"""Ahead-of-time export of jitted pipelines.

Serializes a compiled perception function (e.g. the fused cascade step) as a
portable StableHLO artifact via ``jax.export`` — the deployment story the
reference lacks entirely (its "deployment" is compiling model bytes into a
Rust binary). Exported artifacts reload without the Python model-building
code and run on any matching device topology.

``save_state``/``load_state`` round-trip an arbitrary array pytree (a
tracker's ``init_state``) through one ``.npz`` file — the sidecar that makes
an exported step runnable with nothing but this module: no model blobs, no
wrapper construction (see ``python -m zaru_tpu run-exported``).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax
import numpy as np
from jax import export as jax_export

__all__ = ["export_fn", "load_exported", "save_state", "load_state"]


def export_fn(fn, args, path: str | Path, *, platforms=None) -> None:
    """Exports ``jax.jit(fn)`` specialized to ``args`` to ``path``.

    ``platforms`` (e.g. ``("cpu", "tpu")``) lowers the artifact for each
    listed backend so one file deploys across hosts; default is the
    current backend only. Note the sampler's Pallas-vs-interpret choice
    is made at TRACE time from the current backend (ops/rotated_fast.py),
    so an artifact exported on a CPU host runs everywhere the plain-XLA
    sampler; export on the TPU host (platforms including only "tpu") to
    bake the Mosaic fast path in — verified on device 2026-08-20: the
    fused cascade step with its Pallas sampler serializes and
    deserializes without safety-check overrides (tpu_custom_call is on
    jax.export's stable-custom-call allowlist).
    """
    exp = jax_export.export(jax.jit(fn), platforms=platforms)(*args)
    Path(path).write_bytes(exp.serialize())


def load_exported(path: str | Path):
    """Loads an exported function; returns a callable of the original args."""
    exp = jax_export.deserialize(Path(path).read_bytes())
    return exp.call


def save_state(state, path: str | Path) -> None:
    """Saves an array pytree (e.g. ``tracker.init_state()``) as one npz.

    The tree structure (including empty subtrees like a smoother-less
    filter state) is preserved exactly, so the reloaded value matches the
    treedef an exported step was traced with.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(
        Path(path),
        __treedef__=np.frombuffer(pickle.dumps(treedef), np.uint8),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )


def load_state(path: str | Path):
    """Loads a pytree saved by :func:`save_state`."""
    with np.load(Path(path)) as data:
        treedef = pickle.loads(data["__treedef__"].tobytes())
        leaves = [data[f"leaf_{i}"] for i in range(treedef.num_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
