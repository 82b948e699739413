"""Ahead-of-time export of jitted pipelines.

Serializes a compiled perception function (e.g. the fused cascade step) as a
portable StableHLO artifact via ``jax.export`` — the deployment story the
reference lacks entirely (its "deployment" is compiling model bytes into a
Rust binary, build.rs:1-3). Exported artifacts reload without the Python
model-building code and run on any matching device topology.

``save_state``/``load_state`` round-trip an arbitrary array pytree (a
tracker's ``init_state``) through one ``.npz`` file — the sidecar that makes
an exported step runnable with nothing but this module: no model blobs, no
wrapper construction (see ``python -m zaru_tpu run-exported``).

The sidecar format is **pure data** (no pickle): the tree structure is a
JSON spec stored as a unicode scalar inside the npz, leaves are plain
arrays, and ``load_state`` opens the file with ``allow_pickle=False`` —
a sidecar shipped between hosts can never execute code on load. Artifacts
additionally carry a ``.manifest.json`` (``write_manifest``) recording the
framework/jax versions, pipeline, input signature, and lowering platforms,
so a deployment endpoint can validate inputs before the first device call.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
from jax import export as jax_export

__all__ = [
    "export_fn",
    "load_exported",
    "deserialize_exported",
    "save_state",
    "load_state",
    "write_manifest",
    "read_manifest",
]

# Bumped whenever the sidecar layout changes; load_state rejects unknown
# versions (and the round-4 pickle-based layout) with actionable errors.
_SIDECAR_FORMAT = 2


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
    return deserialize_exported(path).call


def deserialize_exported(path: str | Path):
    """Loads the full ``jax.export.Exported`` (signature + callable).

    Use this instead of :func:`load_exported` when the caller needs the
    input signature (``.in_avals`` / ``.in_tree``) to validate frames or a
    state sidecar *before* the first device call — e.g. the
    ``run-exported`` CLI rejecting a batch artifact or a stale sidecar up
    front instead of surfacing a trace-level TypeError mid-loop.
    """
    return jax_export.deserialize(Path(path).read_bytes())


# --------------------------------------------------------------------------
# State sidecar: a pickle-free pytree <-> npz codec.
# --------------------------------------------------------------------------


def _encode_tree(obj, leaves: list) -> dict:
    """Recursively encodes a pytree of dict/list/tuple/None containers into
    a JSON-able spec, appending array leaves to ``leaves`` in order.

    Empty containers (a smoother-less filter state ``{}``) are preserved
    exactly — they are structure, not leaves."""
    if obj is None:
        return {"kind": "none"}
    if isinstance(obj, dict):
        keys = list(obj.keys())
        if not all(isinstance(k, str) for k in keys):
            raise TypeError(
                f"state sidecars require string dict keys, got {keys!r}"
            )
        return {
            "kind": "dict",
            "keys": keys,
            "children": [_encode_tree(obj[k], leaves) for k in keys],
        }
    if isinstance(obj, (list, tuple)):
        return {
            "kind": "list" if isinstance(obj, list) else "tuple",
            "children": [_encode_tree(v, leaves) for v in obj],
        }
    leaves.append(np.asarray(obj))
    return {"kind": "leaf", "i": len(leaves) - 1}


def _decode_tree(spec: dict, leaves):
    kind = spec["kind"]
    if kind == "none":
        return None
    if kind == "dict":
        return {
            k: _decode_tree(c, leaves)
            for k, c in zip(spec["keys"], spec["children"])
        }
    if kind == "list":
        return [_decode_tree(c, leaves) for c in spec["children"]]
    if kind == "tuple":
        return tuple(_decode_tree(c, leaves) for c in spec["children"])
    if kind == "leaf":
        return leaves[spec["i"]]
    raise ValueError(f"unknown sidecar tree node kind {kind!r}")


def save_state(state, path: str | Path) -> None:
    """Saves an array pytree (e.g. ``tracker.init_state()``) as one npz.

    The tree structure (including empty subtrees like a smoother-less
    filter state) is preserved exactly, so the reloaded value matches the
    treedef an exported step was traced with. The file contains ONLY
    arrays + a JSON structure spec — nothing executable (the round-4
    format pickled the treedef, which made loading a shipped sidecar an
    arbitrary-code-execution risk; ADVICE r4)."""
    leaves: list = []
    spec = _encode_tree(state, leaves)
    # Write through a file handle: np.savez(path) silently appends
    # ".npz" to suffix-less paths, breaking the save/load round-trip
    # for arbitrary sidecar paths.
    with open(Path(path), "wb") as f:
        np.savez(
            f,
            __format__=np.int64(_SIDECAR_FORMAT),
            __tree__=np.str_(json.dumps(spec, separators=(",", ":"))),
            **{f"leaf_{i}": leaf for i, leaf in enumerate(leaves)},
        )


def load_state(path: str | Path):
    """Loads a pytree saved by :func:`save_state`.

    Opens the npz with ``allow_pickle=False``: a tampered or legacy
    pickle-bearing sidecar is rejected, never executed."""
    with np.load(Path(path), allow_pickle=False) as data:
        if "__treedef__" in data.files:
            raise ValueError(
                f"{path} is a legacy pickle-based state sidecar; re-export "
                "the artifact (python -m zaru_tpu export) to produce the "
                "pickle-free format"
            )
        if "__tree__" not in data.files or "__format__" not in data.files:
            raise ValueError(f"{path} is not a zaru_tpu state sidecar")
        version = int(data["__format__"])
        if version != _SIDECAR_FORMAT:
            raise ValueError(
                f"{path}: unsupported sidecar format {version} "
                f"(this build reads format {_SIDECAR_FORMAT})"
            )
        spec = json.loads(str(data["__tree__"]))
        leaves = [data[f"leaf_{i}"] for i in range(sum(1 for f in data.files
                                                       if f.startswith("leaf_")))]
        return _decode_tree(spec, leaves)


# --------------------------------------------------------------------------
# Artifact manifest.
# --------------------------------------------------------------------------


def manifest_path(artifact: str | Path) -> Path:
    return Path(f"{artifact}.manifest.json")


def write_manifest(
    artifact: str | Path,
    *,
    pipeline: str,
    kind: str,
    batch: int,
    frame_shape,
    frame_dtype: str,
    platforms,
    state_leaves: int,
) -> Path:
    """Writes ``{artifact}.manifest.json`` describing the exported step.

    The manifest is the artifact's deployment contract: what frames it
    accepts, which backends it was lowered for, and which framework/jax
    versions produced it — checkable by ``run-exported`` before any
    device work. (The reference's analog is implicit: model bytes and
    code versions are fused into one Rust binary.)"""
    import datetime

    from . import __version__

    path = manifest_path(artifact)
    meta = {
        "format": 1,
        "framework": "zaru_tpu",
        "framework_version": __version__,
        "jax_version": jax.__version__,
        "created": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "pipeline": pipeline,
        "kind": kind,
        "batch": int(batch),
        "frame_shape": [int(d) for d in frame_shape],
        "frame_dtype": str(frame_dtype),
        "platforms": list(platforms) if platforms else None,
        "state_leaves": int(state_leaves),
        "artifact": Path(artifact).name,
    }
    path.write_text(json.dumps(meta, indent=2) + "\n")
    return path


def read_manifest(artifact: str | Path) -> dict | None:
    """Reads ``{artifact}.manifest.json`` if present; None otherwise."""
    path = manifest_path(artifact)
    if not path.exists():
        return None
    return json.loads(path.read_text())
