"""Ahead-of-time export of jitted pipelines.

Serializes a compiled perception function (e.g. the fused cascade step) as a
portable StableHLO artifact via ``jax.export`` — the deployment story the
reference lacks entirely (its "deployment" is compiling model bytes into a
Rust binary). Exported artifacts reload without the Python model-building
code and run on any matching device topology.
"""

from __future__ import annotations

from pathlib import Path

import jax
from jax import export as jax_export

__all__ = ["export_fn", "load_exported"]


def export_fn(fn, args, path: str | Path) -> None:
    """Exports ``jax.jit(fn)`` specialized to ``args`` to ``path``."""
    exp = jax_export.export(jax.jit(fn))(*args)
    Path(path).write_bytes(exp.serialize())


def load_exported(path: str | Path):
    """Loads an exported function; returns a callable of the original args."""
    exp = jax_export.deserialize(Path(path).read_bytes())
    return exp.call
