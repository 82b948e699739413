"""Weight checkpointing.

The reference has no checkpoint system (weights are compiled into the
binary, SURVEY.md §5). Here model params are plain pytrees, so fine-tuned
weights save/restore either as ``.npz`` (dependency-free, single file) or
through orbax (sharded, async, multi-host) — both behind one API.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["save_params", "load_params"]


def save_params(path: str | Path, params: dict) -> None:
    """Saves a flat ``{name: array}`` param pytree.

    ``.npz`` suffix → numpy archive; anything else → orbax checkpoint dir.
    """
    path = Path(path)
    if path.suffix == ".npz":
        np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path.resolve(), params)
    ckptr.wait_until_finished()


def load_params(path: str | Path) -> dict:
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path.resolve())
