"""Weight checkpointing.

The reference has no checkpoint system (weights are compiled into the
binary, SURVEY.md §5). Here model params are plain pytrees, so fine-tuned
weights save/restore either as ``.npz`` (dependency-free, single file) or
through orbax (sharded, async, multi-host) — both behind one API.

For training loops, :class:`CheckpointManager` adds step-numbered async
saves with retention: the save is dispatched in the background (device→host
copies happen immediately; serialization overlaps the next training steps)
so the step loop never blocks on disk.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = [
    "save_params",
    "load_params",
    "save_params_async",
    "CheckpointManager",
]


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
    # force=True: the npz path silently overwrites, so the orbax path
    # must too — "save latest" loops call this repeatedly on one path.
    ckptr.save(path.resolve(), params, force=True)
    ckptr.wait_until_finished()


def save_params_async(path: str | Path, params: dict):
    """Starts an async orbax save; returns the checkpointer handle.

    Device arrays are snapshotted to host immediately; writing overlaps
    subsequent computation. Call ``.wait_until_finished()`` on the returned
    handle (or just let :func:`save_params`'s sync path be your last save)
    before reading the checkpoint back or exiting the process.
    """
    import orbax.checkpoint as ocp

    path = Path(path)
    if path.suffix == ".npz":
        raise ValueError("async saves require an orbax directory path, not .npz")
    ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    ckptr.save(path.resolve(), args=ocp.args.StandardSave(params))
    return ckptr


def _abstract_like(like: dict):
    """Pytree of ShapeDtypeStructs carrying each leaf's sharding — the
    orbax restore target that places leaves directly on their mesh."""
    import jax

    return jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=v.sharding)
        if hasattr(v, "sharding")
        else v,
        like,
    )


def load_params(path: str | Path, *, like: dict | None = None) -> dict:
    """Loads a param pytree.

    ``like`` (optional): a pytree of arrays or ``jax.ShapeDtypeStruct``s
    carrying ``sharding``s — the restore then places every leaf directly
    with that sharding (e.g. params replicated or sharded over a
    ``jax.sharding.Mesh``), so multi-chip training resumes without a
    host-memory round trip + reshard.
    """
    path = Path(path)
    if path.suffix == ".npz":
        if like is not None:
            import jax

            with np.load(path) as data:
                missing = sorted(set(like) - set(data.files))
                if missing:
                    raise KeyError(
                        f"checkpoint {path} is missing params {missing} "
                        f"(has {sorted(data.files)})"
                    )
                extra = sorted(set(data.files) - set(like))
                if extra:
                    raise ValueError(
                        f"checkpoint {path} has params {extra} not in the "
                        "restore target; pass a matching `like` tree"
                    )
                return {
                    k: jax.device_put(data[k], getattr(v, "sharding", None))
                    for k, v in like.items()
                }
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        # StandardCheckpointer.restore takes the abstract target tree
        # positionally (orbax >= 0.11; ShapeDtypeStructs with shardings
        # place leaves directly on the mesh).
        return ckptr.restore(path.resolve(), _abstract_like(like))
    return ckptr.restore(path.resolve())


class CheckpointManager:
    """Step-numbered async checkpointing for fine-tune loops.

    Thin policy layer over :mod:`orbax.checkpoint`'s CheckpointManager:
    saves every ``save_interval_steps`` (callers may call ``save`` every
    step), keeps the newest ``max_to_keep`` checkpoints, and performs
    writes asynchronously so the training loop never blocks on disk.

    Usage::

        mgr = CheckpointManager(dir, max_to_keep=3)
        for step in range(n):
            params, opt_state = train_step(params, opt_state, batch)
            mgr.save(step, params)
        mgr.close()                      # flush pending writes
        params = mgr.restore()           # latest
        params = mgr.restore(step=1200)  # specific step
    """

    def __init__(
        self,
        directory: str | Path,
        *,
        max_to_keep: int = 3,
        save_interval_steps: int = 1,
    ):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mgr = ocp.CheckpointManager(
            Path(directory).resolve(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, params: dict) -> bool:
        """Dispatches an async save; returns whether one was started
        (False when the interval policy skips this step)."""
        return self._mgr.save(
            step, args=self._ocp.args.StandardSave(params)
        )

    def restore(self, step: int | None = None, *, like: dict | None = None) -> dict:
        """Restores ``step`` (default: the latest saved step).

        ``like``: arrays (or ShapeDtypeStructs) whose ``sharding``s place
        the restored leaves directly on a mesh (see :func:`load_params`).
        """
        self.wait_until_finished()
        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError("no checkpoints saved yet")
        if like is not None:
            return self._mgr.restore(
                step,
                args=self._ocp.args.StandardRestore(_abstract_like(like)),
            )
        return self._mgr.restore(step)

    def all_steps(self) -> list[int]:
        return sorted(self._mgr.all_steps())

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self) -> "CheckpointManager":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
