"""Multi-chip scaling via jax.sharding.

The reference is single-process (SURVEY.md §2.5); its only concurrency is
CPU worker threads. The TPU-native scaling story is *per-stream data
parallelism over ICI*: perception streams are embarrassingly parallel, so a
fleet of camera feeds shards over a 1-D device mesh with no collectives on
the serving path (collectives appear only in fine-tuning, where gradient
all-reduce rides ICI).
"""

from .mesh import ShardedFaceTracker, ShardedTracker, stream_mesh

__all__ = ["ShardedFaceTracker", "ShardedTracker", "stream_mesh"]
