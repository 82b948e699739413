"""Fine-tuning support for imported models.

The reference ships frozen weights only (no training at all); this module is
a capability extension the TPU rebuild gets for free from the functional
design: imported models are pure ``apply(params, x)`` functions with float32
param pytrees, so optax gradient fine-tuning (e.g. adapting a landmarker to
a new camera/domain) is a few lines — and data-parallel over a device mesh
via jax.sharding.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .onnx import ImportedModel

__all__ = ["Trainer", "landmark_mse_loss", "make_data_parallel_train_step"]


def landmark_mse_loss(model: ImportedModel, output_index: int = 0) -> Callable:
    """MSE on a model output vs. targets — the natural loss for landmark
    regressors (outputs are coordinate vectors)."""

    def loss_fn(params, x, y):
        out = model.apply(params, x)[output_index]
        return jnp.mean((out.reshape(y.shape) - y) ** 2)

    return loss_fn


class Trainer:
    """Minimal optax trainer over an imported model's param pytree."""

    def __init__(self, model: ImportedModel, loss_fn=None, optimizer=None):
        self.model = model
        self.loss_fn = loss_fn or landmark_mse_loss(model)
        self.optimizer = optimizer or optax.adam(1e-4)
        self.params = model.params
        self.opt_state = self.optimizer.init(self.params)

        @jax.jit
        def step(params, opt_state, x, y):
            loss, grads = jax.value_and_grad(self.loss_fn)(params, x, y)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = step

    def train_step(self, x, y) -> float:
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, x, y
        )
        return float(loss)


def make_data_parallel_train_step(
    model: ImportedModel,
    mesh: Mesh,
    *,
    batch_axis: str = "stream",
    loss_fn=None,
    optimizer=None,
):
    """Builds a data-parallel training step jitted over ``mesh``.

    Params (and optimizer state) are replicated; the batch is sharded over
    ``batch_axis``; XLA inserts the gradient all-reduce (psum over ICI)
    automatically from the output sharding constraints — the
    scaling-book recipe: annotate shardings, let the compiler place
    collectives.

    Returns ``(step, params, opt_state, shard_batch)`` where
    ``step(params, opt_state, x, y) -> (params, opt_state, loss)`` and
    ``shard_batch(arr)`` places a host array with the right sharding.
    """
    loss_fn = loss_fn or landmark_mse_loss(model)
    optimizer = optimizer or optax.adam(1e-4)

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(batch_axis))

    params = jax.device_put(model.params, replicated)
    opt_state = jax.device_put(optimizer.init(params), replicated)

    def step_fn(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(
        step_fn,
        in_shardings=(replicated, replicated, batch_sharded, batch_sharded),
        out_shardings=(replicated, replicated, replicated),
    )

    def shard_batch(arr):
        return jax.device_put(jnp.asarray(arr), batch_sharded)

    return step, params, opt_state, shard_batch
