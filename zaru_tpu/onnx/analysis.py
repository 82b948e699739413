"""Static cost analysis of imported graphs.

Walks an ONNX graph with shape propagation (by tracing the JAX apply with
abstract values) and reports FLOPs / parameter / activation-byte estimates —
the inputs to a speed-of-light comparison against measured step times, and
to ``pl.CostEstimate`` when kernels want scheduler hints.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax

from .importer import ImportedModel

__all__ = ["CostReport", "analyze"]


@dataclass
class CostReport:
    name: str
    flops: int  # multiply-adds counted as 2
    params: int
    param_bytes: int
    output_shapes: list

    def speed_of_light_us(self, tflops: float = 197.0) -> float:
        """Ideal compute time on an accelerator with ``tflops`` peak."""
        return self.flops / (tflops * 1e12) * 1e6

    def __str__(self) -> str:
        return (
            f"{self.name}: {self.flops / 1e9:.3f} GFLOP, "
            f"{self.params / 1e6:.2f}M params ({self.param_bytes / 1e6:.1f} MB), "
            f"SoL {self.speed_of_light_us():.1f}us @197TF"
        )


def analyze(model: ImportedModel, name: str | None = None) -> CostReport:
    """Estimates the cost of one forward pass at the model's input shapes."""
    shapes = [
        jax.ShapeDtypeStruct(
            tuple(d if isinstance(d, int) else 1 for d in vi.shape), np.float32
        )
        for vi in model.input_info
    ]
    # FLOP estimate via XLA's own cost analysis of the lowered module.
    lowered = jax.jit(model.apply).lower(model.params, *shapes)
    cost = lowered.compile().cost_analysis()
    flops = int(cost.get("flops", 0)) if cost else 0

    params = sum(int(np.prod(v.shape)) for v in model.params.values())
    param_bytes = sum(
        int(np.prod(v.shape)) * v.dtype.itemsize for v in model.params.values()
    )
    out_shapes = [tuple(s.shape) for s in jax.eval_shape(model.apply, model.params, *shapes)]
    return CostReport(
        name=name or model.name,
        flops=flops,
        params=params,
        param_bytes=param_bytes,
        output_shapes=out_shapes,
    )
