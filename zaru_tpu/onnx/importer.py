"""ONNX → JAX graph importer.

Replaces the reference's `Loader`/`NeuralNetwork` stack
(crates/zaru/src/nn/mod.rs:206-538) with a compile-time import: the ONNX
graph is converted once into a pure ``apply(params, *inputs)`` function whose
body traces to a single XLA program. There is no runtime ONNX dependency and
no per-node interpreter overhead after `jax.jit` compilation.

Weights become a flat ``{name: array}`` pytree — usable directly with optax
for fine-tuning, and shardable with jax.sharding for multi-chip serving.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .ops import OPS
from .proto import OnnxModel, ValueInfo, parse_model

log = logging.getLogger(__name__)

__all__ = ["ImportedModel", "import_model", "load_model"]


def _is_staticval(v) -> bool:
    return isinstance(v, (np.ndarray, np.generic))


@dataclass
class ImportedModel:
    """A pure-functional JAX model imported from ONNX.

    - ``params``: float weights (trainable pytree).
    - ``apply(params, *inputs)``: returns the list of graph outputs.
    - ``input_info`` / ``output_info``: name/shape/dtype of graph I/O.
    - ``layout``: internal activation layout ("NCHW" = ONNX-native;
      "NHWC" = TPU-native, see onnx/layout.py). ``apply`` always follows
      the ONNX contract; with NHWC internals, ``apply_nhwc`` additionally
      accepts rank-4 image inputs already in NHWC (transpose-free feeding
      from the sampler).
    """

    name: str
    params: dict[str, jnp.ndarray]
    apply: Callable
    input_info: list[ValueInfo]
    output_info: list[ValueInfo]
    opset: int
    layout: str = "NCHW"
    apply_nhwc: Callable | None = None

    @property
    def num_inputs(self) -> int:
        return len(self.input_info)

    @property
    def num_outputs(self) -> int:
        return len(self.output_info)

    def __call__(self, *inputs):
        return self.apply(self.params, *inputs)

    def jit(self):
        """Returns a jitted ``f(*inputs)`` closure over the current params."""
        apply = jax.jit(self.apply)
        params = self.params
        return lambda *inputs: apply(params, *inputs)


def import_model(
    model: OnnxModel,
    *,
    output_subset: Sequence[str] | None = None,
    compute_dtype=None,
    layout: str = "NCHW",
) -> ImportedModel:
    """Builds an :class:`ImportedModel` from a parsed :class:`OnnxModel`.

    ``output_subset`` mirrors the reference Loader's output selection
    (nn/mod.rs:286-300): restrict the graph outputs (by name) so XLA can
    dead-code-eliminate unused branches (the reference uses this to disable
    the body-pose segmentation/heatmap heads).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) runs the network body in a
    lower precision with f32 MXU accumulation; inputs/outputs stay f32.

    ``layout="NHWC"`` keeps activations physically NHWC between
    layout-aware ops (TPU-native convolution layout; onnx/layout.py). The
    graph's I/O contract is unchanged.
    """
    assert layout in ("NCHW", "NHWC"), layout
    g = model.graph

    # Split initializers: float arrays are weights (trainable pytree);
    # everything else (int64 shape vectors, pad amounts, ...) is structural
    # and stays baked into the traced graph as static numpy. Exception:
    # a FLOAT initializer consumed exclusively by structural input slots
    # that the op registry requires to be trace-time constants (Resize
    # roi/scales, Upsample scales, Pad constant_value — common exporter
    # output) is structural too, never a trainable weight.
    _FLOAT_STATIC_SLOTS = {
        ("Resize", 1), ("Resize", 2), ("Upsample", 1), ("Pad", 2),
    }
    float_static_names = set()
    float_traced_names = set()
    for n in g.nodes:
        for idx, iname in enumerate(n.inputs):
            if not iname:
                continue
            if (n.op_type, idx) in _FLOAT_STATIC_SLOTS:
                float_static_names.add(iname)
            else:
                float_traced_names.add(iname)
    # Only force-static when NO consumer treats it as a tensor input.
    float_static_names -= float_traced_names

    params: dict[str, np.ndarray] = {}
    static_init: dict[str, np.ndarray] = {}
    for name, arr in g.initializers.items():
        if arr.dtype in (np.float32, np.float16, np.float64):
            if name in float_static_names:
                static_init[name] = np.asarray(arr, dtype=np.float32)
                continue
            # Normalize all float weights to f32 (some exporters store fp16;
            # TPU compute precision is then controlled via compute_dtype).
            params[name] = np.ascontiguousarray(arr, dtype=np.float32)
        else:
            static_init[name] = arr

    init_names = set(g.initializers)
    input_info = [vi for vi in g.inputs if vi.name not in init_names]
    if output_subset is not None:
        by_name = {vi.name: vi for vi in g.outputs}

        def resolve(sel):
            if isinstance(sel, int):
                return g.outputs[sel]
            if sel not in by_name:
                raise ValueError(f"unknown output {sel!r}; have {list(by_name)}")
            return by_name[sel]

        output_info = [resolve(s) for s in output_subset]
    else:
        output_info = list(g.outputs)
    output_names = [vi.name for vi in output_info]

    nodes = g.nodes
    unsupported = sorted({n.op_type for n in nodes} - set(OPS))
    if unsupported:
        raise NotImplementedError(
            f"model {g.name!r} uses unsupported ONNX ops: {unsupported}"
        )
    for n in nodes:
        # Opset-sensitive handlers (Softmax < 13 flattening semantics)
        # read this; the model header's opset is the only source.
        n.opset = model.opset

    use_nhwc = layout == "NHWC"
    if use_nhwc:
        from .layout import dispatch_nhwc, to_nchw

    def _apply_impl(p: dict[str, Any], inputs, inputs_are_nhwc: bool):
        if len(inputs) != len(input_info):
            raise ValueError(
                f"expected {len(input_info)} inputs, got {len(inputs)}"
            )
        env: dict[str, Any] = {}
        tags: dict[str, bool] = {}
        static_env: dict[str, np.ndarray] = dict(static_init)
        if compute_dtype is not None:
            env.update({k: jnp.asarray(v, compute_dtype) for k, v in p.items()})
        else:
            env.update(p)
        env.update(static_env)
        for vi, x in zip(input_info, inputs):
            env[vi.name] = x.astype(compute_dtype) if compute_dtype is not None else x
            tags[vi.name] = bool(
                inputs_are_nhwc and hasattr(x, "ndim") and x.ndim == 4
            )

        needed = _liveness(nodes, output_names)
        for node in nodes:
            if node.outputs and not any(o in needed for o in node.outputs):
                continue
            vals = [env[i] if i else None for i in node.inputs]
            statics = [static_env.get(i) if i else None for i in node.inputs]
            try:
                if use_nhwc:
                    in_tags = [bool(tags.get(i)) for i in node.inputs]
                    results, out_tags = dispatch_nhwc(node, vals, statics, in_tags)
                else:
                    result = OPS[node.op_type](node, vals, statics)
                    results = result if isinstance(result, list) else [result]
                    out_tags = [False] * len(results)
            except Exception as e:
                # Keep the node context in str(e) where possible, but
                # `type(e)(msg)` breaks for exception classes whose
                # constructor doesn't take a single string (e.g. jax's
                # TracerArrayConversionError) — fall back to RuntimeError.
                msg = f"while lowering {node.op_type} node {node.name!r}: {e}"
                try:
                    exc = type(e)(msg)
                except Exception:
                    exc = RuntimeError(msg)
                raise exc from e
            for out_name, val, tag in zip(node.outputs, results, out_tags):
                env[out_name] = val
                tags[out_name] = tag
                if not tag and _is_staticval(val):
                    static_env[out_name] = np.asarray(val)

        outs = [
            to_nchw(env[n]) if tags.get(n) else env[n] for n in output_names
        ] if use_nhwc else [env[n] for n in output_names]
        if compute_dtype is not None:
            outs = [
                o.astype(jnp.float32)
                if hasattr(o, "dtype") and o.dtype == compute_dtype
                else o
                for o in outs
            ]
        return outs

    def apply(p, *inputs):
        return _apply_impl(p, inputs, False)

    apply_nhwc = None
    if use_nhwc:

        def apply_nhwc(p, *inputs):
            return _apply_impl(p, inputs, True)

    return ImportedModel(
        name=g.name,
        params=params,
        apply=apply,
        input_info=input_info,
        output_info=output_info,
        opset=model.opset,
        layout=layout,
        apply_nhwc=apply_nhwc,
    )


def _liveness(nodes, output_names) -> set[str]:
    """Names whose values are needed to compute ``output_names`` (supports
    output-subset DCE before tracing; XLA would also eliminate them, but
    skipping nodes avoids tracing unsupported dead branches)."""
    needed = set(output_names)
    for node in reversed(nodes):
        if any(o in needed for o in node.outputs):
            needed.update(i for i in node.inputs if i)
    return needed


def load_model(
    path_or_bytes,
    *,
    output_subset: Sequence[str] | None = None,
    compute_dtype=None,
    layout: str = "NCHW",
) -> ImportedModel:
    """Parses and imports an ONNX model from a path or raw bytes."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    model = parse_model(data)
    return import_model(
        model,
        output_subset=output_subset,
        compute_dtype=compute_dtype,
        layout=layout,
    )
