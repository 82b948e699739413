"""Neural-network inference runtime.

TPU-native counterpart of reference crates/zaru/src/nn/mod.rs. The reference
wraps three CPU/GPU ONNX runtimes behind `NeuralNetwork` and converts images
to tensors with a per-pixel CPU closure (`Cnn::image_map`, nn/mod.rs:54-80).
Here a `NeuralNetwork` is an imported JAX graph compiled by XLA, and `Cnn`
fuses the rotated-view sampling + color mapping + inference into ONE jitted
device program, so image→tensor→outputs never leaves the chip.
"""

from __future__ import annotations

import enum
import logging
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .image import Image, ImageView, as_view
from .onnx import ImportedModel, load_model
from .ops.sampling import letterbox_sample_core, view_to_tensor_core
from .resolution import Resolution

log = logging.getLogger(__name__)

__all__ = ["CnnInputShape", "ColorMapper", "Cnn", "NeuralNetwork", "Loader"]


class CnnInputShape(enum.Enum):
    """Input tensor layout (nn/mod.rs:170-186)."""

    NCHW = "NCHW"
    NHWC = "NHWC"


@dataclass(frozen=True)
class ColorMapper:
    """Linear sRGB→range mapper (nn/mod.rs:129-168)."""

    lo: float
    hi: float

    @staticmethod
    def linear(lo: float, hi: float) -> "ColorMapper":
        assert hi > lo
        return ColorMapper(lo, hi)

    def map_array(self, rgb_u8):
        adjust = (self.hi - self.lo) / np.float32(255.0)
        return rgb_u8.astype(jnp.float32) * adjust + self.lo


class NeuralNetwork:
    """A loaded network: cheap handle around an imported JAX graph
    (reference nn/mod.rs:369-446)."""

    def __init__(self, model: ImportedModel):
        self._model = model
        self._jit_apply = jax.jit(model.apply)

    @staticmethod
    def load(
        path_or_bytes, *, output_subset=None, compute_dtype=None, layout=None
    ) -> "NeuralNetwork":
        """``layout=None`` defaults to ``ZARU_TPU_NHWC`` (1 → NHWC internal
        activations, the TPU-native conv layout; see onnx/layout.py)."""
        if layout is None:
            layout = "NHWC" if os.environ.get("ZARU_TPU_NHWC") == "1" else "NCHW"
        return NeuralNetwork(
            load_model(
                path_or_bytes,
                output_subset=output_subset,
                compute_dtype=compute_dtype,
                layout=layout,
            )
        )

    # `from_onnx(...).load()` builder-style alias for API parity with the
    # reference (nn/mod.rs:259).
    from_onnx = load

    @property
    def model(self) -> ImportedModel:
        return self._model

    @property
    def params(self):
        return self._model.params

    def num_inputs(self) -> int:
        return self._model.num_inputs

    def num_outputs(self) -> int:
        return self._model.num_outputs

    def inputs(self):
        return list(self._model.input_info)

    def outputs(self):
        return list(self._model.output_info)

    def estimate(self, *tensors):
        """Runs inference on raw input tensors, returning output list."""
        return self._jit_apply(self._model.params, *tensors)


class Loader:
    """Builder mirroring the reference `Loader` (nn/mod.rs:206-363)."""

    def __init__(self, path_or_bytes):
        self._src = path_or_bytes
        self._output_subset = None
        self._compute_dtype = None
        self._layout = None

    def with_output_selection(self, names: Sequence[str]) -> "Loader":
        self._output_subset = list(names)
        return self

    def with_output_selection_by_index(self, indices: Sequence[int]) -> "Loader":
        """Select outputs by position (reference nn/mod.rs:286-300 takes
        indices)."""
        self._output_subset = [int(i) for i in indices]
        return self

    def with_bf16(self) -> "Loader":
        """Runs the network body in bfloat16 (reference's f16 conversion
        flag, nn/mod.rs:282-284, mapped to the TPU-native dtype)."""
        self._compute_dtype = jnp.bfloat16
        return self

    def with_layout(self, layout: str) -> "Loader":
        """Internal activation layout: "NCHW" (ONNX-native) or "NHWC"
        (TPU-native convs, onnx/layout.py)."""
        self._layout = layout
        return self

    def load(self) -> NeuralNetwork:
        return NeuralNetwork.load(
            self._src,
            output_subset=self._output_subset,
            compute_dtype=self._compute_dtype,
            layout=self._layout,
        )


class Cnn:
    """A CNN operating on image views (reference nn/mod.rs:35-127).

    The whole pipeline — rotated-ROI gather, letterbox, color map, network —
    is one jitted function; `estimate` recompiles only per distinct root
    image shape.
    """

    def __init__(self, nn: NeuralNetwork, shape: CnnInputShape, color_mapper: ColorMapper):
        self._nn = nn
        self._shape = shape
        self._mapper = color_mapper
        self._input_res = self._get_input_res(nn, shape)

        w, h = self._input_res.width, self._input_res.height
        lo, hi = color_mapper.lo, color_mapper.hi
        layout = shape.value
        model = nn.model
        apply = model.apply
        if model.apply_nhwc is not None and shape == CnnInputShape.NCHW:
            # NHWC-internal model: sample straight to NHWC and skip the
            # entry transpose entirely — the sampler's natural layout.
            layout = "NHWC"
            apply = model.apply_nhwc

        def apply_on_view(params, image_u8, rrect):
            tensor = view_to_tensor_core(image_u8, rrect, w, h, lo, hi, layout)
            return apply(params, tensor)

        def sample_views_fast(images_u8, rrects, **opts):
            from .ops.rotated_fast import rotated_sample_fast

            return rotated_sample_fast(images_u8, rrects, w, h, lo, hi, **opts)

        def sample_view_hwc(image_u8, rrect):
            return view_to_tensor_core(image_u8, rrect, w, h, lo, hi, "NHWC")[0]

        def sample_views_letterbox(images_u8, rrects):
            return jax.vmap(
                lambda img, rr: letterbox_sample_core(img, rr, w, h, lo, hi)
            )(images_u8, rrects)

        def apply_tensor_hwc(params, t_hwc):
            if model.apply_nhwc is not None:
                return model.apply_nhwc(params, t_hwc[None])
            return model.apply(params, jnp.transpose(t_hwc, (2, 0, 1))[None])

        self._apply_on_view = apply_on_view
        self._sample_views_fast = sample_views_fast
        self._sample_views_letterbox = sample_views_letterbox
        self._sample_view_hwc = sample_view_hwc
        self._apply_tensor_hwc = apply_tensor_hwc
        self._jit = jax.jit(apply_on_view)

    @staticmethod
    def _get_input_res(nn: NeuralNetwork, shape: CnnInputShape) -> Resolution:
        if nn.num_inputs() != 1:
            raise ValueError(
                f"CNN network has to take exactly 1 input, this one takes "
                f"{nn.num_inputs()}"
            )
        t = [d if isinstance(d, int) else 1 for d in nn.inputs()[0].shape]
        if shape == CnnInputShape.NCHW and len(t) == 4 and t[0] == 1 and t[1] == 3:
            return Resolution(t[3], t[2])
        if shape == CnnInputShape.NHWC and len(t) == 4 and t[0] == 1 and t[3] == 3:
            return Resolution(t[2], t[1])
        raise ValueError(f"invalid model input shape for {shape}: {t}")

    @property
    def nn(self) -> NeuralNetwork:
        return self._nn

    @property
    def params(self):
        return self._nn.params

    def input_resolution(self) -> Resolution:
        return self._input_res

    def apply_on_view(self, params, image_u8, rrect):
        """Traceable (params, image, view-rect) → outputs. Use inside fused
        jitted pipelines; vmap over leading dims for multi-stream batching."""
        return self._apply_on_view(params, image_u8, rrect)

    def sample_views_fast(self, images_u8, rrects, **opts):
        """Batched MXU-based rotated-view sampling (ops/rotated_fast.py):
        ``[B,H,W,4] u8`` + ``[B,...,5]`` rects → ``[B,...,h,w,3] f32``
        color-mapped network inputs. Sampling is within ~1 source px of
        the exact per-stream path — the fused serving-path fast lane.
        ``opts`` forward the sampler's geometry knobs
        (prescale_m/band_p/col_split)."""
        return self._sample_views_fast(images_u8, rrects, **opts)

    def sample_views_letterbox(self, images_u8, rrects):
        """Batched exact angle-0 view sampling (ops/sampling.py
        ``letterbox_sample_core``): ``[B,H,W,4] u8`` + ``[B,5]`` unrotated
        rects → ``[B,h,w,3] f32`` network inputs, bit-identical to the
        exact per-stream path at any scale — the detection letterbox
        fast lane."""
        return self._sample_views_letterbox(images_u8, rrects)

    def apply_tensor_hwc(self, params, t_hwc):
        """Applies the network to one pre-sampled ``[h, w, 3]`` f32 input
        (NHWC feeds NHWC-internal models transpose-free)."""
        return self._apply_tensor_hwc(params, t_hwc)

    def sample_view_hwc(self, image_u8, rrect):
        """Exact single-view sample → ``[h, w, 3]`` f32 (color-mapped),
        for traced pipelines that transform the crop before applying."""
        return self._sample_view_hwc(image_u8, rrect)

    def estimate(self, image) -> list:
        """Runs the network on an image or view (nn/mod.rs:118-126).

        Aspect mismatch stretches the image, like the reference.
        """
        view = as_view(image)
        return self._jit(
            self._nn.params,
            view.image.data,
            jnp.asarray(view.view_rect.array),
        )
