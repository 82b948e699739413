"""Device-side image/compute kernels (sampling, resize, color conversion)."""

from .sampling import sample_view, sample_view_rgba, view_to_tensor

__all__ = ["sample_view", "sample_view_rgba", "view_to_tensor"]
