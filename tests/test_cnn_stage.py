"""Fused BlazeBlock stage kernel (ops/cnn_stage.py) vs the XLA reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from zaru_tpu.ops.cnn_stage import (
    blaze_blocks_reference, fused_blocks, pack_blocks,
)


def make_blocks(rng, C, nb):
    return [
        {
            "dw_w": rng.normal(0, 0.3, (C, 1, 3, 3)).astype(np.float32),
            "dw_b": rng.normal(0, 0.1, (C,)).astype(np.float32),
            "pw_w": rng.normal(0, 0.3, (C, C, 1, 1)).astype(np.float32),
            "pw_b": rng.normal(0, 0.1, (C,)).astype(np.float32),
            "alpha": rng.uniform(0.05, 0.3, (C,)).astype(np.float32),
        }
        for _ in range(nb)
    ]


@pytest.mark.parametrize("C,H,W,B,nb", [
    (32, 24, 24, 8, 3),   # stage-2-like (G=4)
    (16, 12, 20, 8, 2),   # non-square spatial, G=8
    (128, 6, 6, 2, 2),    # deep stage, G=1
])
def test_fused_blocks_matches_reference(C, H, W, B, nb):
    rng = np.random.default_rng(11)
    blocks = make_blocks(rng, C, nb)
    x = rng.normal(0, 1, (B, C, H, W)).astype(np.float32)

    want = np.asarray(blaze_blocks_reference(jnp.asarray(x), blocks))
    G = max(1, 128 // C)
    packed = pack_blocks(blocks, C, G)
    got = np.asarray(
        fused_blocks(jnp.asarray(x), packed, H, W, C, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
