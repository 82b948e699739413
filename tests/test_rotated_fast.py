"""Fast MXU rotated sampler (ops/rotated_fast.py) vs the exact sampler.

Strategy: encode each source pixel's coordinates in its channels, sample
with both paths, decode, and assert the fast path reads a source pixel
within the documented tolerance of the exact path's choice
(<= max(1, bbox/M) + 1 px per axis). Runs the Pallas kernel in interpret
mode on CPU."""

import numpy as np
import pytest

import jax.numpy as jnp

from zaru_tpu.ops.rotated_fast import PRESCALE_M, rotated_sample_fast
from zaru_tpu.ops.sampling import sample_view_rgba


def coord_image(H, W):
    """RGB encodes (x, y): r = x & 255, g = (x>>8)*16 + (y>>8), b = y & 255."""
    x = np.arange(W)[None, :].repeat(H, 0)
    y = np.arange(H)[:, None].repeat(W, 1)
    img = np.zeros((H, W, 4), np.uint8)
    img[..., 0] = x & 255
    img[..., 1] = (x >> 8) * 16 + (y >> 8)
    img[..., 2] = y & 255
    img[..., 3] = 255
    return img


def decode(rgb):
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    return (g // 16) * 256 + r, (g % 16) * 256 + b  # (x, y)


CASES = [
    # (cx, cy, w, h, theta)
    (960, 540, 300, 300, 0.0),
    (960, 540, 300, 300, 0.25),
    (700, 400, 450, 380, -0.35),
    (300, 300, 220, 260, 0.55),   # ~31 deg
    (1700, 900, 500, 500, 0.1),   # near right/bottom edge -> OOB pixels
    (420, 320, 640, 480, -0.15),  # bbox > M: coarser tolerance
]


@pytest.mark.parametrize("case", CASES)
def test_fast_sampler_within_tolerance(case):
    H, W = 1080, 1920
    img = coord_image(H, W)
    rrect = np.asarray(case, np.float32)
    out_w = out_h = 192

    exact = np.asarray(
        sample_view_rgba(jnp.asarray(img), jnp.asarray(rrect), out_w, out_h)
    )
    fast = np.asarray(
        rotated_sample_fast(
            jnp.asarray(img[None]),
            jnp.asarray(rrect[None]),
            out_w,
            out_h,
            0.0,
            255.0,
            interpret=True,
        )[0]
    ).round().astype(np.int64)

    bbox = (
        abs(case[2] * np.cos(case[4])) + abs(case[3] * np.sin(case[4])) + 2,
        abs(case[2] * np.sin(case[4])) + abs(case[3] * np.cos(case[4])) + 2,
    )
    fits = max(bbox) <= PRESCALE_M
    # Integer-stride subsampling: index error <= ceil(stride/2).
    stride = int(np.ceil(max(bbox) / PRESCALE_M))
    tol = 0.0 if fits else np.ceil(stride / 2)

    ex_x, ex_y = decode(exact)
    fa_x, fa_y = decode(fast)
    # Compare only where both paths are in-bounds (alpha=255 marks valid
    # for the exact path; fast OOB reads black which decodes to (0, 0)).
    valid = (exact[..., 3] == 255) & (fast.sum(-1) > 0)
    assert valid.mean() > 0.5, "degenerate case: too few valid pixels"
    dx = np.abs(ex_x - fa_x)[valid]
    dy = np.abs(ex_y - fa_y)[valid]
    # Views whose bbox fits the intermediate sample BIT-EXACTLY; larger
    # views quantize by ~bbox/M px.
    assert dx.max() <= tol, (dx.max(), tol)
    assert dy.max() <= tol, (dy.max(), tol)
    if fits:
        assert (fast[valid] == exact[valid][..., :3]).all()
    # And where the exact path is OOB (black), the fast path is black too
    # (within the same boundary tolerance band: interior OOB only).
    oob = exact[..., 3] == 0
    if oob.any():
        assert (fast[oob].sum(-1) == 0).mean() > 0.95


def test_fast_sampler_batched_shapes():
    img = coord_image(270, 480)
    rrects = np.asarray(
        [[240, 135, 150, 150, 0.2], [100, 100, 80, 120, -0.1]], np.float32
    )
    out = rotated_sample_fast(
        jnp.asarray(np.stack([img, img])),
        jnp.asarray(rrects),
        192,
        192,
        0.0,
        1.0,
        interpret=True,
    )
    assert out.shape == (2, 192, 192, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.max(out)) <= 1.0 and float(jnp.min(out)) >= 0.0


@pytest.mark.parametrize("theta", [np.pi / 2, 2.6, -2.0, -0.9])
def test_full_band_arbitrary_rotation(theta):
    """band_p == prescale_m (no banding) supports ANY rotation — the
    hand-cascade configuration. Bit-exact for bbox <= prescale_m."""
    H, W = 540, 960
    img = coord_image(H, W)
    rrect = np.asarray([480, 270, 160, 160, theta], np.float32)
    exact = np.asarray(
        sample_view_rgba(jnp.asarray(img), jnp.asarray(rrect), 192, 192)
    )
    fast = np.asarray(
        rotated_sample_fast(
            jnp.asarray(img[None]), jnp.asarray(rrect[None]), 192, 192,
            0.0, 255.0, interpret=True,
            prescale_m=256, band_p=256, col_split=1,
        )[0]
    ).round().astype(np.int64)
    valid = (exact[..., 3] == 255) & (fast.sum(-1) > 0)
    assert valid.mean() > 0.9
    assert (fast[valid] == exact[valid][..., :3]).all()


@pytest.mark.parametrize("theta", [0.0, np.pi / 2, 2.6, -2.0, -0.9, 3.14])
def test_rolled_window_bit_identical(theta):
    """square_views enables the rolled-window mode (dynamic lane roll
    instead of DMA alignment) for full-band configs; results must be
    BIT-identical to the plain full-band kernel at any rotation."""
    H, W = 540, 960
    img = coord_image(H, W)
    # Square views (the mode's coverage-proof precondition), one of them
    # larger than prescale_m (integer-stride regime).
    rrects = np.asarray(
        [
            [480, 270, 160, 160, theta],
            [300, 300, 300, 300, theta],
        ],
        np.float32,
    )[None]
    common = dict(interpret=True, prescale_m=256, band_p=256, col_split=1)
    plain = np.asarray(
        rotated_sample_fast(
            jnp.asarray(img[None]), jnp.asarray(rrects), 224, 224,
            0.0, 255.0, **common,
        )
    )
    rolled = np.asarray(
        rotated_sample_fast(
            jnp.asarray(img[None]), jnp.asarray(rrects), 224, 224,
            0.0, 255.0, square_views=True, **common,
        )
    )
    np.testing.assert_array_equal(rolled, plain)


def test_rolled_window_small_m_falls_back():
    """square_views with prescale_m < 128 (the rolled window's fixed
    width) must fall back to the plain full-band kernel, not crash."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (1, 120, 160, 4), dtype=np.uint8)
    rrect = np.asarray([[80, 60, 40, 40, 0.8]], np.float32)[None]
    out = rotated_sample_fast(
        jnp.asarray(img), jnp.asarray(rrect[0]), 64, 64, 0.0, 255.0,
        interpret=True, prescale_m=64, band_p=64, win_x=64,
        col_split=1, square_views=True,
    )
    exact = sample_view_rgba(jnp.asarray(img[0]), jnp.asarray(rrect[0, 0]), 64, 64)
    got = np.asarray(out[0]).round().astype(np.int64)
    want = np.asarray(exact)[..., :3]
    # The view is fully in-bounds and bbox <= M: bit-exact everywhere.
    np.testing.assert_array_equal(got, want)


PALLAS_PRESCALE_CASES = [
    # stride 1, rotated
    (960, 540, 300, 300, 0.35),
    # stride 2 (bbox ~844 — the 1080p serving regime), strong rotation
    (960, 540, 700, 700, 0.9),
    # near-edge: crop window clamps at the frame border
    (1800, 1000, 400, 400, -0.6),
    # past-edge: part of the view is OOB (black fill)
    (60, 60, 300, 300, 1.2),
]


@pytest.mark.parametrize("case", PALLAS_PRESCALE_CASES)
def test_pallas_prescale_bit_identical(case):
    """The crop-resident Pallas prescale must match the XLA take path
    BIT-identically wherever its batch-scalar coverage predicate admits
    the batch (strides <= 2, bboxes within the static crop window)."""
    from zaru_tpu.ops.rotated_fast import _prescale_coverage_ok

    H, W = 1080, 1920
    img = coord_image(H, W)
    rrect = np.asarray([case], np.float32)
    # The predicate must actually admit these cases — otherwise the
    # Pallas branch silently never runs and this test checks nothing.
    assert bool(
        _prescale_coverage_ok(jnp.asarray(rrect), PRESCALE_M, H, W)
    ), "coverage predicate rejected a case meant to exercise the kernel"
    args = (jnp.asarray(img[None]), jnp.asarray(rrect), 192, 192, 0.0, 255.0)
    via_pallas = np.asarray(
        rotated_sample_fast(*args, interpret=True, pallas_prescale=True)
    )
    via_take = np.asarray(
        rotated_sample_fast(*args, interpret=True, pallas_prescale=False)
    )
    np.testing.assert_array_equal(via_pallas, via_take)


@pytest.mark.parametrize(
    "size,theta,expected_smax",
    [
        # Serving regimes on a 1080p frame, M=512. bbox inflates by
        # (cos+sin) under rotation; the tightest admitting class should
        # hold these assignments — a change here means views silently
        # moved to a bigger crop DMA or the take fallback (the round-3
        # tilt cliff: 8.4 -> 12.9 ms/step, caught only by timing).
        (400.0, 0.3, 1),    # bbox ~502 <= 512
        (420.0, 0.3, 2),    # bbox ~527 — NOT stride 1 (r3bench6 bug)
        (836.0, 0.12, 2),   # the bench face view, upright-ish
        (700.0, 0.9, 2),    # bbox ~985
        (836.0, 1.0, 3),    # bbox ~1157 — the tilt-cliff view
        (1200.0, 0.78, 4),  # bbox ~1692 > stride-3 coverage: take path
    ],
)
def test_prescale_class_assignment(size, theta, expected_smax):
    """Pin the tightest admitting crop class for representative views —
    the classes are performance lanes (crop DMA 0.6 / 5.5 / 7.7 MB), so
    a silent reassignment is a regression even though every lane is
    bit-exact."""
    from zaru_tpu.ops.rotated_fast import (
        PRESCALE_SMAXES, _prescale_coverage_ok,
    )

    H, W = 1080, 1920
    rr = jnp.asarray([[960.0, 540.0, size, size, theta]], jnp.float32)
    admitting = [
        s for s in PRESCALE_SMAXES
        if bool(_prescale_coverage_ok(rr, PRESCALE_M, H, W, s))
    ]
    if expected_smax > max(PRESCALE_SMAXES):
        assert admitting == [], (
            f"view {size}px@{theta} unexpectedly admitted by {admitting}"
        )
    else:
        assert admitting and admitting[0] == expected_smax, (
            f"view {size}px@{theta}: tightest admitting class "
            f"{admitting[:1]} != expected {expected_smax}"
        )


@pytest.mark.parametrize("dbuf", [False, True])
def test_pallas_prescale_dbuf_forced(dbuf):
    """Both crop-DMA buffering modes (single / double) must be
    bit-identical to the take path — the prescale_dbuf knob only
    changes WHEN the crop lands in VMEM, never what is read. Uses a
    multi-view batch so the double buffer's cross-grid-step prefetch
    (view v+1's DMA issued during view v) actually alternates slots."""
    H, W = 1080, 1920
    img = coord_image(H, W)
    rrect = np.asarray(
        [PALLAS_PRESCALE_CASES[0], PALLAS_PRESCALE_CASES[1],
         PALLAS_PRESCALE_CASES[2]],
        np.float32,
    )
    args = (jnp.asarray(img[None]), jnp.asarray(rrect[None]), 192, 192,
            0.0, 255.0)
    via_pallas = np.asarray(
        rotated_sample_fast(
            *args, interpret=True, pallas_prescale=True,
            prescale_dbuf=dbuf,
        )
    )
    via_take = np.asarray(
        rotated_sample_fast(*args, interpret=True, pallas_prescale=False)
    )
    np.testing.assert_array_equal(via_pallas, via_take)


def test_pallas_prescale_stride3_class():
    """The rotation-inflated serving regime (836 px square view at
    theta=1.0 -> 1157 px bbox, stride 3): rejected by the tight stride-2
    class, admitted by the wide stride-3 class, and BIT-identical to the
    take path (the round-3 tilt cliff: 8.4 -> 12.9 ms/step was this view
    falling to the take fallback)."""
    from zaru_tpu.ops.rotated_fast import _prescale_coverage_ok

    H, W = 1080, 1920
    img = coord_image(H, W)
    rrect = np.asarray([[1038, 595, 836, 836, 1.0]], np.float32)
    assert not bool(
        _prescale_coverage_ok(jnp.asarray(rrect), PRESCALE_M, H, W, 2)
    ), "case unexpectedly fits the tight class — not exercising stride 3"
    assert bool(
        _prescale_coverage_ok(jnp.asarray(rrect), PRESCALE_M, H, W, 3)
    ), "stride-3 class rejected the case it exists for"
    args = (jnp.asarray(img[None]), jnp.asarray(rrect), 192, 192, 0.0, 255.0)
    via_pallas = np.asarray(
        rotated_sample_fast(*args, interpret=True, pallas_prescale=True)
    )
    via_take = np.asarray(
        rotated_sample_fast(*args, interpret=True, pallas_prescale=False)
    )
    np.testing.assert_array_equal(via_pallas, via_take)


def test_pallas_prescale_fallback_large_view():
    """Views beyond every crop class's static coverage (stride >= 4)
    must take the XLA fallback branch of the cond chain and still sample
    correctly."""
    from zaru_tpu.ops.rotated_fast import _prescale_coverage_ok

    H, W = 1080, 1920
    img = coord_image(H, W)
    rrect = np.asarray([[960, 540, 1500, 900, 0.1]], np.float32)
    for smax in (2, 3):
        assert not bool(
            _prescale_coverage_ok(jnp.asarray(rrect), PRESCALE_M, H, W, smax)
        )
    args = (jnp.asarray(img[None]), jnp.asarray(rrect), 192, 192, 0.0, 255.0)
    via_cond = np.asarray(
        rotated_sample_fast(*args, interpret=True, pallas_prescale=True)
    )
    via_take = np.asarray(
        rotated_sample_fast(*args, interpret=True, pallas_prescale=False)
    )
    np.testing.assert_array_equal(via_cond, via_take)


def test_pallas_prescale_rolled_any_rotation():
    """Pallas prescale + rolled-window rotate (the face serving config)
    at strong rotation, stride 1: every output within the documented
    <=1 source px of the exact sampler, and all but f32 rounding-edge
    pixels (<0.1%) bit-identical."""
    H, W = 1080, 1920
    img = coord_image(H, W)
    rrect = np.asarray([900, 500, 360, 360, -1.1], np.float32)
    exact = np.asarray(
        sample_view_rgba(jnp.asarray(img), jnp.asarray(rrect), 192, 192)
    )
    fast = np.asarray(
        rotated_sample_fast(
            jnp.asarray(img[None]), jnp.asarray(rrect[None]), 192, 192,
            0.0, 255.0, interpret=True,
            band_p=PRESCALE_M, col_split=1, square_views=True,
        )[0]
    ).round().astype(np.int64)
    in_frame = exact[..., 3] == 255
    # Black must appear ONLY where the exact sampler is itself OOB —
    # masking black out of the comparison is how the rpb=64 x-window
    # bug survived the suite (see the no_black_fill regression tests).
    assert float(((fast.sum(-1) == 0) & in_frame).mean()) < 1e-3
    valid = in_frame & (fast.sum(-1) > 0)
    assert valid.mean() > 0.9
    ex_x, ex_y = decode(exact)
    fa_x, fa_y = decode(fast)
    assert np.abs(ex_x - fa_x)[valid].max() <= 1
    assert np.abs(ex_y - fa_y)[valid].max() <= 1
    exact_frac = (fast[valid] == exact[valid][..., :3]).all(-1).mean()
    assert exact_frac > 0.999, exact_frac


@pytest.mark.parametrize("theta", [0.4, 0.8, 1.2, 2.2, -2.8])
def test_banded_auto_any_rotation(theta):
    """Round 3: the auto banded config's y-band covers ANY rotation (the
    `any_rotation` condition in the config chooser) — no black-outs, <=1
    source px everywhere, and bit-exact up to rare f32 rounding edges
    (the collapsed affine map vs the exact path's two-stage rounding can
    differ by 1 ulp on a handful of boundary pixels). Round 2's ±38°
    clamp envelope was the old col_split=4 / 32-align geometry."""
    H, W = 1080, 1920
    img = coord_image(H, W)
    rrect = np.asarray([900, 500, 320, 320, theta], np.float32)
    exact = np.asarray(
        sample_view_rgba(jnp.asarray(img), jnp.asarray(rrect), 192, 192)
    )
    fast = np.asarray(
        rotated_sample_fast(
            jnp.asarray(img[None]), jnp.asarray(rrect[None]), 192, 192,
            0.0, 255.0, interpret=True,  # default banded auto config
        )[0]
    ).round().astype(np.int64)
    in_frame = exact[..., 3] == 255
    # No black where the exact sampler has pixels (see no_black_fill).
    assert float(((fast.sum(-1) == 0) & in_frame).mean()) < 1e-3
    valid = in_frame & (fast.sum(-1) > 0)
    assert valid.mean() > 0.9
    ex_x, ex_y = decode(exact)
    fa_x, fa_y = decode(fast)
    assert np.abs(ex_x - fa_x)[valid].max() <= 1
    assert np.abs(ex_y - fa_y)[valid].max() <= 1
    exact_frac = (fast[valid] == exact[valid][..., :3]).all(-1).mean()
    assert exact_frac > 0.999, exact_frac


@pytest.mark.parametrize(
    "size,theta,tol",
    # tol: stride-1 views (bbox <= 512) sample on the exact grid
    # (<= 1 px rounding); stride-2 views subsample (<= 1 px grid
    # quantization + rounding -> 2).
    [(480.0, 1.57, 1), (400.0, -1.57, 1), (700.0, 2.4, 2),
     (836.0, 0.8, 2)],
)
def test_default_config_no_black_fill_steep_rotation(size, theta, tol):
    """REGRESSION (round-3 review): the x-window proof must include
    rows_per_block — rotation mixes output rows into source x, so a
    config with rpb > cols (the briefly-shipped band_p=192/rpb=64 face
    default) read up to ~22% black at steep rotations for views >=
    ~400 px while every then-existing test masked black pixels OUT of
    its comparison. This test drives the DEFAULT config at the failing
    geometry and asserts black appears ONLY where the exact sampler is
    itself out-of-bounds."""
    H, W = 1080, 1920
    img = coord_image(H, W)
    rrect = np.asarray([960, 540, size, size, theta], np.float32)
    exact = np.asarray(
        sample_view_rgba(jnp.asarray(img), jnp.asarray(rrect), 192, 192)
    )
    fast = np.asarray(
        rotated_sample_fast(
            jnp.asarray(img[None]), jnp.asarray(rrect[None]), 192, 192,
            0.0, 255.0, interpret=True,  # default auto config
        )[0]
    ).round().astype(np.int64)
    in_frame = exact[..., 3] == 255
    # coord_image encodes coordinates, so a real pixel is never 0 in
    # all three channels except source (0, 0) — tolerate a handful of
    # genuine edge pixels, not percent-scale fill.
    black = fast.sum(-1) == 0
    black_in_frame = float((black & in_frame).mean())
    assert black_in_frame < 1e-3, (
        f"{black_in_frame:.1%} of in-frame pixels black at "
        f"{size}px theta={theta} — x/y window coverage broken"
    )
    ex_x, ex_y = decode(exact)
    fa_x, fa_y = decode(fast)
    valid = in_frame & ~black
    assert np.abs(ex_x - fa_x)[valid].max() <= tol
    assert np.abs(ex_y - fa_y)[valid].max() <= tol


@pytest.mark.parametrize(
    "size,theta,tol",
    # Same geometry sweep as the default-config regression test (plus a
    # stride-3 crop-class view): the staged faceconfig A/B may promote
    # this blocking to the face default, so its coverage must be pinned
    # at every failing-class geometry BEFORE any device benchmark can
    # flip it. tol follows the stride convention (<= ceil(stride/2)
    # grid quantization + 1 rounding).
    [(480.0, 1.57, 1), (400.0, -1.57, 1), (700.0, 2.4, 2),
     (836.0, 0.8, 2), (836.0, -2.2, 2), (1100.0, 1.0, 3)],
)
def test_cs3_candidate_config_any_rotation(size, theta, tol):
    """The proven faster face-candidate blocking (col_split=3, rpb=64,
    win_x=256 x-roll: 9 blocks/view, x-span 180 <= 246, y-span 185 <=
    P=192) must hold the same no-black-fill bar as the auto default at
    steep rotations before any benchmark can promote it."""
    H, W = 1080, 1920
    img = coord_image(H, W)
    rrect = np.asarray([960, 540, size, size, theta], np.float32)
    exact = np.asarray(
        sample_view_rgba(jnp.asarray(img), jnp.asarray(rrect), 192, 192)
    )
    fast = np.asarray(
        rotated_sample_fast(
            jnp.asarray(img[None]), jnp.asarray(rrect[None]), 192, 192,
            0.0, 255.0, interpret=True,
            band_p=192, col_split=3, rows_per_block=64, win_x=256,
            xroll=True,
        )[0]
    ).round().astype(np.int64)
    in_frame = exact[..., 3] == 255
    black = fast.sum(-1) == 0
    assert float((black & in_frame).mean()) < 1e-3
    ex_x, ex_y = decode(exact)
    fa_x, fa_y = decode(fast)
    valid = in_frame & ~black
    assert np.abs(ex_x - fa_x)[valid].max() <= tol
    assert np.abs(ex_y - fa_y)[valid].max() <= tol


@pytest.mark.parametrize("theta", [0.2, 1.1, -2.5])
def test_resident_banded_bit_identical(theta):
    """RESIDENT banded mode (whole intermediate as a per-view VMEM
    block, windows as aligned slices) must match the per-block-DMA
    banded kernel BIT-identically."""
    H, W = 1080, 1920
    img = coord_image(H, W)
    rrects = np.asarray(
        [[900, 500, 320, 320, theta], [960, 540, 700, 700, -theta]],
        np.float32,
    )
    args = (jnp.asarray(np.stack([img, img])), jnp.asarray(rrects),
            192, 192, 0.0, 255.0)
    dma = np.asarray(rotated_sample_fast(*args, interpret=True))
    res = np.asarray(
        rotated_sample_fast(*args, interpret=True, resident=True)
    )
    np.testing.assert_array_equal(res, dma)


@pytest.mark.parametrize("theta", [0.0, 0.7, 1.9, -2.8])
def test_xroll_banded_bit_identical(theta):
    """x-roll mode (roll-extracted unaligned x-windows, win_x at the
    span bound) must match the aligned resident banded kernel
    BIT-identically at any rotation — including non-square views (the
    x-span LP bound is rotation-independent; no square promise)."""
    H, W = 1080, 1920
    img = coord_image(H, W)
    rrects = np.asarray(
        [[900, 500, 320, 320, theta], [960, 540, 700, 560, -theta]],
        np.float32,
    )
    args = (jnp.asarray(np.stack([img, img])), jnp.asarray(rrects),
            192, 192, 0.0, 255.0)
    base = np.asarray(rotated_sample_fast(*args, interpret=True,
                                          resident=True))
    xr = np.asarray(
        rotated_sample_fast(*args, interpret=True, resident=True,
                            win_x=128, xroll=True)
    )
    np.testing.assert_array_equal(xr, base)


def test_xroll_requires_resident_and_headroom():
    """xroll silently degrades to the aligned path when resident is off
    or M < win_x + 128 — results must still be exact."""
    H, W = 512, 512
    img = coord_image(H, W)
    rrect = np.asarray([[256, 256, 200, 200, 0.4]], np.float32)
    args = (jnp.asarray(img[None]), jnp.asarray(rrect), 192, 192,
            0.0, 255.0)
    for kw in (dict(resident=False), dict(prescale_m=256, win_x=192)):
        base = np.asarray(rotated_sample_fast(*args, interpret=True, **kw))
        out = np.asarray(
            rotated_sample_fast(*args, interpret=True, xroll=True, **kw)
        )
        np.testing.assert_array_equal(out, base)


def test_view_pack_bitwise_and_fallback():
    """view_pack runs N/pack grid steps with identical per-view math —
    packed results must be bitwise-equal, and odd view counts / non-VMEM
    modes must silently fall back to pack=1 (still exact)."""
    H, W = 720, 1280
    img = coord_image(H, W)
    imgs = jnp.asarray(np.stack([img] * 4))
    rrects = jnp.asarray(
        np.asarray(
            [[640, 360, 300, 300, 0.3], [400, 300, 150, 150, -1.2],
             [700, 380, 420, 420, 2.0], [640, 360, 80, 80, 0.0]],
            np.float32,
        )
    )
    args = (imgs, rrects, 192, 192, 0.0, 255.0)
    base = np.asarray(rotated_sample_fast(*args, interpret=True, view_pack=1))
    # Default (None) now auto-packs; must still be bitwise-equal to pack=1.
    for pack in (2, 4, None):
        got = np.asarray(
            rotated_sample_fast(*args, interpret=True, view_pack=pack)
        )
        np.testing.assert_array_equal(got, base)
    # Rolled full-band mode packs too.
    kw = dict(square_views=True, prescale_m=256, band_p=256, col_split=1)
    base_r = np.asarray(
        rotated_sample_fast(*args, interpret=True, view_pack=1, **kw)
    )
    got_r = np.asarray(
        rotated_sample_fast(*args, interpret=True, view_pack=4, **kw)
    )
    np.testing.assert_array_equal(got_r, base_r)
    # Odd N: silent fallback to pack=1.
    base3 = np.asarray(rotated_sample_fast(imgs[:3], rrects[:3], 192, 192,
                                           0.0, 255.0, interpret=True))
    got3 = np.asarray(
        rotated_sample_fast(imgs[:3], rrects[:3], 192, 192, 0.0, 255.0,
                            interpret=True, view_pack=2)
    )
    np.testing.assert_array_equal(got3, base3)


def test_prescale_blocking_bitwise():
    """prescale_rq/prescale_cq change only the selection chunking — the
    windows always cover their chunk, so results are index-identical at
    any admissible blocking (bigger chunks are the round-4 cure for the
    prescale's per-chunk fixed cost; benchsuite prescale-sweep carries
    the device numbers + device parity)."""
    H, W = 720, 1280
    img = coord_image(H, W)
    imgs = jnp.asarray(np.stack([img] * 2))
    rrects = jnp.asarray(
        np.asarray(
            # stride-1 small view and a stride-2/3 tilted large view.
            [[640, 360, 300, 300, 0.3], [640, 360, 700, 700, 1.0]],
            np.float32,
        )
    )
    args = (imgs, rrects, 192, 192, 0.0, 255.0)
    base = np.asarray(rotated_sample_fast(*args, interpret=True))
    for rq, cq in ((128, 128), (64, 256), (128, 256), (256, 512)):
        got = np.asarray(
            rotated_sample_fast(
                *args, interpret=True, prescale_rq=rq, prescale_cq=cq
            )
        )
        np.testing.assert_array_equal(got, base)


def test_prescale_pack_bitwise_and_fallback():
    """prescale_pack runs N/pack prescale grid steps with identical
    per-view math (crop dbuf alternates over the GLOBAL view sequence) —
    packed results must be bitwise-equal, and odd view counts must
    silently fall back to pack=1. fused=False throughout: the knob
    applies only to the standalone prescale kernel (the fused-default
    path has no separate prescale grid)."""
    H, W = 720, 1280
    img = coord_image(H, W)
    imgs = jnp.asarray(np.stack([img] * 4))
    rrects = jnp.asarray(
        np.asarray(
            [[640, 360, 300, 300, 0.3], [400, 300, 150, 150, -1.2],
             [700, 380, 420, 420, 2.0], [640, 360, 700, 700, 1.0]],
            np.float32,
        )
    )
    args = (imgs, rrects, 192, 192, 0.0, 255.0)
    base = np.asarray(
        rotated_sample_fast(*args, interpret=True, fused=False, prescale_pack=1)
    )
    for pack in (2, 4, None):
        got = np.asarray(
            rotated_sample_fast(*args, interpret=True, fused=False, prescale_pack=pack)
        )
        np.testing.assert_array_equal(got, base)
    # dbuf OFF packs too (single crop buffer, serial DMA per view).
    got_nodbuf = np.asarray(
        rotated_sample_fast(
            *args, interpret=True, fused=False, prescale_pack=4, prescale_dbuf=False
        )
    )
    base_nodbuf = np.asarray(
        rotated_sample_fast(
            *args, interpret=True, fused=False, prescale_pack=1, prescale_dbuf=False
        )
    )
    np.testing.assert_array_equal(got_nodbuf, base_nodbuf)
    # Odd N: silent fallback to pack=1.
    b3 = np.asarray(rotated_sample_fast(imgs[:3], rrects[:3], 192, 192,
                                        0.0, 255.0, interpret=True,
                                        prescale_pack=1))
    g3 = np.asarray(rotated_sample_fast(imgs[:3], rrects[:3], 192, 192,
                                        0.0, 255.0, interpret=True,
                                        prescale_pack=4))
    np.testing.assert_array_equal(g3, b3)


def test_fused_kernel_bit_identical_face_config():
    """The fused prescale+rotate kernel (one pallas_call, intermediate
    in VMEM scratch only) must be bit-identical to the two-kernel path
    on the face serving config (banded resident + x-roll), across crop
    classes: stride 1/2 upright, stride 3 tilted, and a mixed batch."""
    H, W = 1080, 1920
    img = coord_image(H, W)
    imgs = jnp.asarray(np.stack([img] * 4))
    for rects in (
        [[900, 500, 360, 360, 0.3]] * 4,        # stride-1 class
        [[900, 500, 836, 836, 0.12]] * 4,       # stride-2 class
        [[900, 500, 836, 836, 1.0]] * 4,        # stride-3 class (tilt)
        [[900, 500, 360, 360, 0.3], [400, 300, 200, 200, -1.2],
         [1500, 700, 500, 500, 2.0], [960, 540, 420, 420, 0.0]],
    ):
        rrects = jnp.asarray(np.asarray(rects, np.float32))
        args = (imgs, rrects, 192, 192, 0.0, 1.0)
        base = np.asarray(
            rotated_sample_fast(*args, interpret=True, fused=False)
        )
        got = np.asarray(
            rotated_sample_fast(*args, interpret=True, fused=True)
        )
        np.testing.assert_array_equal(got, base)


def test_fused_kernel_bit_identical_hand_rolled():
    """Fused kernel under the hand serving config (full-band rolled
    M=256) with tracker slots [B, S, 5]: bit-identical to the
    two-kernel path, any rotation."""
    H, W = 1080, 1920
    img = coord_image(H, W)
    imgs = jnp.asarray(np.stack([img] * 2))
    rng = np.random.default_rng(7)
    rois = np.stack([
        np.stack([
            rng.uniform(300, 1600, 2), rng.uniform(200, 900, 2),
            rng.uniform(180, 320, 2), rng.uniform(180, 320, 2),
            rng.uniform(-3.0, 3.0, 2),
        ], axis=-1)
        for _ in range(2)
    ]).astype(np.float32)
    side = np.maximum(rois[..., 2], rois[..., 3])
    rois[..., 2] = rois[..., 3] = side
    opts = dict(prescale_m=256, band_p=256, col_split=1,
                square_views=True)
    args = (imgs, jnp.asarray(rois), 224, 224, 0.0, 1.0)
    base = np.asarray(
        rotated_sample_fast(*args, interpret=True, fused=False, **opts)
    )
    got = np.asarray(
        rotated_sample_fast(*args, interpret=True, fused=True, **opts)
    )
    np.testing.assert_array_equal(got, base)


def test_fused_kernel_take_fallback():
    """Views no crop class covers (bbox > 3*M) drop the whole batch to
    the take-prescale + standalone-rotate fallback inside the fused
    dispatch — still bit-identical to the unfused path."""
    H, W = 1080, 1920
    img = coord_image(H, W)
    imgs = jnp.asarray(img[None])
    rrects = jnp.asarray(np.asarray([[960, 540, 1700, 1700, 0.2]],
                                    np.float32))
    args = (imgs, rrects, 192, 192, 0.0, 1.0)
    base = np.asarray(
        rotated_sample_fast(*args, interpret=True, fused=False)
    )
    got = np.asarray(rotated_sample_fast(*args, interpret=True, fused=True))
    np.testing.assert_array_equal(got, base)


def test_s1_direct_bit_identical_hand_rolled():
    """Stride-1 DIRECT mode (the fused kernel's class-1 branch reads the
    raw crop, prescale compute skipped): bit-identical to the selection
    prescale under the hand serving config (rolled M=256), any rotation,
    including frame-edge views whose OOB sources must stay black.
    The batch is constructed to be class-1-coverable (asserted), so the
    branch under test is the one that runs."""
    from zaru_tpu.ops.rotated_fast import _prescale_coverage_ok

    H, W = 1080, 1920
    img = coord_image(H, W)
    imgs = jnp.asarray(np.stack([img] * 2))
    rng = np.random.default_rng(11)
    rois = np.stack([
        np.stack([
            rng.uniform(100, 1800, 2), rng.uniform(80, 1000, 2),
            rng.uniform(90, 170, 2), rng.uniform(90, 170, 2),
            rng.uniform(-3.0, 3.0, 2),
        ], axis=-1)
        for _ in range(2)
    ]).astype(np.float32)
    side = np.maximum(rois[..., 2], rois[..., 3])
    rois[..., 2] = rois[..., 3] = side
    # Frame-corner views: OOB sources sample black in both paths.
    rois[0, 0] = [20, 15, 150, 150, 0.7]
    rois[1, 1] = [1905, 1070, 160, 160, -2.1]
    assert bool(_prescale_coverage_ok(
        jnp.asarray(rois.reshape(-1, 5)), 256, H, W, 1
    ))
    opts = dict(prescale_m=256, band_p=256, col_split=1,
                square_views=True)
    args = (imgs, jnp.asarray(rois), 224, 224, 0.0, 1.0)
    base = np.asarray(rotated_sample_fast(
        *args, interpret=True, fused=True, s1_direct=False, **opts
    ))
    got = np.asarray(rotated_sample_fast(
        *args, interpret=True, fused=True, s1_direct=True, **opts
    ))
    np.testing.assert_array_equal(got, base)
    # And vs the full two-kernel chain (oracle-pinned elsewhere).
    unfused = np.asarray(rotated_sample_fast(
        *args, interpret=True, fused=False, **opts
    ))
    np.testing.assert_array_equal(got, unfused)


def test_s1_direct_bit_identical_face_banded():
    """Stride-1 DIRECT mode under the face default config (banded
    resident + x-roll, M=512): bit-identical on class-1 view batches,
    upright and tilted, and with the crop double-buffer off (nbuf ==
    pack slots instead of pack + 1)."""
    from zaru_tpu.ops.rotated_fast import _prescale_coverage_ok

    H, W = 1080, 1920
    img = coord_image(H, W)
    imgs = jnp.asarray(np.stack([img] * 4))
    for rects in (
        [[900, 500, 360, 360, 0.3]] * 4,
        [[900, 500, 350, 350, 1.0], [400, 300, 200, 200, -1.2],
         [1500, 700, 340, 340, 2.0], [960, 540, 300, 300, 0.0]],
    ):
        rrects = jnp.asarray(np.asarray(rects, np.float32))
        assert bool(_prescale_coverage_ok(rrects, PRESCALE_M, H, W, 1))
        args = (imgs, rrects, 192, 192, 0.0, 1.0)
        base = np.asarray(rotated_sample_fast(
            *args, interpret=True, fused=True, s1_direct=False
        ))
        got = np.asarray(rotated_sample_fast(
            *args, interpret=True, fused=True, s1_direct=True
        ))
        np.testing.assert_array_equal(got, base)
        nodbuf = np.asarray(rotated_sample_fast(
            *args, interpret=True, fused=True, s1_direct=True,
            prescale_dbuf=False,
        ))
        np.testing.assert_array_equal(nodbuf, base)


def test_s1_direct_higher_classes_unchanged():
    """s1_direct only rewrites the class-1 branch: stride-2/3 batches
    route through the selection prescale regardless of the knob."""
    H, W = 1080, 1920
    img = coord_image(H, W)
    imgs = jnp.asarray(img[None])
    for rect in ([900, 500, 836, 836, 0.12], [900, 500, 836, 836, 1.0]):
        rrects = jnp.asarray(np.asarray([rect], np.float32))
        args = (imgs, rrects, 192, 192, 0.0, 1.0)
        base = np.asarray(rotated_sample_fast(
            *args, interpret=True, fused=True, s1_direct=False
        ))
        got = np.asarray(rotated_sample_fast(
            *args, interpret=True, fused=True, s1_direct=True
        ))
        np.testing.assert_array_equal(got, base)


def test_fused_kernel_nonresident_falls_back():
    """fused=True on a config whose rotate stage is NOT VMEM-delivered
    (non-resident banded: M too large for the resident gate) silently
    uses the two-kernel path — same results."""
    H, W = 1080, 1920
    img = coord_image(H, W)
    imgs = jnp.asarray(img[None])
    rrects = jnp.asarray(np.asarray([[900, 500, 700, 700, 0.4]],
                                    np.float32))
    args = (imgs, rrects, 192, 192, 0.0, 1.0)
    kw = dict(prescale_m=1024, resident=False)
    base = np.asarray(
        rotated_sample_fast(*args, interpret=True, fused=False, **kw)
    )
    got = np.asarray(
        rotated_sample_fast(*args, interpret=True, fused=True, **kw)
    )
    np.testing.assert_array_equal(got, base)
