"""Device NMS must reproduce the host (reference-exact) NMS, and the traced
SSD decode must match the host decode — property-tested on random
detection fields."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zaru_tpu.detection import (
    Anchors,
    Detection,
    Detections,
    LayerInfo,
    decode_ssd,
    decode_ssd_device,
)
from zaru_tpu.detection.nms import (
    NonMaxSuppression,
    SuppressionMode,
    nms_average_device,
    nms_remove_device,
)
from zaru_tpu.geometry import Rect


def random_detections(rng, n, spread=100.0, nkp=2):
    dets = []
    arrs = []
    for _ in range(n):
        cx, cy = rng.uniform(0, spread, 2)
        w, h = rng.uniform(10, 40, 2)
        conf = rng.uniform(0.5, 1.0)
        kps = [rng.uniform(0, spread, 2).astype(np.float32) for _ in range(nkp)]
        angle = rng.uniform(-1, 1)
        dets.append(
            Detection(conf, Rect.from_center(cx, cy, w, h), keypoints=kps, angle=angle)
        )
        arrs.append((conf, [cx, cy, w, h], np.stack(kps), angle))
    boxes = np.array([a[1] for a in arrs], np.float32)
    confs = np.array([a[0] for a in arrs], np.float32)
    kps = np.stack([a[2] for a in arrs]).astype(np.float32)
    angles = np.array([a[3] for a in arrs], np.float32)
    return dets, boxes, confs, kps, angles


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("mode", ["average", "remove"])
def test_device_nms_matches_host(seed, mode):
    rng = np.random.default_rng(seed)
    dets, boxes, confs, kps, angles = random_detections(rng, 24, spread=80.0)

    host_nms = NonMaxSuppression()
    host_nms.set_mode(mode)
    host_out = host_nms.process(list(dets))

    fn = nms_average_device if mode == "average" else nms_remove_device
    valid, conf_d, boxes_d, kps_d, angles_d = jax.jit(
        lambda b, c, k, a: fn(b, c, k, a, max_out=24)
    )(jnp.asarray(boxes), jnp.asarray(confs), jnp.asarray(kps), jnp.asarray(angles))

    n_dev = int(np.asarray(valid).sum())
    assert n_dev == len(host_out), (n_dev, len(host_out))

    # Device output is ordered by descending seed confidence; host output
    # too (seeds popped from a sorted list).
    for i, host_det in enumerate(host_out):
        assert float(conf_d[i]) == pytest.approx(host_det.confidence(), rel=1e-6)
        hr = host_det.bounding_rect()
        np.testing.assert_allclose(
            np.asarray(boxes_d[i]),
            np.concatenate([hr.center(), [hr.width(), hr.height()]]),
            rtol=1e-4,
            atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(angles_d[i]), host_det.angle(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(kps_d[i]),
            np.stack(host_det.keypoints()),
            rtol=1e-4,
            atol=1e-3,
        )


def test_device_decode_matches_host():
    rng = np.random.default_rng(7)
    anchors = Anchors.calculate([LayerInfo(2, 4, 4)])
    n = anchors.anchor_count()
    boxes_raw = rng.normal(0, 10, (1, n, 16)).astype(np.float32)
    conf_raw = rng.normal(0, 3, (1, n, 1)).astype(np.float32)

    host = Detections()
    decode_ssd(128, 128, anchors, boxes_raw, conf_raw, 0.5, host, num_keypoints=6)

    boxes_d, conf_d, kps_d = jax.jit(
        lambda b, c: decode_ssd_device(
            128, 128, jnp.asarray(anchors.centers), b, c, 0.5, 6
        )
    )(jnp.asarray(boxes_raw), jnp.asarray(conf_raw))

    conf_np = np.asarray(conf_d)
    live = np.nonzero(conf_np > 0)[0]
    host_list = list(host.iter())
    assert len(live) == len(host_list)
    # Host extraction iterates anchors in order; device keeps anchor order.
    for idx, det in zip(live, host_list):
        assert conf_np[idx] == pytest.approx(det.confidence(), rel=1e-5)
        hr = det.bounding_rect()
        np.testing.assert_allclose(
            np.asarray(boxes_d[idx]),
            np.concatenate([hr.center(), [hr.width(), hr.height()]]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(kps_d[idx]), np.stack(det.keypoints()), rtol=1e-5
        )


def test_nms_reference_vectors():
    """The reference's own NMS unit tests (nms.rs:165-219), host and device."""
    # Remove mode suppresses the lower-confidence overlap.
    nms = NonMaxSuppression()
    nms.set_mode(SuppressionMode.Remove)
    a = Detection(0.6, Rect.from_center(0.0, 0.0, 1.0, 1.0))
    b = Detection(0.55, Rect.from_center(0.0, 0.0, 1.5, 1.5))
    out = nms.process([a, b])
    assert len(out) == 1 and out[0].confidence() == 0.6

    # Non-overlapping stay.
    a = Detection(1.0, Rect.from_center(0.0, 0.0, 1.0, 1.0))
    b = Detection(1.0, Rect.from_center(5.0, 0.0, 1.0, 1.0))
    assert len(nms.process([a, b])) == 2

    # Average mode blends boxes with confidence weights.
    nms = NonMaxSuppression()
    nms.set_iou_thresh(0.0)
    a = Detection(1.0, Rect.from_center(-1.0, 3.0, 1.0, 1.0))
    b = Detection(0.5, Rect.from_center(-1.0, 3.0, 4.0, 4.0))
    out = nms.process([a, b])
    assert len(out) == 1
    d = out[0]
    assert d.confidence() == 1.0
    np.testing.assert_allclose(d.bounding_rect().center(), [-1.0, 3.0])
    assert d.bounding_rect().width() == pytest.approx(2.0)
    assert d.bounding_rect().height() == pytest.approx(2.0)
