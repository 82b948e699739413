#!/usr/bin/env python3
"""Regenerate tests/goldens/goldens.npz from the current pipeline.

Run on CPU from the repo root:

    python tests/regen_goldens.py

and, with the TPU tunnel available, record the TPU golden set too
(tests/goldens/goldens_tpu.npz — catches numeric drift the CPU goldens
can't see, e.g. a new compiler changing conv fusion/precision on the
real chip; VERDICT r2 weak #5):

    python tests/regen_goldens.py --tpu

The recorded tensors pin the exact numeric outputs of the verified
pipeline (detection boxes/keypoints/angles, landmark meshes, iris chain)
on the checked-in fixture photos, converting the semantic-invariant tests
into regression-proof golden tests (SURVEY.md §4: "bit-closeness
comparisons against recorded reference outputs"). Only regenerate after a
deliberate, verified change in numeric behavior — and say why in the
commit message.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
GOLDEN_PATH = os.path.join(_GOLDEN_DIR, "goldens.npz")
GOLDEN_PATH_TPU = os.path.join(_GOLDEN_DIR, "goldens_tpu.npz")


def detections_arrays(dets, num_keypoints):
    """Flattens a Detections into (conf [N], angle [N], rect [N,4] cxcywh,
    keypoints [N,K,2]), sorted by descending confidence for stable order."""
    rows = sorted(dets.iter(), key=lambda d: -d.confidence())
    conf = np.array([d.confidence() for d in rows], np.float32)
    angle = np.array([d.angle() for d in rows], np.float32)
    rect = np.array(
        [[*d.bounding_rect().center(), d.bounding_rect().width(),
          d.bounding_rect().height()] for d in rows],
        np.float32,
    )
    kps = np.array([d.keypoints() for d in rows], np.float32).reshape(
        len(rows), num_keypoints, 2
    )
    return conf, angle, rect, kps


def compute_goldens():
    from zaru_tpu.assets import fixture_path
    from zaru_tpu.detection import Detector
    from zaru_tpu.face.detection import FullRangeNetwork, ShortRangeNetwork
    from zaru_tpu.face.eye import EyeNetwork
    from zaru_tpu.face.landmark.mediapipe import FaceMeshV1, FaceMeshV2
    from zaru_tpu.face.landmark.multipie68 import FaceOnnx, PeppaFacialLandmark
    from zaru_tpu.image import Image
    from zaru_tpu.landmark import Estimator

    full = Image.load(fixture_path("sad_linus.jpg"))
    cropped = Image.load(fixture_path("sad_linus_cropped.jpg"))

    out = {}

    for name, net in [("short", ShortRangeNetwork()), ("full", FullRangeNetwork())]:
        conf, angle, rect, kps = detections_arrays(
            Detector(net).detect(full), num_keypoints=6
        )
        out[f"det_{name}_conf"] = conf
        out[f"det_{name}_angle"] = angle
        out[f"det_{name}_rect"] = rect
        out[f"det_{name}_kps"] = kps

    v1 = Estimator(FaceMeshV1()).estimate(cropped)
    out["mesh_v1_pos"] = v1.landmarks_mut().positions().copy()
    out["mesh_v1_conf"] = np.float32(v1.confidence())

    v2 = Estimator(FaceMeshV2()).estimate(cropped)
    out["mesh_v2_pos"] = v2.landmarks_mut().positions().copy()
    out["mesh_v2_conf"] = np.float32(v2.confidence())

    for name, net in [("peppa", PeppaFacialLandmark()), ("faceonnx", FaceOnnx())]:
        est = Estimator(net).estimate(cropped)
        out[f"lm68_{name}_pos"] = est.landmarks_mut().positions().copy()

    # Iris chain: mesh -> left-eye ROI -> eye/iris landmarker (the ROI is
    # itself a pinned function of the mesh output, so this pins the whole
    # detect->mesh->eye cascade's numeric path).
    eye_rect = v1.left_eye()
    eye_view = cropped.view(eye_rect)
    eye = Estimator(EyeNetwork()).estimate(eye_view)
    out["eye_rect"] = np.asarray(eye_rect.array, np.float32)
    out["eye_pos"] = eye.landmarks_mut().positions().copy()
    out["eye_iris_center"] = np.asarray(eye.iris_center(), np.float32)

    return out


def main():
    on_tpu = "--tpu" in sys.argv[1:]
    if not on_tpu:
        # Force CPU BEFORE first backend use (the shell env may inject a
        # TPU plugin; see tests/conftest.py).
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(_GOLDEN_DIR), "..", ".jax_cache"),
        )
        assert jax.default_backend() == "tpu", (
            f"--tpu requested but backend is {jax.default_backend()}"
        )
    path = GOLDEN_PATH_TPU if on_tpu else GOLDEN_PATH
    out = compute_goldens()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **out)
    print(f"wrote {path}:")
    for k, v in sorted(out.items()):
        v = np.asarray(v)
        print(f"  {k}: shape {v.shape}")


if __name__ == "__main__":
    main()
