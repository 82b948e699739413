"""Repo-hygiene test: every third-party asset must be attributed.

Mirrors the reference's license-table walker (reference
crates/zaru/tests/misc.rs:7-52, which walks 3rdparty/ and asserts every
file appears in its license table). Here the third-party tree is
``assets/`` and the table is ``assets/ATTRIBUTION.md``.
"""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(REPO, "assets")
ATTRIBUTION = os.path.join(ASSETS, "ATTRIBUTION.md")


def test_every_asset_is_attributed():
    with open(ATTRIBUTION, encoding="utf-8") as f:
        table = f.read()
    missing = []
    for root, _dirs, files in os.walk(ASSETS):
        for name in files:
            if name == "ATTRIBUTION.md":
                continue
            if name not in table:
                rel = os.path.relpath(os.path.join(root, name), ASSETS)
                missing.append(rel)
    assert not missing, (
        f"assets without an entry in assets/ATTRIBUTION.md: {sorted(missing)}"
    )


# Blobs absent from the reference checkout itself
# (reference 3rdparty/onnx/.MISSING_LARGE_BLOBS:1-5); wrappers load-gate them.
KNOWN_MISSING = {
    "hand_landmark_full.onnx",
    "palm_detection_full.onnx",
    "pose_detection.onnx",
    "pose_landmark_full.onnx",
    "pose_landmark_lite.onnx",
}


def test_attribution_covers_only_real_files():
    """Inverse check: every file named in the table exists (or is one of
    the documented missing blobs) — keeps the table honest."""
    import re

    with open(ATTRIBUTION, encoding="utf-8") as f:
        table = f.read()
    present = set()
    for _root, _dirs, files in os.walk(ASSETS):
        present.update(files)
    for name in set(re.findall(r"[\w.]+\.(?:onnx|obj|jpg)", table)):
        assert name in present or name in KNOWN_MISSING, (
            f"ATTRIBUTION.md names {name} which is not in assets/"
        )
