"""Smoke-runs the examples headless (GUI file-sink backend, fixture frames),
mirroring the reference's use of examples as its e2e suite (SURVEY.md §4)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"

RUNNABLE = [
    "load_image.py",
    "jpegbench.py",
    "face_detection.py",
    "facemesh.py",
    "facemarks68.py",
    "pose68.py",
    "fused_cascade.py",
    "eye_tracking.py",
    "palm_detection.py",
    "hand_tracking.py",
    "identify_stream.py",
]


def _run(name, *args, frames=1, timeout=300):
    env = dict(os.environ)
    env.update(
        ZARU_TPU_GUI="none",
        ZARU_TPU_EXAMPLE_FRAMES=str(frames),
        JAX_PLATFORMS="cpu",
        ZARU_TPU_LOG="WARNING",
    )
    return subprocess.run(
        [sys.executable, str(EXAMPLES / name), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=EXAMPLES,
    )


@pytest.mark.parametrize("name", RUNNABLE)
def test_example_runs(name):
    res = _run(name)
    assert res.returncode == 0, f"{name} failed:\n{res.stdout}\n{res.stderr}"


def test_animation_example(tmp_path):
    from PIL import Image as PILImage

    gif = tmp_path / "t.gif"
    frames = [PILImage.new("RGB", (8, 8), c) for c in ((255, 0, 0), (0, 255, 0))]
    frames[0].save(gif, save_all=True, append_images=frames[1:], duration=10)
    res = _run("animation.py", str(gif))
    assert res.returncode == 0, res.stderr


def test_gui_file_backend(tmp_path, monkeypatch):
    monkeypatch.setenv("ZARU_TPU_GUI", "file")
    monkeypatch.setenv("ZARU_TPU_GUI_DIR", str(tmp_path))
    from zaru_tpu import gui
    from zaru_tpu.image import Image

    gui.show_image("testwin", Image.new(8, 8))
    files = list((tmp_path / "testwin").glob("*.png"))
    assert len(files) == 1


def test_eval_face_recognition_example(tmp_path):
    # Two photos of the same person -> one intra-person pair; exercises
    # the example's full detect -> crop -> embed -> distance loop
    # (reference: examples/eval_face_recognition.rs).
    img_dir = Path(__file__).resolve().parent.parent / "assets" / "img"
    person = tmp_path / "linus"
    person.mkdir()
    for src in ("sad_linus.jpg", "sad_linus_cropped.jpg"):
        (person / src).write_bytes((img_dir / src).read_bytes())
    res = _run("eval_face_recognition.py", str(tmp_path))
    assert res.returncode == 0, res.stderr
    assert "intra-person distance" in res.stdout, res.stdout


def test_usage_errors():
    for name in ("animation.py", "httpcam.py"):
        res = _run(name)
        assert res.returncode == 2, (name, res.returncode, res.stderr)
        assert "usage" in res.stdout
