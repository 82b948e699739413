"""Video input + native-layer tests."""

import io
import socket
import threading

import numpy as np
import pytest

from zaru_tpu.resolution import Resolution
from zaru_tpu.video.anim import Animation
from zaru_tpu.video.httpcam import HttpCam
from zaru_tpu.video.webcam import (
    ParamPreference,
    Webcam,
    WebcamOptions,
    _FOURCC_MJPG,
    _Mode,
    list_devices,
    negotiate_format,
)


def _make_jpeg(w=32, h=24, color=(255, 0, 0)) -> bytes:
    from PIL import Image as PILImage

    buf = io.BytesIO()
    PILImage.new("RGB", (w, h), color).save(buf, "JPEG")
    return buf.getvalue()


class TestNativeJpeg:
    def test_decode_matches_cv2(self):
        import cv2

        from zaru_tpu.assets import fixture_path
        from zaru_tpu.native import turbojpeg

        data = fixture_path("sad_linus.jpg").read_bytes()
        ours = turbojpeg.decode(data)
        ref = cv2.cvtColor(
            cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB,
        )
        np.testing.assert_array_equal(ours, ref)

    def test_garbage_rejected(self):
        from zaru_tpu.native import turbojpeg

        with pytest.raises(ValueError):
            turbojpeg.decode(b"not a jpeg")

    def test_backend_selection(self, monkeypatch):
        from zaru_tpu.image import decode as idec

        data = _make_jpeg()
        for backend in ("cv2", "pil", "native"):
            monkeypatch.setenv("ZARU_TPU_JPEG_BACKEND", backend)
            rgb = idec.decode_jpeg(data)
            assert rgb.shape == (24, 32, 3)
            assert rgb[:, :, 0].mean() > 200  # red-ish

    def test_unknown_backend(self, monkeypatch):
        from zaru_tpu.image import decode as idec

        monkeypatch.setenv("ZARU_TPU_JPEG_BACKEND", "bogus")
        with pytest.raises(ValueError, match="bogus"):
            idec.decode_jpeg(_make_jpeg())


class TestWebcamNegotiation:
    MODES = [
        _Mode(_FOURCC_MJPG, 1920, 1080, 30, 1),
        _Mode(_FOURCC_MJPG, 1280, 720, 60, 1),
        _Mode(_FOURCC_MJPG, 640, 480, 120, 1),
        _Mode(0x56595559, 3840, 2160, 30, 1),  # YUYV, must be ignored
    ]

    def test_prefers_resolution_by_default(self):
        m = negotiate_format(self.MODES, WebcamOptions())
        assert (m.width, m.height) == (1920, 1080)

    def test_prefers_framerate(self):
        m = negotiate_format(
            self.MODES, WebcamOptions(prefer=ParamPreference.FRAMERATE)
        )
        assert m.fps == 120

    def test_resolution_is_at_least(self):
        # Reference semantics (webcam.rs:167-190): the resolution
        # constraint is >=, and the RESOLUTION preference then picks the
        # largest eligible mode.
        m = negotiate_format(
            self.MODES, WebcamOptions(resolution=Resolution(1280, 720))
        )
        assert (m.width, m.height) == (1920, 1080)

    def test_resolution_floor_with_framerate_pref(self):
        # >= 1280x720 excludes the 120 fps 640x480 mode; among eligible,
        # FRAMERATE preference picks the fastest (1280x720@60).
        m = negotiate_format(
            self.MODES,
            WebcamOptions(
                resolution=Resolution(1280, 720),
                prefer=ParamPreference.FRAMERATE,
            ),
        )
        assert (m.width, m.height, m.fps) == (1280, 720, 60)

    def test_fps_floor_beats_exact_resolution(self):
        # The verdict-review scenario (webcam.rs:97-190): asking for
        # 640x480@60 with RESOLUTION preference must return a mode that
        # satisfies BOTH floors (1280x720@60), not silently drop fps.
        m = negotiate_format(
            self.MODES,
            WebcamOptions(resolution=Resolution(640, 480), fps=60),
        )
        assert m.fps >= 60 and m.width >= 640

    def test_constraint_degradation(self):
        # Impossible fps: the preferred (resolution) constraint drops
        # first, then fps — ending at the largest mode overall.
        m = negotiate_format(
            self.MODES,
            WebcamOptions(resolution=Resolution(1920, 1080), fps=500),
        )
        assert (m.width, m.height) == (1920, 1080)

    def test_non_jpeg_only(self):
        m = negotiate_format(
            [_Mode(0x56595559, 640, 480, 30, 1)], WebcamOptions()
        )
        assert m is None

    def test_no_devices_in_ci(self):
        # This environment has no cameras; enumeration must not crash and
        # open must raise a clean error.
        devices = list_devices()
        if not devices:
            with pytest.raises(RuntimeError, match="no usable V4L2"):
                Webcam.open()


class TestAnimation:
    def test_gif_roundtrip(self, tmp_path):
        from PIL import Image as PILImage

        frames = [
            PILImage.new("RGB", (16, 16), c) for c in ((255, 0, 0), (0, 255, 0), (0, 0, 255))
        ]
        path = tmp_path / "anim.gif"
        frames[0].save(
            path, save_all=True, append_images=frames[1:], duration=50, loop=0
        )
        anim = Animation.from_path(path)
        assert len(anim) == 3
        for frame, expected_channel in zip(anim.frames(), (0, 1, 2)):
            assert frame.duration() == pytest.approx(0.05)
            arr = frame.image_view().to_numpy()
            assert arr.shape == (16, 16, 4)
            assert arr[..., expected_channel].mean() > 150


class TestHttpCam:
    @staticmethod
    def _serve_mjpeg(sock, jpegs, use_content_length=True):
        conn, _ = sock.accept()
        conn.recv(4096)  # request
        head = (
            b"HTTP/1.0 200 OK\r\n"
            b"Content-Type: multipart/x-mixed-replace; boundary=frameboundary\r\n\r\n"
        )
        conn.sendall(head)
        for j in jpegs:
            part = b"--frameboundary\r\nContent-Type: image/jpeg\r\n"
            if use_content_length:
                part += b"Content-Length: %d\r\n" % len(j)
            part += b"\r\n" + j + b"\r\n"
            conn.sendall(part)
        conn.sendall(b"--frameboundary--\r\n")
        conn.close()

    @pytest.mark.parametrize("use_content_length", [True, False])
    def test_reads_frames(self, use_content_length):
        jpegs = [_make_jpeg(color=(255, 0, 0)), _make_jpeg(color=(0, 0, 255))]
        sock = socket.socket()
        sock.bind(("127.0.0.1", 0))
        sock.listen(1)
        port = sock.getsockname()[1]
        t = threading.Thread(
            target=self._serve_mjpeg, args=(sock, jpegs, use_content_length)
        )
        t.start()
        try:
            cam = HttpCam(f"http://127.0.0.1:{port}/stream")
            f1 = cam.read().to_numpy()
            f2 = cam.read().to_numpy()
            assert f1[..., 0].mean() > 200  # red
            assert f2[..., 2].mean() > 200  # blue
            cam.close()
        finally:
            t.join()
            sock.close()

    def test_rejects_non_multipart(self):
        sock = socket.socket()
        sock.bind(("127.0.0.1", 0))
        sock.listen(1)
        port = sock.getsockname()[1]

        def serve():
            conn, _ = sock.accept()
            conn.recv(4096)
            conn.sendall(b"HTTP/1.0 200 OK\r\nContent-Type: text/html\r\n\r\nhi")
            conn.close()

        t = threading.Thread(target=serve)
        t.start()
        try:
            with pytest.raises(RuntimeError, match="multipart"):
                HttpCam(f"http://127.0.0.1:{port}/")
        finally:
            t.join()
            sock.close()


class TestFaceRecognition:
    def test_embeddings_discriminate(self, sad_linus_cropped):
        from zaru_tpu.face.recognition import Embedder, embedding_distance
        from zaru_tpu.image import Image

        emb = Embedder()
        a = emb.embed(sad_linus_cropped)
        assert a.shape == (128,)
        # Same image -> identical embedding.
        assert embedding_distance(a, emb.embed(sad_linus_cropped)) < 1e-4
        # Random noise -> clearly different.
        rng = np.random.default_rng(0)
        noise = Image.from_array(rng.integers(0, 255, (112, 112, 3), np.uint8))
        assert embedding_distance(a, emb.embed(noise)) > 0.5


class TestVideoFile:
    def test_read_frames(self, tmp_path):
        import cv2

        from zaru_tpu.video.file import VideoFile

        p = str(tmp_path / "t.avi")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 10, (32, 24))
        for i in range(5):
            w.write(np.full((24, 32, 3), i * 40, np.uint8))
        w.release()

        vf = VideoFile(p)
        assert vf.frame_count() == 5
        assert vf.fps() == pytest.approx(10.0)
        assert vf.resolution().width == 32
        frames = list(vf)
        assert len(frames) == 5
        assert frames[0].to_numpy().shape == (24, 32, 4)
        # Brightness increases across frames (MJPEG is lossy; loose check).
        means = [f.to_numpy()[..., :3].mean() for f in frames]
        assert means[4] > means[0] + 100
        vf.close()

    def test_missing_file(self):
        from zaru_tpu.video.file import VideoFile

        with pytest.raises(RuntimeError, match="failed to open"):
            VideoFile("/nonexistent/video.mp4")


class TestFaceIdentification:
    def test_enroll_and_identify(self, sad_linus_full, sad_linus_cropped):
        from zaru_tpu.face.identify import FaceIdentifier
        from zaru_tpu.image import Image

        ident = FaceIdentifier(threshold=1.0)
        assert ident.enroll("linus", sad_linus_full)
        assert len(ident) == 1

        # Identify from the full photo (same source image -> near-zero
        # distance; the crop runs through detection again).
        match = ident.identify(sad_linus_full)
        assert match is not None and match.name == "linus"
        assert match.distance < 0.3

        # No face -> None; no-enrollment path -> None.
        blank = Image.new(128, 128)
        assert ident.identify(blank) is None
        empty = FaceIdentifier()
        assert empty.identify(sad_linus_full) is None

    def test_no_face_enroll(self):
        from zaru_tpu.face.identify import FaceIdentifier
        from zaru_tpu.image import Image

        ident = FaceIdentifier()
        assert not ident.enroll("nobody", Image.new(64, 64))
        assert len(ident) == 0


def test_identify_across_images(sad_linus_full, sad_linus_cropped):
    """Enroll from the cropped photo, identify in the full photo — the
    embedding must be stable across different crops of the same person."""
    from zaru_tpu.face.identify import FaceIdentifier

    ident = FaceIdentifier(threshold=1.0)
    assert ident.enroll("linus", sad_linus_cropped)
    match = ident.identify(sad_linus_full)
    assert match is not None and match.name == "linus", match
    assert match.distance < 1.0
