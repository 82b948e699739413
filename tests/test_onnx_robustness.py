"""ONNX wire-parser robustness: truncations and bit flips of real models
must raise clean Python exceptions, never crash or hang."""

import numpy as np
import pytest

from zaru_tpu.assets import model_path
from zaru_tpu.onnx import load_model, parse_model


@pytest.fixture(scope="module")
def data():
    return model_path("slim_160_latest.onnx").read_bytes()


def test_truncations(data):
    rng = np.random.default_rng(0)
    for frac in (0.01, 0.1, 0.5, 0.9, 0.999):
        cut = data[: int(len(data) * frac)]
        try:
            m = parse_model(cut)
            # Parsed by luck — importing may still fail; both are fine as
            # long as it's a clean exception.
            load_model(cut)
        except Exception as e:
            assert isinstance(e, (ValueError, IndexError, KeyError, NotImplementedError)), type(e)


def test_bit_flips(data):
    rng = np.random.default_rng(1)
    for _ in range(10):
        buf = bytearray(data)
        for pos in rng.integers(0, len(buf), size=8):
            buf[pos] ^= 0xFF
        try:
            load_model(bytes(buf))
        except Exception as e:
            assert isinstance(
                e, (ValueError, IndexError, KeyError, NotImplementedError, TypeError, AssertionError)
            ), type(e)


def test_empty_and_tiny():
    with pytest.raises(ValueError):
        parse_model(b"")
    for blob in (b"\x00", b"\xff" * 16):
        with pytest.raises((ValueError, IndexError)):
            parse_model(blob)


def test_profiling_device_timer():
    from zaru_tpu.profiling import annotate, device_timer

    out = []
    with device_timer("t", sink=out.append) as sync:
        with annotate("region"):
            import jax.numpy as jnp

            y = sync(jnp.ones((8, 8)) * 2)
    assert out and out[0].startswith("t: ")
    assert float(y.sum()) == 128.0
