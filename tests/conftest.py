"""Test configuration.

Unit tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (mirrors SURVEY.md §4's requirement that tests
run without a TPU; the same suite re-runs unchanged on real chips by unsetting
JAX_PLATFORMS).
"""

import os

# Must be set before the first jax backend initialization. Note: this
# environment may pre-register a TPU plugin and set JAX_PLATFORMS itself, so
# overwrite (not setdefault) and also force the config below.
if os.environ.get("ZARU_TPU_TEST_BACKEND", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

import hashlib
import pathlib
import platform

import jax as _jax


def _machine_fingerprint() -> str:
    """CPU-feature fingerprint for partitioning the compile cache.

    XLA:CPU AOT cache entries bake in the compile machine's CPU features;
    loading an entry produced on a different machine type can SIGILL (the
    repo — and its .jax_cache — persists across build rounds on different
    VMs, and a cross-machine entry crashed a full-suite run on
    2026-08-20). Partitioning by feature hash keeps reuse on the same
    machine and isolation across machines. TPU entries are unaffected
    (bench tooling uses the shared .jax_cache root; TPU code is compiled
    for the device, not the host)."""
    try:
        cpuinfo = pathlib.Path("/proc/cpuinfo").read_text()
        flags = next(
            (l for l in cpuinfo.splitlines() if l.startswith("flags")), ""
        )
    except OSError:
        flags = ""
    key = f"{platform.machine()}:{flags}"
    return hashlib.sha1(key.encode()).hexdigest()[:10]


# Persistent compile cache: unchanged test programs skip XLA compilation
# on re-runs (keyed by HLO hash, so code changes recompile as needed).
_jax.config.update(
    "jax_compilation_cache_dir",
    str(
        pathlib.Path(__file__).resolve().parent.parent
        / ".jax_cache"
        / f"cpu-{_machine_fingerprint()}"
    ),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def sad_linus_full():
    """Full test photo (reference: crates/zaru/src/test.rs:5-25)."""
    from zaru_tpu.assets import fixture_path
    from zaru_tpu.image import Image

    return Image.load(fixture_path("sad_linus.jpg"))


@pytest.fixture(scope="session")
def sad_linus_cropped():
    from zaru_tpu.assets import fixture_path
    from zaru_tpu.image import Image

    return Image.load(fixture_path("sad_linus_cropped.jpg"))


def rng(seed=0):
    return np.random.default_rng(seed)
