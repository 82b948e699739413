"""Driver-contract test: ``__graft_entry__.dryrun_multichip`` must pass when
invoked exactly as the driver does — a fresh interpreter with the unmodified
shell environment (where jax would come up on a single tunneled-TPU or CPU
device), calling ``dryrun_multichip(8)``.

Round 1 failed this contract (MULTICHIP_r01.json: rc=1, "need 8 devices,
have 1") because the entry asserted on ``jax.devices()`` instead of
provisioning the virtual CPU mesh itself. The entry now re-execs its body in
a subprocess forced onto an 8-device CPU mesh; this test exercises that path
end-to-end, including from an environment that explicitly mimics the
driver's (``JAX_PLATFORMS=axon``, no host-platform device-count flag).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """The env the driver would use: no CPU forcing, no virtual devices."""
    env = dict(os.environ)
    env.pop("ZARU_TPU_DRYRUN_CHILD", None)
    env.pop("ZARU_TPU_DRYRUN_NATIVE", None)
    # Undo conftest's CPU forcing: the driver's shell has the TPU platform
    # set and no --xla_force_host_platform_device_count.
    env["JAX_PLATFORMS"] = "axon"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def test_dryrun_multichip_driver_style():
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout[-2000:]
