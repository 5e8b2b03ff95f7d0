"""Test harness config: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize force-registers the axon TPU platform, so the
platform must be overridden via jax.config (env vars alone are ignored).
Shardings are validated on a forced 8-device CPU platform; the driver
separately dry-runs the multi-chip path (see __graft_entry__.dryrun_multichip).
"""
import os
import sys

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
# Keep the remote-TPU (axon) backend from ever initializing: the harness
# env pins JAX_PLATFORMS to the tunnel platform, and with only the
# jax.config override the tunnel backend still spins up, adding minutes
# of per-test stalls (and hanging a run outright on a dropped
# connection).  Overriding the env var before any backend initializes
# keeps the whole suite on the local CPU platform (measured ~8x faster
# per test on this box).  A user pointing the suite at real hardware
# (e.g. JAX_PLATFORMS=tpu to run the kernel tests on-chip) is honored:
# only the unset/tunnel-pinned cases are overridden (ADVICE r4 #5).
_plat = os.environ.get("JAX_PLATFORMS")
if _plat in (None, "", "axon"):
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_golden(name: str) -> str | None:
    """Path to a reference golden-vector file, or None when unavailable."""
    path = os.path.join(REFERENCE_DIR, "vectors", "golden", name)
    return path if os.path.exists(path) else None
