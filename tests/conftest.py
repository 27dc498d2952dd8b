"""Test configuration: force an 8-device virtual CPU platform for JAX.

Real-TPU runs use bench.py / the driver's entry points; tests validate
numerics and the multi-chip sharding path on a virtual CPU mesh, mirroring
how the driver dry-runs dryrun_multichip.
"""

import os

# Force the CPU backend even when the environment points JAX at a TPU: the
# suite validates numerics and sharding on an 8-device virtual CPU mesh.
# (The env-var alone is not enough on hosts whose sitecustomize registers a
# TPU plugin at interpreter start, so also flip the config knob.)
# NANORQ_TEST_TPU=1 opts out, for the TPU-gated kernel parity tests
# (tests/test_pallas_tpu.py; `make test-tpu`).
if not os.environ.get("NANORQ_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
