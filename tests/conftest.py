"""Test configuration: force an 8-device virtual CPU platform for JAX.

Real-TPU runs use bench.py / the driver's entry points; tests validate
numerics and the multi-chip sharding path on a virtual CPU mesh, mirroring
how the driver dry-runs dryrun_multichip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
