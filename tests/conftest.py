import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the
# multi-chip path via __graft_entry__.dryrun_multichip).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects the remote TPU backend via
# jax.config; override it back to CPU for the test suite.
jax.config.update("jax_platforms", "cpu")

# Oracle tests compare against scipy/numpy references in double precision.
jax.config.update("jax_enable_x64", True)
