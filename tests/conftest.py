import os

# Tests run on an 8-virtual-device CPU mesh.  The axon TPU plugin is
# registered by a sitecustomize at interpreter startup (before conftest),
# so the platform must be forced through jax.config, not just env vars.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REFERENCE = "/root/reference"
ORACLE_BIN = "/tmp/bppbuild/src/bpp"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running statistical comparisons")
    config.addinivalue_line(
        "markers", "smoke: per-family end-to-end chains that compile a "
        "full engine step (~10-90s each); exclude together with slow "
        "for the pure-logic <3-minute tier)")
