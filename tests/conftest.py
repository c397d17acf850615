"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding semantics are validated on one host via
``xla_force_host_platform_device_count`` (the driver separately dry-runs the
multi-chip path); x64 is enabled so CPU-side physics checks can run in double
precision while TPU runs stay in f32.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the JAX_PLATFORMS env var is ignored in this environment (the 'axon'
# TPU-tunnel plugin still becomes the default backend, making every op compile
# take seconds over the tunnel); the config update below is what actually
# forces the host CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# XLA:CPU compiles the fused transport loop slowly (~1 min); cache compiled
# executables across test runs. HYP_NO_COMPILE_CACHE=1 disables it (used to
# bisect a rare segfault inside backend_compile_and_load).
if not os.environ.get("HYP_NO_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_addoption(parser):
    # regenerate the stored self-regression outputs (tests/data/selfreg/)
    # instead of comparing against them (ref: the reference's
    # --generate-reference flag, testing/pytest_plugin.py:4-21)
    parser.addoption("--generate-reference", action="store_true",
                     default=False,
                     help="regenerate stored self-regression outputs")
