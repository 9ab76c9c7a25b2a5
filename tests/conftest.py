"""Test harness configuration.

All tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path). Environment must be set before jax is imported anywhere.
"""

import os

# Force CPU even when the session environment points at a TPU tunnel
# (JAX_PLATFORMS=axon): the suite targets the virtual CPU mesh; real-TPU
# runs go through bench.py / the verify skill, not pytest.
os.environ["JAX_PLATFORMS"] = "cpu"
# CPU tests use the pure-JAX traversal (the Pallas kernel's reference
# implementation); interpret-mode packet traversal is too slow for CI.
os.environ.setdefault("SGE_JAX_TRAVERSAL", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Some environments (the axon TPU tunnel) import jax from sitecustomize at
# interpreter startup, latching jax_platforms from the pre-existing env
# before the assignments above ran — override the latched config too.
# XLA_FLAGS is re-read from os.environ at backend creation, which is still
# lazy at this point, so the flag assignment above is sufficient for it.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compile cache: this box has one CPU core, so re-compiling every
# eager op per pytest process dominates test time without this.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "fast: quick iteration subset (`pytest -m fast`, < 5 min): "
        "math/pose/queries/assets oracles — no Pallas interpret mode, no "
        "subprocess fan-out, no full-scene builds")
    config.addinivalue_line(
        "markers",
        "slow: multi-minute tests (subprocess renders, soak runs); "
        "excluded from -m fast by definition")
