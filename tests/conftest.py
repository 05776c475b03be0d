"""Test configuration: force an 8-device CPU mesh.

The session environment pins JAX_PLATFORMS=axon (real TPU through a tunnel)
and a sitecustomize imports jax at interpreter startup, so plain env-var
overrides are too late — use jax.config instead, which works until a
backend is initialized. The driver validates multi-chip sharding the same
way (xla_force_host_platform_device_count); real-TPU behavior is exercised
by bench.py and the TPU smoke scripts, not the unit suite.
"""
import os

TPU_TESTS = os.environ.get("TPU_TESTS", "") == "1"

if not TPU_TESTS:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_TESTS:
    # TPU_TESTS=1 keeps the session's real backend (axon TPU) so the
    # `-m tpu` gate exercises compiled Pallas kernels on the chip;
    # everything else runs on a virtual 8-device CPU mesh.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Keep f32 matmuls exact in oracle comparisons.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the suite's cost is dominated by
# re-compiling the same interpret-mode pipelines; repeat runs on this
# host drop several-fold. (Not committed — see .gitignore.)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
