"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
initializes, so multi-chip sharding tests run without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Parity tests compare against torch fp32; the XLA default conv/matmul
# precision is reduced (bf16-class), so pin full fp32 accumulation here.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# The axon sitecustomize sets jax_platforms="axon,cpu" via CONFIG (env is
# ignored after that), so tests would nondeterministically get 1 TPU or 8
# CPU devices depending on whether the chip is busy.  Pin CPU explicitly.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: re-runs of the (slow, 1-core) test suite
# reuse compiled executables instead of re-tracing everything
jax.config.update("jax_compilation_cache_dir", "/tmp/refid_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
