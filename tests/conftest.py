"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh, SURVEY.md section 4) and enable x64 so numeric
parity checks against the float64 reference math are meaningful."""

import os

# XLA_FLAGS must be set before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Serialize LLVM codegen inside XLA:CPU compilation: three full-suite runs
# segfaulted/aborted inside backend_compile_and_load on the large x64
# reference-parity programs (each at a different test, all in the biggest
# compiles; every crash site passes standalone) — parallel LLVM codegen is
# the prime suspect, and serializing it costs little here since the huge
# compiles are few.
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# NOTE: in this environment the JAX_PLATFORMS env var is overridden by the
# preinstalled TPU plugin; the config route reliably pins tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
