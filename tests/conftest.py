"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` (the approach the driver's
``dryrun_multichip`` also uses). The environment may pin JAX to a remote TPU
backend via sitecustomize, so we must force the CPU platform through
jax.config (env vars alone are overridden).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the solver-step programs take minutes to
# compile on this 2-core host; cache them across pytest processes.
# NB a SEPARATE directory from bench.py's .jax_cache: entries written by
# TPU-session processes carry different CPU machine features and
# deserializing them on this host can SIGSEGV inside the XLA AOT loader
# (observed: cpu_aot_loader 'machine type doesn't match' warnings, then a
# segfault in compilation_cache.get_executable_and_time).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
