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
# Two scoping rules, both load-bearing:
# * a SEPARATE tree from bench.py's .jax_cache — entries written by
#   TPU-session processes don't mix with CPU-backend ones;
# * a per-MACHINE subdirectory (utils/jaxcache.py) — XLA:CPU AOT entries
#   embed the compile host's CPU features, and loading one compiled on a
#   different host SIGSEGVs in the cache read, SIGABRTs in
#   backend_compile_and_load, or silently executes wrong (all three
#   observed when driver rounds land on different machines).
from criteria3d_tpu.utils.jaxcache import machine_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    machine_cache_dir(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_tests")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables_between_modules():
    """Drop compiled XLA executables after each test module.

    A single-process run of the full suite compiles ~300 programs on the
    8-virtual-device CPU backend; the accumulated loaded executables
    eventually crash XLA itself (observed: SIGSEGV in the compilation-cache
    read path and SIGABRT inside ``backend_compile_and_load`` around test
    ~276 of 309). Recompiles after the flush are cheap because the
    persistent on-disk cache above survives ``jax.clear_caches()`` — only
    the in-memory executable handles are released.
    """
    yield
    jax.clear_caches()
    gc.collect()
