"""Machine-scoped JAX persistent compilation cache directories.

XLA:CPU AOT executables embed the COMPILE machine's CPU feature set; jax's
persistent-cache key does not include it. Loading an entry compiled on a
host with a different feature set makes ``cpu_aot_loader`` warn
("Machine type used for XLA:CPU compilation doesn't match ...") and then
either SIGSEGV inside the cache read, SIGABRT in
``backend_compile_and_load``, or — worst — execute silently wrong (we
observed a solver step that left the state bit-identical). Since this
repo's working tree persists across driver rounds that may land on
different hosts, every persistent cache dir must be scoped to the host's
CPU fingerprint.
"""

from __future__ import annotations

import hashlib
import os
import platform

__all__ = ["machine_cache_dir", "machine_fingerprint"]


def machine_fingerprint() -> str:
    """A short stable hash of this host's CPU feature set + jax build.

    The jaxlib version is part of the key because the embedded LLVM
    target-feature string of an AOT entry is an XLA-version property,
    not only a CPU one: identical /proc/cpuinfo flags have produced
    entries differing in XLA-chosen features (+prefer-no-scatter /
    +prefer-no-gather), which cpu_aot_loader flags as a
    possibly-SIGILL machine mismatch on load."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not flags:
        flags = f"{platform.machine()}|{platform.processor()}"
    try:
        import jaxlib
        import jax
        flags += f"|jax{jax.__version__}|jaxlib{jaxlib.__version__}"
    except Exception:
        pass
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


def machine_cache_dir(base: str) -> str:
    """``base/<cpu-fingerprint>`` — a cache dir only this machine type
    reads or writes."""
    return os.path.join(base, machine_fingerprint())
