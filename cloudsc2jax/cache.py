"""Host-fingerprinted persistent compile cache.

One shared helper for every entry point (CLI, bench, tools, tests) that
enables JAX's persistent compilation cache.  The cache directory is keyed
by a fingerprint of the host CPU and the jax/jaxlib versions: XLA:CPU
executables encode the *compiling* machine's feature set, and loading one
on a host with different features aborts with "Machine type used for
XLA:CPU compilation doesn't match the machine type for execution"
(observed when the round-3 cache met the round-4 host).  Fingerprinting
the directory makes a host change start a fresh cache instead of
poisoning every CPU-path run.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import platform

_REPO = pathlib.Path(__file__).resolve().parents[1]


def _host_fingerprint() -> str:
    """Short stable id for (CPU feature set, jax version) pairs."""
    bits = [platform.machine(), platform.system()]
    try:
        import jax

        bits.append(jax.__version__)
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    bits.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def compile_cache_dir() -> str:
    """The host-specific persistent cache directory (honours
    ``CLOUDSC2_CACHE_DIR`` as a verbatim override)."""
    override = os.environ.get("CLOUDSC2_CACHE_DIR")
    if override:
        return override
    return str(_REPO / ".jax_cache" / _host_fingerprint())


def enable_compile_cache() -> None:
    """Point JAX's persistent compilation cache at the host-keyed dir.

    Safe to call from any entry point, any number of times; swallows
    config errors on jax versions without these knobs.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
