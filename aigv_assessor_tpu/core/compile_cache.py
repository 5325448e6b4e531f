"""Persistent XLA compilation cache for the CLIs.

Every entry point (train/eval/score/serve) pays a cold-start trace+compile
of the full composite model — tens of seconds on TPU per program shape.
XLA's persistent compilation cache makes the second process start in
milliseconds per program instead: compiled executables are keyed by
(HLO, compile options, device kind) and reloaded from disk. The reference
has no counterpart (torch eager pays per-op dispatch instead of a compile);
for a serving fleet this is the difference between a ~1 min and a ~5 s
rolling restart.

Env contract:
  AIGV_COMPILE_CACHE=<dir>  cache directory (default ~/.cache/aigv_assessor_tpu/jax)
  AIGV_COMPILE_CACHE=0      disable

The cache root is suffixed with a HOST FINGERPRINT (jaxlib version,
arch, JAX platform selection, and a hash of the CPU feature flags):
XLA:CPU serializes AOT executables specialized to the compiling host's
CPU features, and its cache key does NOT include them — loading an
entry produced on a host with a different feature set (e.g. AMX/AVX512
variants across a heterogeneous fleet) SIGSEGVs/SIGILLs the process at
deserialization time (observed: a suite run crashing inside
`compilation_cache.get_executable_and_time` on an entry written by a
wider-featured machine). Scoping the directory per host class makes
cross-host reuse structurally impossible while keeping same-host reuse.
"""

from __future__ import annotations

import contextlib
import hashlib
import logging
import os
import platform

logger = logging.getLogger(__name__)

_ENABLED = False
_PATH: str | None = None


def _host_fingerprint() -> str:
    """Identity of the executable-compatibility class of this host."""
    try:
        import jaxlib.version

        jl = jaxlib.version.__version__
    except Exception:  # pragma: no cover - jaxlib always present in CI
        jl = "unknown"
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line.split(":", 1)[1]
                    break
    except OSError:  # pragma: no cover - non-Linux
        flags = platform.processor()
    h = hashlib.sha256(flags.encode()).hexdigest()[:12]
    plat = os.environ.get("JAX_PLATFORMS", "default").replace(",", "+")
    return f"{jl}-{platform.machine()}-{plat}-{h}"


def enable_compilation_cache() -> str | None:
    """Idempotently point JAX's persistent compilation cache at a local
    directory. Returns the cache dir actually in use, or None when disabled."""
    global _ENABLED, _PATH
    raw = os.environ.get("AIGV_COMPILE_CACHE", "")
    if raw in ("0", "off", "none"):
        return None
    if not raw:
        # Default-on only for accelerator backends. XLA:CPU persists AOT
        # executables whose recorded machine-feature spec can fail the
        # loader's host check even on the machine that WROTE them
        # (cpu_aot_loader "machine type doesn't match" → SIGILL risk;
        # observed crashing a test run in-round). CPU compiles are also
        # the cheap case. An explicit AIGV_COMPILE_CACHE=<dir> still
        # opts in on any backend.
        import jax

        try:
            if jax.default_backend() == "cpu":
                return None
        except Exception:  # pragma: no cover - backend init failure
            return None
    root = raw or os.path.join(
        os.path.expanduser("~"), ".cache", "aigv_assessor_tpu", "jax"
    )
    path = os.path.join(root, _host_fingerprint())
    if _ENABLED:
        if path == _PATH:
            return _PATH
        # A different dir was requested after init: JAX's in-memory cache
        # handle is process-global, so drop it and repoint the config —
        # otherwise we'd return/log a directory that is not the one in use.
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:  # pragma: no cover - private-API drift
            logger.warning(
                "compilation cache already initialized at %s; cannot repoint "
                "to %s in this JAX build",
                _PATH,
                path,
            )
            return _PATH
        _ENABLED = False
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program: the model programs all clear any floor, and
        # the small helper programs (resize/normalize) are free to keep
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - depends on jax build flags
        logger.warning("persistent compilation cache unavailable: %r", e)
        return None
    _ENABLED = True
    _PATH = path
    logger.info("persistent compilation cache: %s", path)
    return path


@contextlib.contextmanager
def suspended():
    """Temporarily disable the persistent cache (no reads OR writes).

    Used around host-side (CPU-device) param materialization inside an
    accelerator-backend process: those one-shot CPU init programs would
    otherwise be persisted as XLA:CPU AOT entries in the accelerator
    process's cache dir — the entry class whose reload trips the
    machine-feature check (see module docstring). No-op when the cache
    is off."""
    import jax

    global _ENABLED, _PATH
    if not _ENABLED:
        yield
        return
    path = _PATH
    try:
        from jax._src import compilation_cache as _cc

        jax.config.update("jax_compilation_cache_dir", None)
        _cc.reset_cache()
        _ENABLED = False
        yield
    finally:
        try:
            jax.config.update("jax_compilation_cache_dir", path)
            _cc.reset_cache()
            _ENABLED = True
            _PATH = path
        except Exception:  # pragma: no cover - private-API drift
            logger.warning("could not re-enable the compilation cache")
