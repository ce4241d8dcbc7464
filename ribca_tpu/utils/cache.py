"""Persistent XLA compile-cache setup, shared by every device entry point.

Cold compiles cost minutes on remote-compiled TPUs, so the Annotator has
always enabled ``jax_compilation_cache_dir`` (the reference has no analog
— torch eager pays no compile, model.py:397-406). But the library surface
can be driven without an Annotator (direct ``ops.knn``/``ops.cluster``/
``analytics`` calls at whole-slide scale), and those paths used to pay
full cold compiles every process: a 500k-cell ``tissue_region_partition``
measured 954 s cold vs ~40 s compute. Every device path funnels through
``parallel.mesh.get_mesh``, so the cache is enabled there by default;
the Annotator still configures it first (honoring
``config.compile_cache_dir``, including an explicit opt-out).

The directory is keyed on the host CPU fingerprint: the cache serializes
backend-specific executables, and a cache written by a different host
type would only poison lookups.
"""

from __future__ import annotations

import hashlib
import os

DEFAULT_CACHE_DIR = "~/.cache/ribca_tpu/xla"

# set once the first caller (Annotator config or mesh default) decided;
# an explicit opt-out (falsy dir) also counts as configured
_configured = False


def host_fingerprint() -> str:
    """Short hash of this host's CPU identity (family/model/stepping +
    feature flags). XLA:CPU loads cached AOT executables compiled on a
    DIFFERENT machine generation with only a warning — and they can run
    orders of magnitude slower (observed: a sub-second ensemble flush
    taking 340 s from a stale cache) or abort outright. Flags alone are
    NOT enough: LLVM tuning features like ``prefer-no-scatter`` key off
    the CPU *model*, so two fleet hosts with identical flags lines but
    different model/stepping collide on a flags-only hash (observed:
    machine-feature-mismatch E-logs from a same-flags cache dir)."""
    try:
        ident = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(
                    ("flags", "cpu family", "model", "stepping")
                ):
                    ident.append(line)
                if line.startswith("flags"):
                    break  # one physical package is enough
        if ident:
            return hashlib.sha1("".join(ident).encode()).hexdigest()[:10]
    except Exception:
        pass
    return "generic"


def enable_compile_cache(cache_dir: str | None) -> None:
    """Persistent XLA compile cache; safe no-op when disabled (falsy
    ``cache_dir``) or when a cache dir is already configured (e.g. the
    test conftest or user JAX config)."""
    global _configured
    _configured = True
    if not cache_dir:
        return
    import jax

    try:
        path = os.path.join(
            os.path.expanduser(cache_dir), host_fingerprint()
        )
        os.makedirs(path, exist_ok=True)
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
            # persist EVERYTHING: the ensemble tail programs compile in
            # ~0.35 s each, so any positive threshold silently exempts
            # them and fresh processes recompile on every run
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0
            )
    except Exception:
        pass


def ensure_compile_cache() -> None:
    """Default-on cache for library-surface device paths (called by
    ``get_mesh``). Respects an earlier explicit configuration and the
    ``RIBCA_COMPILE_CACHE_DIR`` env override (empty string disables)."""
    if not _configured:
        enable_compile_cache(
            os.environ.get("RIBCA_COMPILE_CACHE_DIR", DEFAULT_CACHE_DIR)
        )
