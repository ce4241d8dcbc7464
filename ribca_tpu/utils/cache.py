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
            purge_on_aot_mismatch(path)
    except Exception:
        pass


def purge_on_aot_mismatch(path: str) -> bool:
    """Canary-load the cache and PURGE it when XLA:CPU warns about a
    machine-feature mismatch. Returns True when a purge happened.

    The fingerprint above cannot fully prevent cross-machine loads: the
    compile-time feature set embeds LLVM *tuning* features derived from
    the precise CPU model (``+prefer-no-gather``/``+prefer-no-scatter``),
    which no /proc/cpuinfo line exposes — MULTICHIP_r03 still logged
    ``cpu_aot_loader.cc`` mismatch errors ("could lead to execution
    errors such as SIGILL") from a family/model/stepping-keyed dir, and
    one fatal abort was observed from a jitted train step loaded this
    way (ROADMAP r3 session 4). So: compile one deterministic canary
    program with fd-2 capture; every process stores it, so a foreign
    machine sharing the dir hits the mismatch warning on the canary
    LOAD, and we wipe the directory before any production program can
    load a poisoned executable. Only runs when the process is pinned to
    the CPU platform (``JAX_PLATFORMS``) — the failure mode is specific
    to XLA:CPU AOT results, and probing would otherwise initialize the
    TPU backend early."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" not in [p.strip() for p in plats.split(",")]:
        return False
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    with tempfile.TemporaryFile() as cap:
        saved = os.dup(2)
        try:
            os.dup2(cap.fileno(), 2)
            x = jnp.full((16,), 1.000123, jnp.float32)
            jax.jit(
                lambda v: (v * 1.000456 + 0.000789).sum()
            )(x).block_until_ready()
        finally:
            os.dup2(saved, 2)
            os.close(saved)
        cap.seek(0)
        log = cap.read().decode(errors="replace")
    if _foreign_aot_features(log):
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        import sys

        print(
            "ribca_tpu: purged XLA compile cache at "
            f"{path} — cached AOT executables were compiled for a "
            "different machine ISA feature set "
            f"({sorted(_foreign_aot_features(log))}; stale executables "
            "can SIGILL)",
            file=sys.stderr,
        )
        return True
    return False


# XLA adds these LLVM tuning pseudo-features at compile time but omits
# them from the host feature list at load, so EVERY same-host
# cross-process cache hit logs a cpu_aot_loader mismatch naming only
# them — benign noise, runs correctly (verified on this host). Purging
# on it would wipe the cache on every fresh process.
_BENIGN_TUNING_FEATURES = {"prefer-no-scatter", "prefer-no-gather"}


def _foreign_aot_features(log: str) -> set[str]:
    """Real ISA features named by cpu_aot_loader mismatch lines (e.g. a
    missing avx512 subset) — the genuinely-foreign-cache signal."""
    import re

    feats = set()
    for line in log.splitlines():
        if "cpu_aot_loader" not in line:
            continue
        m = re.search(
            r"Target machine feature \+?([\w.-]+) is not\s+supported",
            line,
        )
        if m:
            feats.add(m.group(1))
    return feats - _BENIGN_TUNING_FEATURES


_COMPILED_VS_HOST_RE = None


def is_benign_aot_line(line: str) -> bool:
    """True for the ONE class of stderr line safe to drop: an XLA:CPU
    AOT-loader machine-feature-mismatch warning whose missing features
    are only the LLVM tuning pseudo-features (``prefer-no-gather`` /
    ``prefer-no-scatter``). XLA adds those at compile time but omits them
    from the host feature list at load, so every same-host cross-process
    cache hit logs one — pure noise that buries real errors in driver
    artifacts (MULTICHIP_r04's tail was 100% this class). A mismatch
    naming any REAL ISA feature (e.g. a missing avx512 subset) is the
    genuinely-foreign-cache signal and always passes through.

    Handles both shapes the loader emits: the single-feature
    "Target machine feature +X is not supported" line and the full
    "Compiled machine features [...] vs host machine features: [...]"
    dump."""
    if "cpu_aot_loader" not in line:
        return False
    single = _foreign_aot_features(line)
    if single:
        return False  # real ISA feature named -> loud
    import re

    global _COMPILED_VS_HOST_RE
    if _COMPILED_VS_HOST_RE is None:
        _COMPILED_VS_HOST_RE = re.compile(
            r"Compiled machine features \[([^\]]*)\]\s*vs host machine "
            r"features:\s*\[([^\]]*)\]"
        )
    m = _COMPILED_VS_HOST_RE.search(line)
    if m:
        needed = {
            t[1:] for t in m.group(1).split(",") if t.startswith("+")
        }
        host = {t.strip() for t in m.group(2).split(",")}
        missing = needed - host
        return bool(missing) and missing <= _BENIGN_TUNING_FEATURES
    # a cpu_aot_loader line in neither known shape: was it the
    # single-feature form naming only benign features?
    return bool(re.search(
        r"Target machine feature \+?(?:"
        + "|".join(sorted(_BENIGN_TUNING_FEATURES))
        + r") is not\s+supported", line
    ))


def install_stderr_aot_filter():
    """Route THIS PROCESS's fd 2 through a line classifier that drops
    benign AOT tuning-feature spray and forwards everything else
    untouched. XLA's C++ logging writes straight to fd 2, so a Python
    ``sys.stderr`` wrapper cannot intercept it — this replaces fd 2 with
    a pipe drained by a pump thread. Returns an ``uninstall()`` callable
    that restores fd 2 and drains the pipe; also registered atexit so a
    process that never uninstalls still flushes pending lines.

    Installed by driver-facing entry points (``__graft_entry__`` dryrun,
    ``bench.py``) so MULTICHIP/BENCH artifacts carry only real signal;
    NOT by the production Annotator (a library must not re-plumb its
    host process's file descriptors)."""
    import atexit
    import threading

    r, w = os.pipe()
    saved = os.dup(2)
    os.dup2(w, 2)
    os.close(w)

    def pump():
        buf = b""
        try:
            while True:
                chunk = os.read(r, 1 << 16)
                if not chunk:
                    break
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    _emit(line + b"\n")
        finally:
            if buf:
                _emit(buf)
            os.close(r)

    def _emit(raw: bytes) -> None:
        if not is_benign_aot_line(raw.decode("utf-8", "replace")):
            os.write(saved, raw)

    t = threading.Thread(target=pump, daemon=True,
                         name="aot-stderr-filter")
    t.start()

    done = {"flag": False}

    def uninstall():
        if done["flag"]:
            return
        done["flag"] = True
        os.dup2(saved, 2)   # new writes go straight out again
        # the pipe's sole write end was fd 2; restoring it closes the
        # pipe, the pump sees EOF, drains, and exits
        t.join(timeout=5.0)
        os.close(saved)

    atexit.register(uninstall)
    return uninstall


def ensure_compile_cache() -> None:
    """Default-on cache for library-surface device paths (called by
    ``get_mesh``). Respects an earlier explicit configuration and the
    ``RIBCA_COMPILE_CACHE_DIR`` env override (empty string disables)."""
    if not _configured:
        enable_compile_cache(
            os.environ.get("RIBCA_COMPILE_CACHE_DIR", DEFAULT_CACHE_DIR)
        )
