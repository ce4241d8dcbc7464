"""Run logging.

Keeps the reference's plain-text ``results/log.txt`` contract
(``logger.py:4-20``) and adds structured per-stage wall-time tracing,
which the reference lacks entirely (SURVEY §5: "Tracing/profiling: none").
"""

from __future__ import annotations

import contextlib
import json
import os
import time

# process-wide XLA compile accounting (jax.monitoring events); each Logger
# snapshots at construction and reports its own run's delta in trace.json,
# so batch runs show exactly how many programs they compiled and how much
# wall time went to compilation vs compute (VERDICT r1 "next" #3).
_COMPILES = {"count": 0, "secs": 0.0}
_LISTENER_ON = False


def _ensure_compile_listener() -> None:
    global _LISTENER_ON
    if _LISTENER_ON:
        return
    try:
        from jax import monitoring

        def on_event(name: str, secs: float, **kw) -> None:
            if name == "/jax/core/compile/backend_compile_duration":
                _COMPILES["count"] += 1
                _COMPILES["secs"] += secs

        monitoring.register_event_duration_secs_listener(on_event)
        _LISTENER_ON = True
    except Exception:
        pass


class Logger:
    """Plain-text run log, same file layout as the reference logger."""

    def __init__(self, main_dir: str, subdir: str = "results"):
        os.makedirs(os.path.join(main_dir, subdir), exist_ok=True)
        self.log_file_path = os.path.join(main_dir, subdir, "log.txt")
        self.log_file = open(self.log_file_path, "w")
        self.log_file.write("Log file created at {}\n".format(time.ctime()))
        self._timings: dict[str, float] = {}
        self._flags: dict[str, object] = {}
        _ensure_compile_listener()
        self._compiles0 = dict(_COMPILES)

    def set_flag(self, name: str, value) -> None:
        """Run-level marker surfaced in trace.json (e.g. random_weights)."""
        self._flags[name] = value

    def log(self, message: str) -> None:
        self.log_file.write(message + "\n")
        self.log_file.flush()

    def log_all_hyperparameters(self, hyperparameters: dict) -> None:
        self.log_file.write("Hyperparameters:\n")
        for key, value in hyperparameters.items():
            self.log_file.write(f"{key}: {value}\n")
        self.log_file.flush()

    @contextlib.contextmanager
    def stage(self, name: str, quiet: bool = False):
        """Time a pipeline stage; accumulated into the trace summary.
        ``quiet`` skips the per-call log line — for hot sub-stages entered
        hundreds of times per run (their totals still land in trace.json)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._timings[name] = self._timings.get(name, 0.0) + dt
            if not quiet:
                self.log(f"[trace] stage {name}: {dt:.3f}s")

    @property
    def timings(self) -> dict[str, float]:
        return dict(self._timings)

    @property
    def compile_stats(self) -> dict[str, float]:
        """XLA programs compiled (count + seconds) since this run began."""
        return {
            "xla.compile_count": _COMPILES["count"]
            - self._compiles0["count"],
            "xla.compile_secs": round(
                _COMPILES["secs"] - self._compiles0["secs"], 3
            ),
        }

    def write_trace_summary(self) -> None:
        path = os.path.join(os.path.dirname(self.log_file_path), "trace.json")
        with open(path, "w") as f:
            json.dump(
                {**self._timings, **self.compile_stats, **self._flags},
                f, indent=2,
            )

    def close(self) -> None:
        self.log_file.close()
