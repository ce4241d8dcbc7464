"""Persistent annotation server — a resident process draining a job queue.

The reference has no serving story: every run is one fresh process
(CLI ``main.py:9-52`` or the GUI's per-job worker, ``gui_api.py:62-114``),
which on TPU pays the full XLA compile / server-side executable-load cost
per job (measured: cold 175 s vs warm ~13 s on the e2e scenario,
BASELINE.md). This module keeps ONE process resident: the module-level
ensemble program cache (engine/ensemble.py), the jitted analytics
programs, and the device-resident weights all survive across jobs, so
every job after the first runs with ``xla.compile_count == 0``.

Protocol — same file-handoff spirit as the reference's working-dir API
(``gui_api.py:62-114``), extended to a queue:

* **submit**: write the job payload JSON to a temporary name inside the
  queue dir, then ``os.rename`` it to ``<name>.json`` (atomic on POSIX;
  the server never observes partial files). ``submit_job()`` does this.
* **payload**: the reference hyperparams keys (``gui_api.py:65-109``,
  via ``AnnotatorConfig.from_dict`` which accepts the ``image_file`` /
  ``mask_file`` / ``amax`` aliases). A payload with ``csv_file`` runs a
  batch job; one with ``image_file`` + ``mask_file`` runs single-image.
* **claim**: the server renames the job to ``<name>.json.running``
  (atomic — two servers on one queue never double-process a job).
* **result**: ``<name>.json.done`` holding ``{"status": "ok"|"error",
  "seconds": float, "xla": {compile_count, compile_secs}, "result_dir":
  str, ...}``; on error, the traceback rides along and the server keeps
  serving.
* **shutdown**: create a ``stop`` file in the queue dir — the server
  drains the already-queued jobs, then exits (or pass ``max_jobs``).

Jobs are processed oldest-first (by submit order, i.e. rename mtime with
name as tie-break).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
import traceback

from ribca_tpu.api.annotator import Annotator
from ribca_tpu.api.gui_api import _pipeline
from ribca_tpu.io.manifest import write_manifest
from ribca_tpu.utils.config import AnnotatorConfig

STOP_FILE = "stop"


def submit_job(queue_dir: str, payload: dict, name: str | None = None) -> str:
    """Atomically enqueue a job; returns the queued job path."""
    os.makedirs(queue_dir, exist_ok=True)
    if name is None:
        name = "job_{:.6f}_{}".format(time.time(), os.getpid())
    if not name.endswith(".json"):
        name += ".json"
    tmp = os.path.join(queue_dir, "." + name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    final = os.path.join(queue_dir, name)
    os.rename(tmp, final)
    return final


def run_job(payload: dict, defaults: dict | None = None) -> dict:
    """Execute one job payload through the canonical pipeline sequence
    (region analysis before export — the GUI ordering, gui_api.py:22-31)
    and return a result summary."""
    raw = {**(defaults or {}), **payload}
    config = AnnotatorConfig.from_dict(raw)
    single = not config.csv_file
    csv_path = None
    if single:
        if not (config.image_path and config.mask_path):
            raise ValueError(
                "job needs either csv_file or image_file + mask_file"
            )
        os.makedirs(config.main_dir, exist_ok=True)
        csv_path = os.path.join(config.main_dir, "images.csv")
        write_manifest([(config.image_path, config.mask_path)], csv_path)
        config = dataclasses.replace(
            config, csv_file=csv_path, image_path=None, mask_path=None
        )

    t0 = time.perf_counter()
    annotator = Annotator(config)
    if not annotator.channel_parser.any_panel:
        raise ValueError(
            "No panels are applied. Please check the marker list."
        )
    _pipeline(annotator, config.batch_size, config.n_regions)
    if csv_path:
        try:
            os.remove(csv_path)
        except OSError:
            pass
    return {
        "status": "ok",
        "seconds": round(time.perf_counter() - t0, 3),
        "n_images": len(annotator.records),
        "n_cells": int(sum(len(r.cell_ids) for r in annotator.records)),
        "result_dir": annotator.result_dir,
        "xla": annotator.logger.compile_stats,
    }


def _queued_jobs(queue_dir: str) -> list[str]:
    jobs = []
    for name in os.listdir(queue_dir):
        if name.endswith(".json") and not name.startswith("."):
            path = os.path.join(queue_dir, name)
            try:
                jobs.append((os.path.getmtime(path), name, path))
            except OSError:
                continue  # raced with another claimer
    return [p for _, _, p in sorted(jobs)]


def serve(
    queue_dir: str,
    poll_interval: float = 0.5,
    max_jobs: int | None = None,
    defaults: dict | None = None,
    warm_shapes=None,
    warm: bool = False,
) -> int:
    """Drain ``queue_dir`` until a ``stop`` file appears (or ``max_jobs``
    jobs have been processed). Returns the number of jobs processed.

    ``warm=True`` pre-compiles the program ladder before the first job
    (``Annotator.warm_cache``) using ``defaults`` for panel/config
    selection, so even job #1 runs compile-free.
    """
    os.makedirs(queue_dir, exist_ok=True)
    stop_path = os.path.join(queue_dir, STOP_FILE)

    if warm:
        import tempfile

        with tempfile.TemporaryDirectory(prefix="ribca_warm_") as td:
            cfg = AnnotatorConfig.from_dict(
                {**(defaults or {}), "main_dir": td,
                 "image_path": None, "mask_path": None, "csv_file": None}
            )
            Annotator(cfg).warm_cache(warm_shapes)

    done = 0
    while True:
        stopping = os.path.exists(stop_path)
        claimed = None
        for path in _queued_jobs(queue_dir):
            running = path + ".running"
            try:
                os.rename(path, running)  # atomic claim
            except OSError:
                continue  # another server took it
            claimed = (path, running)
            break
        if claimed is None:
            # stop file = stop accepting: drain what was queued, then exit
            if stopping or (max_jobs is not None and done >= max_jobs):
                break
            time.sleep(poll_interval)
            continue

        path, running = claimed
        try:
            with open(running) as f:
                payload = json.load(f)
            result = run_job(payload, defaults)
        except Exception as exc:  # job failures must not kill the server
            result = {
                "status": "error",
                "error": repr(exc),
                "traceback": traceback.format_exc(),
            }
        with open(path + ".done.tmp", "w") as f:
            json.dump(result, f, indent=2)
        os.rename(path + ".done.tmp", path + ".done")
        try:
            os.remove(running)
        except OSError:
            pass
        done += 1
        if max_jobs is not None and done >= max_jobs:
            break
    return done
