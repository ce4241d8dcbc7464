"""VERDICT r2 #4 done-criterion: a 500k-cell synthetic run completes in
bounded time on EVERY advertised analytics method.

Covers (reference analogs in parens):

* ``tissue_region_partition`` with method=kmeans (device PCA+k-means,
  spatial_methods.py:185-193), hdbscan and spectral (bounded-fit guards:
  seeded subsample + 1-NN assign),
* ``find_extra_cell_types`` on a 500k-cell Others population
  (model.py:642-675) — includes the 5-component device UMAP
  (subsample-fit path) + bounded HDBSCAN.

Run on the TPU host (idle — see axon-tpu-benchmarking memory):

    python scripts/validate_scale_500k.py

Prints one line per method with wall seconds; exits nonzero if any
method exceeds its bound. Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = 500_000
N_TYPES = 12
SIZE = 12_000  # ~3.5 cells / 100px^2 — whole-slide-like density

BOUNDS = {  # generous wall bounds (seconds) that still prove "bounded"
    "kmeans": 600,
    "hdbscan": 1200,
    "spectral": 1200,
    "discovery": 1800,
}


class Log:
    def log(self, msg):
        print(f"  [log] {msg}", file=sys.stderr)


def main() -> int:
    rng = np.random.default_rng(0)
    rows = rng.uniform(0, SIZE, N).astype(np.float64)
    cols = rng.uniform(0, SIZE, N).astype(np.float64)
    type_ids = rng.integers(0, N_TYPES, N)
    failures = []
    timings = {}

    from ribca_tpu.analytics.spatial import tissue_region_partition

    im = {
        "cell_ids": np.arange(1, N + 1),
        "mean_row": rows,
        "mean_col": cols,
        "type_ids": type_ids,
    }
    for method in ("kmeans", "hdbscan", "spectral"):
        t0 = time.perf_counter()
        out = tissue_region_partition(
            [im], n_clusters=3, method=method, logger=Log()
        )
        dt = time.perf_counter() - t0
        timings[method] = dt
        n_lab = len(out[0])
        ok = n_lab == N and dt <= BOUNDS[method]
        print(f"tissue_region_partition[{method}]: {dt:.1f}s "
              f"({n_lab} labels) bound={BOUNDS[method]}s "
              f"{'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(method)

    # discovery on a 500k-cell Others population (mean intensities, 7ch)
    from ribca_tpu.analytics.discover import find_extra_cell_types

    centers = rng.normal(size=(6, 7)) * 3.0
    intens = (centers[rng.integers(0, 6, N)]
              + rng.normal(size=(N, 7)) * 0.4).astype(np.float32)
    annotations = [["Others"] * N]
    confidence = [np.zeros(N, np.float32)]
    t0 = time.perf_counter()
    find_extra_cell_types(
        annotations, confidence, [intens], min_cells=100, logger=Log()
    )
    dt = time.perf_counter() - t0
    timings["discovery"] = dt
    n_new = len({a for a in annotations[0] if a != "Others"})
    ok = dt <= BOUNDS["discovery"]
    print(f"find_extra_cell_types[500k]: {dt:.1f}s "
          f"({n_new} novel types) bound={BOUNDS['discovery']}s "
          f"{'OK' if ok else 'FAIL'}")
    if not ok:
        failures.append("discovery")

    print("TIMINGS " + " ".join(f"{k}={v:.1f}s" for k, v in timings.items()))
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("ALL BOUNDED — VERDICT r2 #4 criterion met")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
