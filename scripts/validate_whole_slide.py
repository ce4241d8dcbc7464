"""Whole-slide FULL-PIPELINE validation: 500k cells, 12k x 12k x 7, one
Annotator run end to end.

`validate_scale_500k.py` bounds the analytics stage alone; this script
proves the production scenario the framework is built for — a real
whole-slide image through EVERY stage in one process:

  streaming decode (io/tiff_stream) -> banded normalize with the
  single-upload HBM prenorm cache at ~4.26 GB (engine/tiled; above the
  old 4 GB constant, so this exercises the HBM-aware auto budget) ->
  fused patch extraction + ensemble (cohort packer) -> voting ->
  tissue regions (grid-binned device kNN + device PCA/k-means) ->
  neighborhood -> heatmap/CSV/colorized maps/composition
  (reference pipeline sequence, gui_api.py:22-31).

Cells carry planted type signatures (models/calibrate.py) and the run
uses a calibrated immune_base head, so the printed planted-type accuracy
certifies the pipeline end to end — not just that it ran.

Run on the TPU host (idle — fixture generation alone needs ~20 GB RAM
and a few minutes; both fixture and calibration cache under
/tmp/ribca_whole_slide):

    python scripts/validate_whole_slide.py

Prints per-stage wall seconds from results/trace.json, the planted-type
accuracy, and cells/sec; exits nonzero if the warm run exceeds WALL_BOUND
or accuracy falls below ACC_BOUND. Results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIR = os.environ.get("RIBCA_WS_DIR", "/tmp/ribca_whole_slide")
SIZE = 12_288          # pixels per side
N_CELLS = 500_000
RADIUS = 5             # grid spacing ~17 px at this density
WALL_BOUND = 900.0     # warm full-pipeline bound (seconds)
ACC_BOUND = 0.5        # planted-type accuracy floor (collapse detector)

# --cells 1m: the "millions of cells per slide" claim (SURVEY §5) at
# actual scale. 16384^2 x7 pushes the f32 prenorm footprint to ~7.5 GB,
# past the HBM prenorm-cache budget, so this geometry also exercises the
# histogram two-pass normalization fallback that 12288^2 never hits.
if "--cells" in sys.argv:
    _c = sys.argv[sys.argv.index("--cells") + 1].lower()
    if _c in ("1m", "1000000"):
        SIZE = 16_384
        N_CELLS = 1_000_000
        DIR = os.environ.get("RIBCA_WS_DIR", "/tmp/ribca_whole_slide_1m")
        WALL_BOUND = float(os.environ.get("RIBCA_WS_BOUND", 900.0))
    elif _c not in ("500k", "500000"):
        raise SystemExit(f"unknown --cells value {_c} (500k|1m)")


def fixture():
    from PIL import Image

    from ribca_tpu.io import write_tiff
    from ribca_tpu.models.calibrate import (
        make_typed_cells,
        panel_signatures,
        typed_image,
    )
    from ribca_tpu.panels.vocab import PANELS

    os.makedirs(DIR, exist_ok=True)
    img_path = os.path.join(DIR, "slide.tif")
    mask_path = os.path.join(DIR, "mask.tif")  # TIFF: ids exceed PNG's 16-bit
    types_path = os.path.join(DIR, "types.npy")
    marker_path = os.path.join(DIR, "markers.txt")
    with open(marker_path, "w") as f:
        f.write("\n".join(PANELS["immune_base"]) + "\n")
    if all(os.path.exists(p) for p in (img_path, mask_path, types_path)):
        return marker_path, img_path, mask_path, types_path

    t0 = time.perf_counter()
    sig = panel_signatures("immune_base")
    mask, types = make_typed_cells(SIZE, SIZE, N_CELLS, sig.shape[0],
                                   radius=RADIUS, seed=7)
    print(f"fixture: stamped {int(mask.max())} cells in "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
    img = typed_image(mask, types, sig, seed=7)
    write_tiff(img_path, img)
    del img
    # int32 instance mask as a single-page TIFF (mode 'I')
    Image.fromarray(mask.astype(np.int32), mode="I").save(
        mask_path, format="TIFF"
    )
    np.save(types_path, types)
    print(f"fixture: written in {time.perf_counter() - t0:.0f}s "
          f"({os.path.getsize(img_path) / 1e9:.1f} GB slide)",
          file=sys.stderr)
    return marker_path, img_path, mask_path, types_path


def weights_dir():
    d = os.path.join(DIR, "weights")
    npz = os.path.join(d, "immune_base.npz")
    if not os.path.exists(npz):
        from ribca_tpu.models.calibrate import calibrate_panel

        t0 = time.perf_counter()
        r = calibrate_panel("immune_base", d, n_cells=4096,
                            image_hw=(1024, 1024), epochs=6, seed=0)
        print(f"calibrated immune_base in {time.perf_counter() - t0:.0f}s "
              f"(holdout {r.holdout_accuracy:.3f})", file=sys.stderr)
    return d


def planted_accuracy(result_dir, types_path):
    import csv
    import glob

    types = np.load(types_path)
    from ribca_tpu.panels.vocab import PANEL_CLASS_MAPS

    names = PANEL_CLASS_MAPS["immune_base"]
    correct = total = 0
    for path in glob.glob(os.path.join(result_dir, "*_annotation_*.csv")):
        with open(path) as f:
            for row in csv.DictReader(f):
                cid = int(row["Cell Index"])
                if not (1 <= cid <= len(types)):
                    continue
                total += 1
                correct += row["Cell Type"] == names[int(types[cid - 1])]
    return correct / max(total, 1), total


def once(marker_path, img_path, mask_path, models_dir, tag):
    from ribca_tpu import cli
    from ribca_tpu.utils.config import AnnotatorConfig

    run_dir = os.path.join(DIR, f"run_{tag}")
    shutil.rmtree(run_dir, ignore_errors=True)
    config = AnnotatorConfig(
        marker_file=marker_path, image_path=img_path, mask_path=mask_path,
        main_dir=run_dir, batch_id="ws", strict=True, infer=False,
        models_dir=models_dir, allow_random_weights=False, n_regions=3,
    )
    t0 = time.perf_counter()
    cli.run(config, bs=config.batch_size, n_regions=config.n_regions)
    wall = time.perf_counter() - t0
    with open(os.path.join(run_dir, "results", "trace.json")) as f:
        trace = json.load(f)
    return wall, trace, os.path.join(run_dir, "results")


def wire_rate() -> float | None:
    """MB/s host->device right now — the 2.1 GB slide upload swings
    6 s <-> 100 s across sessions with no code change (BASELINE.md), so
    every wall number this script prints carries the rate next to it."""
    from ribca_tpu.utils.wire import probe, probe_line

    try:
        r = probe()
        print(probe_line(r), file=sys.stderr)
        return r["mb_per_s"]
    except Exception as exc:
        print(f"wire probe failed: {exc!r}", file=sys.stderr)
        return None


def main() -> int:
    marker_path, img_path, mask_path, types_path = fixture()
    models_dir = weights_dir()
    wire0 = wire_rate()

    cold, _, rd = once(marker_path, img_path, mask_path, models_dir, "cold")
    shutil.rmtree(os.path.dirname(rd), ignore_errors=True)
    print(f"cold: {cold:.0f}s", file=sys.stderr)
    warm, trace, rd = once(marker_path, img_path, mask_path, models_dir,
                           "warm")
    acc, n = planted_accuracy(rd, types_path)
    # third run in the SAME process — the persistent-server scenario
    # (--serve): jitted programs, device params, and the XLA client stay
    # resident, so this excludes the per-process server-side executable
    # loads over the tunnel that dominate fresh-process "warm" runs
    shutil.rmtree(os.path.dirname(rd), ignore_errors=True)
    hot, hot_trace, rd = once(marker_path, img_path, mask_path, models_dir,
                              "warm")
    acc2, _ = planted_accuracy(rd, types_path)

    wire1 = wire_rate()
    stages = {k: v for k, v in trace.items()
              if isinstance(v, float) and v >= 0.5}
    print(f"whole-slide {SIZE}^2 x7, {n} cells: warm {warm:.0f}s "
          f"({n / warm:,.0f} cells/s), in-process warm {hot:.0f}s "
          f"({n / hot:,.0f} cells/s, server scenario), cold {cold:.0f}s, "
          f"planted accuracy {acc:.3f}/{acc2:.3f}, "
          f"wire {wire0}/{wire1} MB/s (start/end)")
    for k, v in sorted(stages.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {v:.1f}s (in-process "
              f"{hot_trace.get(k, 0.0):.1f}s)")
    ok = warm <= WALL_BOUND and acc >= ACC_BOUND and acc2 >= ACC_BOUND
    print(f"bounds: wall<={WALL_BOUND:.0f}s acc>={ACC_BOUND} "
          f"{'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
