"""Diagnose the 500k whole-slide planted-accuracy cliff (VERDICT r3 #4).

Observed: planted-type accuracy 0.78-0.80 on the 20k-cell e2e fixture
(3000², cell radius 8) vs 0.600 on the 500k-cell whole slide (12288²,
radius 5) with the same calibration scheme. Two candidate causes:

1. fixture-distribution artifact — the whole-slide fixture packs cells
   at ~3x the areal density with smaller radii, which (a) shifts the
   per-image percentile normalization (known to matter: calibration had
   to train across geometries, ROADMAP r3 session 4) and (b) shrinks
   each cell's pixel count, so mean-signature patches are noisier;
2. a real banded-path behavior difference at scale (the banded cache
   path is claimed bit-identical to single-shot).

Bisect without the 8-minute whole-slide run, holding the model fixed
(the bench calibration cache):

  A. e2e-geometry control: 3000², radius 8, 20k cells, single-shot;
  B. whole-slide GEOMETRY at e2e SIZE: 3000², radius 5, ~30k cells
     (the 500k slide's areal density), single-shot;
  C. the same fixture as B through the FORCED banded cache path —
     labels must match B's bitwise (banded exactness at this density).

If B's accuracy drops to ~0.60 while C == B, the cliff is the fixture
distribution, not a banded-path bug. Prints a verdict line.

Run on the TPU host: python scripts/diagnose_density_accuracy.py
"""

from __future__ import annotations

import csv
import glob
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIR = os.environ.get("RIBCA_DENSITY_DIR", "/tmp/ribca_density_diag")
SIZE = 3000
WS_SIZE = 12_288
WS_CELLS = 500_000


def _fixture(tag: str, n_cells: int, radius: int, seed: int):
    from PIL import Image

    from ribca_tpu.io import write_tiff
    from ribca_tpu.models.calibrate import (
        make_typed_cells,
        panel_signatures,
        typed_image,
    )
    from ribca_tpu.panels.vocab import PANELS

    os.makedirs(DIR, exist_ok=True)
    img_path = os.path.join(DIR, f"slide_{tag}.tif")
    mask_path = os.path.join(DIR, f"mask_{tag}.tif")
    types_path = os.path.join(DIR, f"types_{tag}.npy")
    marker_path = os.path.join(DIR, "markers.txt")
    with open(marker_path, "w") as f:
        f.write("\n".join(PANELS["immune_base"]) + "\n")
    if not all(os.path.exists(p)
               for p in (img_path, mask_path, types_path)):
        sig = panel_signatures("immune_base")
        mask, types = make_typed_cells(SIZE, SIZE, n_cells, sig.shape[0],
                                       radius=radius, seed=seed)
        img = typed_image(mask, types, sig, seed=seed)
        write_tiff(img_path, img)
        Image.fromarray(mask.astype(np.int32), mode="I").save(
            mask_path, format="TIFF"
        )
        np.save(types_path, types)
    return marker_path, img_path, mask_path, types_path


def _accuracy(result_dir: str, types_path: str):
    from ribca_tpu.panels.vocab import PANEL_CLASS_MAPS

    types = np.load(types_path)
    names = PANEL_CLASS_MAPS["immune_base"]
    labels = {}
    correct = total = 0
    for path in glob.glob(os.path.join(result_dir, "*_annotation_*.csv")):
        with open(path) as f:
            for row in csv.DictReader(f):
                cid = int(row["Cell Index"])
                labels[cid] = row["Cell Type"]
                if 1 <= cid <= len(types):
                    total += 1
                    correct += (
                        row["Cell Type"] == names[int(types[cid - 1])]
                    )
    return correct / max(total, 1), labels


def _run(marker_path, img_path, mask_path, models_dir, tag,
         force_banded=False):
    from ribca_tpu import cli
    from ribca_tpu.utils.config import AnnotatorConfig

    run_dir = os.path.join(DIR, f"run_{tag}")
    shutil.rmtree(run_dir, ignore_errors=True)
    kw = {}
    if force_banded:
        # push the slide over the single-shot budget -> banded cache path
        kw["device_image_budget_bytes"] = 1 << 20
    config = AnnotatorConfig(
        marker_file=marker_path, image_path=img_path, mask_path=mask_path,
        main_dir=run_dir, batch_id="dd", strict=True, infer=False,
        models_dir=models_dir, allow_random_weights=False, n_regions=0,
        **kw,
    )
    t0 = time.perf_counter()
    cli.run(config, bs=config.batch_size, n_regions=0)
    return time.perf_counter() - t0, os.path.join(run_dir, "results")


def main() -> int:
    sys.path.insert(0, REPO)
    import bench

    models_dir = bench._calibrated_models_dir()

    # the whole-slide areal density scaled to 3000²
    dens_cells = int(WS_CELLS * (SIZE / WS_SIZE) ** 2)
    cases = {
        "A_e2e_geometry": _fixture("A", 20_000, 8, seed=0),
        "B_ws_density": _fixture("B", dens_cells, 5, seed=7),
    }

    results = {}
    label_sets = {}
    for tag, (mk, im, ms, ty) in cases.items():
        wall, rd = _run(mk, im, ms, models_dir, tag)
        acc, labels = _accuracy(rd, ty)
        results[tag] = acc
        label_sets[tag] = labels
        print(f"{tag}: {len(labels)} cells, accuracy {acc:.3f} "
              f"({wall:.0f}s)", file=sys.stderr)

    mk, im, ms, ty = cases["B_ws_density"]
    wall, rd = _run(mk, im, ms, models_dir, "C_banded", force_banded=True)
    acc_c, labels_c = _accuracy(rd, ty)
    results["C_banded"] = acc_c
    b = label_sets["B_ws_density"]
    diffs = sum(1 for k, v in labels_c.items() if b.get(k) != v)
    print(f"C_banded: accuracy {acc_c:.3f} ({wall:.0f}s); "
          f"label diffs vs single-shot: {diffs}/{len(labels_c)}",
          file=sys.stderr)

    a, bb, c = (results["A_e2e_geometry"], results["B_ws_density"],
                results["C_banded"])
    fixture_effect = a - bb
    banded_effect = abs(bb - c)
    if diffs == 0 and fixture_effect > 0.05:
        conclusion = "Density/geometry artifact — banded path exonerated."
    elif diffs == 0 and abs(fixture_effect) <= 0.05:
        conclusion = (
            "No cliff from density OR banding: the r3 session-8 0.600 "
            "at 500k is attributable to that run's calibration "
            "instance (measured 2026-08-20: a fresh calibration scores "
            "0.793 on the full 500k whole slide — see BASELINE.md)."
        )
    else:
        conclusion = ("INVESTIGATE: banded path diverges or density is "
                      "not the cause.")
    print(
        f"VERDICT: e2e-geometry acc {a:.3f}; whole-slide-density acc "
        f"{bb:.3f} (fixture effect {fixture_effect:+.3f}); banded vs "
        f"single-shot diff {banded_effect:.4f} ({diffs} label flips). "
        + conclusion
    )
    return 0 if diffs == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
