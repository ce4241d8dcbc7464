"""Synthetic calibration weights: fine-tune a panel head on planted types.

The published checkpoints (models/download.py) need network access that
validation environments often lack, and running the pipeline with random
weights produces near-uniform softmax outputs — every cell falls below
the 0.3 confidence threshold, so the voting/discovery stages see a
distribution nothing like a real run (reference defaults: main.py:84-85,
model.py:481-639). This module closes that gap offline:

1. generate a synthetic slide whose cells carry *planted* cell types,
   each type expressing a biology-style marker signature (CD4 T cells
   are CD45+CD3+CD4+DAPI+, B cells CD45+CD20+DAPI+, ...);
2. push it through the REAL pipeline front end (engine/pipeline
   preprocess + ops/patches gather) so the training patches have exactly
   the production normalization/soft-mask distribution;
3. fine-tune the panel classifier with the DP Trainer (models/train.py)
   and save a registry-compatible ``.npz`` checkpoint.

The result: an end-to-end run over a typed fixture produces peaked,
realistic softmax outputs and a measurable planted-type accuracy —
used by ``bench.py`` so the e2e/cohort scenarios exercise representative
voting accept rates instead of the all-Others degenerate case, and
useful standalone as demo weights (``python -m ribca_tpu.models.calibrate``).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from ribca_tpu.panels.vocab import (
    CELL_TYPES,
    PANEL_CLASS_MAPS,
    PANELS,
    others_index,
)
from ribca_tpu.models.registry import CLASSIFIER_BASENAME

# Positive markers per cell type (standard immunophenotyping gates; the
# reference paper's Table 1 panel design implies the same gates). DAPI is
# nuclear — positive for every cell. "Others" expresses nothing beyond
# DAPI.
TYPE_POSITIVE_MARKERS: dict[str, tuple[str, ...]] = {
    "B cell": ("CD45", "CD20"),
    "CD4 T cell": ("CD45", "CD3", "CD4"),
    "CD8 T cell": ("CD45", "CD3", "CD8"),
    "Dendritic cell": ("CD45", "CD11c"),
    "M1 macrophage cell": ("CD45", "CD68"),
    "M2 macrophage cell": ("CD45", "CD68", "CD163"),
    "Regulatory T cell": ("CD45", "CD3", "CD4", "FoxP3"),
    "Granulocyte cell": ("CD45", "CD15"),
    "Plasma cell": ("CD45", "CD138"),
    "Natural killer cell": ("CD45", "CD56"),
    "Mast cell": ("CD45", "Trypase"),
    "Stroma cell": ("Vimentin",),
    "Smooth muscle": ("aSMA", "Vimentin"),
    "Endothelial cell": ("CD31",),
    "Epithelial cell": ("PanCK",),
    "Proliferating/tumor cell": ("PanCK", "Ki67"),
    "Nerve cell": ("GFAP",),
    "Others": (),
}


def panel_signatures(panel: str, markers: list[str] | None = None) -> np.ndarray:
    """(num_classes, n_markers) 0/1 expression table for a panel's class
    heads over ``markers`` (default: the panel's own marker order)."""
    markers = markers if markers is not None else PANELS[panel]
    class_map = PANEL_CLASS_MAPS[panel]
    sig = np.zeros((len(class_map), len(markers)), np.float32)
    for cls, name in class_map.items():
        pos = set(TYPE_POSITIVE_MARKERS[name]) | {"DAPI"}
        for j, m in enumerate(markers):
            if m in pos:
                sig[cls, j] = 1.0
    return sig


def union_markers(panels) -> list[str]:
    """Union of the panels' marker lists, first-occurrence order — the
    marker file a multi-panel slide would ship (all listed panels parse
    as fully present under strict=True)."""
    out: list[str] = []
    for p in panels:
        for m in PANELS[p]:
            if m not in out:
                out.append(m)
    return out


def global_signatures(markers: list[str]) -> np.ndarray:
    """(18, n_markers) 0/1 expression table over the GLOBAL cell-type
    vocabulary (CELL_TYPES order) — for planting multi-panel fixtures
    whose types span every panel's head."""
    sig = np.zeros((len(CELL_TYPES), len(markers)), np.float32)
    for t, name in enumerate(CELL_TYPES):
        pos = set(TYPE_POSITIVE_MARKERS[name]) | {"DAPI"}
        for j, m in enumerate(markers):
            if m in pos:
                sig[t, j] = 1.0
    return sig


def panel_label_lut(panel: str) -> np.ndarray:
    """(18,) int32 LUT: global CELL_TYPES index -> this panel's head
    class index; types the head cannot express map to its Others class
    (exactly what the reference's per-panel training data implies —
    every head has an Others slot, vocab.PANEL_CLASS_MAPS)."""
    index_by_name = {
        name: idx for idx, name in PANEL_CLASS_MAPS[panel].items()
    }
    oth = others_index(panel)
    return np.asarray(
        [index_by_name.get(name, oth) for name in CELL_TYPES], np.int32
    )


def make_typed_cells(
    h: int, w: int, n_cells: int, n_types: int, radius: int = 6,
    seed: int = 0,
):
    """Jittered-grid disk cells with a planted type each.

    Returns (mask (H, W) int32 with ids 1..n, types (n,) int32 in
    [0, n_types)). Same O(H*W + n*r^2) stamping as the test fixtures."""
    rng = np.random.default_rng(seed)
    mask = np.zeros((h, w), np.int32)
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    stamp = (yy ** 2 + xx ** 2) <= radius ** 2
    gy = int(np.ceil(np.sqrt(n_cells)))
    gx = int(np.ceil(n_cells / gy))
    cid = 1
    for iy in range(gy):
        for ix in range(gx):
            if cid > n_cells:
                break
            cy = int(np.clip((iy + 0.5) * h / gy + rng.integers(-3, 4),
                             radius, h - radius - 1))
            cx = int(np.clip((ix + 0.5) * w / gx + rng.integers(-3, 4),
                             radius, w - radius - 1))
            win = mask[cy - radius:cy + radius + 1,
                       cx - radius:cx + radius + 1]
            win[stamp & (win == 0)] = cid
            cid += 1
    n = cid - 1
    types = rng.integers(0, n_types, size=n).astype(np.int32)
    return mask, types


def typed_image(
    mask: np.ndarray,
    types: np.ndarray,
    signatures: np.ndarray,
    seed: int = 0,
    amplitude: float = 200.0,
    crosstalk: float = 0.08,
) -> np.ndarray:
    """(C, H, W) uint16 image expressing each cell's planted signature.

    Per-cell brightness jitters U(0.6, 1.0) on positive markers; every
    marker also carries U(0, crosstalk) nonspecific signal plus the same
    U(0, 10) background the untyped fixtures use, so classes overlap a
    little and the trained head's confidences spread realistically."""
    rng = np.random.default_rng(seed)
    n_cells = int(mask.max())
    n_ch = signatures.shape[1]
    expr = np.zeros((n_cells + 1, n_ch), np.float32)
    sig = signatures[types]                              # (n, C)
    jitter = rng.uniform(0.6, 1.0, size=sig.shape).astype(np.float32)
    noise = rng.uniform(0.0, crosstalk, size=sig.shape).astype(np.float32)
    expr[1:] = sig * jitter + noise
    img = rng.uniform(0, 10, size=(n_ch,) + mask.shape).astype(np.float32)
    img += amplitude * np.transpose(expr[mask], (2, 0, 1))
    return img.astype(np.uint16)


def extract_labeled_patches(image, mask, types, config=None, mesh=None):
    """(patches (N, C, 40, 40) f32, labels (N,) int32) through the
    production preprocess + patch gather (engine/pipeline.py:222-281)."""
    import jax

    from ribca_tpu.engine.pipeline import chunk_size_for, preprocess_image
    from ribca_tpu.ops.patches import extract_patches
    from ribca_tpu.parallel.mesh import cell_sharding_axis1, get_mesh
    from ribca_tpu.utils.config import AnnotatorConfig

    config = config or AnnotatorConfig()
    mesh = mesh if mesh is not None else get_mesh()
    img_zero, min_val, mask_dev, _, ext, (h, w) = preprocess_image(
        np.asarray(image), np.asarray(mask), config, mesh
    )
    ids = ext.present_ids
    n = len(ids)
    patch_size = int(40 * config.cell_size / 30.0)
    n_dev = mesh.size
    sh = cell_sharding_axis1(mesh)
    chunk = chunk_size_for(min(max(n, 1), 4096), 4096, n_dev)

    parts = []
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        sel = ids[start:stop]
        size = chunk_size_for(len(sel), chunk, n_dev)

        cells = np.zeros((5, size), np.int32)
        for row, a in enumerate((sel, ext.rmin[sel], ext.rmax[sel],
                                 ext.cmin[sel], ext.cmax[sel])):
            cells[row, : len(sel)] = a
        patches, _ = extract_patches(
            img_zero, min_val, mask_dev, jax.device_put(cells, sh),
            patch_size=patch_size, full_h=h, full_w=w,
            prepadded=True,  # preprocess_image pads one window
        )
        parts.append(np.asarray(patches)[: len(sel)])
    patches = (
        np.concatenate(parts, axis=0) if parts
        else np.zeros((0, image.shape[0], 40, 40), np.float32)
    )
    labels = np.asarray(types, np.int32)[ids - 1]
    return patches, labels


@dataclasses.dataclass
class CalibrationResult:
    path: str                 # saved .npz checkpoint
    holdout_accuracy: float   # planted-type accuracy on an UNSEEN image
    history: list             # per-epoch (loss, acc) from Trainer.fit


def calibrate_panel(
    panel: str,
    out_dir: str,
    n_cells: int = 4096,
    image_hw: tuple[int, int] = (1024, 1024),
    epochs: int = 24,
    seed: int = 0,
    learning_rate: float = 1e-3,
    batch_size: int = 256,
    dtype: str = "bfloat16",
    radii: tuple[int, ...] = (5, 8, 11),
    mesh=None,
    config=None,
    logger=None,
) -> CalibrationResult:
    """Fine-tune ``panel``'s classifier on planted-signature patches and
    save it as ``<out_dir>/<basename>.npz`` (registry layout).

    Patches pool from ``len(radii)`` fixtures of DIFFERENT cell radius /
    density / seed: per-image percentile normalization shifts with cell
    coverage, so a head trained on one geometry misreads slides of
    another (measured: a single-fixture head collapsed to one class on a
    fresh image). The holdout is the LAST fixture's cells entirely —
    cross-image generalization, not just unseen cells."""
    from ribca_tpu.models.train import TrainConfig, Trainer

    sig = panel_signatures(panel)
    n_types = sig.shape[0]
    h, w = image_hw
    per = max(n_cells // len(radii), 8)
    # (measured: ALSO varying per-image stain amplitude 140-280 here
    # dropped cross-image holdout 0.75 -> 0.65 at this step budget — the
    # extra invariance costs more steps than it buys; geometry spread
    # alone is what the percentile-normalization shift needs)
    xs, ys = [], []
    for i, radius in enumerate(radii):
        mask, types = make_typed_cells(h, w, per, n_types, radius=radius,
                                       seed=seed + i)
        image = typed_image(mask, types, sig, seed=seed + i)
        xi, yi = extract_labeled_patches(image, mask, types, config=config,
                                         mesh=mesh)
        xs.append(xi)
        ys.append(yi)

    # holdout = one extra fixture the training never saw (new geometry)
    mask, types = make_typed_cells(
        h // 2, w // 2, max(per // 2, 8), n_types,
        radius=radii[len(radii) // 2] + 1, seed=seed + len(radii),
    )
    image = typed_image(mask, types, sig, seed=seed + len(radii))
    x_ho, y_ho = extract_labeled_patches(image, mask, types, config=config,
                                         mesh=mesh)

    x_tr = np.concatenate(xs, axis=0)
    y_tr = np.concatenate(ys, axis=0)
    order = np.random.default_rng(seed).permutation(len(x_tr))
    x_tr, y_tr = x_tr[order], y_tr[order]

    trainer = Trainer(
        panel,
        TrainConfig(learning_rate=learning_rate, batch_size=batch_size,
                    dtype=dtype, seed=seed),
        mesh=mesh,
    )
    history = trainer.fit(x_tr, y_tr, epochs=epochs, log_every=0,
                          logger=logger)
    acc = trainer.evaluate(x_ho, y_ho)

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(
        out_dir, f"{CLASSIFIER_BASENAME[panel]}.npz"
    )
    trainer.save(path)
    if logger is not None:
        logger.log(
            f"calibrated {panel}: holdout acc {acc:.3f} -> {path}"
        )
    return CalibrationResult(path=path, holdout_accuracy=acc,
                             history=history)


def calibrate_ensemble(
    panels,
    out_dir: str,
    n_cells: int = 4096,
    image_hw: tuple[int, int] = (1024, 1024),
    epochs: int = 24,
    seed: int = 0,
    learning_rate: float = 1e-3,
    batch_size: int = 256,
    dtype: str = "bfloat16",
    radii: tuple[int, ...] = (5, 8, 11),
    mesh=None,
    config=None,
    logger=None,
    skip_existing: bool = False,
) -> dict[str, CalibrationResult]:
    """Fine-tune EVERY listed panel head on shared multi-panel fixtures.

    Fixtures are planted over the GLOBAL 18-type vocabulary on the
    panels' union marker set, preprocessed ONCE through the production
    front end at union width; each head then trains on its own channel
    slice with its own class labels (global type -> head class via
    ``panel_label_lut``, off-panel types -> Others). This is the
    distribution a real multi-panel slide feeds the ensemble, so a run
    over such a fixture exercises ``merge_by_voting``'s multi-head
    branches (reference model.py:481-639) with peaked, representative
    softmax — not the all-Others degenerate case of random weights.
    """
    from ribca_tpu.models.train import TrainConfig, Trainer

    panels = list(panels)
    paths = {
        p: os.path.join(out_dir, f"{CLASSIFIER_BASENAME[p]}.npz")
        for p in panels
    }
    if skip_existing and all(os.path.exists(paths[p]) for p in panels):
        # resume support: nothing to train, so skip the minutes of
        # fixture extraction too
        if logger is not None:
            logger.log("calibrate_ensemble: all heads exist, kept as-is")
        return {
            p: CalibrationResult(path=paths[p],
                                 holdout_accuracy=float("nan"), history=[])
            for p in panels
        }
    markers = union_markers(panels)
    sig = global_signatures(markers)
    n_types = sig.shape[0]
    chan_idx = {
        p: np.asarray([markers.index(m) for m in PANELS[p]], np.int64)
        for p in panels
    }
    h, w = image_hw
    per = max(n_cells // len(radii), 8)

    xs, ys = [], []
    for i, radius in enumerate(radii):
        mask, types = make_typed_cells(h, w, per, n_types, radius=radius,
                                       seed=seed + i)
        image = typed_image(mask, types, sig, seed=seed + i)
        xi, yi = extract_labeled_patches(image, mask, types, config=config,
                                         mesh=mesh)
        xs.append(xi)
        ys.append(yi)
    mask, types = make_typed_cells(
        h // 2, w // 2, max(per // 2, 8), n_types,
        radius=radii[len(radii) // 2] + 1, seed=seed + len(radii),
    )
    image = typed_image(mask, types, sig, seed=seed + len(radii))
    x_ho, y_ho = extract_labeled_patches(image, mask, types, config=config,
                                         mesh=mesh)

    x_tr = np.concatenate(xs, axis=0)
    y_tr = np.concatenate(ys, axis=0)
    order = np.random.default_rng(seed).permutation(len(x_tr))
    x_tr, y_tr = x_tr[order], y_tr[order]

    os.makedirs(out_dir, exist_ok=True)
    results: dict[str, CalibrationResult] = {}
    for panel in panels:
        lut = panel_label_lut(panel)
        path = paths[panel]
        if skip_existing and os.path.exists(path):
            # resume support: a multi-head calibration is minutes per
            # head; an interrupted run keeps its finished heads
            if logger is not None:
                logger.log(f"calibrated {panel}: kept existing {path}")
            results[panel] = CalibrationResult(
                path=path, holdout_accuracy=float("nan"), history=[]
            )
            continue
        trainer = Trainer(
            panel,
            TrainConfig(learning_rate=learning_rate,
                        batch_size=batch_size, dtype=dtype, seed=seed),
            mesh=mesh,
        )
        history = trainer.fit(x_tr[:, chan_idx[panel]], lut[y_tr],
                              epochs=epochs, log_every=0, logger=logger)
        acc = trainer.evaluate(x_ho[:, chan_idx[panel]], lut[y_ho])
        trainer.save(path)
        if logger is not None:
            logger.log(
                f"calibrated {panel} (ensemble fixture): holdout acc "
                f"{acc:.3f} -> {path}"
            )
        results[panel] = CalibrationResult(path=path, holdout_accuracy=acc,
                                           history=history)
    return results


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Generate synthetic calibration weights for panels"
    )
    p.add_argument("--out-dir", required=True)
    p.add_argument("--panels", nargs="+", default=["immune_base"],
                   choices=sorted(PANELS))
    p.add_argument("--ensemble", action="store_true",
                   help="train all --panels heads on SHARED union-marker "
                        "fixtures (multi-panel voting distributions)")
    p.add_argument("--n-cells", type=int, default=4096)
    p.add_argument("--epochs", type=int, default=24)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.ensemble:
        results = calibrate_ensemble(args.panels, args.out_dir,
                                     n_cells=args.n_cells,
                                     epochs=args.epochs, seed=args.seed)
        for panel, r in results.items():
            print(f"{panel}: holdout accuracy {r.holdout_accuracy:.3f} "
                  f"-> {r.path}")
        return
    for panel in args.panels:
        r = calibrate_panel(panel, args.out_dir, n_cells=args.n_cells,
                            epochs=args.epochs, seed=args.seed)
        print(f"{panel}: holdout accuracy {r.holdout_accuracy:.3f} "
              f"-> {r.path}")


if __name__ == "__main__":
    main()
