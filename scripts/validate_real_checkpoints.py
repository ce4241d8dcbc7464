"""Real-checkpoint burn-down kit: download -> convert -> annotate -> diff.

The framework's numerical-parity proofs run on converted *synthetic*
torch weights (tests/test_convert_reference_layout.py,
tests/test_e2e_parity.py); this environment has no egress, so the 8
PUBLISHED checkpoints (reference download_models.py:7-37, loaded at
model.py:188-239 / markerImputer.py:258-284) have never been validated.
This script turns that into a one-command task for the first session
that CAN reach the network:

    python scripts/validate_real_checkpoints.py

It (1) downloads the 8 checkpoints with the reference's own Drive
file-IDs (models/download.py), (2) converts each ``.pth`` to the native
``.npz`` store (models/convert.py), (3) runs the full Annotator over a
deterministic evaluation slide built for the reference's published
example marker panel (examples/markers.txt — matches immune_extended +
structure with zero missing markers), (4) re-runs the
reference-equivalent torch mirror (oracle preprocess, utils.py:226-270 /
preprocess.py:214-239; torch forwards, model.py:397-406) with the SAME
``.pth`` weights and diffs labels + confidences, (5) measures
bf16-vs-f32 label agreement ON THE REAL WEIGHTS (the synthetic-weight
1.0000 agreement number may not transfer if the published heads put
confidence mass near the 0.3 threshold), and (6) writes a JSON report.

A second scenario drops Granzyme B + Trypase from the full-panel union
(within immune_full's missing budget of 3, markerParse.py:33) so the
immune_full MAE imputer runs with real weights and is mirrored through
the torch MAE as well.

Offline validation of THIS script (so the first egress session spends
10 minutes, not an hour of archaeology): tests/test_real_checkpoint_kit.py
runs it end-to-end with fixture ``.pth`` files served through a mocked
Drive opener. Use ``--fixture-dir`` to point the downloader at a
directory of ``.pth`` files instead of the network.

Exit codes: 0 = all present + mirror parity PASS; 2 = checkpoints
missing (report says which); 1 = parity FAIL. With only converted
``.npz`` weights on disk (no ``.pth`` for the torch mirror) the kit
still runs both Annotator dtypes and reports the real-weight bf16
agreement, marking the verdict ``NPZ_ONLY`` (exit 0).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The reference's published example marker panel, verbatim
# (reference examples/markers.txt; also reachable via --markers-file).
REFERENCE_EXAMPLE_MARKERS = [
    "DAPI", "CD31", "aSMA", "CD34", "CD4", "CD8", "CD68", "Ki67",
    "CD11c", "CollagenIV", "CD163", "CD45", "CD56", "Vimentin", "CD3",
    "CD20", "PanCK",
]

DIMS = {"vit_tiny": 144, "vit_s": 288, "vit_m": 384, "vit_l": 576}


# -- torch mirror (reference-equivalent pipeline) ---------------------------


def _load_mirror_vit(models_dir: str, panel: str):
    import torch

    from ribca_tpu.models.registry import CLASSIFIER_BASENAME
    from ribca_tpu.panels.vocab import PANEL_MODEL_SPECS
    from tests.torch_mirror import TorchViT

    arch, in_chans, n_cls = PANEL_MODEL_SPECS[panel]
    path = os.path.join(models_dir, CLASSIFIER_BASENAME[panel] + ".pth")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    m = TorchViT(in_chans, n_cls, DIMS[arch]).eval()
    m.load_state_dict(sd)
    return m


def _load_mirror_mae(models_dir: str, panel: str):
    import torch

    from ribca_tpu.models.registry import CLASSIFIER_BASENAME
    from ribca_tpu.panels.vocab import IMPUTER_MOSAIC
    from tests.torch_mirror import TorchMAE

    gh, gw = IMPUTER_MOSAIC[panel]
    path = os.path.join(
        models_dir, CLASSIFIER_BASENAME[panel] + "_impute.pth"
    )
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    m = TorchMAE(img_size=(gh * 40, gw * 40)).eval()
    m.load_state_dict(sd)
    return m


def _mirror_impute(sel: np.ndarray, channel_index, panel: str, mae):
    """Reference MAE composition (markerImputer.py:294-329): row-major
    mosaic, deterministic keep-masking, composite missing tiles."""
    import torch

    from ribca_tpu.models.mae import masking_plan
    from ribca_tpu.panels.vocab import IMPUTER_MOSAIC

    gh, gw = IMPUTER_MOSAIC[panel]
    n, c, p, _ = sel.shape
    mosaic = np.zeros((n, 1, gh * p, gw * p), np.float32)
    for j in range(c):
        r, q = divmod(j, gw)
        mosaic[:, 0, r * p:(r + 1) * p, q * p:(q + 1) * p] = sel[:, j]
    present = [k for k, v in enumerate(channel_index) if v != -1]
    ids_keep, ids_restore, token_mask = masking_plan(present, c)
    with torch.no_grad():
        pred = mae(
            torch.from_numpy(mosaic),
            torch.from_numpy(ids_keep.astype(np.int64)),
            torch.from_numpy(ids_restore.astype(np.int64)),
        ).numpy()  # (N, c, p*p)
    out = sel.copy()
    for j in range(c):
        if token_mask[j] > 0:
            out[:, j] = pred[:, j].reshape(n, p, p)
    return out


def mirror_annotate(img, mask, parser, models_dir, *, blur, amax,
                    confidence, cell_type_confidence, infer):
    """The reference's preprocess->predict->merge flow, all matched
    panels, torch forwards with the real ``.pth`` weights. Voting runs
    through engine/voting.merge_by_voting, whose branch-exactness vs
    model.py:481-639 is pinned separately (tests/test_voting.py) — this
    keeps the diff focused on preprocessing + model numerics."""
    import torch

    from ribca_tpu.engine.ensemble import prediction_panels
    from ribca_tpu.engine.voting import PanelProbs, merge_by_voting
    from ribca_tpu.models.registry import CLASSIFIER_BASENAME
    from tests.oracle import (
        cell_pos_dict,
        oracle_channel_select,
        oracle_crop_cell,
        oracle_normalize,
        oracle_resize,
    )

    norm = oracle_normalize(img.astype(np.float32), blur=blur, amax=amax)
    min_val = norm.min(axis=(1, 2), keepdims=True)
    img_zero = norm - min_val
    pos = cell_pos_dict(mask)
    patches = []
    for cid in sorted(pos):
        patch, _ = oracle_crop_cell(img_zero, mask, min_val, cid, pos, 40)
        patches.append(oracle_resize(patch, 40))

    probs_by_panel = {}
    for panel in prediction_panels(parser):
        ci = parser.indices[panel]
        vit = _load_mirror_vit(models_dir, panel)
        sel = np.stack(
            [oracle_channel_select(p, ci) for p in patches]
        ).astype(np.float32)
        if infer and -1 in list(ci):
            impute_pth = os.path.join(
                models_dir, CLASSIFIER_BASENAME[panel] + "_impute.pth"
            )
            if os.path.exists(impute_pth):
                sel = _mirror_impute(
                    sel, ci, panel, _load_mirror_mae(models_dir, panel)
                )
        with torch.no_grad():
            probs_by_panel[panel] = torch.softmax(
                vit(torch.from_numpy(sel)), dim=1
            ).numpy()

    immune = structure = nerve = None
    for panel, probs in probs_by_panel.items():
        pp = PanelProbs(panel, probs)
        if panel.startswith("immune"):
            immune = pp
        elif panel == "structure":
            structure = pp
        elif panel == "nerve_cell":
            nerve = pp
    labels, conf = merge_by_voting(
        immune, structure, nerve, confidence, cell_type_confidence
    )
    return labels, np.asarray(conf, np.float32), probs_by_panel


# -- scenarios --------------------------------------------------------------


def _write_eval_fixture(work_dir: str, markers: list[str], *, size: int,
                        n_cells: int, seed: int):
    """Deterministic multi-channel slide + mask for a marker list."""
    from PIL import Image

    from ribca_tpu.io import write_tiff
    from tests.synth import make_cells, make_image

    os.makedirs(work_dir, exist_ok=True)
    mask, _ = make_cells(size, size, n_cells, radius=6, seed=seed)
    img = make_image(mask, n_channels=len(markers), seed=seed)
    img_path = os.path.join(work_dir, "eval.tif")
    mask_path = os.path.join(work_dir, "eval_mask.png")
    write_tiff(img_path, img)
    Image.fromarray(mask.astype(np.uint16)).save(mask_path)
    marker_path = os.path.join(work_dir, "markers.txt")
    with open(marker_path, "w") as f:
        f.write("\n".join(markers) + "\n")
    return img, mask, img_path, mask_path, marker_path


def _run_annotator(work_dir, marker_path, img_path, mask_path, models_dir,
                   *, dtype, infer, blur, amax, confidence):
    import shutil
    import tempfile

    from ribca_tpu.api.annotator import Annotator
    from ribca_tpu.io.manifest import write_manifest
    from ribca_tpu.utils.config import AnnotatorConfig

    run_dir = tempfile.mkdtemp(prefix="ribca_realck_", dir=work_dir)
    csv = os.path.join(run_dir, "images.csv")
    write_manifest([(img_path, mask_path)], csv)
    ann = Annotator(
        AnnotatorConfig(
            marker_file=marker_path, csv_file=csv, main_dir=run_dir,
            batch_id="realck", strict=False, infer=infer, dtype=dtype,
            blur=blur, upper_limit=amax, confidence=confidence,
            models_dir=models_dir, allow_random_weights=False,
        )
    )
    ann.preprocess()
    ann.predict()
    labels = list(ann.annotations[0])
    conf = np.asarray(ann.confidence[0])
    panels = [s.panel for s in ann._runner.specs]
    parser = ann.channel_parser
    shutil.rmtree(run_dir, ignore_errors=True)
    return labels, conf, panels, parser


def _agreement(labels_a, conf_a, labels_b, conf_b) -> dict:
    n = len(labels_a)
    flips = [i for i, (x, y) in enumerate(zip(labels_a, labels_b))
             if x != y]
    both = (np.asarray(conf_a) >= 0) & (np.asarray(conf_b) >= 0)
    delta = np.abs(np.asarray(conf_a)[both] - np.asarray(conf_b)[both])
    return {
        "n_cells": n,
        "label_agreement": round(1.0 - len(flips) / max(n, 1), 6),
        "n_flips": len(flips),
        "flip_indices": flips[:50],
        "conf_max_delta": float(delta.max()) if delta.size else 0.0,
    }


def run_scenario(name: str, markers: list[str], *, work_dir, models_dir,
                 size, n_cells, infer, mirror=True, blur=0.3, amax=99.8,
                 confidence=0.3) -> dict:
    print(f"[{name}] building eval fixture ({size}x{size}, "
          f"{n_cells} cells, {len(markers)} markers)", file=sys.stderr)
    sdir = os.path.join(work_dir, name)
    img, mask, img_path, mask_path, marker_path = _write_eval_fixture(
        sdir, markers, size=size, n_cells=n_cells, seed=7,
    )

    t0 = time.perf_counter()
    labels_f32, conf_f32, panels, parser = _run_annotator(
        sdir, marker_path, img_path, mask_path, models_dir,
        dtype="float32", infer=infer, blur=blur, amax=amax,
        confidence=confidence,
    )
    print(f"[{name}] annotator f32: {len(labels_f32)} cells, panels "
          f"{panels} ({time.perf_counter() - t0:.1f}s)", file=sys.stderr)

    t0 = time.perf_counter()
    labels_bf16, conf_bf16, _, _ = _run_annotator(
        sdir, marker_path, img_path, mask_path, models_dir,
        dtype="bfloat16", infer=infer, blur=blur, amax=amax,
        confidence=confidence,
    )
    print(f"[{name}] annotator bf16 ({time.perf_counter() - t0:.1f}s)",
          file=sys.stderr)

    out = {
        "markers": markers,
        "panels": panels,
        "bf16_vs_f32": _agreement(labels_f32, conf_f32,
                                  labels_bf16, conf_bf16),
    }
    if mirror:
        t0 = time.perf_counter()
        labels_t, conf_t, _ = mirror_annotate(
            img, mask, parser, models_dir, blur=blur, amax=amax,
            confidence=confidence, cell_type_confidence={}, infer=infer,
        )
        print(f"[{name}] torch mirror ({time.perf_counter() - t0:.1f}s)",
              file=sys.stderr)
        out["torch_mirror_vs_f32"] = _agreement(labels_f32, conf_f32,
                                                labels_t, conf_t)
    return out


# -- entry ------------------------------------------------------------------


def _fixture_opener(fixture_dir: str):
    """Offline stand-in for the network: serve ``<name>.pth`` bytes for
    each checkpoint URL through the downloader's opener seam."""
    import io
    import urllib.parse

    from ribca_tpu.models.download import CHECKPOINT_URLS

    by_id = {}
    for name, url in CHECKPOINT_URLS.items():
        file_id = url.split("/file/d/")[1].split("/")[0]
        by_id[file_id] = os.path.join(fixture_dir, name)

    class _Resp(io.BytesIO):
        def __init__(self, data):
            super().__init__(data)
            self.headers = {"Content-Type": "application/octet-stream"}

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def opener(req):
        q = urllib.parse.parse_qs(urllib.parse.urlparse(req.full_url).query)
        path = by_id[q["id"][0]]
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        with open(path, "rb") as f:
            return _Resp(f.read())

    return opener


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--models-dir", default=None,
                    help="checkpoint directory (default: registry dir)")
    ap.add_argument("--skip-download", action="store_true",
                    help="validate whatever is already in --models-dir")
    ap.add_argument("--fixture-dir", default=None,
                    help="serve .pth files from this dir instead of the "
                         "network (offline test hook)")
    ap.add_argument("--size", type=int, default=900,
                    help="eval slide side length (pixels)")
    ap.add_argument("--cells", type=int, default=1200,
                    help="eval slide cell count")
    ap.add_argument("--scenario", choices=["reference", "imputed", "both"],
                    default="both")
    ap.add_argument("--out", default=os.path.join(
        REPO, "real_checkpoint_report.json"))
    args = ap.parse_args(argv)

    from ribca_tpu.models.download import CHECKPOINT_URLS, download_models
    from ribca_tpu.models.registry import DEFAULT_MODELS_DIR
    from ribca_tpu.panels.vocab import PANELS
    from ribca_tpu.utils.wire import probe, probe_line

    models_dir = args.models_dir or DEFAULT_MODELS_DIR
    report: dict = {"models_dir": models_dir}

    try:
        report["wire_probe"] = probe(size_mb=32)
        print(probe_line(report["wire_probe"]), file=sys.stderr)
    except Exception as e:  # no device — CPU-only validation still works
        report["wire_probe"] = {"error": repr(e)}

    if not args.skip_download:
        opener = _fixture_opener(args.fixture_dir) if args.fixture_dir \
            else None
        status = download_models(models_dir, convert=True, opener=opener)
        report["download"] = status
        for name, st in status.items():
            print(f"  {name}: {st}", file=sys.stderr)
    else:
        report["download"] = "skipped"

    missing = [
        name for name in CHECKPOINT_URLS
        if not (
            os.path.exists(os.path.join(models_dir, name))
            or os.path.exists(
                os.path.join(models_dir, name.replace(".pth", ".npz")))
        )
    ]
    report["missing"] = missing
    if missing:
        report["verdict"] = "MISSING_CHECKPOINTS"
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"MISSING {len(missing)} checkpoint(s): {missing}\n"
              f"report -> {args.out}", file=sys.stderr)
        return 2

    # the torch mirror loads .pth directly; with only the converted .npz
    # store on disk the kit still runs both Annotator dtypes and reports
    # the real-weight bf16 agreement — the mirror diff is marked skipped
    pth_missing = [
        n for n in CHECKPOINT_URLS
        if not os.path.exists(os.path.join(models_dir, n))
    ]
    mirror_ok = not pth_missing
    if pth_missing:
        report["mirror_skipped"] = (
            f".pth absent ({pth_missing}); npz-only run — torch mirror "
            "diff unavailable"
        )
        print(report["mirror_skipped"], file=sys.stderr)

    work_dir = os.path.join(
        os.environ.get("RIBCA_REALCK_DIR", "/tmp/ribca_realck"))
    scenarios = {}
    if args.scenario in ("reference", "both"):
        scenarios["reference_markers"] = (REFERENCE_EXAMPLE_MARKERS, False)
    if args.scenario in ("imputed", "both"):
        union = sorted({m for v in PANELS.values() for m in v})
        imputed = [m for m in union if m not in ("Granzyme B", "Trypase")]
        scenarios["imputed_full"] = (imputed, True)

    ok = True
    for name, (markers, infer) in scenarios.items():
        res = run_scenario(
            name, markers, work_dir=work_dir, models_dir=models_dir,
            size=args.size, n_cells=args.cells, infer=infer,
            mirror=mirror_ok,
        )
        bf = res["bf16_vs_f32"]
        line = (
            f"[{name}] bf16-vs-f32 {bf['label_agreement']:.4f} "
            f"({bf['n_flips']} flips, conf |d| {bf['conf_max_delta']:.2g})"
        )
        if mirror_ok:
            tm = res["torch_mirror_vs_f32"]
            scenario_ok = tm["label_agreement"] == 1.0
            res["pass"] = scenario_ok
            ok = ok and scenario_ok
            line = (
                f"[{name}] mirror agreement {tm['label_agreement']:.4f} "
                f"({tm['n_flips']} flips, conf |d| "
                f"{tm['conf_max_delta']:.2g}); " + line.split("] ", 1)[1]
            )
        report.setdefault("scenarios", {})[name] = res
        print(line, file=sys.stderr)

    report["verdict"] = (
        ("PASS" if ok else "FAIL") if mirror_ok else "NPZ_ONLY"
    )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"{report['verdict']} — report -> {args.out}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
