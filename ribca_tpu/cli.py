"""Command-line front end — flag parity with the reference ``main.py``.

Same flags, names, and defaults (main.py:56-112); same single-image /
batch-CSV mode split (main.py:9-52). The post-run sequence follows the
canonical GUI ordering (region analysis before export, gui_api.py:22-31)
so the CSV's Tissue Region column is populated — the reference CLI runs
export first and always writes ``None`` there (SURVEY §3.1); pass
``--reference-ordering`` to reproduce that behavior exactly.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ribca_tpu.api.annotator import Annotator
from ribca_tpu.io.manifest import write_manifest
from ribca_tpu.utils.config import AnnotatorConfig


def _run_pipeline(annotator: Annotator, bs: int, n_regions: int,
                  reference_ordering: bool = False):
    annotator.preprocess()
    annotator.predict(bs)
    # render the annotation-only figures (marker heatmap + composition
    # pies) and the region-independent colorized maps on host threads
    # while the device computes tissue regions / neighborhoods;
    # generate_heatmap()/colorize()/cell_type_composition() below join
    # and skip (or finish) the remaining pieces
    annotator.plots_prefetch(heatmap_integrate=True)
    annotator.colorize_prefetch(from_script=True)
    if reference_ordering:
        annotator.export_annotations()
        if n_regions > 0:
            annotator.tissue_region_analysis(n_regions)
    else:
        if n_regions > 0:
            annotator.tissue_region_analysis(n_regions)
        annotator.export_annotations()
    annotator.generate_heatmap(integrate=True)
    annotator.neighborhood_analysis(integrate=True, normalize=True)
    annotator.colorize(from_script=True)
    annotator.cell_type_composition()
    annotator.clear_tmp()


def run(config: AnnotatorConfig, bs: int, n_regions: int,
        reference_ordering: bool = False):
    """Single-image mode: writes a 1-row images.csv then delegates
    (main.py:9-36); returns ({cell_id: intensity_vector}, legend text)."""
    os.makedirs(config.main_dir, exist_ok=True)
    csv_path = os.path.join(config.main_dir, "images.csv")
    write_manifest([(config.image_path, config.mask_path)], csv_path)
    config = AnnotatorConfig(**{
        **config.to_dict(), "csv_file": csv_path,
        "image_path": None, "mask_path": None,
    })
    annotator = Annotator(config)
    if not annotator.channel_parser.any_panel:
        raise ValueError("No panels are applied. Please check the marker list.")
    _run_pipeline(annotator, bs, n_regions, reference_ordering)

    intensity = annotator.intensity_full[0]
    intensity_dict = {0: np.zeros(intensity.shape[1], intensity.dtype)}
    for j, cid in enumerate(annotator.records[0].cell_ids):
        intensity_dict[int(cid)] = intensity[j]
    names = annotator.get_cell_type_names()
    os.remove(csv_path)
    return intensity_dict, names


def batch_run(config: AnnotatorConfig, bs: int, n_regions: int,
              reference_ordering: bool = False):
    """Batch-CSV mode (main.py:39-52)."""
    annotator = Annotator(config)
    if not annotator.channel_parser.any_panel:
        raise ValueError("No panels are applied. Please check the marker list.")
    _run_pipeline(annotator, bs, n_regions, reference_ordering)
    return annotator


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Process images with markers"
    )
    # required for runs; server jobs carry their own (validated post-parse)
    parser.add_argument("--marker-list-path", type=str, default=None)
    parser.add_argument("--device", type=str, default="tpu",
                        help="Device to run on (tpu/cpu)")
    parser.add_argument("--main-dir", type=str, default="./")
    parser.add_argument("--batch-id", type=str, default=None)
    parser.add_argument("--strict", action="store_true")
    parser.add_argument("--infer", action="store_true", default=True)
    parser.add_argument("--min-cells", type=int, default=-1)
    parser.add_argument("--n-regions", type=int, default=3)
    parser.add_argument("--normalize", action="store_true", default=True)
    parser.add_argument("--blur", type=float, default=0.3)
    parser.add_argument("--amax", type=float, default=99.8)
    parser.add_argument("--confidence", type=float, default=0.3)
    parser.add_argument("--cell-type-confidence", type=str, default=None,
                        help="JSON file with per-type thresholds")
    parser.add_argument("--bs", type=int, default=128)
    parser.add_argument("--cell-size", type=int, default=30)
    parser.add_argument("--n_jobs", type=int, default=0)
    parser.add_argument("--reference-ordering", action="store_true",
                        help="Reproduce the reference CLI stage order "
                             "(export before region analysis)")
    parser.add_argument("--warm-cache", action="store_true",
                        help="Pre-compile the program ladder into the "
                             "persistent XLA cache before (or instead of) "
                             "running — kills cohort cold-start compiles")
    parser.add_argument("--warm-shapes", type=str, default=None,
                        help="Comma-separated HxW image sizes to warm, "
                             "e.g. 3000x3000,2048x2048 (with --warm-cache)")
    parser.add_argument("--allow-random-weights", action="store_true",
                        help="Run with RANDOM weights when checkpoints are "
                             "missing (annotations meaningless; for shape/"
                             "flow validation only). Production CLI runs "
                             "fail fast without this flag — the reference "
                             "silently skips absent panels, model.py:195")
    parser.add_argument("--models-dir", type=str, default=None,
                        help="Checkpoint directory for the model registry "
                             "(default: the package's bundled weights dir; "
                             "the reference hardcodes cwd-relative .pth "
                             "paths, model.py:189-239)")
    parser.add_argument("--serve", type=str, default=None, metavar="DIR",
                        help="Run as a persistent annotation server "
                             "draining the job-queue directory DIR "
                             "(api/server.py): compiled programs stay "
                             "resident, so every job after the first "
                             "pays zero XLA compiles. Combine with "
                             "--warm-cache to pre-compile before job #1. "
                             "Stop with a 'stop' file in DIR.")
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--image-path", type=str)
    group.add_argument("--batch-csv", type=str)
    parser.add_argument("--mask-path", type=str)

    args = parser.parse_args(argv)
    if not (args.image_path or args.batch_csv or args.warm_cache
            or args.serve):
        parser.error("one of --image-path or --batch-csv is required")
    if args.image_path and not args.mask_path:
        parser.error("--mask-path is required when using --image-path")
    if not args.serve:
        if args.marker_list_path is None:
            parser.error("--marker-list-path is required")
        if args.batch_id is None:
            parser.error("--batch-id is required")
    return args


def config_from_args(args: argparse.Namespace) -> AnnotatorConfig:
    cell_type_confidence = None
    if args.cell_type_confidence:
        import json

        with open(args.cell_type_confidence) as f:
            cell_type_confidence = json.load(f)
    return AnnotatorConfig(
        marker_file=args.marker_list_path,
        image_path=args.image_path,
        mask_path=args.mask_path,
        csv_file=args.batch_csv,
        device=args.device,
        main_dir=args.main_dir,
        batch_id=args.batch_id,
        strict=args.strict,
        infer=args.infer,
        min_cells=args.min_cells,
        n_regions=args.n_regions,
        normalize=args.normalize,
        blur=args.blur,
        upper_limit=args.amax,
        confidence=args.confidence,
        cell_size=args.cell_size,
        n_jobs=args.n_jobs,
        cell_type_confidence=cell_type_confidence,
        # the CLI is the production surface: missing checkpoints fail
        # fast unless the user explicitly opted into random weights
        # (library/bench/test callers construct AnnotatorConfig directly
        # and keep its permissive default)
        allow_random_weights=args.allow_random_weights,
        models_dir=args.models_dir,
    )


def _parse_warm_shapes(spec: str | None):
    if not spec:
        return None
    shapes = []
    for part in spec.split(","):
        h, w = part.lower().split("x")
        shapes.append((int(h), int(w)))
    return shapes


def main(argv=None):
    from ribca_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    args = parse_args(argv)
    if args.serve:
        from ribca_tpu.api.server import serve

        defaults = {}
        if args.marker_list_path:
            defaults["marker_file"] = args.marker_list_path
        if args.allow_random_weights:
            defaults["allow_random_weights"] = True
        if args.models_dir:
            defaults["models_dir"] = args.models_dir
        return serve(
            args.serve,
            defaults=defaults or None,
            warm=args.warm_cache,
            warm_shapes=_parse_warm_shapes(args.warm_shapes),
        )
    config = config_from_args(args)
    if args.warm_cache:
        warmer = Annotator(config)
        warmer.warm_cache(_parse_warm_shapes(args.warm_shapes))
        if not (args.image_path or args.batch_csv):
            return warmer
    if args.batch_csv:
        return batch_run(config, args.bs, args.n_regions,
                         args.reference_ordering)
    return run(config, args.bs, args.n_regions, args.reference_ordering)


if __name__ == "__main__":
    main()
