"""End-to-end flows through the Annotator facade, the JSON job API, and
the CLI — synthetic micro-image, deterministic random weights, shape/flow
correctness (SURVEY §4 test plan)."""

import json
import os

import numpy as np
import pytest

from ribca_tpu.api.annotator import Annotator
from ribca_tpu.api.gui_api import batch_process, gui_api
from ribca_tpu.io.manifest import write_manifest
from ribca_tpu.panels.vocab import PANELS
from ribca_tpu.utils.config import AnnotatorConfig
from tests.synth import write_fixture

N_CELLS = 9


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("run")


@pytest.fixture(scope="module")
def fixture_paths(workdir):
    img_path, mask_path, mask, img = write_fixture(
        workdir, n_channels=7, n_cells=N_CELLS, h=90, w=100
    )
    marker_file = workdir / "markers.txt"
    marker_file.write_text("\n".join(PANELS["immune_base"]) + "\n")
    return img_path, mask_path, str(marker_file)


@pytest.fixture(scope="module")
def ran_annotator(workdir, fixture_paths):
    img_path, mask_path, marker_file = fixture_paths
    main_dir = workdir / "main"
    main_dir.mkdir()
    csv = str(main_dir / "images.csv")
    write_manifest([(img_path, mask_path)], csv)
    cfg = AnnotatorConfig(
        marker_file=marker_file, csv_file=csv, main_dir=str(main_dir),
        batch_id="t", infer=False, dtype="float32", n_regions=2,
    )
    ann = Annotator(cfg, models_dir=str(workdir / "nomodels"))
    ann.preprocess()
    ann.predict()
    return ann


def test_predict_populates_state(ran_annotator):
    ann = ran_annotator
    assert len(ann.annotations) == 1
    assert len(ann.annotations[0]) == N_CELLS
    assert ann.confidence[0].shape == (N_CELLS,)
    assert str(ann.cell_types[-1]) == "Others"
    assert len(ann.colors) == len(ann.cell_types)
    assert os.path.exists(os.path.join(ann.result_dir, "log.txt"))
    assert os.path.exists(
        os.path.join(ann.result_dir, "cell_color_legend.png")
    )
    # annotations_all records (model.py:464-478 shape)
    rec = ann.annotations_all[0][0]
    assert set(rec) == {"Cell ID", "Cell type", "Confidence", "Row", "Column"}


def test_outputs_and_analytics(ran_annotator):
    ann = ran_annotator
    ann.generate_heatmap(integrate=True)
    ann.tissue_region_analysis(2)
    ann.neighborhood_analysis(integrate=True, normalize=True)
    ann.export_annotations()
    ann.colorize(from_script=True)
    ann.cell_type_composition()
    ann.umap_visualization()
    rd = ann.result_dir
    for name in [
        "t_Integrated_heatmap.png",
        "t_integrated_neighborhood.png",
        "t_integrated_neighborhood.csv",
        "t_annotation_0.csv",
        "t_colorized_annotation_0.png",
        "t_confidence_0.png",
        "t_tissue_region_0.png",
        "t_cell-type_composition_0.png",
        "t_umap.png",
        "tissue_region_color_legend.png",
    ]:
        assert os.path.exists(os.path.join(rd, name)), name
    lines = open(os.path.join(rd, "t_annotation_0.csv")).read().splitlines()
    assert len(lines) == N_CELLS + 1
    # canonical ordering populates the region column
    assert not lines[1].endswith(",None")
    legend = ann.get_cell_type_names()
    assert "1: " in legend


def test_clear_tmp(ran_annotator):
    ann = ran_annotator
    assert os.path.isdir(ann.temp_dir)
    ann.clear_tmp()
    assert not os.path.isdir(ann.temp_dir)


def test_gui_api_protocol(workdir, fixture_paths):
    img_path, mask_path, marker_file = fixture_paths
    wd = workdir / "guiwd"
    wd.mkdir()
    main_dir = workdir / "guimain"
    main_dir.mkdir()
    hp = {
        "marker_file": marker_file, "image_file": img_path,
        "mask_file": mask_path, "device": "cpu",
        "main_dir": str(main_dir), "batch_size": 64, "strict": True,
        "infer": False, "min_cells": -1, "n_regions": 0,
        "normalize": True, "blur": 0.3, "upper_limit": 99.8,
        "confidence": 0.3, "cell_size": 30, "cell_type_confidence": None,
    }
    (wd / "hyperparams.json").write_text(json.dumps(hp))
    intensity_dict, names = gui_api(str(wd))
    assert set(intensity_dict) == set(range(0, N_CELLS + 1))
    assert np.all(intensity_dict[0] == 0)
    assert intensity_dict[1].shape == (7,)
    assert "1: " in names
    # GUI label maps written into the working dir (model.py:845-858)
    assert (wd / "output_img.png").exists()
    assert not (main_dir / "images.csv").exists()


def test_batch_process_sentinel(workdir, fixture_paths):
    img_path, mask_path, marker_file = fixture_paths
    wd = workdir / "batchwd"
    wd.mkdir()
    main_dir = workdir / "batchmain"
    main_dir.mkdir()
    csv = str(main_dir / "batch.csv")
    write_manifest([(img_path, mask_path), (img_path, mask_path)], csv)
    hp = {
        "marker_file": marker_file, "csv_file": csv, "device": "cpu",
        "main_dir": str(main_dir), "batch_id": "b", "batch_size": 64,
        "strict": True, "infer": False, "min_cells": -1, "n_regions": 0,
        "normalize": True, "blur": 0.3, "upper_limit": 99.8,
        "confidence": 0.3, "cell_size": 30, "cell_type_confidence": None,
    }
    (wd / "hyperparams_batch.json").write_text(json.dumps(hp))
    batch_process(str(wd))
    assert (wd / "output.txt").read_text() == "Batch process completed"
    rd = main_dir / "results"
    assert (rd / "b_annotation_0.csv").exists()
    assert (rd / "b_annotation_1.csv").exists()


def test_cli_single_image(workdir, fixture_paths):
    from ribca_tpu.cli import main

    img_path, mask_path, marker_file = fixture_paths
    main_dir = workdir / "climain"
    main_dir.mkdir()
    argv = [
        "--marker-list-path", marker_file,
        "--image-path", img_path,
        "--mask-path", mask_path,
        "--device", "cpu",
        "--main-dir", str(main_dir),
        "--batch-id", "cli",
        "--n-regions", "0",
        "--bs", "64",
    ]
    # production CLI fails fast when checkpoints are missing unless the
    # user explicitly opts into random weights (VERDICT r2 #7)
    with pytest.raises(ValueError, match="No classifier heads"):
        main(argv)
    intensity_dict, names = main(argv + ["--allow-random-weights"])
    assert set(intensity_dict) == set(range(0, N_CELLS + 1))
    assert (main_dir / "results" / "cli_annotation_0.csv").exists()
    # random-weight runs are marked in both log.txt and trace.json
    import json as _json

    assert "RANDOM_WEIGHTS" in (main_dir / "results" / "log.txt").read_text()
    trace = _json.loads((main_dir / "results" / "trace.json").read_text())
    assert trace.get("random_weights") is True


def test_min_cells_triggers_discovery(workdir, fixture_paths):
    """min_cells > 0 routes Others cells through discovery (shape only)."""
    img_path, mask_path, marker_file = fixture_paths
    main_dir = workdir / "extramain"
    main_dir.mkdir()
    csv = str(main_dir / "images.csv")
    write_manifest([(img_path, mask_path)], csv)
    cfg = AnnotatorConfig(
        marker_file=marker_file, csv_file=csv, main_dir=str(main_dir),
        batch_id="x", infer=False, dtype="float32", min_cells=3,
        confidence=2.0,  # force every cell to Others
    )
    ann = Annotator(cfg, models_dir=str(main_dir / "nomodels"))
    ann.preprocess()
    ann.predict()
    # 9 cells <= 10 samples -> all remain Others with confidence -1
    assert all(
        l == "Others" or l.startswith("Additional type")
        for l in ann.annotations[0]
    )
    assert np.all(ann.confidence[0] == -1)


def test_colorize_prefetch_matches_direct(workdir, fixture_paths):
    """colorize_prefetch + colorize produces byte-identical maps to the
    direct colorize call, with the tissue maps rendered post-join."""
    img_path, mask_path, marker_file = fixture_paths
    outs = {}
    for tag, prefetch in (("direct", False), ("pre", True)):
        main_dir = workdir / f"cpf_{tag}"
        main_dir.mkdir()
        csv = str(main_dir / "images.csv")
        write_manifest([(img_path, mask_path)], csv)
        cfg = AnnotatorConfig(
            marker_file=marker_file, csv_file=csv, main_dir=str(main_dir),
            batch_id="c", infer=False, dtype="float32", n_regions=2,
        )
        ann = Annotator(cfg, models_dir=str(workdir / "nomodels"))
        ann.preprocess()
        ann.predict()
        if prefetch:
            ann.colorize_prefetch(from_script=True)
        ann.tissue_region_analysis(2)
        ann.colorize(from_script=True)
        outs[tag] = {
            name: (main_dir / "results" / f"c_{name}_0.png").read_bytes()
            for name in ("colorized_annotation", "confidence",
                         "tissue_region")
        }
        assert ann._colorize_thread is None
    assert outs["direct"] == outs["pre"]


def test_colorize_prefetch_arg_mismatch_falls_back(workdir, fixture_paths):
    """A prefetch with different args is discarded: colorize re-renders
    everything itself (no missing maps)."""
    img_path, mask_path, marker_file = fixture_paths
    main_dir = workdir / "cpf_mismatch"
    main_dir.mkdir()
    csv = str(main_dir / "images.csv")
    write_manifest([(img_path, mask_path)], csv)
    cfg = AnnotatorConfig(
        marker_file=marker_file, csv_file=csv, main_dir=str(main_dir),
        batch_id="m", infer=False, dtype="float32",
    )
    ann = Annotator(cfg, models_dir=str(workdir / "nomodels"))
    ann.preprocess()
    ann.predict()
    ann.colorize_prefetch(from_script=True,
                          working_dir=str(main_dir / "elsewhere"))
    ann.colorize(from_script=True)  # default working_dir: args differ
    rd = main_dir / "results"
    assert (rd / "m_colorized_annotation_0.png").exists()
    assert (rd / "m_confidence_0.png").exists()


def test_plots_prefetch_matches_direct(workdir, fixture_paths):
    """plots_prefetch + the normal generate_heatmap/cell_type_composition
    calls produce byte-identical figures to the direct calls, rendered
    once (the prefetch thread's output is reused, not re-rendered)."""
    img_path, mask_path, marker_file = fixture_paths
    outs = {}
    for tag, prefetch in (("direct", False), ("pre", True)):
        main_dir = workdir / f"ppf_{tag}"
        main_dir.mkdir()
        csv = str(main_dir / "images.csv")
        write_manifest([(img_path, mask_path)], csv)
        cfg = AnnotatorConfig(
            marker_file=marker_file, csv_file=csv, main_dir=str(main_dir),
            batch_id="p", infer=False, dtype="float32",
        )
        ann = Annotator(cfg, models_dir=str(workdir / "nomodels"))
        ann.preprocess()
        ann.predict()
        if prefetch:
            ann.plots_prefetch(heatmap_integrate=True)
        ann.generate_heatmap(integrate=True)
        ann.cell_type_composition()
        rd = main_dir / "results"
        outs[tag] = {
            name: (rd / name).read_bytes()
            for name in ("p_Integrated_heatmap.png",
                         "p_cell-type_composition_0.png")
        }
        assert ann._plots_thread is None
        if prefetch:
            assert ("heatmap", True) in ann._plots_done
            assert ("composition", True, False) in ann._plots_done
    assert outs["direct"] == outs["pre"]


def test_plots_prefetch_arg_mismatch_rerenders(workdir, fixture_paths):
    """generate_heatmap with args the prefetch did NOT cover renders the
    missing figure itself (per-image heatmaps after an integrated-only
    prefetch)."""
    img_path, mask_path, marker_file = fixture_paths
    main_dir = workdir / "ppf_mismatch"
    main_dir.mkdir()
    csv = str(main_dir / "images.csv")
    write_manifest([(img_path, mask_path)], csv)
    cfg = AnnotatorConfig(
        marker_file=marker_file, csv_file=csv, main_dir=str(main_dir),
        batch_id="q", infer=False, dtype="float32",
    )
    ann = Annotator(cfg, models_dir=str(workdir / "nomodels"))
    ann.preprocess()
    ann.predict()
    ann.plots_prefetch(heatmap_integrate=True)
    ann.generate_heatmap(integrate=False)  # not covered by the prefetch
    assert (main_dir / "results" / "q_heatmap_0.png").exists()


def test_neighborhood_reuses_region_counts(ran_annotator):
    """After tissue_region_analysis the neighborhood matrices come from
    the cached fused-pass counts and must equal a fresh kNN computation
    (VERDICT r3 perf: one spatial kNN sweep per run, not two)."""
    ann = ran_annotator
    ann.tissue_region_analysis(2)
    assert ann._nbhd_counts is not None
    cached = ann.neighborhood_analysis(integrate=True, normalize=True)
    saved, ann._nbhd_counts = ann._nbhd_counts, None
    direct = ann.neighborhood_analysis(integrate=True, normalize=True)
    ann._nbhd_counts = saved
    np.testing.assert_allclose(cached[0], direct[0], atol=1e-12)
    # a non-default n_neighbors must bypass the k=24 cache, not misuse it
    odd = ann.neighborhood_analysis(
        n_neighbors=5, integrate=True, normalize=True
    )
    assert odd[0].shape == direct[0].shape
