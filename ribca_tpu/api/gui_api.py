"""File-based JSON job API — the GUI <-> pipeline handoff protocol.

Protocol parity with the reference ``gui_api.py``:

* ``gui_run`` / ``gui_batch_run``: run the canonical pipeline sequence
  (gui_api.py:13-59 — heatmap, region analysis when n_regions > 0,
  neighborhood, export, colorize with GUI label maps, composition) and,
  for single runs, return ``({cell_id: intensity_vector}, legend_text)``
  with the 0 key holding a zero vector (gui_api.py:37-43);
* ``gui_api(working_dir)`` reads ``hyperparams.json`` (keys
  gui_api.py:65-82, batch_id forced to "single_run");
* ``batch_process(working_dir)`` reads ``hyperparams_batch.json`` and
  writes the ``output.txt`` completion sentinel (gui_api.py:112-114).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ribca_tpu.api.annotator import Annotator
from ribca_tpu.io.manifest import write_manifest
from ribca_tpu.utils.config import AnnotatorConfig


def _pipeline(annotator: Annotator, bs, n_regions, working_dir=None):
    annotator.preprocess()
    annotator.predict(bs)
    annotator.generate_heatmap(integrate=True)
    # overlap the region-independent colorized-map render with the
    # device-bound analytics stages (annotator.colorize_prefetch)
    annotator.colorize_prefetch(from_script=working_dir is None,
                                working_dir=working_dir)
    if n_regions and n_regions > 0:
        annotator.tissue_region_analysis(n_regions)
    annotator.neighborhood_analysis(integrate=True, normalize=True)
    annotator.export_annotations()
    annotator.colorize(from_script=working_dir is None,
                       working_dir=working_dir)
    annotator.cell_type_composition()
    annotator.clear_tmp()


def gui_run(
    marker_list_path, image_path, mask_path, device, main_dir, batch_id,
    bs, strict, infer, min_cells, n_regions, normalize, blur, amax,
    confidence, cell_size, cell_type_confidence, n_jobs=0,
    working_dir=None,
):
    csv_path = os.path.join(main_dir, "images.csv")
    write_manifest([(image_path, mask_path)], csv_path)
    config = AnnotatorConfig(
        marker_file=marker_list_path, csv_file=csv_path, device=device,
        main_dir=main_dir, batch_id=batch_id, strict=bool(strict),
        infer=bool(infer), min_cells=min_cells, normalize=bool(normalize),
        blur=blur or 0.0, upper_limit=amax, confidence=confidence,
        cell_size=cell_size, cell_type_confidence=cell_type_confidence,
        n_jobs=n_jobs,
    )
    annotator = Annotator(config)
    if not annotator.channel_parser.any_panel:
        raise ValueError("No panels are applied. Please check the marker list.")
    _pipeline(annotator, bs, n_regions, working_dir=working_dir)
    os.remove(csv_path)

    intensity = annotator.intensity_full[0]
    # keyed by the TRUE cell ids (the reference keys i+1 assuming the mask
    # ids are 1..N contiguous, gui_api.py:38-42 — wrong for sparse masks;
    # identical for the contiguous masks its GUI produces)
    intensity_dict = {0: np.zeros(intensity.shape[1], intensity.dtype)}
    for j, cid in enumerate(annotator.records[0].cell_ids):
        intensity_dict[int(cid)] = intensity[j]
    return intensity_dict, annotator.get_cell_type_names()


def gui_batch_run(
    marker_list_path, image_path, device, main_dir, batch_id, bs, strict,
    infer, min_cells, n_regions, normalize, blur, amax, confidence,
    cell_size, cell_type_confidence, n_jobs=0,
):
    config = AnnotatorConfig(
        marker_file=marker_list_path, csv_file=image_path, device=device,
        main_dir=main_dir, batch_id=batch_id, strict=bool(strict),
        infer=bool(infer), min_cells=min_cells, normalize=bool(normalize),
        blur=blur or 0.0, upper_limit=amax, confidence=confidence,
        cell_size=cell_size, cell_type_confidence=cell_type_confidence,
        n_jobs=n_jobs,
    )
    annotator = Annotator(config)
    if not annotator.channel_parser.any_panel:
        raise ValueError("No panels are applied. Please check the marker list.")
    _pipeline(annotator, bs, n_regions)
    return annotator


def gui_api(working_addr: str):
    """Single-image worker entry: reads <working_addr>/hyperparams.json."""
    with open(os.path.join(working_addr, "hyperparams.json")) as f:
        hp = json.load(f)
    return gui_run(
        hp.get("marker_file"), hp.get("image_file"), hp.get("mask_file"),
        hp.get("device"), hp.get("main_dir"), "single_run",
        hp.get("batch_size"), hp.get("strict"), hp.get("infer"),
        hp.get("min_cells"), hp.get("n_regions"), hp.get("normalize"),
        hp.get("blur"), hp.get("upper_limit"), hp.get("confidence"),
        hp.get("cell_size"), hp.get("cell_type_confidence"),
        n_jobs=hp.get("n_jobs", 0), working_dir=working_addr,
    )


def batch_process(working_dir: str) -> None:
    """Batch worker entry: reads hyperparams_batch.json, writes the
    output.txt completion sentinel."""
    with open(os.path.join(working_dir, "hyperparams_batch.json")) as f:
        hp = json.load(f)
    gui_batch_run(
        hp.get("marker_file"), hp.get("csv_file"), hp.get("device"),
        hp.get("main_dir"), hp.get("batch_id"), hp.get("batch_size"),
        hp.get("strict"), hp.get("infer"), hp.get("min_cells"),
        hp.get("n_regions"), hp.get("normalize"), hp.get("blur"),
        hp.get("upper_limit"), hp.get("confidence"), hp.get("cell_size"),
        hp.get("cell_type_confidence"), n_jobs=hp.get("n_jobs", 0),
    )
    with open(os.path.join(working_dir, "output.txt"), "w") as f:
        f.write("Batch process completed")
