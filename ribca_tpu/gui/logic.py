"""Headless GUI logic: validation, JSON handoff, marker auto-extraction.

Everything the napari widgets (_widget.py in the reference) do that is not
literally Qt lives here so it can run and be tested without a display:

* hyperparameter JSON writing for the worker handoff
  (_widget.py:486-497 single / 110-120 batch);
* path validation with human-readable errors (_widget.py:563-594);
* OME/QPTIFF marker auto-extraction to ``AUTOMATIC_markers_{single,
  batch}.txt`` (_widget.py:249-326,664-759);
* GUI-JSON prefill parsing (_widget.py:614-640);
* the run-worker functions the widgets launch on napari threads.
"""

from __future__ import annotations

import json
import os

from ribca_tpu.io.metadata import extract_markers, write_marker_txt

WORKING_DIR_NAME = "_working_dir_temp"

# canonical napari layer names (reference _widget.py:670,797)
IMAGE_LAYER_NAME = "multiplexed_image"
MASK_LAYER_NAME = "cell_mask"

# magicgui widget options of the params panel, field by field
# (reference _widget.py:505-518; 'tpu' replaces 'cuda' as the accelerator)
PANEL_WIDGET_OPTIONS: dict[str, dict] = {
    "device": {"choices": ["tpu", "cpu"]},
    "batch_size": {"min": 1, "max": 10000, "step": 16},
    "blur": {"widget_type": "FloatSlider", "min": 0.0, "max": 1.0},
    "upper_limit": {"widget_type": "FloatSlider", "min": 95.0, "max": 100.0},
    "cell_size": {"min": 1, "max": 100},
    "min_cells": {"min": -1, "max": 10000},
    "n_regions": {"min": -1, "max": 50},
    "confidence": {"widget_type": "FloatSlider", "min": 0.0, "max": 1.0},
}


def default_params() -> dict:
    """JSON-handoff defaults (reference gui_api.py:65-84 / main.py:56-112)."""
    return {
        "device": "tpu",
        "batch_size": 128,
        "strict": False,
        "infer": True,
        "normalize": True,
        "blur": 0.3,
        "upper_limit": 99.8,
        "confidence": 0.3,
        "cell_size": 30,
        "min_cells": -1,
        "n_regions": 3,
        "n_jobs": 0,
        "cell_type_confidence": None,
    }


def panel_defaults() -> dict:
    """Initial values of the single-image params panel. The reference GUI
    seeds min_cells=50, n_regions=5, blur=0.4 (_widget.py:524-534) —
    deliberately different from the job-API defaults."""
    return {**default_params(), "min_cells": 50, "n_regions": 5,
            "blur": 0.4}


def layer_delete_updates(layer_name: str) -> dict:
    """Field resets when a napari layer is deleted (_widget.py:850-858):
    removing the image/mask layer clears the corresponding file pick."""
    if layer_name == IMAGE_LAYER_NAME:
        return {"image_file": None}
    if layer_name == MASK_LAYER_NAME:
        return {"mask_file": None}
    return {}


INTENSITY_PLACEHOLDER = (
    "Cell-level expression intensity has been detected.\n"
    "It will be displayed here.\n"
    "PLEASE SELECT MASK LAYER TO USE THIS FUNCTION."
)


def format_intensity(markers, intensity) -> str:
    """Per-cell intensity readout text (_widget.py:807-827): 4 significant
    digits, comma-separated, newline every 5 markers, no trailing comma."""
    if intensity is None:
        return INTENSITY_PLACEHOLDER
    txt = ""
    for idx, marker in enumerate(markers):
        txt += f"{marker}: {intensity[idx]:1.4}, "
        if idx == len(markers) - 1:
            txt = txt[:-2]
        if idx > 0 and idx % 5 == 0:
            txt += "\n"
    return txt


def collect_output_layers(working_dir: str) -> list:
    """(array, layer_name) pairs from the worker's label-map handoff
    (_widget.py:458-481): cell-type map, then tissue regions if present."""
    import numpy as np
    from PIL import Image

    out = []
    for fname, name in (("output_img.png", "cell_type_map"),
                        ("output_img_2.png", "tissue_region")):
        path = os.path.join(working_dir, fname)
        if os.path.exists(path):
            out.append((np.asarray(Image.open(path)), name))
    return out


def read_marker_names(marker_file: str) -> list[str]:
    """Marker names for the intensity readout (one per line)."""
    with open(marker_file) as f:
        return [ln.strip() for ln in f if ln.strip()]


def validate_single_params(marker_file, image_file, mask_file, main_dir):
    """Returns a list of error strings; empty means runnable
    (_widget.py:563-594 checks)."""
    errors = []
    if not marker_file or not os.path.isfile(marker_file):
        errors.append("Please provide a valid marker file.")
    if not image_file or not os.path.isfile(image_file):
        errors.append("Please provide a valid image file.")
    if not mask_file or not os.path.isfile(mask_file):
        errors.append("Please provide a valid mask file.")
    if not main_dir or not os.path.isdir(main_dir):
        errors.append("Please provide a valid main directory.")
    return errors


def validate_batch_params(marker_file, csv_file, main_dir):
    errors = []
    if not marker_file or not os.path.isfile(marker_file):
        errors.append("Please provide a valid marker file.")
    if not csv_file or not os.path.isfile(csv_file):
        errors.append("Please provide a valid batch csv file.")
    if not main_dir or not os.path.isdir(main_dir):
        errors.append("Please provide a valid main directory.")
    return errors


def auto_extract_markers(image_path: str, out_dir: str,
                         batch: bool = False) -> str | None:
    """OME/QPTIFF marker auto-extraction; writes AUTOMATIC_markers_*.txt
    next to the run and returns its path (None when no metadata found)."""
    names = extract_markers(image_path)
    if not names:
        return None
    suffix = "batch" if batch else "single"
    out = os.path.join(out_dir, f"AUTOMATIC_markers_{suffix}.txt")
    return write_marker_txt(names, out)


def prepare_working_dir(main_dir: str) -> str:
    wd = os.path.join(main_dir, WORKING_DIR_NAME)
    os.makedirs(wd, exist_ok=True)
    return wd


def write_single_handoff(working_dir: str, params: dict) -> str:
    """hyperparams.json for gui_api (gui_api.py:62-84 key set)."""
    path = os.path.join(working_dir, "hyperparams.json")
    with open(path, "w") as f:
        json.dump(params, f, indent=2)
    return path


def write_batch_handoff(working_dir: str, params: dict) -> str:
    path = os.path.join(working_dir, "hyperparams_batch.json")
    with open(path, "w") as f:
        json.dump(params, f, indent=2)
    return path


def load_prefill_json(path: str) -> dict:
    """User-facing hyperparameters.json prefill (_widget.py:614-640):
    unknown keys ignored, known keys override the defaults."""
    with open(path) as f:
        raw = json.load(f)
    params = default_params()
    for k in list(params):
        if k in raw and raw[k] is not None:
            params[k] = raw[k]
    for k in ("marker_file", "image_file", "mask_file", "csv_file",
              "main_dir", "batch_id"):
        if raw.get(k):
            params[k] = raw[k]
    return params


def run_single(working_dir: str):
    """Worker-thread body for the single-image flow: delegates to the JSON
    job API and returns (intensity_dict, legend_text)."""
    from ribca_tpu.api.gui_api import gui_api

    return gui_api(working_dir)


def run_batch(working_dir: str) -> None:
    """Worker-thread body for the batch flow; writes output.txt sentinel."""
    from ribca_tpu.api.gui_api import batch_process

    batch_process(working_dir)


def batch_completed(working_dir: str) -> bool:
    """Sentinel check the batch widget polls (_widget.py:90-105)."""
    return os.path.exists(os.path.join(working_dir, "output.txt"))
