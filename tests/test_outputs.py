"""Output writers: color parity, LUT colorize vs per-cell paint oracle,
CSV golden format, figure smoke tests."""

import numpy as np
import pytest

from ribca_tpu.outputs.colorize import colorize_image
from ribca_tpu.outputs.colors import (
    color_legend,
    get_colors,
    number_to_rgb,
    rgb_to_hex,
    viridis_lut,
)
from ribca_tpu.outputs.export import export_annotations_csv
from ribca_tpu.outputs.plots import composition_pie, marker_heatmap, umap_scatter
from tests.synth import make_cells


def test_get_colors_small_matches_reference_palette():
    got = get_colors(5)
    assert got == [
        (255, 0, 0), (0, 0, 255), (0, 128, 0), (255, 255, 0),
        (192, 192, 192),
    ]
    assert get_colors(1) == [(192, 192, 192)]


def test_get_colors_large_golden_sequence():
    """Golden test of the HSV extension (utils.py:84-106 semantics)."""
    import colorsys

    got = get_colors(25)
    assert len(got) == 25
    assert got[-1] == (192, 192, 192)
    # recompute color 20 (first golden-ratio color) independently
    h = (0.1 + 0.618033988749895) % 1.0
    s = [0.7, 0.8, 0.9, 1.0][19 % 4]
    v = [0.7, 0.8, 0.9, 1.0][19 % 4]
    r, g, b = colorsys.hsv_to_rgb(h, s, v)
    assert got[19] == (int(r * 255), int(g * 255), int(b * 255))


def test_rgb_hex_and_viridis():
    assert rgb_to_hex((255, 0, 128)) == "#ff0080"
    assert number_to_rgb(0.0) == list(viridis_lut(np.asarray([1e-9]))[0])
    with pytest.raises(ValueError):
        number_to_rgb(1.5)
    # rejected cells (conf <= 0) paint gray
    assert list(viridis_lut(np.asarray([-1.0]))[0]) == [192, 192, 192]
    np.testing.assert_array_equal(
        viridis_lut(np.asarray([0.5]))[0], number_to_rgb(0.5)
    )


def test_colorize_matches_per_cell_paint(rng):
    mask, _ = make_cells(h=60, w=70, n_cells=6)
    ids = np.arange(1, 7)
    type_ids = np.asarray([0, 1, 2, 0, 1, 2])
    conf = np.asarray([0.9, -1.0, 0.5, 0.2, 0.7, -1.0], np.float32)
    colors = get_colors(3)
    # cell 5 is HDBSCAN noise (region -1): reserved gray + distinct label
    regions = {int(i): (-1 if i == 5 else int(i % 2)) for i in ids}
    tissue_colors = get_colors(3)

    maps = colorize_image(mask, ids, type_ids, conf, colors,
                          tissue_regions=regions,
                          tissue_colors=tissue_colors)

    # oracle: python paint loops (model.py:824-837)
    h, w = mask.shape
    want_rgb = np.zeros((h, w, 3), np.uint8)
    want_conf = np.zeros((h, w, 3), np.uint8)
    want_lab = np.zeros((h, w), np.uint8)
    want_t = np.zeros((h, w, 3), np.uint8)
    want_tl = np.zeros((h, w), np.uint8)
    n_regions = len(tissue_colors) - 1
    for j, cid in enumerate(ids):
        rr, cc = np.nonzero(mask == cid)
        want_rgb[rr, cc] = colors[type_ids[j]]
        want_conf[rr, cc] = (
            number_to_rgb(float(conf[j])) if conf[j] > 0 else [192, 192, 192]
        )
        want_lab[rr, cc] = type_ids[j] + 1
        if regions[int(cid)] < 0:
            want_t[rr, cc] = [192, 192, 192]
            want_tl[rr, cc] = n_regions + 1
        else:
            want_t[rr, cc] = tissue_colors[regions[int(cid)]]
            want_tl[rr, cc] = regions[int(cid)] + 1

    np.testing.assert_array_equal(maps["cell_type_rgb"], want_rgb)
    np.testing.assert_array_equal(maps["confidence_rgb"], want_conf)
    np.testing.assert_array_equal(maps["cell_type_labels"], want_lab)
    np.testing.assert_array_equal(maps["tissue_rgb"], want_t)
    np.testing.assert_array_equal(maps["tissue_labels"], want_tl)

    # script runs skip the GUI-only label maps entirely
    lean = colorize_image(mask, ids, type_ids, conf, colors,
                          tissue_regions=regions,
                          tissue_colors=tissue_colors, want_labels=False)
    assert "cell_type_labels" not in lean and "tissue_labels" not in lean
    np.testing.assert_array_equal(lean["cell_type_rgb"], want_rgb)
    np.testing.assert_array_equal(lean["tissue_rgb"], want_t)


def test_export_csv_golden(tmp_path):
    path = str(tmp_path / "ann.csv")
    export_annotations_csv(
        path,
        cell_ids=[1, 2],
        labels=["B cell", "Others"],
        confidence=[0.87654, -1.0],
        mean_row=[10.125, 20.5],
        mean_col=[3.14159, 4.0],
        tissue_regions={1: 0, 2: 2},
    )
    lines = open(path).read().splitlines()
    assert lines[0] == "Cell Index,Cell Type,Confidence,Row,Column,Tissue Region"
    assert lines[1] == "1,B cell,0.877,10.12,3.14,Region 0"
    assert lines[2] == "2,Others,-1.0,20.5,4.0,Region 2"

    path2 = str(tmp_path / "ann2.csv")
    export_annotations_csv(
        path2, [5], ["Nerve cell"], [0.5], [1.0], [2.0], None
    )
    assert open(path2).read().splitlines()[1] == "5,Nerve cell,0.5,1.0,2.0,None"


def test_figure_writers_smoke(rng, tmp_path):
    labels = ["A"] * 10 + ["B"] * 10
    intensity = rng.uniform(size=(20, 5))
    cell_types = np.asarray(["A", "B"], dtype=object)
    colors = get_colors(2)
    assert marker_heatmap(
        str(tmp_path / "h.png"), labels, intensity,
        [f"m{i}" for i in range(5)],
    )
    assert composition_pie(
        str(tmp_path / "p.png"), labels, cell_types, colors
    )
    assert umap_scatter(
        str(tmp_path / "u.png"), intensity, labels, cell_types, colors,
        seed=0,
    )
    assert color_legend(str(tmp_path), {"A": "#ff0000", "B": "#0000ff"})
    assert (tmp_path / "h.png").exists()
    assert (tmp_path / "p.png").exists()
    assert (tmp_path / "u.png").exists()
    assert (tmp_path / "cell_color_legend.png").exists()


def test_save_png_pixel_identical_across_levels(rng, tmp_path, monkeypatch):
    """save_png drops to deflate level 1 for whole-slide maps; the pixels
    must be identical to the default-level encode either way."""
    from PIL import Image

    from ribca_tpu.outputs import colorize as cz

    arr = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    # force the fast path on a small array, then compare to default
    monkeypatch.setattr(cz, "_FAST_PNG_THRESHOLD", 1)
    fast = str(tmp_path / "fast.png")
    cz.save_png(fast, arr)
    monkeypatch.setattr(cz, "_FAST_PNG_THRESHOLD", 10**12)
    slow = str(tmp_path / "slow.png")
    cz.save_png(slow, arr)
    a = np.asarray(Image.open(fast))
    b = np.asarray(Image.open(slow))
    assert np.array_equal(a, arr)
    assert np.array_equal(b, arr)

    # grayscale label maps take the same path
    lab = rng.integers(0, 7, size=(32, 32), dtype=np.uint8)
    monkeypatch.setattr(cz, "_FAST_PNG_THRESHOLD", 1)
    p = str(tmp_path / "lab.png")
    cz.save_png(p, lab)
    assert np.array_equal(np.asarray(Image.open(p)), lab)
