"""Colorized map rendering via lookup tables.

The reference paints maps cell-by-cell with fancy-indexed pixel lists
(model.py:806-858) — O(cells * pixels) Python. Here every map is one LUT
gather over the instance mask: build a (max_id + 1)-entry table on host,
then ``table[mask]`` renders the full map in a single vectorized op.
Outputs are identical: cell-type RGB map, viridis confidence map (gray for
rejected), tissue-region RGB map, and the GUI label maps (type int + 1 /
region + 1, background 0).
"""

from __future__ import annotations

import numpy as np

from ribca_tpu.outputs.colors import GRAY, viridis_lut


# numpy fancy-indexing allocates an intermediate per gather; above this
# pixel count the one-pass C++ painter is distinctly faster and lighter.
_NATIVE_PAINT_THRESHOLD = 4_000_000

# Above this element count PNG deflate (PIL default level 6) dominates the
# whole colorize stage — measured 38.5 s/map at 12288^2 vs 14.1 s at
# level 1, and 0.60 s vs 0.38 s for a 3000^2 RGB cell map, with modest
# file-size growth (cell maps are large flat-color regions). Pixels are
# identical either way; only the container's compression effort differs.
_FAST_PNG_THRESHOLD = 4_000_000


def save_png(path: str, arr: np.ndarray) -> str:
    """Save an image array as PNG, dropping to deflate level 1 for
    whole-slide-sized maps (pixel-identical output, ~3x faster encode)."""
    from PIL import Image

    kw = {"compress_level": 1} if arr.size >= _FAST_PNG_THRESHOLD else {}
    Image.fromarray(arr).save(path, **kw)
    return path


def _lut_paint(mask: np.ndarray, table: np.ndarray) -> np.ndarray:
    if (
        table.ndim == 2 and table.shape[1] == 3
        and mask.size >= _NATIVE_PAINT_THRESHOLD
    ):
        try:
            from ribca_tpu import native

            return native.lut_paint_rgb(mask, table)
        except (RuntimeError, OSError):
            pass
    return table[mask]


def colorize_image(
    mask: np.ndarray,
    cell_ids: np.ndarray,
    type_ids: np.ndarray,
    confidence: np.ndarray,
    colors,
    tissue_regions: dict | None = None,
    tissue_colors=None,
    want_labels: bool = True,
    want_cell_maps: bool = True,
):
    """Render all maps for one image.

    Returns dict with keys: cell_type_rgb (H,W,3 u8), confidence_rgb,
    cell_type_labels (H,W u8, type+1), tissue_rgb / tissue_labels when
    ``tissue_regions`` is given. The integer label maps exist only for
    the GUI napari layers (model.py:845-858); ``want_labels=False``
    skips painting them (script runs never read them).
    ``want_cell_maps=False`` paints only the tissue maps — the two map
    families are independent LUT passes, so callers can render the
    cell-type/confidence maps early (before tissue regions exist) and
    finish with a tissue-only pass at no duplicated paint cost.
    """
    max_id = int(mask.max())
    n = max_id + 1

    out = {}
    if want_cell_maps:
        rgb_table = np.zeros((n, 3), dtype=np.uint8)
        conf_table = np.zeros((n, 3), dtype=np.uint8)

        palette = np.asarray(colors, dtype=np.uint8)
        rgb_table[cell_ids] = palette[type_ids]
        conf_table[cell_ids] = viridis_lut(confidence, reject_gray=GRAY)

        out["cell_type_rgb"] = _lut_paint(mask, rgb_table)
        out["confidence_rgb"] = _lut_paint(mask, conf_table)
        if want_labels:
            label_table = np.zeros(n, dtype=np.uint8)
            label_table[cell_ids] = (
                np.asarray(type_ids) + 1
            ).astype(np.uint8)
            out["cell_type_labels"] = _lut_paint(mask, label_table)

    if tissue_regions is not None and tissue_colors is not None:
        tissue_palette = np.asarray(tissue_colors, dtype=np.uint8)
        n_regions = len(tissue_palette) - 1  # last entry is the gray slot
        t_rgb = np.zeros((n, 3), dtype=np.uint8)
        t_lab = np.zeros(n, dtype=np.uint8)
        ids = np.asarray(cell_ids, dtype=np.int64)
        regions = np.asarray(
            [tissue_regions[int(c)] for c in ids], dtype=np.int64
        )
        # HDBSCAN noise (region < 0): the reserved gray, with a label
        # distinct from both background (0) and real regions
        noise = regions < 0
        t_rgb[ids] = np.where(
            noise[:, None], np.asarray(GRAY, np.uint8),
            tissue_palette[np.where(noise, 0, regions)],
        )
        t_lab[ids] = np.where(noise, n_regions + 1, regions + 1).astype(
            np.uint8
        )
        out["tissue_rgb"] = _lut_paint(mask, t_rgb)
        if want_labels:
            out["tissue_labels"] = _lut_paint(mask, t_lab)

    return out
