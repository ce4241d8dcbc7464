"""Distinct-color generation and legends.

Color assignments feed every map/legend/pie, so the sequence must equal the
reference's (utils.py:33-108): 19 fixed standard colors, then golden-ratio
HSV colors cycling saturation/value in {0.7,0.8,0.9,1.0}, silver-gray
(192,192,192) always appended last for "Others".
"""

from __future__ import annotations

import colorsys
import os

import numpy as np

STANDARD_COLORS: tuple[tuple[int, int, int], ...] = (
    (255, 0, 0), (0, 0, 255), (0, 128, 0), (255, 255, 0), (255, 0, 255),
    (0, 255, 255), (255, 165, 0), (128, 0, 128), (0, 128, 128),
    (128, 0, 0), (0, 0, 128), (128, 128, 0), (255, 192, 203),
    (165, 42, 42), (0, 255, 0), (135, 206, 235), (75, 0, 130),
    (255, 215, 0), (192, 192, 192),
)
GRAY = (192, 192, 192)
_GOLDEN = 0.618033988749895
_SATS = (0.7, 0.8, 0.9, 1.0)
_VALS = (0.7, 0.8, 0.9, 1.0)


def get_colors(n: int) -> list[tuple[int, int, int]]:
    """n visually distinct colors; the last is always gray (utils.py:33-108)."""
    n = n - 1
    if n <= len(STANDARD_COLORS):
        return list(STANDARD_COLORS[:n]) + [GRAY]
    colors = list(STANDARD_COLORS)
    h = 0.1
    while len(colors) < n:
        h = (h + _GOLDEN) % 1.0
        s = _SATS[len(colors) % len(_SATS)]
        v = _VALS[len(colors) % len(_VALS)]
        r, g, b = colorsys.hsv_to_rgb(h, s, v)
        colors.append((int(r * 255), int(g * 255), int(b * 255)))
    colors.append(GRAY)
    return colors


def rgb_to_hex(rgb) -> str:
    return "#{:02x}{:02x}{:02x}".format(rgb[0], rgb[1], rgb[2])


def number_to_rgb(value: float, cmap_name: str = "viridis") -> list[int]:
    """[0,1] scalar -> viridis RGB in 0..255 (utils.py:16-28)."""
    if value < 0 or value > 1:
        raise ValueError("Value must be between 0 and 1")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.colors as mcolors
    import matplotlib.pyplot as plt

    cmap = plt.get_cmap(cmap_name)
    rgb = cmap(mcolors.Normalize(vmin=0, vmax=1)(value))[:3]
    return [int(x * 255) for x in rgb]


def viridis_lut(values: np.ndarray, reject_gray=GRAY) -> np.ndarray:
    """Vectorized number_to_rgb over per-cell confidences: (N,) -> (N, 3)
    uint8; values <= 0 map to gray (model.py:832 rejected-cell rule)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cmap = plt.get_cmap("viridis")
    vals = np.clip(np.asarray(values, dtype=np.float64), 0.0, 1.0)
    rgb = (np.asarray(cmap(vals))[:, :3] * 255).astype(np.uint8)
    rgb[np.asarray(values) <= 0] = reject_gray
    return rgb


def color_legend(main_dir: str, colors: dict, cell: bool = True) -> str:
    """6-column legend grid PNG (utils.py:111-140): ``colors`` maps label ->
    hex; luminance picks black/white text; filename depends on ``cell``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    num_cols = 6
    num_rows = (len(colors) + num_cols - 1) // num_cols
    fig, ax = plt.subplots(figsize=(2.5 * num_cols, 0.4 * max(num_rows, 1)))
    for i, name in enumerate(colors):
        row, col = divmod(i, num_cols)
        hexcolor = colors[name]
        ax.add_patch(
            plt.Rectangle((col, num_rows - row - 1), 1, 1, color=hexcolor)
        )
        rgb = [int(hexcolor[k:k + 2], 16) for k in (1, 3, 5)]
        lum = (0.299 * rgb[0] + 0.587 * rgb[1] + 0.114 * rgb[2]) / 255
        ax.text(
            col + 0.5, num_rows - row - 1 + 0.5, name, va="center",
            ha="center", fontsize=10,
            color="black" if lum > 0.5 else "white",
        )
    ax.set_xlim(0, num_cols)
    ax.set_ylim(0, max(num_rows, 1))
    ax.axis("off")
    name = "cell_color_legend.png" if cell else "tissue_region_color_legend.png"
    path = os.path.join(main_dir, name)
    plt.savefig(path, bbox_inches="tight")
    plt.close()
    return path
