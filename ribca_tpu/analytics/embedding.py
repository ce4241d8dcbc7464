"""Low-dimensional embeddings for discovery and visualization.

The reference depends on ``umap-learn`` (model.py:663,758). This
environment does not ship it, so the embedding is pluggable: real UMAP is
used when importable, otherwise a PCA projection stands in (documented
divergence — cluster/plot geometry differs, downstream shapes and flows do
not). Every fallback is logged via the optional ``logger``.
"""

from __future__ import annotations

import numpy as np
from sklearn.decomposition import PCA


def _try_umap():
    try:
        import umap  # type: ignore

        return umap
    except Exception:
        return None


def embed(
    x: np.ndarray,
    n_components: int = 2,
    seed: int | None = None,
    logger=None,
) -> np.ndarray:
    """(N, D) -> (N, n_components) embedding; UMAP when available."""
    x = np.asarray(x, dtype=np.float64)
    mod = _try_umap()
    if mod is not None:
        reducer = mod.UMAP(n_components=n_components, random_state=seed)
        return np.asarray(reducer.fit_transform(x))
    if logger is not None:
        logger.log(
            "umap-learn not available; using PCA embedding "
            f"({n_components} components)"
        )
    n_components = min(n_components, x.shape[0], x.shape[1])
    return PCA(n_components=n_components, random_state=seed).fit_transform(x)
