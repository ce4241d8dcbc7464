"""Neutral on-disk parameter store (.npz of flattened param paths).

Replaces the reference's torch ``.pth`` dependency at run time: checkpoints
are converted once (models/convert.py) and loaded here without torch.
"""

from __future__ import annotations

import numpy as np


def _flatten(tree: dict, prefix: str = "", out=None) -> dict:
    if out is None:
        out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            _flatten(v, path, out)
        else:
            out[path] = np.asarray(v)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(params: dict, path: str) -> str:
    np.savez(path, **_flatten(params))
    return path


def load_params(path: str) -> dict:
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})
