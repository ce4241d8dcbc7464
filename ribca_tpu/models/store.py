"""Neutral on-disk parameter store (.npz of flattened param paths).

Replaces the reference's torch ``.pth`` dependency at run time: checkpoints
are converted once (models/convert.py) and loaded here without torch.

For training workflows (models/train.py), an Orbax backend is also
available (``save_params("...", format="orbax")``): async-capable,
sharding-aware, and the standard JAX ecosystem format. Inference
checkpoints stay .npz — a single portable file with zero extra deps.
"""

from __future__ import annotations

import os

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


def save_params(params: dict, path: str, format: str = "npz") -> str:
    if format == "orbax":
        return save_params_orbax(params, path)
    np.savez(path, **_flatten(params))
    return path


def load_params(path: str) -> dict:
    if os.path.isdir(path):  # orbax checkpoints are directories
        return load_params_orbax(path)
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


def save_params_orbax(params: dict, path: str) -> str:
    """Orbax StandardCheckpointer backend (directory checkpoint)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def load_params_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return _to_plain(ckptr.restore(os.path.abspath(path)))


def _to_plain(tree):
    """Nested mappings -> plain dicts of numpy arrays."""
    if isinstance(tree, dict):
        return {k: _to_plain(v) for k, v in tree.items()}
    return np.asarray(tree)
