"""napari reader/writer/sample-data hooks (reference component 22).

The reference ships cookiecutter ``.npy`` reader / no-op writer /
random-sample stubs that are not registered in its manifest
(_reader.py, _writer.py, _sample_data.py). Here the same surface exists
but is actually useful: the reader opens CHW TIFF stacks and instance
masks through ribca_tpu.io, the writer saves label layers as PNG/TIFF,
and the sample data generates the synthetic cells fixture.
"""

from __future__ import annotations

import os

import numpy as np


def napari_get_reader(path):
    """Reader hook: accept .tif/.tiff/.qptiff stacks and .png masks."""
    if isinstance(path, list):
        path = path[0]
    ext = os.path.splitext(str(path))[1].lower()
    if ext in (".tif", ".tiff", ".qptiff"):
        return _read_stack
    if ext == ".png":
        return _read_mask
    return None


def _read_stack(path):
    from ribca_tpu.io import read_image

    paths = [path] if isinstance(path, str) else path
    return [
        (read_image(p), {"name": os.path.basename(p)}, "image")
        for p in paths
    ]


def _read_mask(path):
    from ribca_tpu.io import read_mask

    paths = [path] if isinstance(path, str) else path
    return [
        (read_mask(p), {"name": os.path.basename(p)}, "labels")
        for p in paths
    ]


def write_labels(path: str, data, meta: dict) -> list[str]:
    """Writer hook: save a labels layer as PNG (or multipage TIFF)."""
    from PIL import Image

    arr = np.asarray(data)
    if path.lower().endswith((".tif", ".tiff")):
        from ribca_tpu.io import write_tiff

        write_tiff(path, arr.astype(np.int32))
    else:
        Image.fromarray(arr.astype(np.uint16)).save(path)
    return [path]


def make_sample_data(h=256, w=256, n_cells=60, n_channels=7, seed=0):
    """Sample-data hook: synthetic 7-channel cells image + mask (disk
    cells on a jittered grid with per-cell random marker expression)."""
    rng = np.random.default_rng(seed)
    mask = np.zeros((h, w), dtype=np.int32)
    side = int(np.ceil(np.sqrt(n_cells)))
    radius = max(3, min(h, w) // (3 * side))
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    stamp = (yy**2 + xx**2) <= radius**2
    cid = 1
    for iy in range(side):
        for ix in range(side):
            if cid > n_cells:
                break
            cy = int(np.clip((iy + 0.5) * h / side + rng.integers(-3, 4),
                             radius, h - radius - 1))
            cx = int(np.clip((ix + 0.5) * w / side + rng.integers(-3, 4),
                             radius, w - radius - 1))
            win = mask[cy - radius:cy + radius + 1,
                       cx - radius:cx + radius + 1]
            win[stamp & (win == 0)] = cid
            cid += 1
    expression = rng.uniform(20, 220, size=(n_channels, n_cells + 1))
    expression[:, 0] = 0
    img = expression[:, mask] + rng.normal(0, 3, size=(n_channels, h, w))
    img = np.clip(img, 0, 255).astype(np.float32)
    return [
        (img, {"name": "ribca sample image"}, "image"),
        (mask, {"name": "ribca sample mask"}, "labels"),
    ]
