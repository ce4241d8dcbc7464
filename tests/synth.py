"""Synthetic fixture generation: tiny CHW images + instance masks with a
known cell layout, written through the package's own writers."""

from __future__ import annotations

import numpy as np
from PIL import Image

from ribca_tpu.io import write_tiff


def make_cells(h=120, w=150, n_cells=12, radius=6, seed=0):
    """Disk-shaped cells on a grid with jitter; returns (mask, centers).

    Disks are stamped on local (2r+1)^2 windows so generation is O(H*W +
    n_cells*r^2) — usable for whole-slide-scale fixtures."""
    rng = np.random.default_rng(seed)
    mask = np.zeros((h, w), dtype=np.int32)
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    stamp = (yy**2 + xx**2) <= radius**2
    centers = []
    cid = 1
    gy = int(np.ceil(np.sqrt(n_cells)))
    gx = int(np.ceil(n_cells / gy))
    for iy in range(gy):
        for ix in range(gx):
            if cid > n_cells:
                break
            cy = int((iy + 0.5) * h / gy + rng.integers(-3, 4))
            cx = int((ix + 0.5) * w / gx + rng.integers(-3, 4))
            cy = int(np.clip(cy, radius, h - radius - 1))
            cx = int(np.clip(cx, radius, w - radius - 1))
            win = mask[cy - radius:cy + radius + 1,
                       cx - radius:cx + radius + 1]
            win[stamp & (win == 0)] = cid
            centers.append((cy, cx))
            cid += 1
    return mask, centers


def make_image(mask, n_channels=7, seed=0, amplitude=200.0):
    """CHW image: per-cell random marker expression + background noise."""
    rng = np.random.default_rng(seed)
    h, w = mask.shape
    n_cells = int(mask.max())
    img = rng.uniform(0, 10, size=(n_channels, h, w)).astype(np.float32)
    expr = rng.uniform(0, 1, size=(n_cells + 1, n_channels)).astype(np.float32)
    expr[0] = 0
    per_pixel = expr[mask]  # (H, W, C)
    img += amplitude * np.transpose(per_pixel, (2, 0, 1))
    return img.astype(np.uint16)


def write_fixture(tmp_path, n_channels=7, n_cells=12, h=120, w=150, seed=0):
    """Write image TIFF + mask PNG, return (img_path, mask_path, mask, img)."""
    mask, _ = make_cells(h=h, w=w, n_cells=n_cells, seed=seed)
    img = make_image(mask, n_channels=n_channels, seed=seed)
    img_path = str(tmp_path / f"img_{seed}.tif")
    mask_path = str(tmp_path / f"mask_{seed}.png")
    write_tiff(img_path, img)
    Image.fromarray(mask.astype(np.uint16)).save(mask_path)
    return img_path, mask_path, mask, img
