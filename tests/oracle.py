"""Numpy/scipy oracle of the reference preprocessing math.

Re-derived from the behavioral spec of the reference (preprocess.py:214-239
normalization; utils.py:226-270 crop+soft-mask; preprocess.py:106 resize) so
the JAX/XLA kernels can be validated against an independent implementation.
skimage is unavailable here: its documented semantics are reproduced with
scipy.ndimage (dilation = grey_dilation w/ disk footprint; skimage
filters.gaussian = gaussian_filter(mode='nearest'); skimage resize(order=0,
anti_aliasing=True) = AA gaussian (mirror) + ndi.zoom(grid_mode=True)).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi


def disk(radius):
    y, x = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return (x**2 + y**2) <= radius**2


def oracle_normalize(img, blur=0.0, amax=100.0):
    img = img.astype(np.float32).copy()
    for i in range(img.shape[0]):
        bg = ndi.gaussian_filter(img[i], sigma=20)
        bg = np.where(bg > 125, 125, bg)
        img[i] = np.clip(img[i] - bg, 0, None)
        if blur:
            img[i] = ndi.gaussian_filter(img[i], sigma=blur)
        if not (img[i] > 0).any():
            img[i] = -1
            continue
        thresh = np.percentile(img[i], amax)
        if thresh > 20:
            img[i] = np.clip(img[i], 0, thresh)
        img[i] = 2 * (img[i] / max(25, np.max(img[i]))) - 1
    return img


def oracle_smooth(mask_patch, c):
    m = mask_patch == c
    smooth = m.astype("f")
    count = 1
    for j in range(1, 5):
        dil = ndi.grey_dilation(m, footprint=disk(j))
        smooth += dil.astype("f")
        count += 1
        for i in np.arange(0, j - 1, 1):
            smooth += ndi.gaussian_filter(
                dil.astype(np.float64), sigma=1 + i, mode="nearest"
            ).astype(np.float32)
            count += 1
    smooth /= count
    smooth /= np.max(smooth + 1e-6)
    return smooth


def cell_pos_dict(mask):
    d = {}
    ids = np.unique(mask)
    for c in ids[ids > 0]:
        rows, cols = np.nonzero(mask == c)
        d[int(c)] = (list(rows), list(cols))
    return dict(sorted(d.items()))


def oracle_crop_cell(image, mask, min_val, c_id, pos_dict, patch_size):
    x_mean = (min(pos_dict[c_id][0]) + max(pos_dict[c_id][0])) // 2
    xmin = int(max(x_mean - patch_size / 2, 0))
    xmax = int(min(xmin + patch_size, image.shape[1]))
    y_mean = (min(pos_dict[c_id][1]) + max(pos_dict[c_id][1])) // 2
    ymin = int(max(y_mean - patch_size / 2, 0))
    ymax = int(min(ymin + patch_size, image.shape[2]))

    img_zero_patch = np.zeros((image.shape[0], patch_size, patch_size))
    mask_patch = np.zeros((patch_size, patch_size))
    img_zero_patch[:, : xmax - xmin, : ymax - ymin] = image[:, xmin:xmax, ymin:ymax]
    mask_patch[: xmax - xmin, : ymax - ymin] = mask[xmin:xmax, ymin:ymax]

    marker = img_zero_patch * oracle_smooth(mask_patch, c_id) + min_val
    avg = np.array(
        [np.mean(marker[i][mask_patch > 0]) for i in range(image.shape[0])]
    )
    return marker, avg


def oracle_resize(patch, out=40):
    """skimage.transform.resize(..., (C, out, out), order=0,
    anti_aliasing=True, preserve_range=True) semantics."""
    c, p, _ = patch.shape
    if p == out:
        return patch.copy()
    factor = p / out
    sigma = max(0.0, (factor - 1) / 2)
    x = patch
    if sigma > 0:
        x = ndi.gaussian_filter(x, (0, sigma, sigma), mode="mirror")
    return ndi.zoom(x, (1, out / p, out / p), order=0, mode="mirror",
                    grid_mode=True)


def oracle_channel_select(patch, channel_index):
    """preprocess.py:110-121 incl. the multiple-missing quirk."""
    channel_index = np.asarray(channel_index)
    if -1 in channel_index:
        index = list(channel_index).index(-1)
        ci = np.delete(channel_index, index)
        sel = patch[ci, :, :]
        blank = -np.ones_like(sel[0:1])
        return np.concatenate((sel[:index], blank, sel[index:]), axis=0)
    return patch[channel_index, :, :]
