"""Device preprocessing kernels vs the numpy/scipy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from ribca_tpu.ops import (
    gaussian_blur,
    normalize_image,
    cell_extents,
    extract_patches,
    build_panel_gather,
)
from ribca_tpu.ops.patches import apply_panel_gather, disk_footprint

from tests.oracle import (
    oracle_normalize,
    oracle_smooth,
    oracle_crop_cell,
    oracle_resize,
    oracle_channel_select,
    cell_pos_dict,
    disk,
)
from tests.synth import make_cells, make_image

from scipy import ndimage as ndi


def test_gaussian_matches_scipy_reflect(rng):
    x = rng.normal(size=(50, 60)).astype(np.float32) * 100
    for sigma in [0.3, 1.0, 2.5, 20.0]:
        ours = np.asarray(gaussian_blur(jnp.asarray(x), sigma, mode="reflect"))
        ref = ndi.gaussian_filter(x, sigma=sigma)
        np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-4)


def test_gaussian_matches_scipy_nearest(rng):
    x = (rng.uniform(size=(40, 40)) > 0.7).astype(np.float64)
    for sigma in [1.0, 2.0, 3.0]:
        ours = np.asarray(
            gaussian_blur(jnp.asarray(x, dtype=jnp.float32), sigma, mode="nearest")
        )
        ref = ndi.gaussian_filter(x, sigma=sigma, mode="nearest")
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_disk_footprint_matches():
    for r in range(1, 5):
        np.testing.assert_array_equal(disk_footprint(r) > 0, disk(r))


def test_normalize_matches_oracle(rng):
    mask, _ = make_cells(h=80, w=90, n_cells=8)
    img = make_image(mask, n_channels=3, seed=1).astype(np.float32)
    for blur, amax in [(0.0, 100.0), (0.3, 99.8), (1.0, 95.0)]:
        ours = np.asarray(normalize_image(jnp.asarray(img), blur=blur, amax=amax))
        ref = oracle_normalize(img, blur=blur, amax=amax)
        np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_normalize_empty_channel():
    img = np.zeros((2, 64, 64), dtype=np.float32)
    img[1] = 1000.0  # constant channel: bg clip at 125 leaves positive signal
    out = np.asarray(normalize_image(jnp.asarray(img), blur=0.0, amax=100.0))
    ref = oracle_normalize(img)
    np.testing.assert_allclose(out, ref, atol=2e-3)
    assert np.all(out[0] == -1.0)


def test_cell_extents_matches_bruteforce():
    mask, _ = make_cells(h=70, w=95, n_cells=10)
    ext = cell_extents(mask)
    pd = cell_pos_dict(mask)
    assert list(ext.present_ids) == list(pd.keys())
    for cid, (rows, cols) in pd.items():
        assert ext.rmin[cid] == min(rows)
        assert ext.rmax[cid] == max(rows)
        assert ext.cmin[cid] == min(cols)
        assert ext.cmax[cid] == max(cols)
        assert ext.count[cid] == len(rows)
        np.testing.assert_allclose(ext.mean_row[cid], np.mean(rows))
        np.testing.assert_allclose(ext.mean_col[cid], np.mean(cols))


def test_soft_mask_matches_oracle():
    mask, _ = make_cells(h=60, w=60, n_cells=4, radius=7)
    # build a 40x40 patch around cell 1 and compare the smooth map
    pd = cell_pos_dict(mask)
    from ribca_tpu.ops.patches import _gather_windows, _soft_mask

    ext = cell_extents(mask)
    cid = 2
    ip, mp, valid = _gather_windows(
        jnp.pad(jnp.zeros((1, 60, 60)), ((0, 0), (0, 40), (0, 40))),
        jnp.pad(jnp.asarray(mask), ((0, 40), (0, 40))),
        jnp.asarray([ext.rmin[cid]]), jnp.asarray([ext.rmax[cid]]),
        jnp.asarray([ext.cmin[cid]]), jnp.asarray([ext.cmax[cid]]),
        40, 20, jnp.int32(0), jnp.int32(60), jnp.int32(60),
        jnp.int32(60),
    )
    mp = jnp.where(valid, mp, 0)
    sm = np.asarray(_soft_mask((np.asarray(mp) == cid).astype(np.float32)))[0]
    _, avg = None, None
    ref_marker, _ = oracle_crop_cell(
        np.zeros((1, 60, 60)), mask, np.zeros((1, 1, 1)), cid, pd, 40
    )
    ref_sm = oracle_smooth(_mask_patch(mask, pd, cid, 40), cid)
    np.testing.assert_allclose(sm, ref_sm, atol=1e-4)


def _mask_patch(mask, pd, cid, patch_size):
    x_mean = (min(pd[cid][0]) + max(pd[cid][0])) // 2
    xmin = int(max(x_mean - patch_size / 2, 0))
    xmax = int(min(xmin + patch_size, mask.shape[0]))
    y_mean = (min(pd[cid][1]) + max(pd[cid][1])) // 2
    ymin = int(max(y_mean - patch_size / 2, 0))
    ymax = int(min(ymin + patch_size, mask.shape[1]))
    mp = np.zeros((patch_size, patch_size))
    mp[: xmax - xmin, : ymax - ymin] = mask[xmin:xmax, ymin:ymax]
    return mp


@pytest.mark.parametrize("patch_size", [40, 53])
def test_extract_patches_matches_oracle(patch_size):
    mask, _ = make_cells(h=100, w=120, n_cells=10, radius=6)
    img = make_image(mask, n_channels=5, seed=3).astype(np.float32)
    img = oracle_normalize(img, blur=0.3, amax=99.8)

    min_val = img.min(axis=(1, 2), keepdims=True)
    img_zero = img - min_val
    pd = cell_pos_dict(mask)
    ext = cell_extents(mask)
    ids = ext.present_ids

    patches, avg = extract_patches(
        jnp.asarray(img_zero), jnp.asarray(min_val[:, 0, 0]),
        jnp.asarray(mask),
        jnp.asarray(np.stack([ids, ext.rmin[ids], ext.rmax[ids],
                              ext.cmin[ids], ext.cmax[ids]]).astype(
            np.int32)),
        patch_size=patch_size,
    )
    patches, avg = np.asarray(patches), np.asarray(avg)

    for k, cid in enumerate(ids):
        ref_marker, ref_avg = oracle_crop_cell(
            img_zero, mask, min_val, int(cid), pd, patch_size
        )
        ref_resized = oracle_resize(ref_marker, 40)
        np.testing.assert_allclose(patches[k], ref_resized, atol=2e-3)
        np.testing.assert_allclose(avg[k], ref_avg, atol=2e-3)


def test_patch_window_clamping_at_border():
    # a cell hugging the (0,0) corner and one at the far corner
    mask = np.zeros((50, 55), dtype=np.int32)
    mask[0:6, 0:5] = 1
    mask[46:50, 51:55] = 2
    img = np.random.default_rng(0).normal(size=(2, 50, 55)).astype(np.float32)
    min_val = img.min(axis=(1, 2), keepdims=True)
    img_zero = img - min_val
    pd = cell_pos_dict(mask)
    ext = cell_extents(mask)
    ids = ext.present_ids
    patches, avg = extract_patches(
        jnp.asarray(img_zero), jnp.asarray(min_val[:, 0, 0]),
        jnp.asarray(mask),
        jnp.asarray(np.stack([ids, ext.rmin[ids], ext.rmax[ids],
                              ext.cmin[ids], ext.cmax[ids]]).astype(
            np.int32)),
        patch_size=40,
    )
    for k, cid in enumerate(ids):
        ref_marker, ref_avg = oracle_crop_cell(
            img_zero, mask, min_val, int(cid), pd, 40
        )
        np.testing.assert_allclose(np.asarray(patches)[k], ref_marker, atol=1e-4)
        np.testing.assert_allclose(np.asarray(avg)[k], ref_avg, atol=1e-4)


def test_panel_gather_quirk():
    rng = np.random.default_rng(0)
    patch = rng.normal(size=(4, 40, 40)).astype(np.float32)
    # two missing markers: first becomes blank, second takes LAST channel
    ci = [2, -1, 0, -1, 3]
    pg = build_panel_gather(ci, n_channels=4)
    ours = np.asarray(apply_panel_gather(jnp.asarray(patch[None]), pg))[0]
    ref = oracle_channel_select(patch, ci)
    np.testing.assert_allclose(ours, ref)
    assert pg.missing_positions == (1, 3)

    # no missing
    pg2 = build_panel_gather([3, 1, 0], n_channels=4)
    ours2 = np.asarray(apply_panel_gather(jnp.asarray(patch[None]), pg2))[0]
    np.testing.assert_allclose(ours2, patch[[3, 1, 0]])
