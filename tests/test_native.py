"""Native C++ helpers vs numpy/device oracles."""

import numpy as np
import pytest

from ribca_tpu import native
from ribca_tpu.ops.extents import cell_extents
from tests.synth import make_cells

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_mask_scan_matches_device_path(rng):
    mask, _ = make_cells(h=90, w=110, n_cells=14)
    nat = cell_extents(mask, prefer_native=True)
    dev = cell_extents(mask, prefer_native=False)
    ids = nat.present_ids
    np.testing.assert_array_equal(ids, dev.present_ids)
    for field in ("rmin", "rmax", "cmin", "cmax", "count"):
        np.testing.assert_array_equal(
            getattr(nat, field)[ids], getattr(dev, field)[ids], err_msg=field
        )
    np.testing.assert_allclose(nat.mean_row[ids], dev.mean_row[ids])
    np.testing.assert_allclose(nat.mean_col[ids], dev.mean_col[ids])


def test_mask_scan_sparse_ids():
    mask = np.zeros((20, 20), np.int32)
    mask[2:5, 3:7] = 9  # only id 9 present
    ext = cell_extents(mask, prefer_native=True)
    assert list(ext.present_ids) == [9]
    assert ext.rmin[9] == 2 and ext.rmax[9] == 4
    assert ext.cmin[9] == 3 and ext.cmax[9] == 6
    assert ext.count[9] == 12


def test_lut_paint_matches_numpy(rng):
    mask = rng.integers(0, 17, size=(64, 80)).astype(np.int32)
    table = rng.integers(0, 256, size=(17, 3)).astype(np.uint8)
    np.testing.assert_array_equal(
        native.lut_paint_rgb(mask, table), table[mask]
    )
