"""Streaming libtiff band reader vs the whole-image PIL path, and the
banded pipeline driven directly from disk."""

import numpy as np
import pytest

from ribca_tpu.io import read_image, write_tiff
from ribca_tpu.io.tiff_stream import TiffBandReader, open_image

def _libtiff_available() -> bool:
    try:
        from ribca_tpu.io.tiff_stream import _libtiff

        _libtiff()
        return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not _libtiff_available(), reason="libtiff unavailable"
)


@pytest.fixture()
def stack_path(tmp_path, rng):
    arr = rng.integers(0, 60000, size=(3, 50, 64)).astype(np.uint16)
    path = str(tmp_path / "stack.tif")
    write_tiff(path, arr)
    return path, arr


def test_reader_metadata_and_bands(stack_path):
    path, arr = stack_path
    r = TiffBandReader(path)
    assert r.shape == (3, 50, 64)
    assert r.dtype == np.uint16
    np.testing.assert_array_equal(r.read_band(0, 50), arr)
    np.testing.assert_array_equal(r.read_band(10, 23), arr[:, 10:23])
    np.testing.assert_array_equal(r[:, 5:9], arr[:, 5:9])
    # matches the PIL path
    np.testing.assert_array_equal(r.read_band(0, 50), read_image(path))
    np.testing.assert_array_equal(
        r.channel_min(), arr.min(axis=(1, 2)).astype(np.float32)
    )
    r.close()


def test_open_image_budget_switch(stack_path):
    path, arr = stack_path
    small = open_image(path, host_budget_bytes=1 << 30)
    assert isinstance(small, np.ndarray)
    big = open_image(path, host_budget_bytes=10)
    assert hasattr(big, "read_band")
    np.testing.assert_array_equal(np.asarray(big[:, 0:50]), arr)


def test_pipeline_from_streaming_reader(tmp_path, rng):
    """run_image routes a reader through the banded path; results equal
    the in-memory array."""
    import jax.numpy as jnp

    from ribca_tpu.engine.ensemble import EnsembleRunner
    from ribca_tpu.engine.pipeline import run_image
    from ribca_tpu.models.registry import ModelRegistry
    from ribca_tpu.panels.parser import MarkerParser
    from ribca_tpu.panels.vocab import PANELS
    from ribca_tpu.parallel.mesh import get_mesh
    from ribca_tpu.utils.config import AnnotatorConfig
    from tests.synth import make_cells, make_image

    mask, _ = make_cells(h=260, w=70, n_cells=12, seed=2)
    img = make_image(mask, n_channels=7, seed=2).astype(np.uint16)
    path = str(tmp_path / "slide.tif")
    write_tiff(path, img)

    mf = tmp_path / "m.txt"
    mf.write_text("\n".join(PANELS["immune_base"]) + "\n")
    parser = MarkerParser(strict=True)
    parser.parse(str(mf))
    runner = EnsembleRunner(
        parser, ModelRegistry(str(tmp_path / "none")), n_channels=7,
        infer=False, dtype=jnp.float32, mesh=get_mesh(),
    )
    cfg = AnnotatorConfig(normalize=True, blur=0.3)

    whole = run_image(img, mask, cfg, runner)
    reader = open_image(path, host_budget_bytes=10)
    assert hasattr(reader, "read_band")
    streamed = run_image(reader, mask, cfg, runner)

    np.testing.assert_array_equal(whole.cell_ids, streamed.cell_ids)
    np.testing.assert_array_equal(
        np.argmax(whole.panel_probs["immune_base"], 1),
        np.argmax(streamed.panel_probs["immune_base"], 1),
    )
    np.testing.assert_allclose(
        whole.intensity_full, streamed.intensity_full, atol=2e-3
    )


def test_raw_strip_fast_path_selected(stack_path):
    """PIL-written (uncompressed strip) stacks are served by raw pread,
    not per-row TIFFReadScanline calls."""
    path, arr = stack_path
    r = TiffBandReader(path)
    assert len(r._raw) == r.shape[0]
    np.testing.assert_array_equal(r.read_band(3, 41), arr[:, 3:41])
    r.close()
    # open_image materializes small raw-readable files via pread too
    out = open_image(path, host_budget_bytes=1 << 30)
    assert isinstance(out, np.ndarray)
    np.testing.assert_array_equal(out, arr)


def test_compressed_tiff_falls_back_to_scanline(tmp_path, rng):
    """Deflate-compressed stacks can't be pread raw; the scanline path
    must decode them identically."""
    from PIL import Image

    arr = rng.integers(0, 60000, size=(3, 40, 48)).astype(np.uint16)
    path = str(tmp_path / "deflate.tif")
    pages = [Image.fromarray(arr[c]) for c in range(3)]
    pages[0].save(path, save_all=True, append_images=pages[1:],
                  format="TIFF", compression="tiff_deflate")
    r = TiffBandReader(path)
    assert not r._raw  # plan rejected: compression != none
    np.testing.assert_array_equal(r.read_band(0, 40), arr)
    np.testing.assert_array_equal(r.read_band(7, 19), arr[:, 7:19])
    r.close()


# -- tiled (TIFFReadTile) layouts ---------------------------------------------


def write_tiled_tiff(path, img, tile_w=16, tile_l=16):
    """Write a CHW stack as a tile-organized multi-page TIFF through
    libtiff (PIL only writes strips; this exercises the TIFFReadTile
    path). Tile dims must be multiples of 16 (TIFF 6.0)."""
    import ctypes

    from ribca_tpu.io.tiff_stream import (
        TAG_BITSPERSAMPLE,
        TAG_IMAGELENGTH,
        TAG_IMAGEWIDTH,
        TAG_SAMPLEFORMAT,
        TAG_SAMPLESPERPIXEL,
        TAG_TILELENGTH,
        TAG_TILEWIDTH,
        _libtiff,
    )

    TAG_COMPRESSION, TAG_PHOTOMETRIC, TAG_PLANARCONFIG = 259, 262, 284
    lib = _libtiff()
    lib.TIFFWriteTile.restype = ctypes.c_ssize_t
    lib.TIFFWriteTile.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint16,
    ]
    lib.TIFFWriteDirectory.restype = ctypes.c_int
    lib.TIFFWriteDirectory.argtypes = [ctypes.c_void_p]
    lib.TIFFSetField.restype = ctypes.c_int

    assert img.dtype == np.uint16
    c, h, w = img.shape
    tif = lib.TIFFOpen(path.encode(), b"w")
    assert tif, "TIFFOpen(w) failed"
    tifp = ctypes.c_void_p(tif)
    u32, i32 = ctypes.c_uint32, ctypes.c_int
    try:
        for chan in range(c):
            for tag, val in (
                (TAG_IMAGEWIDTH, u32(w)), (TAG_IMAGELENGTH, u32(h)),
                (TAG_BITSPERSAMPLE, i32(16)), (TAG_SAMPLESPERPIXEL, i32(1)),
                (TAG_SAMPLEFORMAT, i32(1)), (TAG_COMPRESSION, i32(1)),
                (TAG_PHOTOMETRIC, i32(1)), (TAG_PLANARCONFIG, i32(1)),
                (TAG_TILEWIDTH, u32(tile_w)), (TAG_TILELENGTH, u32(tile_l)),
            ):
                assert lib.TIFFSetField(tifp, u32(tag), val)
            buf = np.zeros((tile_l, tile_w), np.uint16)
            for ty in range(0, h, tile_l):
                for tx in range(0, w, tile_w):
                    buf[:] = 0
                    rows = min(tile_l, h - ty)
                    cols = min(tile_w, w - tx)
                    buf[:rows, :cols] = img[chan, ty:ty + rows, tx:tx + cols]
                    n = lib.TIFFWriteTile(
                        tifp, buf.ctypes.data_as(ctypes.c_void_p),
                        u32(tx), u32(ty), u32(0), ctypes.c_uint16(0),
                    )
                    assert n > 0, "TIFFWriteTile failed"
            assert lib.TIFFWriteDirectory(tifp)
    finally:
        lib.TIFFClose(tifp)


def test_tiled_tiff_streams(tmp_path, rng):
    """Tile-organized TIFFs stream through TIFFReadTile (round-1 gap:
    they fell back to whole-image PIL decode)."""
    arr = rng.integers(0, 60000, size=(3, 70, 90)).astype(np.uint16)
    path = str(tmp_path / "tiled.tif")
    write_tiled_tiff(path, arr)

    r = TiffBandReader(path)
    assert r.shape == (3, 70, 90)
    assert set(r._tiled.values()) == {(16, 16)}
    np.testing.assert_array_equal(r.read_band(0, 70), arr)
    np.testing.assert_array_equal(r.read_band(13, 37), arr[:, 13:37])
    np.testing.assert_array_equal(r[:, 5:9], arr[:, 5:9])
    r.close()

    # open_image streams it instead of the PIL fallback
    streamed = open_image(path, host_budget_bytes=10)
    assert hasattr(streamed, "read_band")
    np.testing.assert_array_equal(streamed[:, 0:70], arr)
