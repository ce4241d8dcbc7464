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
