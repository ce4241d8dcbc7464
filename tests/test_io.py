"""I/O layer: TIFF round-trip, mask reading, OME/QPTIFF marker extraction."""

import numpy as np
from PIL import Image

from ribca_tpu.io import (
    read_image,
    read_mask,
    write_tiff,
    extract_markers,
    extract_markers_ome,
    extract_markers_qptiff,
    write_marker_txt,
    read_manifest,
    write_manifest,
)

from tests.synth import make_cells, make_image


def test_tiff_roundtrip_uint16(tmp_path):
    arr = (np.arange(3 * 20 * 30).reshape(3, 20, 30) % 60000).astype(np.uint16)
    p = str(tmp_path / "x.tif")
    write_tiff(p, arr)
    back = read_image(p)
    assert back.shape == (3, 20, 30)
    np.testing.assert_array_equal(back, arr)


def test_tiff_roundtrip_float32(tmp_path):
    arr = np.random.default_rng(0).normal(size=(2, 16, 17)).astype(np.float32)
    p = str(tmp_path / "f.tif")
    write_tiff(p, arr)
    back = read_image(p)
    np.testing.assert_allclose(back, arr)


def test_single_page_and_mask(tmp_path):
    mask, _ = make_cells(n_cells=5)
    p = str(tmp_path / "m.png")
    Image.fromarray(mask.astype(np.uint16)).save(p)
    m = read_mask(p)
    assert m.dtype == np.int32
    np.testing.assert_array_equal(m, mask)
    # RGB mask: first channel wins (preprocess.py:247-249)
    rgb = np.stack([mask % 256, np.zeros_like(mask), np.ones_like(mask)], -1)
    p2 = str(tmp_path / "rgb.png")
    Image.fromarray(rgb.astype(np.uint8)).save(p2)
    np.testing.assert_array_equal(read_mask(p2), mask % 256)


def test_mask_pread_fast_path_byte_equal(tmp_path, monkeypatch):
    """The >=32MB raw-strip pread route must match PIL's decode exactly."""
    import ribca_tpu.io.tiff as tiff_mod

    mask, _ = make_cells(h=96, w=130, n_cells=12)
    p = str(tmp_path / "big_mask.tif")
    Image.fromarray(mask.astype(np.int32)).save(p)
    slow = read_mask(p)  # threshold not met: PIL path
    monkeypatch.setattr(tiff_mod, "MASK_PREAD_MIN_BYTES", 1)
    fast = read_mask(p)
    assert fast.dtype == np.int32
    np.testing.assert_array_equal(fast, slow)
    np.testing.assert_array_equal(fast, mask)


def test_reference_example_mask_reads():
    m = read_mask("/root/reference/examples/example_1_cell_mask.png")
    assert m.ndim == 2
    assert m.max() > 0


OME_XML = (
    '<?xml version="1.0"?>'
    '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
    "<Image><Pixels>"
    '<Channel Name="DAPI" ID="Channel:0:0"/>'
    '<Channel Name="CD3" ID="Channel:0:1"/>'
    '<Channel Name="CD45" ID="Channel:0:2"/>'
    "</Pixels></Image></OME>"
)


def test_ome_marker_extraction(tmp_path):
    img = Image.fromarray(np.zeros((8, 8), dtype=np.uint8))
    img2 = Image.fromarray(np.ones((8, 8), dtype=np.uint8))
    p = str(tmp_path / "ome.tif")
    img.save(p, save_all=True, append_images=[img2], description=OME_XML)
    assert extract_markers_ome(p) == ["DAPI", "CD3", "CD45"]
    assert extract_markers(p) == ["DAPI", "CD3", "CD45"]


def test_qptiff_marker_extraction(tmp_path):
    pages = []
    descs = []
    for name in ["DAPI", "CD20", "PanCK"]:
        pages.append(Image.fromarray(np.zeros((8, 8), dtype=np.uint8)))
        descs.append(
            f"<PerkinElmer-QPI-ImageDescription><Biomarker>{name}"
            "</Biomarker></PerkinElmer-QPI-ImageDescription>"
        )
    p = str(tmp_path / "q.tif")
    # PIL only sets description for the first page via save kwarg; use
    # tiffinfo per page through the encoderinfo
    pages[0].save(
        p, save_all=True, append_images=pages[1:], description=descs[0]
    )
    # single-description fallback still finds the first biomarker
    got = extract_markers_qptiff(p)
    assert got[:1] == ["DAPI"]


def test_marker_txt_and_manifest(tmp_path):
    mp = write_marker_txt(["DAPI", "CD3"], str(tmp_path / "am.txt"))
    assert open(mp).read() == "DAPI\nCD3\n"
    pairs = [("a.tif", "a_mask.png"), ("b.tif", "b_mask.png")]
    cp = write_manifest(pairs, str(tmp_path / "images.csv"))
    assert read_manifest(cp) == pairs


def test_synthetic_fixture_shapes(tmp_path):
    mask, centers = make_cells(n_cells=9)
    img = make_image(mask, n_channels=4)
    assert img.shape[0] == 4 and img.shape[1:] == mask.shape
    assert int(mask.max()) == 9
    assert len(centers) == 9
