"""GUI logic layer (headless): validation, JSON handoff, prefill, marker
auto-extraction, reader/writer hooks, mock batch worker."""

import json
import os

import numpy as np

from ribca_tpu.gui import logic
from ribca_tpu.gui.batch_worker import batch_process_func
from ribca_tpu.gui.io_plugin import (
    make_sample_data,
    napari_get_reader,
    write_labels,
)


def test_validate_single_params(tmp_path):
    f = tmp_path / "x.txt"
    f.write_text("x")
    assert logic.validate_single_params(str(f), str(f), str(f),
                                        str(tmp_path)) == []
    errs = logic.validate_single_params(None, str(f), "/nope", str(f))
    assert len(errs) == 3  # marker, mask, main_dir


def test_handoff_roundtrip(tmp_path):
    wd = logic.prepare_working_dir(str(tmp_path))
    assert wd.endswith("_working_dir_temp") and os.path.isdir(wd)
    params = {**logic.default_params(), "marker_file": "m.txt"}
    p1 = logic.write_single_handoff(wd, params)
    assert os.path.basename(p1) == "hyperparams.json"
    assert json.load(open(p1))["marker_file"] == "m.txt"
    p2 = logic.write_batch_handoff(wd, params)
    assert os.path.basename(p2) == "hyperparams_batch.json"


def test_prefill_json(tmp_path):
    p = tmp_path / "hp.json"
    p.write_text(json.dumps({
        "confidence": 0.7, "unknown_key": 1, "marker_file": "mk.txt",
        "blur": None,
    }))
    params = logic.load_prefill_json(str(p))
    assert params["confidence"] == 0.7
    assert params["marker_file"] == "mk.txt"
    assert params["blur"] == logic.default_params()["blur"]  # None ignored
    assert "unknown_key" not in params


def test_auto_extract_markers_none_for_plain_tiff(tmp_path):
    from ribca_tpu.io import write_tiff

    path = str(tmp_path / "plain.tif")
    write_tiff(path, np.zeros((2, 8, 8), np.uint16))
    assert logic.auto_extract_markers(path, str(tmp_path)) is None


def test_auto_extract_markers_ome(tmp_path):
    """A minimal OME-TIFF: PIL TIFF with an OME-XML ImageDescription."""
    from PIL import Image
    from PIL.TiffImagePlugin import ImageFileDirectory_v2

    ome = (
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        "<Image><Pixels>"
        '<Channel Name="DAPI"/><Channel Name="CD45"/><Channel Name="CD3"/>'
        "</Pixels></Image></OME>"
    )
    path = str(tmp_path / "img.ome.tif")
    im = Image.fromarray(np.zeros((8, 8), np.uint16))
    ifd = ImageFileDirectory_v2()
    ifd[270] = ome
    im.save(path, tiffinfo=ifd)

    out = logic.auto_extract_markers(path, str(tmp_path))
    assert out and out.endswith("AUTOMATIC_markers_single.txt")
    assert open(out).read().splitlines() == ["DAPI", "CD45", "CD3"]


def test_reader_hooks(tmp_path):
    from ribca_tpu.io import write_tiff

    img_path = str(tmp_path / "a.tif")
    write_tiff(img_path, np.ones((3, 8, 9), np.uint16))
    reader = napari_get_reader(img_path)
    layers = reader(img_path)
    assert layers[0][2] == "image" and layers[0][0].shape == (3, 8, 9)

    from PIL import Image

    mask_path = str(tmp_path / "m.png")
    Image.fromarray(np.ones((8, 9), np.uint16)).save(mask_path)
    reader = napari_get_reader(mask_path)
    layers = reader(mask_path)
    assert layers[0][2] == "labels"
    assert napari_get_reader("x.npy") is None


def test_writer_and_sample_data(tmp_path):
    out = write_labels(str(tmp_path / "lab.png"), np.ones((4, 4), np.int32),
                       {})
    assert os.path.exists(out[0])
    layers = make_sample_data(h=64, w=64, n_cells=9, n_channels=3)
    img, mask = layers[0][0], layers[1][0]
    assert img.shape == (3, 64, 64)
    assert mask.shape == (64, 64) and mask.max() == 9


def test_mock_batch_worker(tmp_path):
    wd = str(tmp_path)
    (tmp_path / "hyperparams_batch.json").write_text("{}")
    batch_process_func(wd, sleep_s=0.0)
    assert logic.batch_completed(wd)
    assert (tmp_path / "output_img.png").exists()


def test_download_status_without_network(tmp_path):
    from ribca_tpu.models.download import CHECKPOINT_URLS, download_models

    assert set(CHECKPOINT_URLS) == {
        "immune_base.pth", "immune_extended.pth", "immune_full.pth",
        "struct.pth", "nerve.pth", "immune_base_impute.pth",
        "immune_extended_impute.pth", "immune_full_impute.pth",
    }
    def offline_opener(req):
        raise OSError("no egress")

    status = download_models(str(tmp_path), opener=offline_opener)
    assert all(v.startswith("missing") for v in status.values())


def test_gdrive_fetch_interstitial(tmp_path):
    """_gdrive_fetch follows Drive's virus-scan form hop (the thing gdown
    automates) with the stdlib only; exercised offline via an injected
    opener serving canned responses."""
    import io

    from ribca_tpu.models.download import _gdrive_fetch, download_models

    payload = b"\x80\x04fake-checkpoint-bytes" * 100
    interstitial = (
        '<html><body><form id="download-form" '
        'action="https://drive.usercontent.google.com/download" '
        'method="get">'
        '<input type="hidden" name="id" value="FILEID123">'
        '<input type="hidden" name="export" value="download">'
        '<input type="hidden" name="confirm" value="t">'
        '<input type="hidden" name="uuid" value="abc-def">'
        '</form></body></html>'
    ).encode()

    seen = []

    class FakeResp(io.BytesIO):
        def __init__(self, body, ctype):
            super().__init__(body)
            self.headers = {"Content-Type": ctype}

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def opener(req):
        seen.append(req.full_url)
        if "usercontent" in req.full_url:
            assert "confirm=t" in req.full_url
            assert "id=FILEID123" in req.full_url
            return FakeResp(payload, "application/octet-stream")
        return FakeResp(interstitial, "text/html; charset=utf-8")

    dest = tmp_path / "ckpt.pth"
    _gdrive_fetch(
        "https://drive.google.com/file/d/FILEID123/view?usp=sharing",
        str(dest), opener=opener)
    assert dest.read_bytes() == payload
    assert len(seen) == 2 and "uc?export=download&id=FILEID123" in seen[0]

    # small-file path: bytes on the first hop, via the public entrypoint
    def direct_opener(req):
        return FakeResp(payload, "application/octet-stream")

    status = download_models(str(tmp_path), convert=False,
                             opener=direct_opener)
    assert all(v == "downloaded" for v in status.values())
