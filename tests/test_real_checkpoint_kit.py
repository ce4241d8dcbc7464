"""Offline end-to-end proof of the real-checkpoint burn-down kit.

The kit (scripts/validate_real_checkpoints.py) exists so the first
session WITH network egress can validate the 8 published checkpoints in
one command. This environment has no egress, so these tests run the
whole kit — download through a mocked Drive opener serving fixture
``.pth`` files in the exact reference layout, conversion, the Annotator
runs (f32 + bf16), the torch mirror, and the report — proving every leg
works before it ever meets the real network.
"""

import json

import pytest

from scripts.validate_real_checkpoints import main  # noqa: E402

from tests.test_convert_reference_layout import (  # noqa: E402
    write_classifier_pth,
    write_imputer_pth,
)


@pytest.fixture(scope="module")
def fixture_checkpoints(tmp_path_factory):
    """All 8 reference-basename .pth files with synthetic weights."""
    d = tmp_path_factory.mktemp("realck_fixtures")
    for i, panel in enumerate(
        ["immune_base", "immune_extended", "immune_full", "structure",
         "nerve_cell"]
    ):
        from ribca_tpu.models.registry import CLASSIFIER_BASENAME

        write_classifier_pth(
            str(d / f"{CLASSIFIER_BASENAME[panel]}.pth"), panel, seed=i
        )
    for i, panel in enumerate(
        ["immune_base", "immune_extended", "immune_full"]
    ):
        from ribca_tpu.models.registry import CLASSIFIER_BASENAME

        write_imputer_pth(
            str(d / f"{CLASSIFIER_BASENAME[panel]}_impute.pth"), panel,
            seed=10 + i,
        )
    return d


@pytest.mark.parametrize("scenario", ["reference", "imputed"])
def test_kit_offline_end_to_end(tmp_path, fixture_checkpoints, scenario,
                                monkeypatch):
    monkeypatch.setenv("RIBCA_REALCK_DIR", str(tmp_path / "work"))
    models_dir = tmp_path / "models"
    report_path = tmp_path / "report.json"
    rc = main([
        "--models-dir", str(models_dir),
        "--fixture-dir", str(fixture_checkpoints),
        "--size", "160", "--cells", "24",
        "--scenario", scenario,
        "--out", str(report_path),
    ])
    with open(report_path) as f:
        report = json.load(f)
    assert rc == 0, f"kit failed: {report}"
    assert report["verdict"] == "PASS"
    assert report["missing"] == []
    # every checkpoint either came through the mocked download or was
    # already present from the sibling parametrization
    assert all(
        st in ("downloaded", "present")
        for st in report["download"].values()
    ), report["download"]

    name = ("reference_markers" if scenario == "reference"
            else "imputed_full")
    res = report["scenarios"][name]
    assert res["torch_mirror_vs_f32"]["label_agreement"] == 1.0
    assert res["torch_mirror_vs_f32"]["n_cells"] > 0
    # bf16 agreement is REPORTED (value depends on weights; with real
    # checkpoints this is the VERDICT r4 weak-#4 number)
    assert 0.0 <= res["bf16_vs_f32"]["label_agreement"] <= 1.0
    if scenario == "reference":
        assert res["panels"] == ["immune_extended", "structure"]
    else:
        assert res["panels"] == [
            "immune_full", "structure", "nerve_cell"
        ]


def test_kit_npz_only_reports_agreement(tmp_path, fixture_checkpoints,
                                        monkeypatch):
    """With only converted .npz weights (no .pth for the torch mirror)
    the kit still runs both dtypes and reports the real-weight bf16
    agreement, with verdict NPZ_ONLY and exit 0."""
    import shutil

    monkeypatch.setenv("RIBCA_REALCK_DIR", str(tmp_path / "work"))
    models_dir = tmp_path / "models"

    # convert fixtures to npz, then drop the .pth files
    from ribca_tpu.models.download import _convert_all

    models_dir.mkdir()
    for f in fixture_checkpoints.iterdir():
        shutil.copy(f, models_dir / f.name)
    _convert_all(str(models_dir))
    for f in models_dir.glob("*.pth"):
        f.unlink()

    report_path = tmp_path / "report.json"
    rc = main([
        "--models-dir", str(models_dir),
        "--skip-download",
        "--size", "160", "--cells", "24",
        "--scenario", "reference",
        "--out", str(report_path),
    ])
    with open(report_path) as f:
        report = json.load(f)
    assert rc == 0, report
    assert report["verdict"] == "NPZ_ONLY"
    assert "mirror_skipped" in report
    res = report["scenarios"]["reference_markers"]
    assert "torch_mirror_vs_f32" not in res
    assert 0.0 <= res["bf16_vs_f32"]["label_agreement"] <= 1.0


def test_kit_reports_missing_checkpoints(tmp_path):
    """Offline with an empty fixture dir: the kit must exit 2 and name
    every missing file — the 'what do I still need' mode."""
    rc = main([
        "--models-dir", str(tmp_path / "empty_models"),
        "--fixture-dir", str(tmp_path / "no_fixtures"),
        "--out", str(tmp_path / "report.json"),
    ])
    assert rc == 2
    with open(tmp_path / "report.json") as f:
        report = json.load(f)
    assert report["verdict"] == "MISSING_CHECKPOINTS"
    assert len(report["missing"]) == 8
