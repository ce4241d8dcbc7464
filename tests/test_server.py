"""Persistent annotation server (api/server.py): queue protocol, resident
program reuse across jobs (zero compiles on job 2), error isolation, and
the stop-file shutdown."""

import json
import os

import pytest

from ribca_tpu.api import server
from ribca_tpu.io.manifest import write_manifest
from ribca_tpu.panels.vocab import PANELS
from tests.synth import write_fixture

N_CELLS = 8


@pytest.fixture(scope="module")
def queue_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    img_path, mask_path, _, _ = write_fixture(
        root, n_channels=7, n_cells=N_CELLS, h=90, w=100
    )
    marker_file = root / "markers.txt"
    marker_file.write_text("\n".join(PANELS["immune_base"]) + "\n")
    queue = root / "queue"
    return root, queue, img_path, mask_path, str(marker_file)


def _payload(root, marker_file, img_path, mask_path, tag):
    main_dir = os.path.join(str(root), f"job_{tag}")
    return {
        "marker_file": marker_file,
        "image_file": img_path,      # reference alias keys
        "mask_file": mask_path,
        "main_dir": main_dir,
        "batch_id": tag,
        "strict": True,
        "infer": False,
        "n_regions": 2,
        "batch_size": 64,
        "dtype": "float32",
    }


def test_serve_two_jobs_second_compile_free(queue_env):
    root, queue, img_path, mask_path, marker_file = queue_env
    for tag in ("a", "b"):
        server.submit_job(
            str(queue),
            _payload(root, marker_file, img_path, mask_path, tag),
            name=f"{tag}.json",
        )
    n = server.serve(str(queue), max_jobs=2, poll_interval=0.01)
    assert n == 2

    results = {}
    for tag in ("a", "b"):
        done = queue / f"{tag}.json.done"
        assert done.exists()
        results[tag] = json.loads(done.read_text())
        assert results[tag]["status"] == "ok"
        assert results[tag]["n_cells"] == N_CELLS
        # pipeline outputs landed in the job's own main_dir
        rd = results[tag]["result_dir"]
        assert os.path.exists(os.path.join(rd, "log.txt"))
        assert any(f.endswith(".csv") for f in os.listdir(rd))
        # claimed marker cleaned up
        assert not (queue / f"{tag}.json.running").exists()
        assert not (queue / f"{tag}.json").exists()

    # THE serving property: job 2 reuses every resident program.
    # (job 1 may or may not compile depending on what earlier tests in
    # this process already populated — only job 2's count is a contract)
    assert results["b"]["xla"]["xla.compile_count"] == 0


def test_serve_isolates_job_errors(queue_env):
    root, queue2, img_path, mask_path, marker_file = queue_env
    queue2 = str(queue2) + "_err"
    bad = _payload(root, marker_file, img_path, mask_path, "bad")
    bad["mask_file"] = "/nonexistent/mask.png"
    server.submit_job(queue2, bad, name="bad.json")
    good = _payload(root, marker_file, img_path, mask_path, "good")
    server.submit_job(queue2, good, name="good.json")

    n = server.serve(queue2, max_jobs=2, poll_interval=0.01)
    assert n == 2
    bad_res = json.loads(open(os.path.join(queue2, "bad.json.done")).read())
    assert bad_res["status"] == "error"
    assert "traceback" in bad_res
    good_res = json.loads(
        open(os.path.join(queue2, "good.json.done")).read()
    )
    assert good_res["status"] == "ok"


def test_serve_stop_file(queue_env):
    root, queue, *_ = queue_env
    q = str(queue) + "_stop"
    os.makedirs(q, exist_ok=True)
    open(os.path.join(q, server.STOP_FILE), "w").close()
    assert server.serve(q, poll_interval=0.01) == 0


def test_submit_is_atomic_rename(queue_env, tmp_path):
    # tmp file never visible as a queued job
    q = str(tmp_path / "q")
    path = server.submit_job(q, {"x": 1}, name="j")
    assert path.endswith("j.json")
    assert sorted(os.listdir(q)) == ["j.json"]


def test_batch_payload_routes_by_csv(queue_env, tmp_path):
    root, _, img_path, mask_path, marker_file = queue_env
    csv = str(tmp_path / "batch.csv")
    write_manifest([(img_path, mask_path), (img_path, mask_path)], csv)
    payload = _payload(root, marker_file, img_path, mask_path, "batch")
    payload.pop("image_file")
    payload.pop("mask_file")
    payload["csv_file"] = csv
    payload["main_dir"] = str(tmp_path / "batchdir")
    res = server.run_job(payload)
    assert res["status"] == "ok"
    assert res["n_images"] == 2
    assert res["n_cells"] == 2 * N_CELLS


def test_cli_serve_flag(queue_env):
    """`main.py --serve DIR` enters serve mode without run-mode flags;
    a pre-placed stop file drains the queued job then exits."""
    root, queue, img_path, mask_path, marker_file = queue_env
    q = str(queue) + "_cli"
    server.submit_job(
        q, _payload(root, marker_file, img_path, mask_path, "cli"),
        name="cli.json",
    )
    open(os.path.join(q, server.STOP_FILE), "w").close()

    from ribca_tpu import cli

    assert cli.main(["--serve", q]) == 1
    res = json.loads(open(os.path.join(q, "cli.json.done")).read())
    assert res["status"] == "ok"
