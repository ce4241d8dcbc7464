"""Real 2-process jax.distributed batch run (VERDICT r2 #3).

Launches TWO actual OS processes with a localhost coordinator (CPU
backend, 2 virtual devices each -> a 4-device global arrangement), runs a
4-slide manifest through ``Annotator.predict`` in both, and asserts:

* each process annotates exactly its round-robin ``host_image_shard``
  subset (host 0 -> images 0, 2; host 1 -> images 1, 3),
* each writes its own ``results_host<i>/`` dir with globally-numbered
  per-image annotation CSVs (no cross-host filename collisions),
* no collective hangs (both exit 0 within the timeout).

This is the executed counterpart of the monkeypatched unit tests in
test_graft_entry.py. Reference: SURVEY §2 row 25 (the reference has no
distributed backend at all; this is the TPU-native multi-host batch
capability).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from ribca_tpu.io import write_tiff
from ribca_tpu.io.manifest import write_manifest
from ribca_tpu.panels.vocab import PANELS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")
N_SLIDES = 4


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture
def cohort(tmp_path):
    from tests.synth import make_cells, make_image

    pairs = []
    for i in range(N_SLIDES):
        mask, _ = make_cells(h=64, w=64, n_cells=6, radius=4, seed=i)
        img = make_image(mask, n_channels=7, seed=i)
        ip = str(tmp_path / f"s{i}.tif")
        mp = str(tmp_path / f"m{i}.png")
        write_tiff(ip, img)
        Image.fromarray(mask.astype(np.uint16)).save(mp)
        pairs.append((ip, mp))
    csv_path = str(tmp_path / "batch.csv")
    write_manifest(pairs, csv_path)
    marker = str(tmp_path / "markers.txt")
    with open(marker, "w") as f:
        f.write("\n".join(PANELS["immune_base"]) + "\n")
    return marker, csv_path


def test_two_process_distributed_batch(cohort, tmp_path):
    marker, csv_path = cohort
    main_dir = str(tmp_path / "run")
    os.makedirs(main_dir)
    coordinator = f"localhost:{_free_port()}"
    cache = os.environ.get("RIBCA_TEST_CACHE", "/tmp/ribca_jax_cache")

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(pid), "2",
             marker, csv_path, main_dir, cache],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker hung (collective deadlock?)")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("DONE ")][-1]
        info = json.loads(line[5:])
        results[info["process"]] = info

    assert set(results) == {0, 1}
    for pid, info in results.items():
        assert info["local_devices"] == 2
        assert info["global_devices"] == 4
        # round-robin shard: host p takes images p, p+2
        assert info["images"] == [pid, pid + 2]
        assert info["n_records"] == 2
        assert all(c > 0 for c in info["cells"])
        # per-host result dir with globally-numbered annotation files
        rd = info["result_dir"]
        assert rd.endswith(f"results_host{pid}")
        for g in info["images"]:
            assert os.path.exists(
                os.path.join(rd, f"mh_annotation_{g}.csv")
            ), os.listdir(rd)
        assert os.path.exists(os.path.join(rd, "log.txt"))
    # no shared results/ dir was written (nothing collides)
    assert not os.path.exists(os.path.join(main_dir, "results"))
