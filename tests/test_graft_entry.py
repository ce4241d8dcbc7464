"""Driver entry-point tests: multi-chip dryrun + multi-host init gating.

Round-1 regression: the driver invoked ``dryrun_multichip`` in a process
whose backend was already pinned to the real TPU, and the run died in
``device_put`` (MULTICHIP_r01.json). The entry now forces a virtual CPU
mesh in-process when possible and re-execs a clean child otherwise.
"""

import pytest

import __graft_entry__ as graft
from ribca_tpu.parallel import mesh as mesh_mod


def test_dryrun_multichip_inprocess():
    # conftest provides 8 virtual CPU devices, so the in-process fast path
    # must be taken (no child re-exec) and the sharded programs must run.
    graft.dryrun_multichip(4)


def test_virtual_cpu_devices_available():
    devices = graft._virtual_cpu_devices(8)
    assert devices is not None and len(devices) == 8
    assert all(d.platform == "cpu" for d in devices)


def test_dryrun_child_guard_raises(monkeypatch):
    # A forced child that still cannot build the virtual mesh must fail
    # loudly instead of re-exec-ing forever.
    monkeypatch.setenv("_RIBCA_DRYRUN_CHILD", "1")
    monkeypatch.setattr(graft, "_virtual_cpu_devices", lambda n: None)
    with pytest.raises(RuntimeError, match="forced child"):
        graft.dryrun_multichip(4)


def test_maybe_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert mesh_mod.maybe_init_distributed() is False


def test_maybe_init_distributed_initializes(monkeypatch):
    import jax

    calls = []
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda: calls.append(1)
    )
    mesh_mod.get_mesh()  # populate the cache so clearing is observable
    assert mesh_mod.maybe_init_distributed() is True
    assert calls == [1]
    # the mesh cache must be dropped so the next get_mesh() spans the
    # (post-init) global device set
    assert mesh_mod.get_mesh.cache_info().currsize == 0


def test_host_image_shard_round_robin():
    assert mesh_mod.host_image_shard(7, 0, 3) == [0, 3, 6]
    assert mesh_mod.host_image_shard(7, 1, 3) == [1, 4]
    assert mesh_mod.host_image_shard(7, 2, 3) == [2, 5]
    # every image lands on exactly one host
    all_idx = sorted(
        i for p in range(3) for i in mesh_mod.host_image_shard(7, p, 3)
    )
    assert all_idx == list(range(7))
    assert mesh_mod.host_image_shard(2, 5, 8) == []


def test_get_local_mesh_covers_local_devices():
    import jax

    m = mesh_mod.get_local_mesh()
    assert m.size == len(jax.local_devices())


def test_annotator_multi_host_partition(monkeypatch, tmp_path):
    """With a mocked 3-process world, host 1 must take slides 1, 4."""
    import jax
    import numpy as np
    from PIL import Image

    from ribca_tpu.api.annotator import Annotator
    from ribca_tpu.io import write_tiff
    from ribca_tpu.io.manifest import write_manifest
    from ribca_tpu.panels.vocab import PANELS
    from ribca_tpu.utils.config import AnnotatorConfig
    from tests.synth import make_cells, make_image

    pairs = []
    for i in range(5):
        mask, _ = make_cells(h=48, w=48, n_cells=2 + i, seed=i)
        img = make_image(mask, n_channels=7, seed=i)
        ip = str(tmp_path / f"im{i}.tif")
        mp = str(tmp_path / f"mk{i}.png")
        write_tiff(ip, img)
        Image.fromarray(mask.astype(np.uint16)).save(mp)
        pairs.append((ip, mp))
    csv = str(tmp_path / "batch.csv")
    write_manifest(pairs, csv)
    mf = str(tmp_path / "markers.txt")
    open(mf, "w").write("\n".join(PANELS["immune_base"]) + "\n")

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    cfg = AnnotatorConfig(
        marker_file=mf, csv_file=csv, main_dir=str(tmp_path),
        normalize=False, compile_cache_dir="",
    )
    a = Annotator(cfg, models_dir=str(tmp_path / "empty"))
    a.preprocess()
    a.predict()
    # host 1 of 3 -> images 1 and 4 (3 and 6 cells)
    assert [r.n_cells for r in a.records] == [3, 6]
    assert [p for p in a._image_paths] == [pairs[1][0], pairs[4][0]]
