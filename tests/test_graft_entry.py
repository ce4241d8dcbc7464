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
