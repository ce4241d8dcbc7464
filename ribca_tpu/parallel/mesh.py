"""Device-mesh data parallelism over the cell axis.

The reference is single-device: its only parallelism is a host fork-pool over
mask rows (preprocess.py:183-211) and torch mini-batching (model.py:397-406).
The TPU-native scaling axis is the *batch of cells* (up to millions per
slide): a 1-D ``jax.sharding.Mesh`` over all chips shards the leading cell
axis of every per-cell array, the model parameters and the image stay
replicated, and XLA inserts the (trivial) collectives over ICI.

There is deliberately no TP/PP/SP here: the largest ensemble member is a
~21 M-param ViT (SURVEY §6) — far below single-chip HBM — so model
parallelism would only add latency. DP is the whole story, which is why
these helpers are thin: mesh construction, shardings, and static-shape
padding so every dispatch reuses the same compiled program.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "cells"


@functools.lru_cache(maxsize=8)
def get_mesh(n_devices: int | None = None,
             platform: str | None = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all) devices.

    ``platform`` honors the user's device choice ('tpu' | 'cpu', the
    config/CLI/GUI knob); an unavailable platform falls back to the
    default backend ('cuda' from reference-style configs maps there too).
    """
    from ribca_tpu.utils.cache import ensure_compile_cache

    ensure_compile_cache()
    devices = None
    if platform and platform not in ("cuda", "gpu"):
        try:
            devices = jax.devices(platform)
        except RuntimeError:
            devices = None
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def cell_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (cell) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def cell_sharding_axis1(mesh: Mesh) -> NamedSharding:
    """Shard the SECOND axis across the mesh — the stacked per-chunk
    cell-args array (5, N) uploads in one piece with its N axis split
    like every other cell-axis tensor."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (images, params, scalars)."""
    return NamedSharding(mesh, P())


def pad_cells(n: int, chunk: int, n_devices: int) -> int:
    """Padded per-dispatch cell count: ``chunk`` rounded up to a multiple of
    the device count so the shard split is even. The last chunk of a stream
    is padded up to the same size to keep one compiled program alive."""
    per = max(chunk, n_devices)
    rem = per % n_devices
    if rem:
        per += n_devices - rem
    return per


def shard_chunk(arrays, mesh: Mesh):
    """Place a pytree of per-cell host arrays onto the mesh, cell axis
    sharded. Arrays must already be padded to a multiple of mesh size."""
    sh = cell_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), arrays)


@functools.lru_cache(maxsize=8)
def get_local_mesh(platform: str | None = None) -> Mesh:
    """1-D mesh over THIS HOST's devices only.

    Multi-host batch mode partitions slides across hosts (one host = one
    subset of images, api/annotator.py); each host then runs its own
    per-slide programs on its local chips with no cross-host collectives
    — per-slide work needs only ICI (SURVEY §5), and hosts running
    different dispatch counts must not share a global mesh."""
    from ribca_tpu.utils.cache import ensure_compile_cache

    ensure_compile_cache()
    devices = None
    if platform and platform not in ("cuda", "gpu"):
        try:
            devices = jax.local_devices(backend=platform)
        except RuntimeError:
            devices = None
    if devices is None:
        devices = jax.local_devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def host_image_shard(n_images: int, process_index: int,
                     process_count: int) -> list[int]:
    """Round-robin slide assignment for multi-host batch processing:
    host p takes images p, p+P, p+2P, ... (deterministic, no
    coordination)."""
    return list(range(process_index, n_images, process_count))


def maybe_init_distributed() -> bool:
    """Initialize ``jax.distributed`` for multi-host batch processing when
    the standard coordinator env vars are present (SURVEY §5: cross-host
    DCN only matters if batch mode scales to multi-host pods; per-slide
    work needs only ICI). Safe no-op on a single host. Returns True when
    multi-host mode was initialized."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") is None:
        return False
    jax.distributed.initialize()
    get_mesh.cache_clear()  # mesh must span the global device set
    return True
