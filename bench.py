"""Benchmark: ensemble patch-inference throughput (cells/sec/chip).

North-star metric from BASELINE.md: cells/sec through the full-panel
ensemble (immune_full ViT-l + structure ViT-s + nerve ViT-tiny, the
reference's heaviest configuration, model.py:188-239) on one chip.

The reference repo publishes no numbers (BASELINE.md), so the baseline is
MEASURED: the same ensemble workload through torch at the reference's
default batch size 128 (main.py:88) on this host's CPU — the only platform
the reference can run on here — using the independent torch mirror models
from tests/torch_mirror.py. The measurement is cached in
BENCH_BASELINE.json so repeated runs are cheap. ``vs_baseline`` is
ours / baseline (higher is better).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
)
CHUNK = 8192
WARMUP = 3
ITERS = 10


def measure_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _runner
    from ribca_tpu.parallel.mesh import get_mesh

    mesh = get_mesh()
    runner, _ = _runner(mesh, jnp.bfloat16, n_chunk=CHUNK)
    rng = np.random.default_rng(0)
    # full-channel patch chunk (channel count = combined marker list)
    n_channels = max(max(s.gather.gather_idx) for s in runner.specs) + 1
    patches = jax.device_put(
        rng.normal(size=(CHUNK, n_channels, 40, 40)).astype(np.float32),
    )

    for _ in range(WARMUP):
        out = runner.run_chunk(patches)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = runner.run_chunk(patches)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return CHUNK * ITERS / dt


def measure_torch_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["cells_per_sec"]

    import torch

    from tests.torch_mirror import TorchViT

    torch.manual_seed(0)
    heads = [
        TorchViT(in_chans=15, num_classes=12, embed_dim=576),  # immune_full
        TorchViT(in_chans=7, num_classes=6, embed_dim=288),    # structure
        TorchViT(in_chans=3, num_classes=2, embed_dim=144),    # nerve
    ]
    for h in heads:
        h.eval()
    bs = 128  # reference default (main.py:88)
    n_batches = 4
    x15 = torch.randn(bs, 15, 40, 40)
    with torch.no_grad():
        # warmup
        for h, c in zip(heads, (15, 7, 3)):
            h(x15[:, :c])
        t0 = time.perf_counter()
        for _ in range(n_batches):
            for h, c in zip(heads, (15, 7, 3)):
                torch.softmax(h(x15[:, :c]), dim=1)
        dt = time.perf_counter() - t0
    cells_per_sec = bs * n_batches / dt
    with open(BASELINE_CACHE, "w") as f:
        json.dump(
            {"cells_per_sec": cells_per_sec, "platform": "torch-cpu",
             "batch_size": bs},
            f,
        )
    return cells_per_sec


def main():
    ours = measure_tpu()
    baseline = measure_torch_baseline()
    print(json.dumps({
        "metric": "ensemble_inference_throughput",
        "value": round(ours, 1),
        "unit": "cells/sec/chip",
        "vs_baseline": round(ours / baseline, 2),
    }))


if __name__ == "__main__":
    main()
