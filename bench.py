"""Benchmark: ensemble patch-inference throughput (cells/sec/chip).

North-star metric from BASELINE.md: cells/sec through the full-panel
ensemble (immune_full ViT-l + structure ViT-s + nerve ViT-tiny, the
reference's heaviest configuration, model.py:188-239) on one chip.

Measurement methodology (robust to remote/tunneled devices where
dispatches are asynchronous and host wall-clock around un-fetched results
is meaningless): the ensemble step is wrapped in a ``lax.fori_loop`` whose
carry feeds each iteration's input from the previous iteration's output,
forcing N strictly sequential executions inside ONE executable; timing the
difference between an N2-iteration and an N1-iteration run cancels
constant dispatch/fetch overheads. Patches are generated on device (no
host->device transfer in the timed path, matching production where
patches are extracted on device from the uploaded image).

The reference repo publishes no numbers (BASELINE.md), so the baseline is
MEASURED: the same ensemble workload through torch at the reference's
default batch size 128 (main.py:88) on this host's CPU — the only platform
the reference can run on here — using the independent torch mirror models
from tests/torch_mirror.py. Cached in BENCH_BASELINE.json. ``vs_baseline``
is ours / baseline (higher is better).

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
CHUNK = int(os.environ.get("RIBCA_BENCH_CHUNK", 4096))
N1, N2 = 2, 12


def measure_tpu() -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _combined_marker_parse
    from ribca_tpu.engine.ensemble import EnsembleRunner
    from ribca_tpu.models.registry import ModelRegistry
    from ribca_tpu.parallel.mesh import get_mesh

    mesh = get_mesh()
    parser, n_channels = _combined_marker_parse()
    registry = ModelRegistry("/nonexistent-use-random", allow_random=True)
    runner = EnsembleRunner(
        parser, registry, n_channels=n_channels, infer=False,
        dtype=jnp.bfloat16, mesh=mesh,
    )
    params, imp = runner._params_on_device()
    specs = runner.specs

    def ensemble(patches, params, imp):
        # same body the runner compiles (engine/ensemble.py)
        from ribca_tpu.ops.patches import apply_panel_gather

        out = []
        for s in specs:
            x = apply_panel_gather(patches, s.gather)
            logits = s.model.apply({"params": params[s.panel]}, x)
            out.append(jax.nn.softmax(logits.astype(jnp.float32), -1))
        return out

    @jax.jit
    def chained(key, n, params, imp):
        # dynamic n -> ONE executable for both timing points
        patches = jax.random.normal(
            key, (CHUNK, n_channels, 40, 40), jnp.float32
        )

        def body(i, carry):
            probs = ensemble(patches + carry, params, imp)
            return 1e-9 * sum(p.sum() for p in probs)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    key = jax.random.PRNGKey(0)

    def timed(n):
        t0 = time.perf_counter()
        float(chained(key, n, params, imp))  # fetch forces execution
        return time.perf_counter() - t0

    timed(N1)  # compile
    # median of 3 delta pairs: the device may be shared/tunneled, so a
    # single pair is noisy
    deltas = []
    for _ in range(3):
        t_short = timed(N1)
        t_long = timed(N2)
        deltas.append(t_long - t_short)
    dt = float(np.median(deltas))
    if dt <= 0:
        return CHUNK * N2 / t_long
    return CHUNK * (N2 - N1) / dt


def measure_torch_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["cells_per_sec"]

    import torch

    from tests.torch_mirror import TorchViT

    torch.manual_seed(0)
    heads = [
        TorchViT(in_chans=15, num_classes=12, dim=576),  # immune_full
        TorchViT(in_chans=7, num_classes=6, dim=288),    # structure
        TorchViT(in_chans=3, num_classes=2, dim=144),    # nerve
    ]
    for h in heads:
        h.eval()
    bs = 128  # reference default (main.py:88)
    n_batches = 2
    x15 = torch.randn(bs, 15, 40, 40)
    with torch.no_grad():
        for h, c in zip(heads, (15, 7, 3)):  # warmup
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
    baseline = measure_torch_baseline()
    ours = measure_tpu()
    print(json.dumps({
        "metric": "ensemble_inference_throughput",
        "value": round(ours, 1),
        "unit": "cells/sec/chip",
        "vs_baseline": round(ours / baseline, 2),
    }))


if __name__ == "__main__":
    main()
