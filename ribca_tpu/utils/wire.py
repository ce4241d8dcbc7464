"""Host->device wire-rate probe.

The tunneled TPU's host->device bandwidth swings 10-30x between sessions
(BASELINE.md: 20-40 MB/s observed in one session vs ~340 MB/s-1.4 GB/s
in another, with no code change), so any wall-clock number recorded
without the wire rate next to it cannot be compared across sessions —
a 2.1 GB whole-slide upload alone swings 6 s <-> 100 s. ``probe()``
times two fetch-forced ``device_put`` round trips and returns MB/s;
benchmarks and validators print it on stderr and store it in trace.json
next to every wall number they record. Production Annotator runs do NOT
probe (a 96 MB put costs seconds on a degraded link).

The reference has no analog: torch ``.to(device)`` on local PCIe never
varies enough to confound its (nonexistent) benchmarks.
"""

from __future__ import annotations

import time

import numpy as np


def probe(size_mb: int = 96, repeats: int = 2) -> dict:
    """Measure host->device transfer rate with ``repeats`` timed puts.

    Returns ``{"platform", "size_mb", "puts_s": [...], "mb_per_s"}``;
    ``mb_per_s`` is the best repeat (first puts can pay warm-up costs) and
    is ``None`` on the CPU backend, where device_put is a host-side copy
    and the number would be meaningless.
    """
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    platform = dev.platform
    if platform == "cpu":
        return {"platform": "cpu", "size_mb": size_mb, "puts_s": [],
                "mb_per_s": None}

    n = size_mb * (1 << 20) // 4
    x = np.empty(n, np.float32)
    x[:4096] = np.linspace(0.0, 1.0, 4096, dtype=np.float32)
    times = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        d = jax.device_put(x, dev)
        # block_until_ready over a tunneled device can return before the
        # transfer completes; a tiny value fetch cannot
        float(jnp.sum(d[:64]))
        times.append(time.perf_counter() - t0)
        del d
    return {
        "platform": platform,
        "size_mb": size_mb,
        "puts_s": [round(t, 3) for t in times],
        "mb_per_s": round(size_mb / min(times), 1),
    }


def probe_line(result: dict) -> str:
    """One-line human summary for stderr / logs."""
    if result.get("mb_per_s") is None:
        return f"wire probe: skipped (platform={result.get('platform')})"
    return (
        f"wire probe: {result['mb_per_s']} MB/s host->device "
        f"({result['size_mb']} MB puts: "
        + "/".join(f"{t:.2f}s" for t in result["puts_s"]) + ")"
    )
