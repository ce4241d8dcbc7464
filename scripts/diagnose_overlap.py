"""Can host->device transfers overlap device compute over this link?

The cohort itemization (scripts/diagnose_cohort.py) measured warm
predict == the perfect SERIAL sum of upload + compute, implying zero
wire/compute overlap — on normal TPU hosts DMA engines overlap transfers
with compute, and the pipeline's decode-ahead thread is built on that
assumption (engine/pipeline.stage_image issues async device_put one
image ahead). This experiment isolates the question from the pipeline:

  puts     - N timed 20 MB device_puts (block_until_ready each)
  computes - N timed compute dispatches (~0.4 s chained matmul each)
  serial   - put; compute; put; compute; ... (forced alternation)
  threaded - all puts on a worker thread, computes on the main thread

If threaded ~= max(puts, computes): the link overlaps — pipeline overlap
is real and wire time hides behind compute. If threaded ~= puts +
computes: the link serializes RPCs and wire time is an INHERENT additive
cost at the measured MB/s (record it as such next to the cohort/e2e
numbers).

    python scripts/diagnose_overlap.py
"""

from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = 5
PUT_MB = 20


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ribca_tpu.utils.wire import probe, probe_line

    print(probe_line(probe(size_mb=32)), file=sys.stderr)

    x_host = np.random.default_rng(0).standard_normal(
        (PUT_MB * (1 << 20) // 4,)
    ).astype(np.float32)

    a = jnp.asarray(
        np.random.default_rng(1).standard_normal((2048, 2048)).astype(
            np.float32
        )
    )

    @jax.jit
    def compute(a, n):
        def body(i, m):
            return jnp.tanh(m @ a) * 0.999

        return lax.fori_loop(0, n, body, a)[0, 0]

    # calibrate the compute to ~0.5 s per dispatch (one cohort-image
    # ensemble cost). DELTA timing between two iteration counts — a
    # single small run is dominated by the tunnel's dispatch+fetch RTT
    # (~25 ms) and would overestimate per-iter cost ~30x.
    float(compute(a, 2))
    t0 = time.perf_counter()
    float(compute(a, 64))
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(compute(a, 1088))
    t_big = time.perf_counter() - t0
    per_iter = max((t_big - t_small) / 1024, 1e-7)
    n_iter = max(2, int(0.5 / per_iter))
    print(f"compute calibrated: {per_iter * 1e6:.0f} us/iter -> "
          f"{n_iter} iters (~0.5 s); rtt-ish floor "
          f"{t_small - 64 * per_iter:.3f}s", file=sys.stderr)

    def one_put():
        jax.device_put(x_host).block_until_ready()

    def one_compute():
        float(compute(a, n_iter))

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    # warm both paths
    one_put(), one_compute()

    t_puts = timed(lambda: [one_put() for _ in range(N)])
    t_computes = timed(lambda: [one_compute() for _ in range(N)])

    def serial():
        for _ in range(N):
            one_put()
            one_compute()

    t_serial = timed(serial)

    def threaded():
        th = threading.Thread(target=lambda: [one_put()
                                              for _ in range(N)])
        th.start()
        for _ in range(N):
            one_compute()
        th.join()

    t_threaded = timed(threaded)

    # the PIPELINE's puts carry a NamedSharding (replicated on the mesh,
    # engine/pipeline.stage_image) — device_put with an explicit
    # sharding takes a different PJRT path than the bare call above; if
    # THIS variant fails to overlap, the pipeline's missing overlap is
    # explained even though the link itself can
    from ribca_tpu.parallel.mesh import get_mesh, replicated_sharding

    rep = replicated_sharding(get_mesh())

    def one_put_sharded():
        jax.device_put(x_host, rep).block_until_ready()

    one_put_sharded()
    t_puts_sh = timed(lambda: [one_put_sharded() for _ in range(N)])

    def threaded_sharded():
        th = threading.Thread(
            target=lambda: [one_put_sharded() for _ in range(N)]
        )
        th.start()
        for _ in range(N):
            one_compute()
        th.join()

    t_threaded_sh = timed(threaded_sharded)
    print(f"sharded puts x{N}: {t_puts_sh:.2f}s; threaded with compute: "
          f"{t_threaded_sh:.2f}s (ideal {max(t_puts_sh, t_computes):.2f}, "
          f"additive {t_puts_sh + t_computes:.2f})")

    print(f"puts x{N} ({PUT_MB} MB): {t_puts:.2f}s "
          f"({N * PUT_MB / t_puts:.0f} MB/s)")
    print(f"computes x{N}: {t_computes:.2f}s")
    print(f"serial alternation: {t_serial:.2f}s")
    print(f"threaded overlap: {t_threaded:.2f}s")
    ideal = max(t_puts, t_computes)
    additive = t_puts + t_computes
    if additive - ideal < 0.2:
        print("inconclusive: compute and wire costs too close")
        return 0
    eff = (additive - t_threaded) / (additive - ideal)
    print(f"overlap efficiency: {eff:.0%} "
          f"(100% = wire fully hidden, 0% = link serializes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
