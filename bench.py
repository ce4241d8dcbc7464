"""Benchmark: both north-star metrics (BASELINE.json) plus the MAE path.

Metrics (all on one chip):

1. ``ensemble_inference_throughput`` — cells/sec through the full-panel
   ensemble (immune_full ViT-l + structure ViT-s + nerve ViT-tiny, the
   reference's heaviest head set, model.py:188-239), imputation off. This
   is the primary metric of the printed JSON line.
2. ``ensemble_infer_throughput`` — the same ensemble with the immune_full
   MAE imputer active (two markers missing, within the panel's budget of
   3): measures the heaviest model in the repo (768-wide MAE encoder +
   512-wide decoder, markerImputer.py:294-329) fused into the ensemble
   program.
3. ``e2e_single_image_seconds`` — end-to-end single-image wall time on
   the BASELINE.md scenario: synthetic 3000x3000x7 uint16 image with
   ~20k cells, immune_base panel, full CLI pipeline (read + preprocess +
   predict + vote + heatmap + regions + neighborhood + export + colorize
   + composition, main.py:19-27) with reference defaults; warm-cache run
   is reported (cold-run compile time is logged separately in stderr).
4. ``cohort_throughput`` — cells/sec through a 5-slide batch
   ``Annotator.predict()`` (the reference batch loop, main.py:39-52):
   small slides whose tails share packed ensemble dispatches
   (engine/packer.py) and whose shapes share one canonical program set
   (ops/shapes.py). The VERDICT r1 criterion: cohort cells/s should not
   degrade below the single-image plateau.
5. ``analytics_tissue_region_200k`` — cells/sec through the whole-slide
   tissue-region pipeline (fused multiscale kNN features + device
   PCA+k-means) at 200k cells vs the same flow on the host sklearn route
   (the reference's single-core path, spatial_methods.py:154-193).

Measurement methodology for 1-2 (robust to remote/tunneled devices where
dispatches are asynchronous and host wall-clock around un-fetched results
is meaningless): the ensemble step is wrapped in a ``lax.fori_loop`` whose
carry feeds each iteration's input from the previous iteration's output,
forcing N strictly sequential executions inside ONE executable; timing the
difference between an N2-iteration and an N1-iteration run cancels
constant dispatch/fetch overheads. Patches are generated on device (no
host->device transfer in the timed path). Metric 3 is a real wall-clock:
every pipeline stage materializes host-side outputs, so the clock cannot
run ahead of the device.

Weights: metrics 1-2 time pure device forwards, where values cannot
change the FLOPs — they run the registry's deterministic random init.
Metrics 3-4 run CALIBRATED weights (models/calibrate.py): the fixtures
plant per-cell types with biology-style marker signatures and the
immune_base head is fine-tuned on that distribution, so softmax
peaking, voting accept rates, the Others fraction, and region
composition are representative of a real run; the e2e scenario also
reports its planted-type accuracy on stderr.

The reference repo publishes no numbers (BASELINE.md), so baselines are
MEASURED: the same workloads through torch at the reference's default
batch sizes (bs=128 inference, 64-per-forward MAE; main.py:88,
preprocess.py:129) on this host's CPU — the only platform the reference
can run on here — using the independent torch mirrors from
tests/torch_mirror.py. Cached in BENCH_BASELINE.json. ``vs_baseline`` is
ours / baseline for throughputs and baseline / ours for the e2e time
(higher is better for all).

Prints ONE JSON line: the primary metric's {"metric", "value", "unit",
"vs_baseline"} plus an "extra" list carrying the other two metrics in the
same shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_CACHE = os.path.join(REPO, "BENCH_BASELINE.json")
CHUNK = int(os.environ.get("RIBCA_BENCH_CHUNK", 4096))
N1, N2 = 2, 12
E2E_DIR = os.environ.get("RIBCA_BENCH_E2E_DIR", "/tmp/ribca_bench_e2e")
E2E_SIZE = 3000
E2E_CELLS = 20000


def _build_runner(infer: bool):
    """Full-panel EnsembleRunner; with ``infer`` the immune_full parse is
    missing two markers so the MAE imputer joins the fused program."""
    import tempfile

    import jax.numpy as jnp

    from ribca_tpu.engine.ensemble import EnsembleRunner
    from ribca_tpu.models.registry import ModelRegistry
    from ribca_tpu.panels.parser import MarkerParser
    from ribca_tpu.panels.vocab import PANELS
    from ribca_tpu.parallel.mesh import get_mesh

    markers = sorted({m for v in PANELS.values() for m in v})
    if infer:
        # exclusive to immune_full; 2 missing <= budget 3 (markerParse.py:33)
        markers = [m for m in markers if m not in ("Granzyme B", "Trypase")]
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("\n".join(markers) + "\n")
    parser = MarkerParser(strict=not infer)
    parser.parse(f.name)

    registry = ModelRegistry("/nonexistent-use-random", allow_random=True)
    runner = EnsembleRunner(
        parser, registry, n_channels=len(markers), infer=infer,
        dtype=jnp.bfloat16, mesh=get_mesh(),
    )
    if infer and not any(s.imputer is not None for s in runner.specs):
        raise RuntimeError("imputer path not active; nothing to measure")
    return runner, len(markers)


def _chained_throughput(runner, n_channels: int) -> float:
    """cells/sec through the runner's fused forward, chained-loop timed."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    params, imp = runner._params_on_device()

    @jax.jit
    def chained(key, n, params, imp):
        # dynamic n -> ONE executable for both timing points
        patches = jax.random.normal(
            key, (CHUNK, n_channels, 40, 40), jnp.float32
        )

        def body(i, carry):
            probs = runner.forward(patches + carry, params, imp)
            return 1e-9 * sum(p.sum() for p in probs.values())

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


def measure_tpu() -> float:
    runner, n_channels = _build_runner(infer=False)
    return _chained_throughput(runner, n_channels)


def measure_tpu_mesh(n_devices: int) -> float:
    """Ensemble throughput over an ``n_devices`` data-parallel mesh
    (``python bench.py --mesh N``): the same chained-loop methodology
    with the patch batch sharded on the cell axis and params replicated —
    the multi-chip scaling number drops out the day N real chips exist.
    On CPU (JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count)
    it validates the sharded timing path, not absolute speed."""
    import tempfile

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ribca_tpu.engine.ensemble import EnsembleRunner
    from ribca_tpu.models.registry import ModelRegistry
    from ribca_tpu.panels.parser import MarkerParser
    from ribca_tpu.panels.vocab import PANELS
    from ribca_tpu.parallel.mesh import (
        cell_sharding,
        get_mesh,
        replicated_sharding,
    )

    mesh = get_mesh(n_devices)
    markers = sorted({m for v in PANELS.values() for m in v})
    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as f:
        f.write("\n".join(markers) + "\n")
    parser = MarkerParser(strict=True)
    parser.parse(f.name)
    registry = ModelRegistry("/nonexistent-use-random", allow_random=True)
    runner = EnsembleRunner(
        parser, registry, n_channels=len(markers), infer=False,
        dtype=jnp.bfloat16, mesh=mesh,
    )
    params, imp = runner._params_on_device()

    chunk = CHUNK - CHUNK % n_devices or n_devices
    rng = np.random.default_rng(0)
    patches = jax.device_put(
        rng.normal(size=(chunk, len(markers), 40, 40)).astype(np.float32),
        cell_sharding(mesh),
    )

    # shardings ride on the committed input arrays (device_put above);
    # jit propagates them, so no in_shardings spec is needed here
    @jax.jit
    def chained(patches, n, params, imp):
        def body(i, carry):
            probs = runner.forward(patches + carry, params, imp)
            return 1e-9 * sum(p.sum() for p in probs.values())

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        float(chained(patches, n, params, imp))
        return time.perf_counter() - t0

    timed(N1)
    deltas = []
    for _ in range(3):
        t_short = timed(N1)
        t_long = timed(N2)
        deltas.append(t_long - t_short)
    dt = float(np.median(deltas))
    if dt <= 0:
        return chunk * N2 / t_long
    return chunk * (N2 - N1) / dt


def measure_tpu_infer() -> float:
    runner, n_channels = _build_runner(infer=True)
    return _chained_throughput(runner, n_channels)


CALIB_PARAMS = dict(n_cells=4096, image_hw=(1024, 1024), epochs=6, seed=0)


def _calibration_fingerprint() -> str:
    """Hash of the calibration code + parameters: the driver bench runs
    from a fresh /tmp every round, so the calibrated weights persist
    under ~/.cache keyed on exactly what would change their values —
    the calibrate.py source and the calibration call parameters."""
    import hashlib

    import ribca_tpu.models.calibrate as calib_mod

    h = hashlib.sha256()
    with open(calib_mod.__file__, "rb") as f:
        h.update(f.read())
    h.update(repr(sorted(CALIB_PARAMS.items())).encode())
    return h.hexdigest()[:16]


def _calibrated_models_dir() -> str:
    """Weights dir holding a calibrated immune_base head (persistent).

    The e2e/cohort scenarios run planted-signature fixtures with a head
    fine-tuned on that distribution (models/calibrate.py), so voting
    accept rates, Others fraction, and region composition are
    representative — random weights make every cell fall below the 0.3
    confidence line (VERDICT r2 weak #5). The weights live under
    ~/.cache/ribca_tpu/calibrated/<fingerprint>/ so repeated bench
    invocations (the driver pays ~200 s per calibration) reuse them;
    ``python bench.py --recalibrate`` forces a rebuild."""
    import shutil

    d = os.path.join(
        os.path.expanduser(
            os.environ.get("RIBCA_CALIB_CACHE",
                           "~/.cache/ribca_tpu/calibrated")
        ),
        _calibration_fingerprint(),
    )
    npz = os.path.join(d, "immune_base.npz")
    acc_path = os.path.join(d, "immune_base.acc")
    if "--recalibrate" in sys.argv and os.path.isdir(d):
        shutil.rmtree(d)
    if not os.path.exists(npz):
        from ribca_tpu.models.calibrate import calibrate_panel

        t0 = time.perf_counter()
        r = calibrate_panel("immune_base", d, **CALIB_PARAMS)
        with open(acc_path, "w") as f:
            f.write(f"{r.holdout_accuracy}")
        print(
            f"calibrated immune_base in {time.perf_counter() - t0:.1f}s: "
            f"holdout acc {r.holdout_accuracy:.3f} (cached -> {d})",
            file=sys.stderr,
        )
    else:
        acc = None
        if os.path.exists(acc_path):
            with open(acc_path) as f:
                acc = f.read().strip()[:5]
        print(
            f"reusing cached calibration {d} (holdout acc {acc}); "
            "pass --recalibrate to rebuild",
            file=sys.stderr,
        )
    return d


def _typed_slide(img_path, mask_path, types_path, hw: int, n_cells: int,
                 seed: int):
    """Write a planted-type immune_base slide fixture (cached)."""
    from PIL import Image

    from ribca_tpu.io import write_tiff
    from ribca_tpu.models.calibrate import (
        make_typed_cells,
        panel_signatures,
        typed_image,
    )

    if (os.path.exists(img_path) and os.path.exists(mask_path)
            and os.path.exists(types_path)):
        return
    sig = panel_signatures("immune_base")
    mask, types = make_typed_cells(hw, hw, n_cells, sig.shape[0],
                                   radius=8, seed=seed)
    img = typed_image(mask, types, sig, seed=seed)
    write_tiff(img_path, img)
    Image.fromarray(mask.astype(np.uint16)).save(mask_path)
    np.save(types_path, types)


def _planted_accuracy(result_dir: str, types_path: str) -> float | None:
    """Planted-type accuracy from a run's annotation CSV (None when the
    CSV is absent)."""
    import csv
    import glob

    from ribca_tpu.panels.vocab import PANEL_CLASS_MAPS

    csvs = glob.glob(os.path.join(result_dir, "*_annotation_*.csv"))
    if not csvs:
        return None
    types = np.load(types_path)
    names = PANEL_CLASS_MAPS["immune_base"]
    correct = total = 0
    for path in csvs:
        with open(path) as f:
            for row in csv.DictReader(f):
                cid = int(row["Cell Index"])
                if not (1 <= cid <= len(types)):
                    continue
                total += 1
                correct += row["Cell Type"] == names[int(types[cid - 1])]
    return correct / max(total, 1)


def _e2e_fixture():
    """Synthetic 3000x3000x7 uint16 slide, ~20k planted-type cells
    (cached)."""
    from ribca_tpu.panels.vocab import PANELS

    os.makedirs(E2E_DIR, exist_ok=True)
    img_path = os.path.join(E2E_DIR, "slide_typed.tif")
    mask_path = os.path.join(E2E_DIR, "mask_typed.png")
    types_path = os.path.join(E2E_DIR, "types.npy")
    marker_path = os.path.join(E2E_DIR, "markers.txt")
    _typed_slide(img_path, mask_path, types_path, E2E_SIZE, E2E_CELLS,
                 seed=0)
    with open(marker_path, "w") as f:
        f.write("\n".join(PANELS["immune_base"]) + "\n")
    return marker_path, img_path, mask_path, types_path


def measure_e2e() -> tuple[float, int]:
    """(warm wall seconds, n_cells) for the full single-image CLI flow."""
    import shutil
    import tempfile

    from ribca_tpu import cli
    from ribca_tpu.utils.config import AnnotatorConfig

    marker_path, img_path, mask_path, types_path = _e2e_fixture()
    models_dir = _calibrated_models_dir()

    def once(keep_csv: bool = False):
        run_dir = tempfile.mkdtemp(prefix="ribca_bench_run_")
        config = AnnotatorConfig(
            marker_file=marker_path, image_path=img_path,
            mask_path=mask_path, main_dir=run_dir, batch_id="bench",
            strict=True, infer=False, models_dir=models_dir,
            allow_random_weights=False,
        )
        t0 = time.perf_counter()
        cli.run(config, bs=config.batch_size,
                n_regions=config.n_regions)
        dt = time.perf_counter() - t0
        acc = (
            _planted_accuracy(os.path.join(run_dir, "results"),
                              types_path)
            if keep_csv else None
        )
        shutil.rmtree(run_dir, ignore_errors=True)
        return dt if not keep_csv else (dt, acc)

    cold = once()  # compiles (persistent cache makes reruns cheap)
    # best of N warm runs: the tunneled device is shared and run-to-run
    # contention can inflate a warm run 3-4x (observed: a 9.0 s cohort
    # predict measuring 28 s minutes earlier, identical code and zero
    # compiles both times) — the min is the honest capability number.
    # Adaptive N: keep sampling (3..6) until a second sample lands within
    # 25% of the min, so a noisy window doesn't freeze a 2x-inflated
    # number into the record.
    warms = [once(), once()]
    last, acc = once(keep_csv=True)
    warms.append(last)
    while (
        len(warms) < 6
        and sorted(warms)[1] > 1.25 * min(warms)
    ):
        warms.append(once())
    warm = min(warms)
    print(
        f"e2e cold={cold:.1f}s warm={warms} "
        f"planted-type accuracy={acc if acc is None else round(acc, 3)}",
        file=sys.stderr,
    )
    # collapse detector: a head that degenerates to one class scores
    # ~0.2 here (uniform 5-type planting); healthy calibrations measure
    # ~0.75-0.80 (confusions + below-confidence cells voted Others)
    if acc is not None and acc < 0.5:
        print(
            f"WARNING: planted-type e2e accuracy {acc:.3f} < 0.5 — the "
            "calibrated head did not generalize to the e2e fixture; "
            "voting distributions in this run are NOT representative",
            file=sys.stderr,
        )
    return warm, E2E_CELLS


COHORT_SLIDES = 5
COHORT_SIZE = 1200
COHORT_CELLS = 5000


def measure_cohort() -> tuple[float, int]:
    """(warm predict cells/sec, total cells) for a 5-slide batch run."""
    import shutil
    import tempfile

    from PIL import Image

    from ribca_tpu.api.annotator import Annotator
    from ribca_tpu.io import write_tiff
    from ribca_tpu.io.manifest import write_manifest
    from ribca_tpu.models.calibrate import (
        make_typed_cells,
        panel_signatures,
        typed_image,
    )
    from ribca_tpu.panels.vocab import PANELS
    from ribca_tpu.utils.config import AnnotatorConfig

    models_dir = _calibrated_models_dir()
    cohort_dir = os.path.join(E2E_DIR, "cohort")
    os.makedirs(cohort_dir, exist_ok=True)
    sig = panel_signatures("immune_base")
    pairs = []
    for i in range(COHORT_SLIDES):
        img_path = os.path.join(cohort_dir, f"slide_typed_{i}.tif")
        mask_path = os.path.join(cohort_dir, f"mask_typed_{i}.png")
        if not (os.path.exists(img_path) and os.path.exists(mask_path)):
            # slightly different sizes: exercises canonical shape buckets
            hw = COHORT_SIZE + 16 * i
            mask, types = make_typed_cells(hw, hw, COHORT_CELLS,
                                           sig.shape[0], radius=5,
                                           seed=100 + i)
            img = typed_image(mask, types, sig, seed=100 + i)
            write_tiff(img_path, img)
            Image.fromarray(mask.astype(np.uint16)).save(mask_path)
        pairs.append((img_path, mask_path))
    marker_path = os.path.join(cohort_dir, "markers.txt")
    with open(marker_path, "w") as f:
        f.write("\n".join(PANELS["immune_base"]) + "\n")
    csv_path = os.path.join(cohort_dir, "batch.csv")
    write_manifest(pairs, csv_path)

    def once():
        run_dir = tempfile.mkdtemp(prefix="ribca_bench_cohort_")
        config = AnnotatorConfig(
            marker_file=marker_path, csv_file=csv_path, main_dir=run_dir,
            batch_id="bench", strict=True, infer=False,
            models_dir=models_dir, allow_random_weights=False,
        )
        a = Annotator(config)
        a.preprocess()
        t0 = time.perf_counter()
        a.predict(config.batch_size)
        dt = time.perf_counter() - t0
        compiles = a.logger.compile_stats
        shutil.rmtree(run_dir, ignore_errors=True)
        return dt, compiles

    cold, cold_c = once()
    # best of N warm runs (shared-tunnel contention; see measure_e2e —
    # the spread between warm runs of identical zero-compile code has
    # measured 9.0 s vs 28.0 s on this chip); adaptive 3..6 as in
    # measure_e2e
    runs = [once(), once(), once()]
    while (
        len(runs) < 6
        and sorted(r[0] for r in runs)[1] > 1.25 * min(r[0] for r in runs)
    ):
        runs.append(once())
    warm, warm_c = min(runs, key=lambda r: r[0])
    total = COHORT_SLIDES * COHORT_CELLS
    print(
        f"cohort cold={cold:.1f}s ({cold_c}) warm={warm:.1f}s ({warm_c}) "
        f"[runs: {'/'.join(f'{r[0]:.1f}' for r in runs)}]",
        file=sys.stderr,
    )
    return total / warm, total


def measure_dtype_agreement() -> dict:
    """bf16-vs-f32 label agreement on a CALIBRATED typed slide (VERDICT
    r3 weak #1): the production dtype is bfloat16 while the reference
    runs f32 torch, so the 'compatible maps' claim must carry a measured
    number. Runs one cohort slide through predict() in both dtypes and
    reports flip rate + confidence-delta histogram on stderr."""
    import shutil
    import tempfile

    from ribca_tpu.api.annotator import Annotator
    from ribca_tpu.io.manifest import write_manifest
    from ribca_tpu.utils.config import AnnotatorConfig

    models_dir = _calibrated_models_dir()
    cohort_dir = os.path.join(E2E_DIR, "cohort")
    img_path = os.path.join(cohort_dir, "slide_typed_0.tif")
    mask_path = os.path.join(cohort_dir, "mask_typed_0.png")
    marker_path = os.path.join(cohort_dir, "markers.txt")

    out = {}
    for dtype in ("float32", "bfloat16"):
        run_dir = tempfile.mkdtemp(prefix="ribca_bench_dtype_")
        csv_path = os.path.join(run_dir, "one.csv")
        write_manifest([(img_path, mask_path)], csv_path)
        a = Annotator(AnnotatorConfig(
            marker_file=marker_path, csv_file=csv_path, main_dir=run_dir,
            batch_id="dt", strict=True, infer=False, dtype=dtype,
            models_dir=models_dir, allow_random_weights=False,
        ))
        a.preprocess()
        a.predict()
        out[dtype] = (list(a.annotations[0]),
                      np.asarray(a.confidence[0]))
        shutil.rmtree(run_dir, ignore_errors=True)

    la, ca = out["float32"]
    lb, cb = out["bfloat16"]
    n = len(la)
    flips = np.asarray([x != y for x, y in zip(la, lb)])
    agreement = 1.0 - flips.sum() / max(n, 1)
    both = (ca >= 0) & (cb >= 0)
    delta = np.abs(ca[both] - cb[both])
    edges = [0, 1e-4, 1e-3, 1e-2, 0.05, 1.0]
    histo = np.histogram(delta, bins=edges)[0]
    print(
        f"bf16-vs-f32 on calibrated slide ({n} cells): label agreement "
        f"{agreement:.4f} ({int(flips.sum())} flips), confidence |delta| "
        f"max {delta.max() if len(delta) else 0.0:.4g}, histogram "
        + " ".join(
            f"[{lo:g},{hi:g}):{c}"
            for lo, hi, c in zip(edges[:-1], edges[1:], histo)
        ),
        file=sys.stderr,
    )
    return {"agreement": float(agreement), "n": n,
            "flips": int(flips.sum())}


ANALYTICS_N = 200_000
ANALYTICS_TYPES = 12
ANALYTICS_SIZE = 8000


def measure_analytics() -> tuple[float, float]:
    """(cells/sec, host-baseline cells/sec) through the whole-slide
    tissue-region feature+cluster path at 200k cells: fused multiscale
    composition on the grid-binned device kNN (ops/knn.py) + device
    PCA+k-means (ops/cluster.py). Baseline: the same flow forced down the
    host sklearn route (ball-tree kNN + sklearn PCA/KMeans — the
    reference's own single-core path, spatial_methods.py:154-193),
    measured once and cached."""
    from ribca_tpu.analytics import spatial

    rng = np.random.default_rng(0)
    im = {
        "cell_ids": np.arange(1, ANALYTICS_N + 1),
        "mean_row": rng.uniform(0, ANALYTICS_SIZE, ANALYTICS_N),
        "mean_col": rng.uniform(0, ANALYTICS_SIZE, ANALYTICS_N),
        "type_ids": rng.integers(0, ANALYTICS_TYPES, ANALYTICS_N),
    }

    def once():
        t0 = time.perf_counter()
        out = spatial.tissue_region_partition([im], n_clusters=3)
        assert len(out[0]) == ANALYTICS_N
        return time.perf_counter() - t0

    cold = once()
    samples = [once(), once(), once()]
    while (
        len(samples) < 5
        and sorted(samples)[1] > 1.25 * min(samples)
    ):
        samples.append(once())
    warm = min(samples)
    print(f"analytics cold={cold:.1f}s warm={warm:.1f}s "
          f"[samples: {'/'.join(f'{s:.1f}' for s in samples)}]",
          file=sys.stderr)

    cached = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
    base_rate = cached.get("analytics_cells_per_sec")
    if not base_rate:
        # force the host route: drop below every device-routing threshold
        # by slicing to a size the thresholds exceed is WRONG (different
        # work) — instead monkeypatch the routing constants high
        from ribca_tpu.ops import cluster as cl
        from ribca_tpu.ops import knn as knn_mod

        saved = (knn_mod.DEVICE_KNN_MIN, knn_mod.BINNED_KNN_MIN,
                 cl.DEVICE_CLUSTER_MIN)
        knn_mod.DEVICE_KNN_MIN = knn_mod.BINNED_KNN_MIN = 1 << 60
        cl.DEVICE_CLUSTER_MIN = 1 << 60
        try:
            t0 = time.perf_counter()
            out = spatial.tissue_region_partition([im], n_clusters=3)
            assert len(out[0]) == ANALYTICS_N
            base_secs = time.perf_counter() - t0
        finally:
            (knn_mod.DEVICE_KNN_MIN, knn_mod.BINNED_KNN_MIN,
             cl.DEVICE_CLUSTER_MIN) = saved
        base_rate = ANALYTICS_N / base_secs
        cached["analytics_cells_per_sec"] = base_rate
        with open(BASELINE_CACHE, "w") as f:
            json.dump(cached, f)
    return ANALYTICS_N / warm, float(base_rate)


def _measure_torch_baselines() -> dict:
    """Measured torch-CPU reference-equivalents (cached across runs)."""
    cached = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
    needed = {"cells_per_sec", "infer_cells_per_sec", "base_cells_per_sec"}
    if needed <= set(cached):
        return cached

    import torch

    from tests.torch_mirror import TorchMAE, TorchViT

    torch.manual_seed(0)
    bs = 128  # reference default (main.py:88)
    heads = [
        TorchViT(in_chans=15, num_classes=12, dim=576),  # immune_full
        TorchViT(in_chans=7, num_classes=6, dim=288),    # structure
        TorchViT(in_chans=3, num_classes=2, dim=144),    # nerve
    ]
    for h in heads:
        h.eval()
    x15 = torch.randn(bs, 15, 40, 40)

    def time_ensemble():
        n_batches = 2
        with torch.no_grad():
            for h, c in zip(heads, (15, 7, 3)):  # warmup
                h(x15[:, :c])
            t0 = time.perf_counter()
            for _ in range(n_batches):
                for h, c in zip(heads, (15, 7, 3)):
                    torch.softmax(h(x15[:, :c]), dim=1)
            return bs * n_batches / (time.perf_counter() - t0)

    def time_mae():
        # immune_full mosaic (3,5) -> 120x200, reference-internal bs=64
        # (preprocess.py:129); 13 of 15 tokens kept (2 markers imputed)
        mae = TorchMAE(img_size=(120, 200))
        mae.eval()
        mb = 64
        imgs = torch.randn(mb, 1, 120, 200)
        ids_keep = torch.arange(13)
        ids_restore = torch.arange(15)
        with torch.no_grad():
            mae(imgs, ids_keep, ids_restore)  # warmup
            t0 = time.perf_counter()
            mae(imgs, ids_keep, ids_restore)
            return mb / (time.perf_counter() - t0)

    def time_base():
        base = TorchViT(in_chans=7, num_classes=5, dim=288)  # immune_base
        base.eval()
        n_batches = 4
        x7 = torch.randn(bs, 7, 40, 40)
        with torch.no_grad():
            base(x7)  # warmup
            t0 = time.perf_counter()
            for _ in range(n_batches):
                torch.softmax(base(x7), dim=1)
            return bs * n_batches / (time.perf_counter() - t0)

    ens = cached.get("cells_per_sec") or time_ensemble()
    mae_rate = time_mae()
    # with imputation on, every cell pays one MAE forward plus the ensemble
    infer_rate = 1.0 / (1.0 / ens + 1.0 / mae_rate)
    cached = {
        "cells_per_sec": ens,
        "infer_cells_per_sec": infer_rate,
        "mae_cells_per_sec": mae_rate,
        "base_cells_per_sec": time_base(),
        "platform": "torch-cpu",
        "batch_size": bs,
    }
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cached, f)
    return cached


def main():
    from ribca_tpu.utils.cache import install_stderr_aot_filter
    from ribca_tpu.utils.wire import probe, probe_line

    # drop benign same-host AOT tuning-feature spray from the recorded
    # stderr (real ISA mismatches pass through — utils/cache.py)
    install_stderr_aot_filter()
    # wire rate first: the tunneled link swings 10-30x between sessions
    # (BASELINE.md), so every wall number below is only comparable
    # across sessions WITH this number next to it
    try:
        wire = probe()
        print(probe_line(wire), file=sys.stderr)
    except Exception as exc:
        print(f"wire probe failed: {exc!r}", file=sys.stderr)
        wire = {"mb_per_s": None, "error": repr(exc)}
    if "--mesh" in sys.argv:
        n = int(sys.argv[sys.argv.index("--mesh") + 1])
        rate = measure_tpu_mesh(n)
        print(json.dumps({
            "metric": f"ensemble_inference_throughput_mesh{n}",
            "value": round(rate, 1),
            "unit": "cells/sec",
            "vs_baseline": 0.0,
            "wire_mb_per_s": wire.get("mb_per_s"),
        }))
        return
    baseline = _measure_torch_baselines()
    ours = measure_tpu()
    infer_ours = measure_tpu_infer()
    e2e_seconds, n_cells = measure_e2e()
    cohort_rate, _ = measure_cohort()
    try:
        agreement = measure_dtype_agreement()
    except Exception as exc:  # never let the extra metric kill the line
        print(f"dtype agreement metric failed: {exc!r}", file=sys.stderr)
        agreement = None
    try:
        analytics_rate, analytics_base = measure_analytics()
    except Exception as exc:  # never let the extra metric kill the line
        print(f"analytics metric failed: {exc!r}", file=sys.stderr)
        analytics_rate = None
    # the baseline e2e estimate charges the reference only its model
    # forwards (immune_base head at torch-CPU rate) — no preprocess or
    # analytics cost — i.e. a conservative lower bound on its wall time
    e2e_baseline = n_cells / baseline["base_cells_per_sec"]
    print(json.dumps({
        "metric": "ensemble_inference_throughput",
        "value": round(ours, 1),
        "unit": "cells/sec/chip",
        "vs_baseline": round(ours / baseline["cells_per_sec"], 2),
        "wire_mb_per_s": wire.get("mb_per_s"),
        "extra": [
            {
                "metric": "ensemble_infer_throughput",
                "value": round(infer_ours, 1),
                "unit": "cells/sec/chip",
                "vs_baseline": round(
                    infer_ours / baseline["infer_cells_per_sec"], 2
                ),
            },
            {
                "metric": "e2e_single_image_wall",
                "value": round(e2e_seconds, 2),
                "unit": "seconds",
                "vs_baseline": round(e2e_baseline / e2e_seconds, 2),
            },
            {
                "metric": "cohort_throughput",
                "value": round(cohort_rate, 1),
                "unit": "cells/sec/chip",
                "vs_baseline": round(
                    cohort_rate / baseline["base_cells_per_sec"], 2
                ),
            },
        ] + ([
            {
                "metric": "bf16_f32_label_agreement",
                "value": round(agreement["agreement"], 4),
                "unit": "fraction",
                # reference parity target: f32 torch labels (1.0)
                "vs_baseline": round(agreement["agreement"], 4),
            },
        ] if agreement else []) + ([
            {
                "metric": "analytics_tissue_region_200k",
                "value": round(analytics_rate, 1),
                "unit": "cells/sec/chip",
                "vs_baseline": round(analytics_rate / analytics_base, 2),
            },
        ] if analytics_rate else []),
    }))


if __name__ == "__main__":
    main()
