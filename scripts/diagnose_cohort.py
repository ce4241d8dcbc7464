"""Itemize the warm cohort-predict budget (VERDICT r4 weak #1).

The 5-slide cohort predict (bench.py measure_cohort: 25k cells, ~1216^2
x7 uint16 slides, calibrated immune_base head) has measured 4.2-5.7k
cells/s/chip against a ~13k cells/s single-head ensemble floor, and the
residual has been asserted, never itemized. This script measures every
stage of the warm path STANDALONE (fetch-forced, median of repeats) and
reconciles the sum against the real ``Annotator.predict()`` wall:

  upload      - device_put of one staged uint16 slide (the real wire
                cost; quoted next to the probe rate)
  normalize   - normalize_image_masked on the staged slide (bg-subtract
                conv + blur + per-channel sort percentile + scale)
  stats_only  - the sort+percentile piece alone (pinned_nanpercentile
                over the 7 prenormed channels)
  extents     - host-side native mask scan
  extract     - fused patch gather for one full pack
  ensemble    - one packed ensemble dispatch (the known plateau)
  decode      - host TIFF+mask read

Prints a budget table with each stage x5 images vs the measured warm
predict() wall; the unexplained residual is dispatch gaps/host
bookkeeping. Run on the TPU host:

    python scripts/diagnose_cohort.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (cohort fixture + calibrated weights)


def timed(fn, repeats=5):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ribca_tpu.api.annotator import Annotator
    from ribca_tpu.engine.pipeline import (
        pack_size,
        preprocess_image,
        stage_image,
    )
    from ribca_tpu.io import read_mask
    from ribca_tpu.io.manifest import read_manifest, write_manifest
    from ribca_tpu.io.tiff_stream import open_image
    from ribca_tpu.ops.normalize import (
        normalize_image_masked,
        pinned_nanpercentile,
    )
    from ribca_tpu.ops.patches import extract_patches
    from ribca_tpu.utils.config import AnnotatorConfig
    from ribca_tpu.utils.wire import probe, probe_line

    wire = probe()
    print(probe_line(wire), file=sys.stderr)

    models_dir = bench._calibrated_models_dir()
    # build (or reuse) the bench cohort fixture
    rate, total = None, None
    cohort_dir = os.path.join(bench.E2E_DIR, "cohort")
    csv_path = os.path.join(cohort_dir, "batch.csv")
    marker_path = os.path.join(cohort_dir, "markers.txt")
    if not os.path.exists(csv_path):
        # measure_cohort builds the fixture as a side effect (and gives
        # the official number for this process)
        rate, total = bench.measure_cohort()

    import shutil
    import tempfile

    def predict_once():
        run_dir = tempfile.mkdtemp(prefix="ribca_diag_cohort_")
        config = AnnotatorConfig(
            marker_file=marker_path, csv_file=csv_path, main_dir=run_dir,
            batch_id="diag", strict=True, infer=False,
            models_dir=models_dir, allow_random_weights=False,
        )
        a = Annotator(config)
        a.preprocess()
        t0 = time.perf_counter()
        a.predict(config.batch_size)
        dt = time.perf_counter() - t0
        trace = dict(a.logger.timings)
        compiles = a.logger.compile_stats
        n = sum(r.n_cells for r in a.records)
        shutil.rmtree(run_dir, ignore_errors=True)
        return dt, n, trace, compiles, config

    # warm-up + official measurement
    walls = []
    dt, n_cells, trace, compiles, config = predict_once()
    walls.append(dt)
    print(f"predict #0 (may compile): {dt:.2f}s  {compiles}",
          file=sys.stderr)
    for i in range(3):
        dt, n_cells, trace, compiles, _ = predict_once()
        walls.append(dt)
        print(f"predict #{i+1}: {dt:.2f}s ({n_cells / dt:,.0f} cells/s) "
              f"{compiles}", file=sys.stderr)
    best = min(walls[1:])
    print("\nwarm predict trace (quiet sub-stages):", file=sys.stderr)
    for k, v in sorted(trace.items(), key=lambda kv: -kv[1]):
        if v > 0.02:
            print(f"  {k}: {v:.3f}s", file=sys.stderr)

    # -- standalone stage measurements -------------------------------------
    pairs = read_manifest(csv_path)
    img_path, mask_path = pairs[0]
    a = Annotator(AnnotatorConfig(
        marker_file=marker_path, csv_file=csv_path,
        main_dir=tempfile.mkdtemp(prefix="ribca_diag_m_"), batch_id="d",
        strict=True, infer=False, models_dir=models_dir,
        allow_random_weights=False,
    ))
    runner = a._ensure_runner()
    mesh = a.mesh
    cfg = a.config

    # decode (host)
    def do_decode():
        img = open_image(img_path)
        m = read_mask(mask_path)
        return np.asarray(img), m

    t_decode, _ = timed(do_decode, 3)
    image, mask = do_decode()
    img_bytes = image.nbytes

    # upload (wire): re-put the SAME host array each time
    st = stage_image(image, mask, cfg, mesh)
    from ribca_tpu.ops.shapes import pad_image_chw

    hb, wb = st.img_dev.shape[1], st.img_dev.shape[2]
    padded = pad_image_chw(image, hb, wb)

    def do_upload():
        d = jax.device_put(padded)
        d.block_until_ready()
        return d

    t_upload, ts_up = timed(do_upload, 5)

    # extents (host native scan)
    from ribca_tpu.ops.extents import cell_extents

    t_extents, _ = timed(
        lambda: cell_extents(st.mask_host, prefer_native=True), 3
    )

    # normalize (bg conv + blur + sort stats + scale), fetch-forced
    h, w = st.true_hw

    def do_normalize():
        out = normalize_image_masked(
            st.img_dev, h, w, blur=float(cfg.blur),
            amax=float(cfg.upper_limit),
        )
        float(jnp.sum(out[:, 0, :8]))
        return out

    t_norm, _ = timed(do_normalize, 5)

    # stats piece alone: sort-percentile over the 7 channels of the
    # prenormed image (the data the in-program stats see)
    import functools

    norm_out = do_normalize()

    @functools.partial(jax.jit, static_argnames=("amax",))
    def stats_only(img, amax):
        return jax.vmap(
            lambda ch: pinned_nanpercentile(ch, amax)
        )(img)

    def do_stats():
        r = stats_only(norm_out, float(cfg.upper_limit))
        float(jnp.sum(r))

    t_stats, _ = timed(do_stats, 5)

    # extract one full pack of windows
    img_zero, min_val, mask_dev, mask_host, ext, (th, tw) = (
        preprocess_image(st, None, cfg, mesh)
    )
    ids = ext.present_ids
    pk = pack_size(cfg, mesh.size)
    sel = ids[: min(pk, len(ids))]
    from ribca_tpu.parallel.mesh import cell_sharding_axis1

    args5 = np.zeros((5, pk), np.int32)
    args5[0, : len(sel)] = sel
    args5[1, : len(sel)] = ext.rmin[sel]
    args5[2, : len(sel)] = ext.rmax[sel]
    args5[3, : len(sel)] = ext.cmin[sel]
    args5[4, : len(sel)] = ext.cmax[sel]
    patch_size = int(40 * cfg.cell_size / 30.0)
    sh = cell_sharding_axis1(mesh)

    def do_extract():
        cells = jax.device_put(args5, sh)
        patches, avg = extract_patches(
            img_zero, min_val, mask_dev, cells, patch_size=patch_size,
            full_h=th, full_w=tw, prepadded=True,
        )
        float(jnp.sum(patches[:2, 0, 0]))
        return patches

    t_extract, _ = timed(do_extract, 5)
    patches = do_extract()

    # ensemble dispatch on one pack
    params, imp = runner._params_on_device()

    def do_ensemble():
        out = runner.run_chunk(patches)
        for v in out.values():
            np.asarray(v)

    t_ensemble, _ = timed(do_ensemble, 5)

    n_img = len(pairs)
    cells_per_img = n_cells / n_img
    packs_per_img = cells_per_img / pk
    budget = {
        "decode (host, overlapped)": t_decode,
        "upload": t_upload,
        "extents (host)": t_extents,
        "normalize(incl stats)": t_norm,
        "  of which stats sort": t_stats,
        "extract/pack x%.2f" % packs_per_img: t_extract * packs_per_img,
        "ensemble/pack x%.2f" % packs_per_img: t_ensemble * packs_per_img,
    }
    print(f"\nper-image standalone costs (image {img_bytes / 1e6:.0f} MB "
          f"uint16, {cells_per_img:,.0f} cells, pack {pk}):")
    for k, v in budget.items():
        print(f"  {k}: {v:.3f}s")
    serial = (t_upload + t_norm
              + (t_extract + t_ensemble) * packs_per_img)
    print(f"\nserial device+wire per image: {serial:.3f}s -> x{n_img} = "
          f"{serial * n_img:.2f}s; overlapped host decode+extents "
          f"{(t_decode + t_extents):.3f}s/img")
    print(f"measured warm predict: {best:.2f}s "
          f"({n_cells / best:,.0f} cells/s) -> unattributed residual "
          f"{best - serial * n_img:.2f}s")
    print(f"wire: {wire.get('mb_per_s')} MB/s; upload at "
          f"{img_bytes / 1e6 / t_upload:.0f} MB/s effective")
    if rate:
        print(f"official bench cohort rate this process: {rate:,.0f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
