"""Annotator facade — the reference's public surface on the TPU pipeline.

Method-level parity with the reference Annotator (model.py:90-919):
``preprocess() predict(bs) generate_heatmap() export_annotations()
tissue_region_analysis(n) neighborhood_analysis() colorize()
cell_type_composition() umap_visualization() get_cell_type_names()
clear() clear_tmp()`` plus the attributes downstream code reads
(``channel_parser``, ``cell_types``, ``colors``, ``annotations``,
``confidence``, ``intensity_full``, ``tissue_regions``).

Internal dataflow is redesigned (SURVEY §7): preprocessing, patching,
imputation, and all five classifier heads run as fused XLA programs on the
device mesh (engine/), so ``preprocess()`` only resolves the manifest and
``predict()`` streams each image end-to-end — no tmp ``.pt`` files; the
``tmp/`` dir is still created and cleaned for workflow parity.

The canonical post-run ordering is the GUI flow (gui_api.py:13-43):
region analysis BEFORE export, so the CSV's Tissue Region column is
populated (the reference CLI orders these the other way and always writes
``None`` — SURVEY §3.1).
"""

from __future__ import annotations

import os

import numpy as np

from ribca_tpu.analytics import (
    find_extra_cell_types,
    neighborhood_analysis,
    tissue_region_partition,
)
from ribca_tpu.engine.ensemble import VOTE_STATS_KEY, EnsembleRunner
from ribca_tpu.engine.pipeline import run_image
from ribca_tpu.engine.voting import PanelProbs, finish_votes, merge_by_voting
from ribca_tpu.io import read_mask, read_manifest
from ribca_tpu.models.registry import ModelRegistry
from ribca_tpu.outputs import (
    color_legend,
    colorize_image,
    export_annotations_csv,
    get_colors,
    rgb_to_hex,
    save_png,
)
from ribca_tpu.outputs.plots import composition_pie, marker_heatmap, umap_scatter
from ribca_tpu.panels.parser import MarkerParser
from ribca_tpu.parallel.mesh import get_mesh
from ribca_tpu.utils.cache import enable_compile_cache as _enable_compile_cache
from ribca_tpu.utils.config import AnnotatorConfig
from ribca_tpu.utils.logging import Logger


class Annotator:
    def __init__(
        self,
        config: AnnotatorConfig | None = None,
        models_dir: str | None = None,
        mesh=None,
        **overrides,
    ):
        if config is None:
            config = AnnotatorConfig(**overrides)
        elif overrides:
            config = AnnotatorConfig(**{**config.to_dict(), **overrides})
        self.config = config

        self.main_dir = config.main_dir
        self.batch_id = config.batch_id
        # multi-host batch runs write per-host result dirs: on shared
        # storage, hosts emitting identically-named annotation_{i}.csv /
        # log.txt into one results/ would silently overwrite each other
        result_subdir = "results" + self._host_suffix(config)
        self.result_dir = os.path.join(self.main_dir, result_subdir)
        self.temp_dir = os.path.join(self.main_dir, "tmp")
        os.makedirs(self.result_dir, exist_ok=True)
        os.makedirs(self.temp_dir, exist_ok=True)

        self.logger = Logger(self.main_dir, subdir=result_subdir)
        self.logger.log_all_hyperparameters(
            config.loggable_hyperparameters()
        )
        self.logger.log("")
        self.logger.log("Start parsing the marker list.")

        self.channel_parser = MarkerParser(
            strict=config.strict, logger=self.logger
        )
        self.channel_parser.parse(config.marker_file)

        _enable_compile_cache(config.compile_cache_dir)
        self.registry = ModelRegistry(
            models_dir or config.models_dir, logger=self.logger,
            allow_random=config.allow_random_weights,
        )
        self.mesh = (
            mesh if mesh is not None
            else self._default_mesh(config)
        )

        self.confidence_thresh = config.confidence
        self.cell_type_confidence = dict(config.cell_type_confidence)
        self.min_cells = config.min_cells
        self.extra_cell_types = self.min_cells > 0
        self.n_regions = 0
        self.n_jobs = config.n_jobs

        # per-image state (filled by preprocess/predict)
        self._image_paths: list[str] = []
        self._mask_paths: list[str] = []
        self.records = []                  # engine.pipeline.ImageRecord
        self.annotations: list[list[str]] = []
        self.confidence: list[np.ndarray] = []
        self.annotations_all: list[list[dict]] = []
        self.cell_types = np.array([], dtype=object)
        self.colors: list = []
        self.tissue_regions: list[dict] | None = None
        self._runner = None
        # colorize_prefetch state (overlaps PNG render with device stages)
        self._colorize_thread = None
        self._colorize_err: BaseException | None = None
        self._colorize_args: tuple | None = None
        # plots_prefetch state (marker heatmap + composition pies on one
        # background thread, overlapping the device-bound region stage)
        self._plots_thread = None
        self._plots_err: BaseException | None = None
        self._plots_done: set[tuple] = set()
        # multi-host runs: manifest indices of THIS host's slides, so
        # per-image output filenames keep their global numbering
        self._global_indices: list[int] | None = None

    @staticmethod
    def _host_suffix(config) -> str:
        """"_host<i>" on multi-host slide-sharded runs, else ""."""
        try:
            import jax

            if (
                jax.process_count() > 1
                and getattr(config, "multi_host_image_sharding", True)
            ):
                return f"_host{jax.process_index()}"
        except Exception:
            pass
        return ""

    @staticmethod
    def _default_mesh(config):
        """Global mesh on a single host; LOCAL mesh when multi-host slide
        sharding is active (each host runs its own dispatch schedule —
        sharing a global mesh across hosts doing different work would
        deadlock collectives, parallel/mesh.get_local_mesh)."""
        import jax

        from ribca_tpu.parallel.mesh import get_local_mesh

        if (
            jax.process_count() > 1
            and getattr(config, "multi_host_image_sharding", True)
        ):
            return get_local_mesh(platform=config.device or None)
        return get_mesh(platform=config.device or None)

    # -- reference-shape constructor ----------------------------------------

    @classmethod
    def from_reference_args(
        cls, marker_list_path, image_path, device, main_dir="./",
        batch_id="", strict=True, infer=True, min_cells=-1, normalize=True,
        blur=0.0, amax=1.0, confidence=0.25, cell_size=30,
        cell_type_confidence=None, n_jobs=0, **kw,
    ) -> "Annotator":
        """Positional compatibility with the reference ctor (model.py:94)."""
        cfg = AnnotatorConfig(
            marker_file=marker_list_path, csv_file=image_path, device=device,
            main_dir=main_dir, batch_id=batch_id, strict=strict, infer=infer,
            min_cells=min_cells, normalize=normalize, blur=blur or 0.0,
            upper_limit=amax, confidence=confidence, cell_size=cell_size,
            cell_type_confidence=cell_type_confidence, n_jobs=n_jobs,
        )
        return cls(cfg, **kw)

    # -- pipeline -----------------------------------------------------------

    @property
    def intensity_full(self) -> list[np.ndarray]:
        return [r.intensity_full for r in self.records]

    @property
    def masks(self) -> list[np.ndarray]:
        return [r.mask for r in self.records]

    @property
    def _n_images(self) -> int:
        return len(self._image_paths)

    def preprocess(self) -> None:
        """Resolve the image/mask manifest. Device work happens in
        predict() — each image streams through preprocessing + ensemble in
        one pass without touching disk."""
        cfg = self.config
        if cfg.csv_file:
            pairs = read_manifest(cfg.csv_file)
            self._image_paths = [p for p, _ in pairs]
            self._mask_paths = [m for _, m in pairs]
        elif cfg.image_path and cfg.mask_path:
            self._image_paths = [cfg.image_path]
            self._mask_paths = [cfg.mask_path]
        else:
            raise ValueError(
                "Provide csv_file or image_path+mask_path in the config"
            )
        self.logger.log("\n")
        self.logger.log("Starting image processing...")

    def _ensure_runner(self) -> EnsembleRunner:
        if self._runner is None:
            if not self.channel_parser.any_panel:
                raise ValueError(
                    "No panels are applied. Please check the marker list."
                )
            # n_channels from the marker list length
            self._runner = EnsembleRunner(
                self.channel_parser,
                self.registry,
                n_channels=self.channel_parser.n_markers,
                infer=self.config.infer,
                dtype=_dtype_from_name(self.config.dtype),
                mesh=self.mesh,
                logger=self.logger,
                device_voting=getattr(self.config, "device_voting", True),
            )
            if self.registry.used_random:
                self.logger.log(
                    "RANDOM_WEIGHTS: one or more models are randomly "
                    "initialized — annotations in this run are "
                    "meaningless."
                )
                self.logger.set_flag("random_weights", True)
        return self._runner

    def warm_cache(self, image_shapes=None,
                   image_dtypes=("uint16", "float32")) -> int:
        """Pre-compile the pipeline's program ladder (AOT, no execution)
        into the persistent XLA compile cache, so production runs pay
        compile time once per cache lifetime instead of per process
        (the reference's eager loops have no warmup cost, main.py:39-52;
        under XLA a cold cohort otherwise spends minutes compiling).

        Always compiles the ensemble program for every dispatch-ladder
        bucket; with ``image_shapes`` (true (H, W) pairs) additionally
        compiles the normalization + patch-extraction programs for those
        images' canonical shape buckets. Returns the number of programs
        lowered."""
        import jax
        import jax.numpy as jnp

        from ribca_tpu.engine.pipeline import dispatch_ladder, pack_size
        from ribca_tpu.ops.normalize import halo_radius
        from ribca_tpu.ops.patches import extract_patches
        from ribca_tpu.ops.shapes import bucket_dim
        from ribca_tpu.parallel.mesh import (
            cell_sharding,
            replicated_sharding,
        )

        runner = self._ensure_runner()
        cfg = self.config
        n_dev = self.mesh.size
        c = self.channel_parser.n_markers
        # the packed pipeline never dispatches beyond the pack size
        ladder = dispatch_ladder(pack_size(cfg, n_dev), n_dev)
        params, imp = runner._params_on_device()
        # lower from shardings matching the runtime inputs (cell-sharded
        # patches, replicated images/masks) so the AOT executables hit the
        # same compile-cache keys the production calls use on multi-device
        # meshes
        cell_sh = cell_sharding(self.mesh)
        rep_sh = replicated_sharding(self.mesh)

        count = 0
        with self.logger.stage("warm.ensemble"):
            for size in ladder:
                sds = jax.ShapeDtypeStruct(
                    (size, c, 40, 40), jnp.float32, sharding=cell_sh
                )
                runner._fn.lower(sds, params, imp).compile()
                count += 1

        if image_shapes:
            patch = int(40 * cfg.cell_size / 30.0)
            pad_min = halo_radius(cfg.blur) if cfg.normalize else 0
            f32, i32 = jnp.float32, jnp.int32
            buckets = set()
            for h, w in image_shapes:
                if getattr(cfg, "canonical_shapes", True):
                    buckets.add((bucket_dim(h, pad_min),
                                 bucket_dim(w, pad_min)))
                else:
                    buckets.add((int(h), int(w)))
            with self.logger.stage("warm.image_programs"):
                from ribca_tpu.ops.normalize import (
                    cast_f32_masked,
                    normalize_image_masked,
                )

                for hb, wb in sorted(buckets):
                    # images upload in their SOURCE dtype (uint16 slides
                    # are half the wire bytes; pipeline.stage_image), so
                    # the normalize program is dtype-keyed — warm every
                    # dtype the cohort may decode to
                    for dt in image_dtypes:
                        img_sds = jax.ShapeDtypeStruct(
                            (c, hb, wb), jnp.dtype(dt), sharding=rep_sh
                        )
                        if cfg.normalize:
                            normalize_image_masked.lower(
                                img_sds, 0, 0,
                                blur=float(cfg.blur),
                                amax=float(cfg.upper_limit),
                            ).compile()
                        else:
                            cast_f32_masked.lower(img_sds, 0, 0).compile()
                        count += 1
                    # extract always sees the post-normalize f32 image,
                    # pre-padded one window (pipeline._pad_img_nan)
                    from ribca_tpu.engine.pipeline import _pad_img_nan

                    imgu_sds = jax.ShapeDtypeStruct(
                        (c, hb, wb), f32, sharding=rep_sh
                    )
                    _pad_img_nan.lower(imgu_sds, pad=patch).compile()
                    count += 1
                    imgf_sds = jax.ShapeDtypeStruct(
                        (c, hb + patch, wb + patch), f32, sharding=rep_sh
                    )
                    mask_sds = jax.ShapeDtypeStruct(
                        (hb + patch, wb + patch), i32, sharding=rep_sh
                    )
                    min_sds = jax.ShapeDtypeStruct(
                        (c,), f32, sharding=rep_sh
                    )
                    from ribca_tpu.parallel.mesh import (
                        cell_sharding_axis1,
                    )

                    cells_sh = cell_sharding_axis1(self.mesh)
                    for size in ladder:
                        cells_sds = jax.ShapeDtypeStruct(
                            (5, size), i32, sharding=cells_sh
                        )
                        extract_patches.lower(
                            imgf_sds, min_sds, mask_sds, cells_sds,
                            patch_size=patch, full_h=0, full_w=0,
                            prepadded=True,
                        ).compile()
                        count += 1
        self.logger.log(f"warm_cache: {count} programs lowered")
        return count

    def predict(self, batch_size: int | None = None) -> None:
        """Stream every image through the fused device pipeline, then merge
        votes exactly as model.py:481-639."""
        self.logger.log("\nStart predicting cell types and tissue structures.")
        runner = self._ensure_runner()
        cfg = self.config
        if batch_size:
            # reference bs semantics: a GPU micro-batch (default 128,
            # main.py:88). Naively mapping it to our dispatch size would
            # replace the tuned 65k-cell chunks with thousands of tiny
            # dispatches, so bs only LOWERS the chunk below a 4096 floor
            # when the user genuinely asks for less memory than that.
            cfg = AnnotatorConfig(**{
                **cfg.to_dict(),
                "chunk_cells": min(
                    cfg.chunk_cells, max(int(batch_size), 4096)
                ),
            })

        if not self._image_paths:
            self.preprocess()

        profiling = bool(cfg.profile_dir)
        if profiling:
            import jax

            jax.profiler.start_trace(cfg.profile_dir)
        try:
            self._predict_images(cfg, runner)
        finally:
            if profiling:
                import jax

                jax.profiler.stop_trace()
                self.logger.log(
                    f"Profiler trace written to {cfg.profile_dir}"
                )
        self.logger.log(
            "Finished predicting cell types and tissue structures."
        )

        with self.logger.stage("voting.merge"):
            self.merge_by_voting()

        # unique types, Others forced last (model.py:455-458)
        uniq = set()
        for labels in self.annotations:
            uniq.update(labels)
        cts = np.sort(np.array(list(uniq)))
        cts = np.delete(cts, np.where(cts == "Others"))
        self.cell_types = np.append(cts, "Others")
        self.colors = get_colors(len(self.cell_types))
        color_legend(
            self.result_dir,
            {
                str(self.cell_types[i]): rgb_to_hex(self.colors[i])
                for i in range(len(self.cell_types))
            },
        )
        self._build_annotations_all()

    def _predict_images(self, cfg, runner) -> None:

        # decode AND stage image i+1 on a host thread while image i runs
        # on device: TIFF/mask decode, canonical pad, the (async)
        # device_put uploads, and the extents scan all hide behind the
        # previous image's ensemble compute (the reference's only batch
        # overlap was disk .pt files)
        from concurrent.futures import ThreadPoolExecutor

        from ribca_tpu.engine.pipeline import stage_image

        def decode(paths):
            from ribca_tpu.io.tiff_stream import open_image

            img_path, mask_path = paths
            # stream anything beyond stream_decode_bytes: the banded
            # pipeline then overlaps decode with upload/compute inside the
            # slide (bit-identical via the prenorm cache, engine/tiled.py)
            image = open_image(
                img_path,
                host_budget_bytes=min(
                    cfg.host_image_budget_bytes,
                    getattr(cfg, "stream_decode_bytes",
                            cfg.host_image_budget_bytes),
                ),
            )
            # StagedImage for the single-shot path; raw (image, mask)
            # pass-through for slides that take the banded pipeline
            return stage_image(image, read_mask(mask_path), cfg, self.mesh)

        pairs = list(zip(self._image_paths, self._mask_paths))

        # multi-host batch: this host annotates its round-robin subset of
        # slides on its local chips (parallel/mesh.host_image_shard)
        import jax

        if (
            jax.process_count() > 1
            and getattr(cfg, "multi_host_image_sharding", True)
        ):
            from ribca_tpu.parallel.mesh import host_image_shard

            mine = host_image_shard(
                len(pairs), jax.process_index(), jax.process_count()
            )
            pairs = [pairs[i] for i in mine]
            self._image_paths = [p for p, _ in pairs]
            self._mask_paths = [m for _, m in pairs]
            self._global_indices = [int(i) for i in mine]
            self.logger.log(
                f"Multi-host batch: host {jax.process_index()}/"
                f"{jax.process_count()} takes {len(pairs)} image(s) "
                f"(manifest indices {self._global_indices}); results in "
                f"{self.result_dir}. NOTE: integrated outputs (heatmap, "
                "neighborhood, umap, composition) cover this host's "
                "shard only."
            )

        self.records = []
        # one packer for the whole cohort: tail cells of image i and head
        # cells of image i+1 share full ensemble dispatches, so bucket
        # padding is paid once per run instead of once per image
        from ribca_tpu.engine.packer import CohortPacker
        from ribca_tpu.engine.pipeline import pack_size

        from ribca_tpu.engine.pipeline import effective_prefetch_depth

        pk = pack_size(cfg, self.mesh.size)
        packer = CohortPacker(
            runner, pk, self.channel_parser.n_markers,
            prefetch_depth=effective_prefetch_depth(
                cfg, pk, self.channel_parser.n_markers
            ),
        )
        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = pool.submit(decode, pairs[0]) if pairs else None
            for i, (img_path, _) in enumerate(pairs):
                with self.logger.stage("io.read"):
                    item = pending.result()
                pending = (
                    pool.submit(decode, pairs[i + 1])
                    if i + 1 < len(pairs) else None
                )
                image, mask = item if isinstance(item, tuple) else (item,
                                                                    None)
                with self.logger.stage("device.pipeline"):
                    record = run_image(image, mask, cfg, runner,
                                       packer=packer, tracer=self.logger)
                self.records.append(record)
                self.logger.log(
                    f"Processed {os.path.basename(img_path)}: "
                    f"{record.n_cells} cells"
                )
            with self.logger.stage("device.finalize"):
                packer.finalize()
        self.logger.log(
            "Ensemble dispatch padding: "
            f"{packer.pad_fraction:.1%} of rows"
        )

    def merge_by_voting(self) -> None:
        self._nbhd_counts = None  # annotations change -> counts stale
        # prefetched figures rendered from the previous annotations are
        # stale too: join any in-flight render and force re-rendering
        self._plots_join()
        self._plots_done.clear()
        self.annotations, self.confidence = [], []
        for rec in self.records:
            if VOTE_STATS_KEY in rec.panel_probs:
                # device voting: the ensemble program already merged the
                # heads; apply the (current) thresholds on host — exact
                # for any confidence settings, including ones changed
                # after predict() (engine/voting.finish_votes)
                labels, conf = finish_votes(
                    rec.panel_probs[VOTE_STATS_KEY],
                    self._runner.vote_plan,
                    self.confidence_thresh, self.cell_type_confidence,
                )
                self.annotations.append(labels)
                self.confidence.append(conf)
                continue
            immune = structure = nerve = None
            for panel, probs in rec.panel_probs.items():
                pp = PanelProbs(panel, probs)
                if panel.startswith("immune"):
                    immune = pp
                elif panel == "structure":
                    structure = pp
                elif panel == "nerve_cell":
                    nerve = pp
            labels, conf = merge_by_voting(
                immune, structure, nerve,
                self.confidence_thresh, self.cell_type_confidence,
            )
            self.annotations.append(labels)
            self.confidence.append(conf)

        if self.extra_cell_types:
            find_extra_cell_types(
                self.annotations, self.confidence, self.intensity_full,
                min_cells=self.min_cells, logger=self.logger,
            )

    def _type_index(self) -> dict:
        return {str(t): i for i, t in enumerate(self.cell_types)}

    def _image_tag(self, i: int) -> int:
        """Global manifest index for local image ``i`` (multi-host runs
        keep their per-image output filenames globally numbered)."""
        if self._global_indices is not None and i < len(
            self._global_indices
        ):
            return self._global_indices[i]
        return i

    def _build_annotations_all(self) -> None:
        tindex = self._type_index()
        self.annotations_all = []
        for i, rec in enumerate(self.records):
            rows = []
            for j, cid in enumerate(rec.cell_ids):
                rows.append({
                    "Cell ID": int(cid),
                    "Cell type": tindex[self.annotations[i][j]],
                    "Confidence": float(self.confidence[i][j]),
                    "Row": float(rec.mean_row[j]),
                    "Column": float(rec.mean_col[j]),
                })
            self.annotations_all.append(rows)

    # -- analytics ----------------------------------------------------------

    def _analytics_images(self) -> list[dict]:
        tindex = self._type_index()
        out = []
        for i, rec in enumerate(self.records):
            out.append({
                "cell_ids": rec.cell_ids,
                "mean_row": rec.mean_row,
                "mean_col": rec.mean_col,
                "type_ids": np.asarray(
                    [tindex[lab] for lab in self.annotations[i]],
                    dtype=np.int64,
                ),
            })
        return out

    def neighborhood_analysis(
        self, n_neighbors: int = 25, integrate: bool = True,
        normalize: bool = True,
    ):
        """Reference default n_neighbors=25 via model.py:798.

        When a tissue-region pass already ran for these annotations, the
        co-occurrence matrices derive from its cached neighbor-type
        counts (same kNN answers, zero new queries) — a whole-slide
        neighborhood stage drops from a full device kNN sweep to a host
        scatter-add."""
        cached = getattr(self, "_nbhd_counts", None)
        counts_list = None
        if cached is not None and cached[0] == n_neighbors - 1 and len(
            cached[1]
        ) == len(self.records):
            counts_list = cached[1]
        with self.logger.stage("analytics.neighborhood"):
            return neighborhood_analysis(
                self._analytics_images(), self.cell_types,
                n_neighbors=n_neighbors, integrate=integrate,
                normalize=normalize, result_dir=self.result_dir,
                batch_id=self.batch_id,
                indices=(
                    [self._image_tag(i) for i in range(len(self.records))]
                    if self._global_indices is not None else None
                ),
                counts_list=counts_list,
            )

    # neighborhood co-occurrence counts cached off the tissue-region
    # feature kNN pass: the reference default n_neighbors=25 incl. self
    # (model.py:798), so the extra slice rides at k=24
    NEIGHBORHOOD_DEFAULT_NEIGHBORS = 25

    def tissue_region_analysis(self, n: int, method: str = "kmeans"):
        self.n_regions = n
        extra_k = self.NEIGHBORHOOD_DEFAULT_NEIGHBORS - 1
        with self.logger.stage("analytics.regions"):
            self.tissue_regions, counts = tissue_region_partition(
                self._analytics_images(), n, self.n_jobs, method=method,
                logger=self.logger, extra_k=extra_k,
            )
            # reusable only while the annotations (hence type_ids) stand;
            # merge_by_voting invalidates
            self._nbhd_counts = (extra_k, counts)
        return self.tissue_regions

    # -- outputs ------------------------------------------------------------

    def plots_prefetch(self, heatmap_integrate: bool = True,
                       composition_reduction: bool = True,
                       composition_integrate: bool = False) -> None:
        """Render the annotation-only figure outputs (marker heatmap +
        composition pies) on ONE background thread so their matplotlib
        wall time overlaps the device-bound ``tissue_region_analysis`` /
        ``neighborhood_analysis`` stages. ``generate_heatmap()`` /
        ``cell_type_composition()`` join the thread and skip re-rendering
        when called with the same arguments.

        pyplot state is global, so all figure rendering stays on this
        single thread while it runs; callers must join (via the
        corresponding methods) before rendering any other matplotlib
        figure — the CLI calls ``generate_heatmap()`` before
        ``neighborhood_analysis()`` (which plots from the caller's
        thread), preserving that invariant."""
        if not self.annotations or self._plots_thread is not None:
            return
        import threading

        # import the whole figure stack HERE, on the caller's thread,
        # before spawning: a first import of seaborn/matplotlib on the
        # background thread can deadlock against the main thread's own
        # first imports (sklearn/scipy in the concurrently-running
        # region stage) through Python's per-module import locks —
        # observed as a silent hang in a fresh-process CLI run (the
        # pytest suite never hit it because earlier tests had already
        # imported everything)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot  # noqa: F401
        import seaborn  # noqa: F401

        self._plots_err = None
        jobs = [
            ("heatmap", heatmap_integrate),
            ("composition", composition_reduction, composition_integrate),
        ]

        def work():
            try:
                # overlapped with device stages -> separate trace key,
                # like outputs.colorize_prefetch (trace readers must not
                # sum overlapped seconds into the critical path)
                with self.logger.stage("outputs.plots_prefetch",
                                       quiet=True):
                    for job in jobs:
                        if job[0] == "heatmap":
                            self._generate_heatmap(job[1])
                        else:
                            self._cell_type_composition(job[1], job[2])
                        self._plots_done.add(job)
            except BaseException as e:  # re-raised at join
                self._plots_err = e

        self._plots_thread = threading.Thread(
            target=work, daemon=True, name="plots-prefetch"
        )
        self._plots_thread.start()

    def _plots_join(self) -> None:
        t = self._plots_thread
        if t is None:
            return
        t.join()
        self._plots_thread = None
        if self._plots_err is not None:
            err, self._plots_err = self._plots_err, None
            raise err

    def generate_heatmap(self, integrate: bool = False) -> None:
        if not self.annotations:
            raise ValueError("No annotations to generate heatmap")
        with self.logger.stage("outputs.heatmap"):
            self._plots_join()
            if ("heatmap", integrate) in self._plots_done:
                return  # rendered by the prefetch thread
            self._generate_heatmap(integrate)

    def _generate_heatmap(self, integrate: bool) -> None:
        markers = self.channel_parser.markers
        if integrate:
            labels = [x for lab in self.annotations for x in lab]
            intensity = np.concatenate(self.intensity_full, axis=0)
            marker_heatmap(
                os.path.join(
                    self.result_dir, f"{self.batch_id}_Integrated_heatmap.png"
                ),
                labels, intensity, markers,
            )
        else:
            for i in range(len(self.annotations)):
                marker_heatmap(
                    os.path.join(
                        self.result_dir, f"{self.batch_id}_heatmap_{self._image_tag(i)}.png"
                    ),
                    self.annotations[i], self.intensity_full[i], markers,
                )

    def umap_visualization(self) -> None:
        if not self.annotations:
            raise ValueError("No annotations to visualize")
        intensity = np.concatenate(self.intensity_full, axis=0)
        labels = [x for lab in self.annotations for x in lab]
        umap_scatter(
            os.path.join(self.result_dir, f"{self.batch_id}_umap.png"),
            intensity, labels, self.cell_types, self.colors,
            logger=self.logger,
        )

    def export_annotations(self) -> None:
        if not self.annotations:
            raise ValueError("No annotations to export")
        with self.logger.stage("outputs.export"):
            self._export_annotations()

    def _export_annotations(self) -> None:
        for i, rec in enumerate(self.records):
            path = os.path.join(
                self.result_dir, f"{self.batch_id}_annotation_{self._image_tag(i)}.csv"
            )
            export_annotations_csv(
                path, rec.cell_ids, self.annotations[i], self.confidence[i],
                rec.mean_row, rec.mean_col,
                self.tissue_regions[i]
                if self.tissue_regions is not None else None,
            )
            self.logger.log(f"Exported annotations for image {i} to {path}")

    def colorize(self, from_script: bool = True,
                 working_dir: str | None = None) -> None:
        """Write colorized cell-type / confidence / tissue maps
        (model.py:806-858). ``from_script=False`` additionally writes the
        GUI label maps into ``working_dir`` (default
        <main_dir>/_working_dir_temp)."""
        if not self.records:
            raise ValueError("No masks to colorize")
        if not self.annotations:
            raise ValueError("No annotations to colorize")
        tindex = self._type_index()
        tissue_colors = (
            get_colors(self.n_regions + 1) if self.n_regions > 0 else None
        )
        if working_dir is None:
            working_dir = os.path.join(self.main_dir, "_working_dir_temp")

        with self.logger.stage("outputs.colorize"):
            if self._colorize_join() and self._colorize_args == (
                from_script, working_dir
            ):
                # cell-type/confidence maps already rendered by the
                # prefetch thread (overlapped with the device-bound
                # tissue-region stage); only the tissue maps remain
                self._colorize(tindex, tissue_colors, from_script,
                               working_dir, want_cell_maps=False)
            else:
                self._colorize(tindex, tissue_colors, from_script,
                               working_dir)

    def colorize_prefetch(self, from_script: bool = True,
                          working_dir: str | None = None) -> None:
        """Start rendering the tissue-region-independent colorized maps
        (cell-type + confidence) on a background thread, so their LUT
        paint + PNG encode overlap the device-bound
        ``tissue_region_analysis`` / ``neighborhood_analysis`` stages
        (the painter and PNG encoder run outside the GIL).
        ``colorize()`` joins the thread and paints only the remaining
        tissue maps; pass the same ``from_script``/``working_dir`` it
        will be called with, or the prefetch is discarded and colorize
        renders everything itself."""
        if not self.records or not self.annotations:
            return
        if self._colorize_thread is not None:
            return
        import threading

        tindex = self._type_index()
        if working_dir is None:
            working_dir = os.path.join(self.main_dir, "_working_dir_temp")
        self._colorize_err = None
        self._colorize_args = (from_script, working_dir)

        def work():
            try:
                # separate trace key: this stage's wall time OVERLAPS the
                # device-bound analytics stages (it can exceed its CPU
                # time on a busy host) — keeping it out of
                # outputs.colorize stops trace readers from summing
                # overlapped seconds into the critical path
                with self.logger.stage("outputs.colorize_prefetch",
                                       quiet=True):
                    self._colorize(tindex, None, from_script, working_dir,
                                   want_tissue=False)
            except BaseException as e:  # re-raised at join
                self._colorize_err = e

        self._colorize_thread = threading.Thread(
            target=work, daemon=True, name="colorize-prefetch"
        )
        self._colorize_thread.start()

    def _colorize_join(self) -> bool:
        """Wait for a pending colorize_prefetch; True if one completed."""
        t = self._colorize_thread
        if t is None:
            return False
        t.join()
        self._colorize_thread = None
        if self._colorize_err is not None:
            err, self._colorize_err = self._colorize_err, None
            raise err
        return True

    def _colorize(self, tindex, tissue_colors, from_script,
                  working_dir, want_cell_maps: bool = True,
                  want_tissue: bool = True) -> None:
        for i, rec in enumerate(self.records):
            type_ids = np.asarray(
                [tindex[lab] for lab in self.annotations[i]], dtype=np.int64
            )
            maps = colorize_image(
                rec.mask, rec.cell_ids, type_ids, self.confidence[i],
                self.colors,
                tissue_regions=(
                    self.tissue_regions[i]
                    if want_tissue and self.tissue_regions is not None
                    else None
                ),
                tissue_colors=tissue_colors if want_tissue else None,
                want_labels=not from_script,
                want_cell_maps=want_cell_maps,
            )
            rd, bid = self.result_dir, self.batch_id
            if want_cell_maps:
                save_png(
                    os.path.join(rd, f"{bid}_colorized_annotation_{self._image_tag(i)}.png"),
                    maps["cell_type_rgb"],
                )
                save_png(
                    os.path.join(rd, f"{bid}_confidence_{self._image_tag(i)}.png"),
                    maps["confidence_rgb"],
                )
            if "tissue_rgb" in maps:
                save_png(
                    os.path.join(rd, f"{bid}_tissue_region_{self._image_tag(i)}.png"),
                    maps["tissue_rgb"],
                )
            if not from_script:
                os.makedirs(working_dir, exist_ok=True)
                if want_cell_maps:
                    save_png(
                        os.path.join(working_dir, "output_img.png"),
                        maps["cell_type_labels"],
                    )
                if "tissue_labels" in maps:
                    save_png(
                        os.path.join(working_dir, "output_img_2.png"),
                        maps["tissue_labels"],
                    )
        if want_tissue and tissue_colors is not None:
            color_legend(
                self.result_dir,
                {
                    f"Region {k}": rgb_to_hex(tissue_colors[k])
                    for k in range(len(tissue_colors))
                },
                cell=False,
            )

    def cell_type_composition(
        self, reduction: bool = True, integrate: bool = False
    ) -> None:
        if not self.annotations:
            raise ValueError("No annotations to analyze")
        with self.logger.stage("outputs.composition"):
            self._plots_join()
            if ("composition", reduction, integrate) in self._plots_done:
                return  # rendered by the prefetch thread
            self._cell_type_composition(reduction, integrate)

    def _cell_type_composition(self, reduction: bool,
                               integrate: bool) -> None:
        if integrate:
            labels = [x for lab in self.annotations for x in lab]
            composition_pie(
                os.path.join(
                    self.result_dir,
                    f"{self.batch_id}_integrated_cell-type_composition.png",
                ),
                labels, self.cell_types, self.colors, reduction,
            )
        else:
            for i, labels in enumerate(self.annotations):
                composition_pie(
                    os.path.join(
                        self.result_dir,
                        f"{self.batch_id}_cell-type_composition_{self._image_tag(i)}.png",
                    ),
                    labels, self.cell_types, self.colors, reduction,
                )

    def get_cell_type_names(self) -> str:
        """3-per-line numbered legend text (model.py:689-697)."""
        txt = ""
        for i in range(len(self.cell_types)):
            txt += f"{i + 1}: {self.cell_types[i]}"
            txt += "\n" if i % 3 == 2 else "  "
        return txt

    def clear(self) -> None:
        self.records = []
        self.annotations = []
        self.confidence = []
        self.annotations_all = []

    def clear_tmp(self) -> None:
        if os.path.isdir(self.temp_dir):
            for f in os.listdir(self.temp_dir):
                os.remove(os.path.join(self.temp_dir, f))
            os.rmdir(self.temp_dir)
        self.logger.log("Temporary files cleared")
        # per-stage wall-time trace (SURVEY §5: the reference has none)
        self.logger.write_trace_summary()




def _dtype_from_name(name: str):
    import jax.numpy as jnp

    return {
        "bfloat16": jnp.bfloat16,
        "bf16": jnp.bfloat16,
        "float32": jnp.float32,
        "f32": jnp.float32,
    }[name]
