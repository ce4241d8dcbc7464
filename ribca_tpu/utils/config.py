"""Unified run configuration.

The reference exposes the same hyperparameters through three surfaces with
identical semantics (argparse in ``main.py:56-112``, magicgui fields in
``_widget.py:124-158,505-539``, and JSON files ``hyperparameters.json`` /
``hyperparams{,_batch}.json``). Here there is ONE dataclass; the CLI and
the JSON job API are thin adapters over it.

Names and defaults follow the reference CLI (``main.py:56-112``) and the
example ``hyperparameters.json``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

from ribca_tpu.panels.vocab import CELL_TYPES


def default_cell_type_confidence() -> dict[str, float]:
    """All-(-1) per-type threshold map (reference ``model.py:162-167``)."""
    return {name: -1 for name in CELL_TYPES}


@dataclasses.dataclass
class AnnotatorConfig:
    # inputs
    marker_file: str = ""
    image_path: Optional[str] = None   # single-image mode
    mask_path: Optional[str] = None
    csv_file: Optional[str] = None     # batch mode: csv with image_path,mask_path

    # run identity / placement
    device: str = "tpu"                # "tpu" | "cpu" (jax platform hint)
    main_dir: str = "./"
    batch_id: str = ""

    # pipeline knobs (reference names & defaults)
    batch_size: int = 128              # main.py:88-89
    strict: bool = False               # main.py:70-71 (store_true)
    infer: bool = True                 # main.py:72-73
    normalize: bool = True             # main.py:78-79
    blur: float = 0.3                  # main.py:80-81
    upper_limit: float = 99.8          # "amax"; main.py:82-83
    confidence: float = 0.3            # main.py:84-85
    cell_size: int = 30                # main.py:90-91
    min_cells: int = -1                # main.py:74-75
    n_regions: int = 3                 # main.py:76-77
    n_jobs: int = 0                    # main.py:92-93
    cell_type_confidence: Optional[dict] = None

    # TPU-native extensions (absent from the reference)
    dtype: str = "bfloat16"            # compute dtype of the model ensemble
    # fuse the ensemble vote-merge into the device program: only the
    # 3-scalar per-cell vote stats (argmax / winning vote / min-Others)
    # cross the wire instead of per-panel prob matrices (~12 B/cell vs up
    # to ~80 B/cell; thresholds still apply on host, so re-voting with
    # different confidences stays exact). False drains full per-panel
    # probs and merges on host — the dict-oracle parity path.
    device_voting: bool = True
    # dispatched-ahead work the host may queue before blocking on device
    # results; 0 = auto (bounded to ~2 GB of in-flight patch buffers,
    # engine/pipeline.effective_prefetch_depth). Deeper queues let host
    # decode/staging overlap device compute on serialized links.
    prefetch_depth: int = 0
    data_parallel: bool = True         # shard the cell axis over all chips
    use_native_scanner: bool = True    # C++ mask scanner when built
    chunk_cells: int = 65536           # cells per device dispatch (cap)
    # cells per PACKED ensemble dispatch: the cohort packer
    # (engine/packer.py) fills buffers of this size across images, so
    # bucket padding is paid once per run; throughput is flat from ~2k
    # cells up (BASELINE.md), so 8192 trades nothing for HBM headroom
    pack_cells: int = 8192
    profile_dir: Optional[str] = None  # jax.profiler trace output dir
    # whole-slide images above this f32 footprint stream through the
    # banded pipeline (engine/tiled.py) instead of living in HBM whole
    device_image_budget_bytes: int = 2 << 30
    # banded runs whose f32 prenorm fits this many bytes of HBM keep it
    # device-resident: one decode + one upload per band, exact statistics
    # (engine/tiled.py cache mode). -1 = auto-size from the device's
    # actual free memory (leaving headroom for in-flight patch buffers
    # and XLA scratch); the two-pass histogram flow reads every pixel
    # twice, so a bigger true budget is a direct whole-slide win.
    device_prenorm_cache_bytes: int = -1
    # TIFF stacks above this decoded size are opened as streaming readers
    # so band decode overlaps upload/compute inside one slide (the banded
    # cache mode keeps the result bit-identical to the single-shot path)
    stream_decode_bytes: int = 64 << 20
    # banded pipeline row-band height override; 0 = auto (sized from the
    # device budget, then bounded below by the per-upload byte floor —
    # tunneled links charge a large fixed cost per device_put, so many
    # small band uploads are overhead-dominated; engine/tiled.py)
    tiled_band_rows: int = 0
    # persistent XLA compile cache (cold-start compiles are expensive,
    # minutes on remote-compiled TPU); "" disables
    compile_cache_dir: str = "~/.cache/ribca_tpu/xla"
    # round uploaded images up to a canonical shape ladder (ops/shapes.py)
    # so a cohort of similar-sized images reuses one set of compiled
    # programs; masked statistics + clamped gathers keep results bitwise
    # equal for blur=0 and ~1e-5 allclose with a blur kernel
    # (test_shapes.py). False uploads exact shapes (one compile set per
    # shape).
    canonical_shapes: bool = True
    # banded cache mode: compute the exact per-channel percentile scalars
    # with the histogram-refinement select (ops/quantile.py; O(N) passes,
    # bitwise identical to the nanpercentile sort, test_quantile.py).
    # False restores the per-channel device sort (~45 s at 12288²x7).
    exact_select_stats: bool = True
    # TIFF stacks above this decoded size stream from disk band-by-band
    # (io/tiff_stream.py) instead of materializing in host RAM
    host_image_budget_bytes: int = 8 << 30
    # run with random-initialized weights when checkpoints are missing
    # (loudly logged + stderr warning); False makes missing weights fatal
    allow_random_weights: bool = True
    # checkpoint directory for the model registry; None = the package's
    # bundled weights dir (the reference hardcodes cwd-relative .pth
    # paths, model.py:189-239 — here the location is a config knob)
    models_dir: Optional[str] = None
    # multi-host batch runs (jax.distributed initialized): partition the
    # manifest's slides across hosts round-robin, each host annotating
    # its subset on its LOCAL chips (no cross-host collectives). Each
    # host writes results_host<i>/ with globally-numbered per-image
    # files; integrated outputs cover that host's shard only (logged).
    # False replicates all slides on every host.
    multi_host_image_sharding: bool = True

    def __post_init__(self):
        if self.cell_type_confidence is None:
            self.cell_type_confidence = default_cell_type_confidence()

    # -- adapters -----------------------------------------------------------

    @property
    def amax(self) -> float:
        return self.upper_limit

    @classmethod
    def from_json(cls, path: str, **overrides) -> "AnnotatorConfig":
        """Load a reference-style hyperparameters json (single or batch)."""
        with open(path) as f:
            raw = json.load(f)
        return cls.from_dict(raw, **overrides)

    @classmethod
    def from_dict(cls, raw: dict, **overrides) -> "AnnotatorConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        alias = {
            "image_file": "image_path",
            "mask_file": "mask_path",
            "amax": "upper_limit",
        }
        for key, value in raw.items():
            key = alias.get(key, key)
            if key in known and value is not None:
                kwargs[key] = value
        kwargs.update(overrides)
        return cls(**kwargs)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def loggable_hyperparameters(self) -> dict:
        """The subset the reference logs (``model.py:106-117``)."""
        return {
            "Batch name": self.batch_id,
            "Strictly match panel(s)": self.strict,
            "Normalize image(s)": self.normalize,
            "Image blurring kernel size": self.blur,
            "Percentile of intensity to upper clip": self.upper_limit,
            "Confidence threshold": self.confidence,
            "Estimated cell size (in pixels)": self.cell_size,
        }
