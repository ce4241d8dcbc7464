"""warm_cache: AOT pre-compilation of the program ladder + compile
accounting in the trace (VERDICT r1 "next" #3)."""

import json
import os

import pytest

from ribca_tpu.api.annotator import Annotator
from ribca_tpu.engine.pipeline import dispatch_ladder
from ribca_tpu.panels.vocab import PANELS
from ribca_tpu.utils.config import AnnotatorConfig


def test_dispatch_ladder():
    assert dispatch_ladder(256, 1) == [64, 128, 256]
    # cap not a power of two still appears once, rounded to the mesh
    assert dispatch_ladder(96, 8) == [64, 96]
    assert dispatch_ladder(64, 8) == [64]


def test_effective_prefetch_depth():
    from ribca_tpu.engine.pipeline import effective_prefetch_depth
    from ribca_tpu.utils.config import AnnotatorConfig

    auto = AnnotatorConfig()          # prefetch_depth 0 = auto
    # 8192-cell pieces at 7 channels: ~367 MB each -> 5 fit in 2 GB
    assert effective_prefetch_depth(auto, 8192, 7) == 5
    # wide panel: bigger pieces, smaller queue (floor 2)
    assert effective_prefetch_depth(auto, 8192, 40) == 2
    # tiny pieces cap at 8
    assert effective_prefetch_depth(auto, 64, 7) == 8
    # explicit config always wins
    explicit = AnnotatorConfig(prefetch_depth=3)
    assert effective_prefetch_depth(explicit, 8192, 7) == 3


@pytest.fixture()
def cfg(tmp_path):
    mf = tmp_path / "markers.txt"
    mf.write_text("\n".join(PANELS["immune_base"]) + "\n")
    return AnnotatorConfig(
        marker_file=str(mf), main_dir=str(tmp_path), chunk_cells=128,
        compile_cache_dir="",
    )


def test_warm_cache_counts_programs(cfg, tmp_path):
    a = Annotator(cfg, models_dir=str(tmp_path / "empty"))
    # ladder {64, 128} -> 2 ensemble programs; one shape bucket adds
    # normalize (per source dtype: uint16 + f32) + the one-window NaN
    # pad + 2 extraction programs
    n = a.warm_cache(image_shapes=[(100, 90), (120, 110)])
    assert n == 2 + 2 + 1 + 2
    # backend compiles may be FEWER than n: the conftest's persistent
    # test cache absorbs repeat lowerings across pytest runs (cache hits
    # emit no backend_compile event on CPU). The listener itself is
    # verified by test_compile_listener_counts_fresh_program.
    stats = a.logger.compile_stats
    assert stats["xla.compile_count"] >= 0
    assert stats["xla.compile_secs"] >= 0


def test_compile_listener_counts_fresh_program(tmp_path):
    """The accounting itself: with the persistent cache bypassed, a
    brand-new program MUST raise the counters (guards against the
    monitoring-event listener silently breaking, in which case the
    cache-tolerant >= 0 assertions above would never notice)."""
    import jax
    import jax.numpy as jnp

    from ribca_tpu.utils.logging import Logger

    saved = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        logger = Logger(str(tmp_path))
        # fresh callable -> fresh trace; cache off -> real backend compile
        out = jax.jit(lambda x: x * 2.0 + 1.0)(
            jnp.arange(5, dtype=jnp.float32)
        )
        assert float(out[4]) == 9.0
        stats = logger.compile_stats
        assert stats["xla.compile_count"] >= 1
    finally:
        jax.config.update("jax_compilation_cache_dir", saved)


def test_trace_records_compiles(cfg, tmp_path):
    a = Annotator(cfg, models_dir=str(tmp_path / "empty"))
    a.warm_cache()
    a.logger.write_trace_summary()
    trace = json.load(open(
        os.path.join(str(tmp_path), "results", "trace.json")
    ))
    # count may be 0 when the persistent test cache absorbs every compile
    assert trace["xla.compile_count"] >= 0
    assert "warm.ensemble" in trace


def test_cli_warm_flag_parses():
    from ribca_tpu.cli import parse_args, _parse_warm_shapes

    args = parse_args([
        "--marker-list-path", "m.txt", "--batch-id", "b", "--warm-cache",
        "--warm-shapes", "3000x3000,2048x1024",
    ])
    assert args.warm_cache
    assert _parse_warm_shapes(args.warm_shapes) == [
        (3000, 3000), (2048, 1024)
    ]
    # image/batch still required without --warm-cache
    with pytest.raises(SystemExit):
        parse_args(["--marker-list-path", "m.txt", "--batch-id", "b"])
