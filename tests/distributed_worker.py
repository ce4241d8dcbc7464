"""Subprocess worker for the real 2-process jax.distributed test.

Each worker initializes jax.distributed against a localhost coordinator
(CPU backend, 2 virtual devices per process), runs a 4-slide batch
through the full Annotator, and prints a DONE line with the images it
annotated. The parent test (test_distributed.py) asserts each host
processed exactly its host_image_shard subset into its own per-host
result dir. Exercises SURVEY §2 row 25 / §5 "distributed comm backend"
as executed behavior rather than a monkeypatched claim.
"""

import json
import os
import sys

# env must be set before jax import
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, pid, n_proc, marker, csv_file, main_dir, cache = sys.argv[1:8]
    import jax

    # the axon TPU plugin ignores in-process env vars; jax.config is the
    # reliable switch (same note as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(n_proc),
        process_id=int(pid),
    )
    assert jax.process_count() == int(n_proc), jax.process_count()

    from ribca_tpu.api.annotator import Annotator
    from ribca_tpu.utils.config import AnnotatorConfig

    cfg = AnnotatorConfig(
        marker_file=marker, csv_file=csv_file, main_dir=main_dir,
        batch_id="mh", strict=True, infer=False, n_regions=0,
    )
    a = Annotator(cfg)
    a.preprocess()
    a.predict(64)
    a.export_annotations()
    print("DONE " + json.dumps({
        "process": jax.process_index(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "images": a._global_indices,
        "n_records": len(a.records),
        "result_dir": a.result_dir,
        "cells": [int(r.n_cells) for r in a.records],
    }), flush=True)


if __name__ == "__main__":
    main()
