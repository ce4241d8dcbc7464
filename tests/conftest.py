"""Test bootstrap: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is exercised without TPU hardware via
``--xla_force_host_platform_device_count=8`` (the standard JAX way to test
distributed code, see SURVEY §4).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin initializes early and ignores in-process env vars;
# jax.config is the reliable switch.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent XLA compile cache: the suite compiles dozens of programs and
# CPU compiles are slow; cached across pytest runs. Keyed on the host CPU
# fingerprint (the library's own scheme — utils/cache.py documents why:
# XLA:CPU loads AOT executables compiled on a different machine generation
# with only a warning, and they can run orders of magnitude slower or
# abort outright).
from ribca_tpu.utils.cache import host_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.environ.get("RIBCA_TEST_CACHE", "/tmp/ribca_jax_cache"),
        host_fingerprint(),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_marker_file(tmp_path):
    def _write(markers, name="markers.txt"):
        p = tmp_path / name
        p.write_text("\n".join(markers) + "\n")
        return str(p)

    return _write
