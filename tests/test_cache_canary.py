"""AOT-mismatch canary mechanics (utils/cache.purge_on_aot_mismatch).

The real trigger — an XLA:CPU AOT executable compiled on a different
machine generation — cannot be synthesized in-process, so these tests
pin the mechanics around it: platform gating, the fd-2 capture running a
real jitted canary without purging a healthy cache, and stderr surviving
the dup2 round-trip.
"""

import os

from ribca_tpu.utils import cache as cache_mod


def test_skips_without_cpu_platform(tmp_path, monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    marker = tmp_path / "x"
    marker.write_text("keep")
    assert cache_mod.purge_on_aot_mismatch(str(tmp_path)) is False
    assert marker.read_text() == "keep"


def test_healthy_cache_not_purged(tmp_path, monkeypatch):
    # conftest pins JAX_PLATFORMS=cpu for the suite; assert rather than set
    assert "cpu" in os.environ.get("JAX_PLATFORMS", "")
    marker = tmp_path / "healthy"
    marker.write_text("keep")
    assert cache_mod.purge_on_aot_mismatch(str(tmp_path)) is False
    assert marker.read_text() == "keep"
    # stderr fd restored: writing to fd 2 must not raise
    os.write(2, b"")


def test_foreign_feature_classifier():
    benign = (
        "E0820 12:11:41 8092 cpu_aot_loader.cc:210] Loading XLA:CPU AOT "
        "result. Target machine feature +prefer-no-gather is not  "
        "supported on the host machine.\n"
        "E0820 12:11:41 8092 cpu_aot_loader.cc:210] Target machine "
        "feature +prefer-no-scatter is not supported on the host machine."
    )
    assert cache_mod._foreign_aot_features(benign) == set()
    foreign = benign + (
        "\nE0820 12:11:42 8092 cpu_aot_loader.cc:210] Target machine "
        "feature +avx512vnni is not supported on the host machine."
    )
    assert cache_mod._foreign_aot_features(foreign) == {"avx512vnni"}
    # non-loader lines never classify
    assert cache_mod._foreign_aot_features(
        "Target machine feature +avx512f is not supported"
    ) == set()
