"""bf16 vs f32 label agreement (VERDICT r3 weak #1).

The production compute dtype is bfloat16 (config.dtype); the reference
runs f32 torch (model.py:397-406). bf16 matmuls cannot produce
bit-identical logits, so labels can only be claimed compatible with a
MEASURED agreement bound. These tests measure it on peaked (confident)
softmax distributions — random init gives near-uniform probs whose
argmax is pure noise, so the head kernel is sharpened to produce
realistic confident margins (the calibrated-weights measurement runs in
bench.py and is reported on stderr every bench run):

* every cell whose f32 top-1/top-2 prob margin exceeds MARGIN_EPS gets
  the same label in both dtypes (flips live only inside the near-tie
  band);
* overall label agreement >= MIN_AGREEMENT;
* accepted-cell confidences agree within CONF_ATOL.
"""

import numpy as np
import pytest

from ribca_tpu.engine.ensemble import EnsembleRunner
from ribca_tpu.engine.voting import PanelProbs, merge_by_voting
from ribca_tpu.models.registry import ModelRegistry
from ribca_tpu.panels.parser import MarkerParser
from ribca_tpu.panels.vocab import PANELS

MARGIN_EPS = 0.05     # prob margin above which NO flip is tolerated
MIN_AGREEMENT = 0.98  # overall label agreement bound
CONF_ATOL = 0.02      # accepted-confidence tolerance between dtypes
N_CELLS = 512
SHARPEN = 24.0        # head-kernel scale -> confident softmax


class _SharpRegistry(ModelRegistry):
    """Deterministic random weights with the head kernel scaled so the
    softmax peaks like a trained head (median top-prob ~0.7-0.95)."""

    def classifier_params(self, panel: str):
        params = super().classifier_params(panel)
        params = dict(params)
        head = dict(params["head"])
        head["kernel"] = np.asarray(head["kernel"]) * SHARPEN
        params["head"] = head
        return params


def _runner(dtype):
    import jax.numpy as jnp

    from ribca_tpu.parallel.mesh import get_mesh

    parser = MarkerParser(strict=True)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as f:
        f.write("\n".join(PANELS["immune_base"]) + "\n")
    parser.parse(f.name)
    reg = _SharpRegistry("/nonexistent-use-random", allow_random=True)
    return EnsembleRunner(
        parser, reg, n_channels=7, infer=False,
        dtype={"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype],
        mesh=get_mesh(),
    )


@pytest.fixture(scope="module")
def probs_pair():
    rng = np.random.default_rng(11)
    # patch values in the normalized [-1, 1] range the pipeline emits
    patches = rng.uniform(-1, 1, size=(N_CELLS, 7, 40, 40)).astype(
        np.float32
    )
    out = {}
    for dtype in ("f32", "bf16"):
        r = _runner(dtype)
        out[dtype] = r.run_cells([(patches, N_CELLS)])["immune_base"]
    return out


def _labels(probs):
    return merge_by_voting(
        PanelProbs("immune_base", probs), None, None, 0.3,
        {"B cell": -1},
    )


def test_distribution_is_peaked(probs_pair):
    top = np.sort(probs_pair["f32"], axis=1)[:, -1]
    assert np.median(top) > 0.6, "sharpening failed; test is vacuous"


def test_no_flips_above_margin(probs_pair):
    f32, bf16 = probs_pair["f32"], probs_pair["bf16"]
    s = np.sort(f32, axis=1)
    margin = s[:, -1] - s[:, -2]
    la, _ = _labels(f32)
    lb, _ = _labels(bf16)
    flips = np.asarray([a != b for a, b in zip(la, lb)])
    assert not (flips & (margin > MARGIN_EPS)).any(), (
        f"{(flips & (margin > MARGIN_EPS)).sum()} flips above "
        f"margin {MARGIN_EPS}"
    )


def test_overall_agreement(probs_pair):
    la, ca = _labels(probs_pair["f32"])
    lb, cb = _labels(probs_pair["bf16"])
    agree = np.mean([a == b for a, b in zip(la, lb)])
    assert agree >= MIN_AGREEMENT, f"agreement {agree:.4f}"
    both = (ca >= 0) & (cb >= 0)
    np.testing.assert_allclose(ca[both], cb[both], atol=CONF_ATOL)
