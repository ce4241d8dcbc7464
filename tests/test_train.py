"""Trainer: loss decreases, DP sharding executes on the virtual mesh,
checkpoints round-trip into the inference registry."""

import numpy as np
import pytest

from ribca_tpu.models.registry import ModelRegistry
from ribca_tpu.models.train import TrainConfig, Trainer
from ribca_tpu.parallel.mesh import get_mesh


@pytest.fixture(scope="module")
def toy_data(tmp_path_factory):
    """Separable patches: class = which channel carries signal."""
    rng = np.random.default_rng(0)
    n_per = 24
    xs, ys = [], []
    for cls in range(2):  # nerve_cell head: 2 classes, 3 channels
        x = rng.normal(0, 0.1, size=(n_per, 3, 40, 40)).astype(np.float32)
        x[:, cls] += 3.0
        xs.append(x)
        ys.append(np.full(n_per, cls, np.int64))
    return np.concatenate(xs), np.concatenate(ys)


@pytest.fixture(scope="module")
def trainer():
    return Trainer(
        "nerve_cell",
        TrainConfig(batch_size=16, learning_rate=1e-3, dtype="float32",
                    seed=0),
        mesh=get_mesh(),
    )


def test_loss_decreases(trainer, toy_data):
    x, y = toy_data
    history = trainer.fit(x, y, epochs=10)
    first_loss, _ = history[0]
    last_loss, last_acc = history[-1]
    assert last_loss < first_loss
    assert last_acc > 0.7


def test_evaluate_and_padding(trainer, toy_data):
    x, y = toy_data
    # 48 examples with batch 16 -> exact; 45 -> padded last batch
    acc = trainer.evaluate(x[:45], y[:45])
    assert 0.0 <= acc <= 1.0
    assert acc > 0.7  # after test_loss_decreases fit


def test_checkpoint_roundtrip(trainer, tmp_path):
    path = trainer.save(str(tmp_path / "nerve.npz"))
    registry = ModelRegistry(str(tmp_path))
    params = registry.classifier_params("nerve_cell")
    import jax

    leaves_t = jax.tree_util.tree_leaves(trainer.params)
    leaves_r = jax.tree_util.tree_leaves(params)
    assert len(leaves_t) == len(leaves_r)
    np.testing.assert_allclose(
        np.asarray(leaves_t[0], np.float32), np.asarray(leaves_r[0]),
        atol=1e-6,
    )


def test_device_data_fit_matches_host_path(toy_data):
    """fit(device_data=True) gathers batches from an HBM-resident set;
    same permutation stream + same padding => identical training to the
    per-step-upload path."""
    import jax

    x, y = toy_data
    mk = lambda: Trainer(
        "nerve_cell",
        TrainConfig(batch_size=16, learning_rate=1e-3, dtype="float32",
                    seed=0),
        mesh=get_mesh(),
    )
    t_host = mk()
    h_host = t_host.fit(x[:32], y[:32], epochs=1, device_data=False)
    t_dev = mk()
    h_dev = t_dev.fit(x[:32], y[:32], epochs=1, device_data=True)
    np.testing.assert_allclose(h_host, h_dev, rtol=1e-4, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(t_host.params),
        jax.tree_util.tree_leaves(t_dev.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
