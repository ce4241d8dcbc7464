"""Engine-level imputation parity: the fused gather->MAE->classifier
program vs the reference-equivalent torch composition.

Covers the infer=True flow the reference runs at preprocess.py:268-281 +
markerImputer.py:294-329: panel channel selection with a blank missing
channel, mosaic tiling, deterministic keep-masking, MAE reconstruction,
composite, untile, then the panel classifier — with BOTH model weights
shared via real .pth checkpoints converted by the registry.
"""

import numpy as np
import torch
import jax.numpy as jnp

from ribca_tpu.engine.ensemble import EnsembleRunner
from ribca_tpu.models.mae import masking_plan
from ribca_tpu.models.registry import ModelRegistry
from ribca_tpu.panels.parser import MarkerParser
from ribca_tpu.panels.vocab import PANELS
from ribca_tpu.parallel.mesh import get_mesh
from tests.oracle import oracle_channel_select
from tests.torch_mirror import TorchMAE, TorchViT


def torch_reference_infer(patches6, channel_index, mae, vit):
    """patches6: (N, 6, 40, 40) f32 — the user's 6 channels. Replicates
    oracle channel select (blank insert), mosaic (1,7), deterministic
    masking, MAE composite, classifier softmax."""
    sel = np.stack(
        [oracle_channel_select(p, channel_index) for p in patches6]
    )  # (N, 7, 40, 40) with the blank -1 channel
    n, c, p, _ = sel.shape
    # mosaic (1, 7): channel j at tile (0, j)   (markerImputer.py:297-300)
    mosaic = np.zeros((n, 1, 40, 280), np.float32)
    for j in range(7):
        mosaic[:, 0, :, j * 40:(j + 1) * 40] = sel[:, j]
    present = [k for k, v in enumerate(channel_index) if v != -1]
    ids_keep, ids_restore, token_mask = masking_plan(present, 7)
    with torch.no_grad():
        pred = mae(
            torch.from_numpy(mosaic),
            torch.from_numpy(ids_keep.astype(np.int64)),
            torch.from_numpy(ids_restore.astype(np.int64)),
        ).numpy()  # (N, 7, 1600)
    # unpatchify + composite (markerImputer.py:311-326)
    out = sel.copy()
    for j in range(7):
        if token_mask[j] > 0:
            out[:, j] = pred[:, j].reshape(n, 40, 40)
    with torch.no_grad():
        probs = torch.softmax(
            vit(torch.from_numpy(out)), dim=1
        ).numpy()
    return probs


def test_engine_imputation_matches_torch(tmp_path, rng):
    markers = [m for m in PANELS["immune_base"] if m != "CD11c"]
    mf = tmp_path / "markers.txt"
    mf.write_text("\n".join(markers) + "\n")
    parser = MarkerParser(strict=False)
    parser.parse(str(mf))
    channel_index = parser.indices["immune_base"]
    assert channel_index.count(-1) == 1

    torch.manual_seed(5)
    mae = TorchMAE(img_size=(40, 280)).eval()
    vit = TorchViT(in_chans=7, num_classes=5, dim=288).eval()
    models_dir = tmp_path / "models"
    models_dir.mkdir()
    torch.save({"model": mae.state_dict()},
               str(models_dir / "immune_base_impute.pth"))
    torch.save({"model": vit.state_dict()},
               str(models_dir / "immune_base.pth"))

    mesh = get_mesh()
    runner = EnsembleRunner(
        parser, ModelRegistry(str(models_dir)), n_channels=len(markers),
        infer=True, dtype=jnp.float32, mesh=mesh,
    )
    assert runner.specs[0].imputer is not None

    n = mesh.size * 2
    patches = rng.normal(size=(n, 6, 40, 40)).astype(np.float32)
    got = np.asarray(runner.run_chunk(jnp.asarray(patches))["immune_base"])
    want = torch_reference_infer(patches, channel_index, mae, vit)

    np.testing.assert_allclose(got, want, atol=5e-3)
    np.testing.assert_array_equal(
        np.argmax(got, axis=1), np.argmax(want, axis=1)
    )
