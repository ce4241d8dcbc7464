"""Flax models vs torch math-spec mirrors; converter and store round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ribca_tpu.models import (
    build_panel_model,
    build_imputer_model,
    convert_vit_state_dict,
    convert_mae_state_dict,
    save_params,
    load_params,
)
from ribca_tpu.models.vit import init_params
from ribca_tpu.models.mae import (
    masking_plan,
    make_impute_fn,
    tile_mosaic,
    untile_mosaic,
    get_2d_sincos_pos_embed,
)
from ribca_tpu.panels.vocab import PANEL_MODEL_SPECS, IMPUTER_MOSAIC

from tests.torch_mirror import TorchViT, TorchMAE


def test_all_panel_model_shapes():
    for panel, (arch, in_chans, n_cls) in PANEL_MODEL_SPECS.items():
        model = build_panel_model(panel)
        params = init_params(model, seed=0)
        x = jnp.zeros((2, in_chans, 40, 40))
        out = model.apply({"params": params}, x)
        assert out.shape == (2, n_cls)


@pytest.mark.parametrize("panel", ["nerve_cell", "immune_base"])
def test_vit_parity_with_torch(panel):
    arch, in_chans, n_cls = PANEL_MODEL_SPECS[panel]
    dims = {"vit_tiny": 144, "vit_s": 288, "vit_m": 384, "vit_l": 576}
    torch.manual_seed(0)
    tm = TorchViT(in_chans, n_cls, dims[arch]).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_vit_state_dict(sd)

    model = build_panel_model(panel)
    x = np.random.default_rng(0).normal(size=(3, in_chans, 40, 40)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_masking_plan_semantics():
    # immune_full mosaic: 15 tiles, channels {0,1,2,5,9} present
    present = [0, 1, 2, 5, 9]
    ids_keep, ids_restore, mask = masking_plan(present, 15)
    assert sorted(ids_keep.tolist()) == present
    assert mask[present].sum() == 0
    assert mask.sum() == 10
    # restore is the inverse permutation of shuffle
    shuffle = np.argsort(np.argsort(ids_restore, kind="stable"), kind="stable")
    np.testing.assert_array_equal(
        np.argsort(ids_restore, kind="stable")[: len(present)], ids_keep
    )


def test_tile_untile_roundtrip(rng):
    data = rng.normal(size=(2, 15, 40, 40)).astype(np.float32)
    m = tile_mosaic(jnp.asarray(data), (3, 5))
    assert m.shape == (2, 1, 120, 200)
    # tile (i, j) holds channel i*5+j
    np.testing.assert_allclose(np.asarray(m)[0, 0, 40:80, 80:120], data[0, 7])
    back = untile_mosaic(m, (3, 5))
    np.testing.assert_allclose(np.asarray(back), data)


def test_mae_parity_with_torch():
    torch.manual_seed(1)
    tm = TorchMAE(img_size=(40, 280)).eval()  # immune_base mosaic (1, 7)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_mae_state_dict(sd)

    model = build_imputer_model("immune_base")
    present = [0, 2, 3, 4, 6]
    ids_keep, ids_restore, _ = masking_plan(present, 7)

    x = np.random.default_rng(1).normal(size=(2, 1, 40, 280)).astype(np.float32)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x),
            torch.from_numpy(ids_keep.astype(np.int64)),
            torch.from_numpy(ids_restore.astype(np.int64)),
        ).numpy()
    ours = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(x),
            jnp.asarray(ids_keep), jnp.asarray(ids_restore),
        )
    )
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


def test_impute_preserves_present_channels():
    model = build_imputer_model("immune_base")
    grid = IMPUTER_MOSAIC["immune_base"]
    mosaic_shape = (1, 1, grid[0] * 40, grid[1] * 40)
    present = [0, 2, 3, 4, 6]
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros(mosaic_shape),
        *[jnp.asarray(a) for a in masking_plan(present, 7)[:2]],
    )["params"]
    fn = make_impute_fn("immune_base", model, params, present)
    data = np.random.default_rng(2).normal(size=(3, 7, 40, 40)).astype(
        np.float32
    )
    out = np.asarray(fn(jnp.asarray(data)))
    # kept channels untouched, missing channels replaced
    for c in present:
        np.testing.assert_allclose(out[:, c], data[:, c], atol=1e-6)
    for c in [1, 5]:
        assert not np.allclose(out[:, c], data[:, c])


def test_sincos_matches_reference_convention():
    # spot values: row 0 (w=0, h=0) -> sin(0)=0, cos(0)=1 halves
    emb = get_2d_sincos_pos_embed(8, (2, 3), cls_token=False)
    assert emb.shape == (6, 8)
    np.testing.assert_allclose(emb[0], [0, 0, 1, 1, 0, 0, 1, 1], atol=1e-7)


def test_param_store_roundtrip(tmp_path):
    model = build_panel_model("nerve_cell")
    params = init_params(model, seed=3)
    p = str(tmp_path / "nerve.npz")
    save_params(jax.tree.map(np.asarray, params), p)
    back = load_params(p)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(back)
    assert len(flat1) == len(flat2)
    x = jnp.ones((1, 3, 40, 40))
    np.testing.assert_allclose(
        np.asarray(model.apply({"params": params}, x)),
        np.asarray(model.apply({"params": back}, x)),
        atol=1e-6,
    )


def test_param_store_orbax_roundtrip(tmp_path):
    """Orbax backend (ROADMAP #7): directory checkpoint, same tree back;
    load_params auto-detects the directory layout."""
    pytest.importorskip("orbax.checkpoint")
    model = build_panel_model("nerve_cell")
    params = jax.tree.map(np.asarray, init_params(model, seed=4))
    p = str(tmp_path / "nerve_orbax")
    out = save_params(params, p, format="orbax")
    back = load_params(out)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quant_dense_head_agrees_with_float():
    """QuantDense (int8 dynamic per-tensor) preserves the float head's
    decisions on realistic inputs: same param tree, >=90% top-1 agreement
    and high logit correlation. Guards the measured experimental variant
    (models/vit.py QuantDense) against silent numerical rot."""
    import jax
    import numpy as np

    from ribca_tpu.models.vit import build_panel_model, init_params_np

    m_f = build_panel_model("immune_base", dtype=jnp.float32)
    m_q = build_panel_model("immune_base", dtype=jnp.float32,
                            quantized=True)
    params = init_params_np(m_f, seed=0)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(64, 7, 40, 40)).astype(np.float32))
    lf = np.asarray(jax.jit(m_f.apply)({"params": params}, x))
    lq = np.asarray(jax.jit(m_q.apply)({"params": params}, x))
    assert lf.shape == lq.shape == (64, 5)
    agree = (lf.argmax(1) == lq.argmax(1)).mean()
    corr = np.corrcoef(lf.ravel(), lq.ravel())[0, 1]
    assert agree >= 0.9, (agree, corr)
    assert corr >= 0.98, (agree, corr)
