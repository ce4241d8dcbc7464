"""Flax Masked-Autoencoder ViT marker imputer.

Architecture contract (reference markerImputer.py:69-255): encoder 768x12
(12 heads), decoder 512x8 (8 heads), patch 40, single input channel, fixed
2-D sin-cos positional embeddings, mask-token gather/unshuffle decoding.

The imputation trick (markerImputer.py:258-329): the C channels of a 40x40
cell patch are tiled into one 1-channel mosaic — full (3,5)->120x200,
extended (2,5)->80x200, base (1,7)->40x280 — so each channel is ONE MAE
token. The reference ranks deterministic "noise" (0.1 present / 0.8
missing) with argsort so random_masking keeps exactly the present
channels; here the keep/restore index vectors are precomputed on host
(ties among equal noise values don't affect the output: any consistent
shuffle/restore permutation yields the same composite).

Output composite: x*(1-mask) + pred*mask, untiled back to channels.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ribca_tpu.models.vit import Block
from ribca_tpu.panels.vocab import IMPUTER_MOSAIC

Dtype = Any


# -- fixed sin-cos positional embeddings (public MAE recipe) -----------------


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(embed_dim // 2, dtype=np.float32)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim, grid_size, cls_token=False):
    gh, gw = (grid_size, grid_size) if isinstance(grid_size, int) else grid_size
    grid_h = np.arange(gh, dtype=np.float32)
    grid_w = np.arange(gw, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first (MAE conv.)
    emb = np.concatenate(
        [_sincos_1d(embed_dim // 2, grid[0]), _sincos_1d(embed_dim // 2, grid[1])],
        axis=1,
    )
    if cls_token:
        emb = np.concatenate([np.zeros([1, embed_dim]), emb], axis=0)
    return emb.astype(np.float32)


# -- model ---------------------------------------------------------------


class MaskedAutoencoderViT(nn.Module):
    img_size: tuple  # (H, W) of the mosaic
    patch_size: int = 40
    in_chans: int = 1
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 8
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @property
    def grid(self):
        return (self.img_size[0] // self.patch_size,
                self.img_size[1] // self.patch_size)

    @nn.compact
    def __call__(self, imgs, ids_keep, ids_restore):
        """imgs: (B, 1, H, W); ids_keep: (len_keep,), ids_restore: (L,).

        Returns pred tokens (B, L, patch_size**2 * in_chans) f32.
        """
        b = imgs.shape[0]
        p = self.patch_size
        gh, gw = self.grid
        l = gh * gw
        d = self.embed_dim

        sincos_enc = get_2d_sincos_pos_embed(d, self.grid, cls_token=True)
        sincos_dec = get_2d_sincos_pos_embed(
            self.decoder_embed_dim, self.grid, cls_token=True
        )

        # ---- encoder
        x = imgs.transpose(0, 2, 3, 1).astype(self.dtype)
        x = nn.Conv(d, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, l, d)

        pos_embed = self.param(
            "pos_embed", lambda *_: jnp.asarray(sincos_enc[None]),
            (1, l + 1, d),
        )
        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, d))

        x = x + pos_embed[:, 1:].astype(x.dtype)
        x = jnp.take(x, ids_keep, axis=1)

        cls = (cls_token + pos_embed[:, :1]).astype(x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), x], axis=1)

        for i in range(self.depth):
            x = Block(d, self.num_heads, self.mlp_ratio, dtype=self.dtype,
                      name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)

        # ---- decoder
        dd = self.decoder_embed_dim
        y = nn.Dense(dd, dtype=self.dtype, name="decoder_embed")(
            x.astype(self.dtype)
        )
        mask_token = self.param(
            "mask_token", nn.initializers.zeros, (1, 1, dd)
        )
        n_masked = l + 1 - y.shape[1]
        mask_tokens = jnp.broadcast_to(
            mask_token.astype(y.dtype), (b, n_masked, dd)
        )
        y_ = jnp.concatenate([y[:, 1:], mask_tokens], axis=1)
        y_ = jnp.take(y_, ids_restore, axis=1)  # unshuffle
        y = jnp.concatenate([y[:, :1], y_], axis=1)

        decoder_pos_embed = self.param(
            "decoder_pos_embed", lambda *_: jnp.asarray(sincos_dec[None]),
            (1, l + 1, dd),
        )
        y = y + decoder_pos_embed.astype(y.dtype)

        for i in range(self.decoder_depth):
            y = Block(dd, self.decoder_num_heads, self.mlp_ratio,
                      dtype=self.dtype, name=f"decoder_blocks_{i}")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="decoder_norm")(y)
        y = nn.Dense(p * p * self.in_chans, dtype=jnp.float32,
                     name="decoder_pred")(y)
        return y[:, 1:]


# -- mosaic tiling + masking plan ------------------------------------------


def tile_mosaic(data: jnp.ndarray, grid: tuple) -> jnp.ndarray:
    """(B, h*w, 40, 40) channels -> (B, 1, h*40, w*40) mosaic
    (markerImputer.py:297-300 layout: channel i*w+j at tile (i, j))."""
    b, c, p, q = data.shape
    h, w = grid
    x = data.reshape(b, h, w, p, q).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, 1, h * p, w * q)


def untile_mosaic(mosaic: jnp.ndarray, grid: tuple, p: int = 40) -> jnp.ndarray:
    """Inverse of tile_mosaic."""
    b = mosaic.shape[0]
    h, w = grid
    x = mosaic.reshape(b, h, p, w, p).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h * w, p, p)


def unpatchify(tokens: jnp.ndarray, grid: tuple, p: int = 40) -> jnp.ndarray:
    """(B, L, p*p) tokens -> (B, 1, h*p, w*p) (markerImputer.py:138-153)."""
    b = tokens.shape[0]
    h, w = grid
    x = tokens.reshape(b, h, w, p, p, 1)
    x = jnp.einsum("nhwpqc->nchpwq", x)
    return x.reshape(b, 1, h * p, w * p)


def masking_plan(present_positions, n_tiles: int):
    """Deterministic keep/restore indices replicating the reference's
    noise-ranked masking (markerImputer.py:303-311 + 155-184).

    Returns (ids_keep, ids_restore, token_mask) — token_mask[l] is 1 where
    the tile is reconstructed (missing), 0 where kept.
    """
    noise = np.full(n_tiles, 0.8, dtype=np.float32)
    present = [int(i) for i in present_positions]
    noise[present] = 0.1
    ids_shuffle = np.argsort(noise, kind="stable")
    ids_restore = np.argsort(ids_shuffle, kind="stable")
    len_keep = len(present)
    ids_keep = ids_shuffle[:len_keep]
    mask = np.ones(n_tiles, dtype=np.float32)
    mask[ids_keep] = 0.0
    return (
        ids_keep.astype(np.int32),
        ids_restore.astype(np.int32),
        mask,
    )


def build_imputer_model(panel: str, dtype=jnp.float32) -> MaskedAutoencoderViT:
    """MAE sized for a panel's mosaic (markerImputer.py:260-284)."""
    h, w = IMPUTER_MOSAIC[panel]
    return MaskedAutoencoderViT(
        img_size=(h * 40, w * 40), patch_size=40, in_chans=1,
        embed_dim=768, depth=12, num_heads=12,
        decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=8,
        mlp_ratio=4.0, dtype=dtype,
    )


def make_impute_fn(panel: str, model: MaskedAutoencoderViT, params,
                   present_positions):
    """Jitted closure: (B, C, 40, 40) patches -> imputed patches.

    Kept channels pass through untouched; missing channels are replaced by
    MAE reconstructions (markerImputer.py:294-329)."""
    grid = IMPUTER_MOSAIC[panel]
    l = grid[0] * grid[1]
    ids_keep, ids_restore, token_mask = masking_plan(present_positions, l)
    ids_keep = jnp.asarray(ids_keep)
    ids_restore = jnp.asarray(ids_restore)
    # expand token mask to pixel space once
    mask_img = unpatchify(
        jnp.asarray(token_mask)[None, :, None]
        * jnp.ones((1, l, model.patch_size**2)),
        grid, model.patch_size,
    )  # (1, 1, H, W)

    @jax.jit
    def impute(data):
        mosaic = tile_mosaic(data, grid)
        pred = model.apply(
            {"params": params}, mosaic, ids_keep, ids_restore
        )
        pred_img = unpatchify(pred, grid, model.patch_size)
        out = mosaic * (1.0 - mask_img) + pred_img * mask_img
        return untile_mosaic(out, grid, model.patch_size)

    return impute
