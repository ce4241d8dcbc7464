"""Torch oracles of the timm-ViT / MAE math spec, used to validate the Flax
models and the checkpoint converter. Written from the architecture spec
(timm VisionTransformer block semantics; the MAE paper's encoder/decoder
flow) with state-dict key names matching the reference checkpoints, so the
same converter path is exercised end-to-end.
"""

from __future__ import annotations

import torch
import torch.nn as nn


class PatchEmbed(nn.Module):
    def __init__(self, in_chans, dim, patch):
        super().__init__()
        self.proj = nn.Conv2d(in_chans, dim, patch, patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class Attention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, d = x.shape
        qkv = (
            self.qkv(x)
            .reshape(b, n, 3, self.heads, d // self.heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv.unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, d)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class TorchViT(nn.Module):
    """Mirror of the reference classifier forward (model.py:45-64):
    cls-token pooling, LayerNorm eps 1e-6, head on cls token."""

    def __init__(self, in_chans, num_classes, dim, depth=12, heads=12,
                 img_size=40, patch=4):
        super().__init__()
        grid = img_size // patch
        self.patch_embed = PatchEmbed(in_chans, dim, patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.randn(1, grid * grid + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(Block(dim, heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return self.head(x[:, 0])


class TorchMAE(nn.Module):
    """Mirror of the MAE imputer forward (markerImputer.py:186-232)."""

    def __init__(self, img_size, patch=40, dim=768, depth=12, heads=12,
                 dec_dim=512, dec_depth=8, dec_heads=8):
        super().__init__()
        h, w = img_size[0] // patch, img_size[1] // patch
        self.grid = (h, w)
        self.patch = patch
        self.patch_embed = PatchEmbed(1, dim, patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.randn(1, h * w + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(Block(dim, heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.decoder_embed = nn.Linear(dim, dec_dim)
        self.mask_token = nn.Parameter(torch.zeros(1, 1, dec_dim))
        self.decoder_pos_embed = nn.Parameter(
            torch.randn(1, h * w + 1, dec_dim) * 0.02
        )
        self.decoder_blocks = nn.ModuleList(
            Block(dec_dim, dec_heads) for _ in range(dec_depth)
        )
        self.decoder_norm = nn.LayerNorm(dec_dim, eps=1e-6)
        self.decoder_pred = nn.Linear(dec_dim, patch * patch)

    def forward(self, imgs, ids_keep, ids_restore):
        b = imgs.shape[0]
        x = self.patch_embed(imgs)
        x = x + self.pos_embed[:, 1:]
        x = x[:, ids_keep]
        cls = (self.cls_token + self.pos_embed[:, :1]).expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)

        y = self.decoder_embed(x)
        n_masked = ids_restore.shape[0] + 1 - y.shape[1]
        mask_tokens = self.mask_token.expand(b, n_masked, -1)
        y_ = torch.cat([y[:, 1:], mask_tokens], dim=1)
        y_ = y_[:, ids_restore]
        y = torch.cat([y[:, :1], y_], dim=1)
        y = y + self.decoder_pos_embed
        for blk in self.decoder_blocks:
            y = blk(y)
        y = self.decoder_norm(y)
        y = self.decoder_pred(y)
        return y[:, 1:]
