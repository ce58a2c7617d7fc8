"""DINO Vision Transformer (vit_tiny/small/base, patch 8/16), first-class.

The reference *imports* this model from an external ``dino`` package that is
absent from its tree (`/root/reference/networks.py:21`,
`/root/reference/main_lost.py:33`) and uses it frozen with ``num_classes=0``
for LOST (`/root/reference/networks.py:48-79`,
`/root/reference/main_lost_original.py:221-228`).  We implement it natively.

Behavioral surface needed by the pipeline:
  * arbitrary input resolutions via forward-time pos-embedding interpolation
    (DINO's ``interpolate_pos_encoding``; bicubic, half-pixel centers),
  * ``get_last_selfattention`` semantics — per-head attention of the last
    block — plus the last block's *real* qkv projection output, the feature
    LOST consumes (`/root/reference/main_lost_original.py:221-246`):
        feats, aux = model.apply(vars, x)
        aux["qkv"]:  (N, T, 3*D)  last block qkv output
        aux["attn"]: (N, nh, T, T)
  * ``num_classes=0`` => forward returns the CLS feature after the final
    LayerNorm (timm/DINO convention).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vipers.core.registry import ModelSpec, register_model
from vipers.models.interpolate import bicubic_resize_2d


class DinoAttention(nn.Module):
    num_heads: int

    @nn.compact
    def __call__(self, x, token_mask=None, need_attn: bool = True):
        n, t, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv_out = nn.Dense(3 * d, name="qkv")(x)  # (N, T, 3D), timm layout
        qkv = qkv_out.reshape(n, t, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = hd ** -0.5
        from vipers.ops.flash_attention import flash_min_t
        from vipers.parallel.sp import sequence_axis

        if not need_attn and t >= flash_min_t() and sequence_axis() is None:
            # same blockwise gate as models/vit.py: the tuned flash kernel
            # wins from mid sequence lengths and skips the (T, T) softmax
            from vipers.ops.flash_attention import flash_attention

            out = flash_attention(q, k, v, valid=token_mask, scale=scale)
            attn = None
        else:
            logits = jnp.einsum(
                "nhqd,nhkd->nhqk", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            if token_mask is not None:
                logits = jnp.where(token_mask[:, None, None, :], logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
            attn = attn if need_attn else None
        out = out.transpose(0, 2, 1, 3).reshape(n, t, d)
        out = nn.Dense(d, name="proj")(out)
        return out, attn, qkv_out


class DinoBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, token_mask=None, need_attn: bool = True,
                 train: bool = False, tap_delta=None):
        d = x.shape[-1]
        n1 = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if tap_delta is not None:
            # explainability tap, same contract as models/vit.EncoderBlock:
            # GradCAM's ViT target layer is the last block's first norm
            # (`/root/reference/explain.py:205-206`)
            n1 = n1 + tap_delta
        y, attn, qkv_out = DinoAttention(self.num_heads, name="attn")(
            n1, token_mask=token_mask, need_attn=need_attn,
        )
        x = x + y
        norm2 = nn.LayerNorm(epsilon=1e-6, name="norm2")
        fc1 = nn.Dense(int(d * self.mlp_ratio), name="fc1")
        from vipers.ops.fused_mlp import fused_ln_dense_gelu, fused_supported
        from vipers.parallel.sp import sequence_axis

        if (not self.is_initializing() and not train and fused_supported(x)
                and sequence_axis() is None):
            # One-pass norm2 -> fc1 -> GELU Pallas kernel (ops/fused_mlp.py;
            # see models/vit.EncoderBlock for the gating contract).
            p = self.variables["params"]
            z = fused_ln_dense_gelu(
                x, p["norm2"]["scale"], p["norm2"]["bias"],
                p["fc1"]["kernel"], p["fc1"]["bias"],
            )
        else:
            z = fc1(norm2(x))
            # tanh GELU in bf16 (sub-ulp vs erf, ~27% cheaper end-to-end;
            # see models/vit.py MLPBlock note)
            z = nn.gelu(z, approximate=z.dtype == jnp.bfloat16)
        z = nn.Dense(d, name="fc2")(z)
        return x + z, attn, qkv_out, n1


@dataclasses.dataclass(frozen=True)
class DinoViTConfig:
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    num_classes: int = 0


class DinoVisionTransformer(nn.Module):
    cfg: DinoViTConfig
    # Grid side the stored pos_embed corresponds to (DINO pretrains at 224).
    base_grid: int = 14

    @nn.compact
    def __call__(self, x, train: bool = False, token_mask=None,
                 override_pos_embedding=None, need_attn: bool = True,
                 seq_pad_multiple=None, tap_delta=None):
        # seq_pad_multiple: same contract as models/vit.py — pad the token
        # axis once (masked invalid) so the flash kernel needs no per-block
        # pad/slice and dense matmuls run tile-aligned.
        c = self.cfg
        p = c.patch_size
        n, h, w, _ = x.shape
        gh, gw = h // p, w // p
        x = nn.Conv(
            c.embed_dim, (p, p), strides=(p, p), padding="VALID", name="patch_embed"
        )(x)
        x = x.reshape(n, gh * gw, c.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.embed_dim))
        x = jnp.concatenate([jnp.tile(cls, (n, 1, 1)), x], axis=1)

        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, self.base_grid * self.base_grid + 1, c.embed_dim),
        )
        if override_pos_embedding is not None:
            x = x + override_pos_embedding
        else:
            x = x + self._interp_pos(pos, gh, gw)

        seq_len = gh * gw + 1
        if seq_pad_multiple:
            from vipers.ops.tokens import pad_tokens

            x, token_mask = pad_tokens(x, token_mask, seq_len, seq_pad_multiple)

        # Sequence parallelism: token-axis anchors at block boundaries
        # (see models/vit.py; no-op when SP is inactive).
        from vipers.parallel.sp import shard_tokens

        x = shard_tokens(x)
        attn = qkv_out = qkv_input = None
        for i in range(c.depth):
            last = i == c.depth - 1
            x, attn_i, qkv_i, n1_i = DinoBlock(
                c.num_heads, c.mlp_ratio, name=f"block_{i}")(
                x, token_mask=token_mask, need_attn=need_attn and last,
                train=train, tap_delta=tap_delta if last else None)
            x = shard_tokens(x)
            if last:
                attn, qkv_out, qkv_input = attn_i, qkv_i, n1_i
        if seq_pad_multiple:
            from vipers.ops.tokens import unpad_tokens

            x, qkv_out, attn = unpad_tokens(x, qkv_out, attn, seq_len)
            qkv_input = qkv_input[:, :seq_len]
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        cls_feat = x[:, 0]
        out = (
            nn.Dense(c.num_classes, name="head")(cls_feat)
            if c.num_classes
            else cls_feat
        )
        return out, {"attn": attn, "qkv": qkv_out, "tokens": x,
                     "qkv_input": qkv_input}

    def _interp_pos(self, pos, gh, gw):
        """DINO interpolate_pos_encoding: bicubic, half-pixel centers."""
        if gh == self.base_grid and gw == self.base_grid:
            return pos
        dim = pos.shape[-1]
        tok, img = pos[:, :1], pos[:, 1:]
        grid = img.reshape(1, self.base_grid, self.base_grid, dim).transpose(0, 3, 1, 2)
        grid = bicubic_resize_2d(grid, (gh, gw), align_corners=False)
        grid = grid.transpose(0, 2, 3, 1).reshape(1, gh * gw, dim).astype(pos.dtype)
        return jnp.concatenate([tok, grid], axis=1)


def split_qkv_dino(qkv_out, num_heads: int):
    """`/root/reference/main_lost_original.py:231-246`: (N, T, 3D) ->
    q/k/v each (N, T, D), the true timm/DINO layout."""
    n, t, d3 = qkv_out.shape
    d = d3 // 3
    hd = d // num_heads
    qkv = qkv_out.reshape(n, t, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)

    def flat(z):
        return z.transpose(0, 2, 1, 3).reshape(n, t, d)

    return flat(qkv[0]), flat(qkv[1]), flat(qkv[2])


def _build(name, cfg: DinoViTConfig):
    # DINO pretrains at 224: stored pos_embed grid side = 224 // patch
    module = DinoVisionTransformer(cfg=cfg, base_grid=224 // cfg.patch_size)
    return ModelSpec(
        name=name,
        module=module,
        input_size=(224, 224),
        num_classes=cfg.num_classes,
        # DINO backbones are frozen in the reference (networks.py:50-51);
        # nothing is pruned, but exclude qkv anyway for consistency.
        prune_exclude=("qkv",),
        patch_size=cfg.patch_size,
        family="dino_vit",
        extra={"num_heads": cfg.num_heads, "embed_dim": cfg.embed_dim},
    )


@register_model("dino_vit_tiny")
def dino_vit_tiny(patch_size=16, num_classes=0):
    return _build(
        "dino_vit_tiny",
        DinoViTConfig(patch_size, 192, 12, 3, 4.0, num_classes),
    )


@register_model("dino_vit_small")
def dino_vit_small(patch_size=16, num_classes=0):
    return _build(
        "dino_vit_small",
        DinoViTConfig(patch_size, 384, 12, 6, 4.0, num_classes),
    )


@register_model("dino_vit_base")
def dino_vit_base(patch_size=16, num_classes=0):
    return _build(
        "dino_vit_base",
        DinoViTConfig(patch_size, 768, 12, 12, 4.0, num_classes),
    )
