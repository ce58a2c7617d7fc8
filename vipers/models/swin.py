"""Swin Transformer V2 (Tiny) in flax, TPU-native.

The reference uses torchvision's swin_v2_t for pruning, LOST and
explainability (`/root/reference/main_lost.py:104-106,501-566`,
`/root/reference/explain.py:197-201`); its swin LOST path depends on
hand-edited torchvision internals dumping qkv/attention to disk
(`main_lost.py:512-513`).  Here the model returns them:

    logits, aux = model.apply(vars, x)
    aux["qkv"]:  (N, T, 3C) last block's window-attention qkv output in
                 window-major token order — the reference's own swin LOST
                 consumes a single window's tokens (its w_featmap comes from
                 sqrt(attn.shape[-2]) == the window side, `main_lost.py:517`),
                 so window order is what its pipeline actually sees
    aux["features"]: (N, H/32, W/32, 8C) final feature map (GradCAM tap)
    aux["qkv_grid"]: (N, H/32, W/32, 3C) the same last-block qkv undone
                 back to IMAGE token order (pad/shift/window reversed) —
                 the beyond-reference `--swin-all-windows` LOST mode

Architecture per SwinV2 (arXiv:2111.09883), torchvision config swin_v2_t:
patch 4, dims 96, depths (2,2,6,2), heads (3,6,12,24), window 8,
res-post-norm blocks, cosine attention with learnable per-head logit scale,
continuous relative-position bias (CPB) MLP, PatchMergingV2.

Pruning: all Dense/Conv kernels except the fused ``qkv`` projections
(mirroring the ViT exclusion rationale — torch's in-proj is not an
nn.Linear module).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vipers.core.registry import ModelSpec, register_model


def _window_partition(x, ws: int):
    """(N, H, W, C) -> (N*nW, ws*ws, C); H, W divisible by ws."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_reverse(windows, ws: int, h: int, w: int):
    n = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(n, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h, w, -1)


def _relative_coords_table(ws: int):
    """Normalized log-spaced relative coordinates for the CPB MLP."""
    coords = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(coords, coords, indexing="ij"), axis=-1)
    table = table / (ws - 1)  # [-1, 1]
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.reshape(-1, 2)  # ((2ws-1)^2, 2)


def _relative_position_index(ws: int):
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, T, T)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)  # (T, T)


class _QKVDense(nn.Module):
    """qkv projection returning (full-bias, k-bias-zeroed) outputs.

    torchvision ``shifted_window_attention_v2`` clones the bias and zeroes
    its middle third each call, so imported checkpoints (whose stored
    k-bias may be nonzero) only match if the ATTENTION uses the zeroed
    version.  The full-bias output is what a forward hook on the ``qkv``
    Linear captures — the reference's swin LOST dump consumes that
    (`main_lost.py:505-513`); with the zeroed bias, window pad tokens
    would have exactly-zero k features, win the inverse-degree seed and
    make LOST abort on every image."""

    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        full = x @ kernel + bias
        third = self.features // 3
        k_only = jnp.zeros_like(bias).at[third : 2 * third].set(
            bias[third : 2 * third]
        )
        return full, full - k_only


class WindowAttentionV2(nn.Module):
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: (B, T, C) windows; attn_mask: (nW, T, T) additive or None."""
        b, t, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv_full, qkv_used = _QKVDense(3 * c, name="qkv")(x)
        qkv = qkv_used.reshape(b, t, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # cosine attention with learnable per-head temperature (SwinV2 §3);
        # torch F.normalize uses eps=1e-12
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        logit_scale = self.param(
            "logit_scale",
            lambda _k, s: jnp.full(s, float(np.log(10.0))),
            (h, 1, 1),
        )
        scale = jnp.exp(jnp.minimum(logit_scale, float(np.log(100.0))))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * scale

        # continuous relative position bias: MLP(2->512->heads) on the
        # log-CPB table, 16*sigmoid (SwinV2 eq. 4)
        table = jnp.asarray(_relative_coords_table(self.window_size))
        cpb = nn.Dense(512, name="cpb_fc1")(table)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(h, use_bias=False, name="cpb_fc2")(cpb)  # (L, h)
        idx = jnp.asarray(_relative_position_index(self.window_size))
        bias = cpb[idx.reshape(-1)].reshape(t, t, h).transpose(2, 0, 1)
        bias = 16.0 * jax.nn.sigmoid(bias)
        attn = attn + bias[None]

        if attn_mask is not None:
            n_w = attn_mask.shape[0]
            attn = attn.reshape(b // n_w, n_w, h, t, t) + attn_mask[None, :, None]
            attn = attn.reshape(b, h, t, t)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        out = nn.Dense(c, name="proj")(out)
        return out, attn, qkv_full


def _shift_attn_mask(h: int, w: int, ws: int, sh: int, sw: int):
    """Additive -100 mask for cross-window attention after a cyclic shift —
    exactly torchvision's region labeling over the PADDED (h, w) map,
    including the degenerate slices when one axis has shift 0."""
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in ((0, -ws), (-ws, -sh), (-sh, None)):
        for wsl in ((0, -ws), (-ws, -sw), (-sw, None)):
            img[:, hs[0]:hs[1], wsl[0]:wsl[1], :] = cnt
            cnt += 1
    win = _window_partition(jnp.asarray(img), ws).reshape(-1, ws * ws)
    diff = win[:, :, None] - win[:, None, :]
    return jnp.where(diff != 0, -100.0, 0.0)


class SwinBlockV2(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0
    sd_rate: float = 0.0  # stochastic depth (torchvision linearly scaled)
    # MLP hidden width; None => int(dim * mlp_ratio). Set by structured
    # slimming (pruning/structured.py slim_swin) — exact when the dropped
    # neurons' fc2 rows are zero: fc2's output (norm2's input) is unchanged.
    mlp_dim: Optional[int] = None

    def _drop_path(self, y, train: bool):
        if not train or self.sd_rate == 0.0:
            return y
        keep = 1.0 - self.sd_rate
        mask = jax.random.bernoulli(
            self.make_rng("dropout"), keep, (y.shape[0], 1, 1, 1)
        )
        return y * mask.astype(y.dtype) / keep

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, H, W, C). Returns (x, attn, qkv) of this block.

        torchvision ``shifted_window_attention`` semantics: H/W are
        zero-PADDED up to window multiples (pad tokens participate in the
        attention unmasked), the shift is zeroed per-axis when one window
        covers that axis, and the output is cropped back.
        """
        n, h, w, c = x.shape
        ws = self.window_size
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        xp = (
            jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            if (pad_b or pad_r) else x
        )
        H, W = h + pad_b, w + pad_r
        sh = self.shift if ws < H else 0
        sw = self.shift if ws < W else 0

        sx = jnp.roll(xp, (-sh, -sw), axis=(1, 2)) if (sh or sw) else xp
        windows = _window_partition(sx, ws)
        mask = _shift_attn_mask(H, W, ws, sh, sw) if (sh or sw) else None
        y, attn, qkv = WindowAttentionV2(
            self.dim, self.num_heads, ws, name="attn"
        )(windows, mask)
        y = _window_reverse(y, ws, H, W)
        if sh or sw:
            y = jnp.roll(y, (sh, sw), axis=(1, 2))
        y = y[:, :h, :w, :]
        # res-post-norm (SwinV2): x + norm(f(x))
        x = x + self._drop_path(nn.LayerNorm(epsilon=1e-5, name="norm1")(y), train)

        z = nn.Dense(self.mlp_dim or int(c * self.mlp_ratio),
                     name="fc1")(x)
        # tanh GELU in bf16 (sub-ulp vs erf, ~27% cheaper end-to-end; see
        # models/vit.py MLPBlock note)
        z = nn.gelu(z, approximate=z.dtype == jnp.bfloat16)
        z = nn.Dense(c, name="fc2")(z)
        x = x + self._drop_path(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(z), train
        )
        return x, attn, qkv


class PatchMergingV2(nn.Module):
    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        if h % 2 or w % 2:  # torchvision pads odd maps
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            h, w = h + h % 2, w + w % 2
        x = x.reshape(n, h // 2, 2, w // 2, 2, c)
        # torchvision channel order: cat([x0, x1, x2, x3]) =
        # [(r0,c0), (r1,c0), (r0,c1), (r1,c1)] — col-offset-major
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(n, h // 2, w // 2, 4 * c)
        x = nn.Dense(2 * c, use_bias=False, name="reduction")(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


@dataclasses.dataclass(frozen=True)
class SwinV2Config:
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 8
    num_classes: int = 1000
    mlp_ratio: float = 4.0
    stochastic_depth_prob: float = 0.2  # torchvision swin_v2_t default
    # Arch-override surface for structured slimming (slim_swin):
    # block name -> MLP hidden width; missing blocks keep int(dim*ratio).
    mlp_dims: Optional[Dict[str, int]] = None


class SwinTransformerV2(nn.Module):
    cfg: SwinV2Config

    @nn.compact
    def __call__(self, x, train: bool = False, tap_delta=None,
                 need_attn: bool = True):  # windows are small; attn always materialized
        c = self.cfg
        p = c.patch_size
        x = nn.Conv(c.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        last_attn = last_qkv = None
        last_geo = None  # (h, w, shift) entering the last block
        total_blocks = sum(c.depths)
        block_id = 0
        for si, (depth, heads) in enumerate(zip(c.depths, c.num_heads)):
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else c.window_size // 2
                # torchvision: stochastic depth linearly scaled over blocks
                sd = c.stochastic_depth_prob * block_id / max(total_blocks - 1, 1)
                last_geo = (x.shape[1], x.shape[2], shift)
                x, attn, qkv = SwinBlockV2(
                    x.shape[-1], heads, c.window_size, shift,
                    c.mlp_ratio, sd_rate=sd,
                    mlp_dim=(c.mlp_dims or {}).get(f"stage{si}_block{bi}"),
                    name=f"stage{si}_block{bi}",
                )(x, train=train)
                last_attn, last_qkv = attn, qkv
                block_id += 1
            if si < len(c.depths) - 1:
                x = PatchMergingV2(name=f"merge{si}")(x)

        # Image-grid re-assembly of the last block's qkv — undoing the
        # block's pad/shift/window transform (same arithmetic as
        # SwinBlockV2.__call__) so LOST's --swin-all-windows mode can
        # consume the FULL last-stage token grid, not just the first
        # window (the only regime the reference's hook flow supports,
        # `main_lost.py:501-566`, its multi-window handling commented out
        # at `object_discovery.py:40-50`).
        ws = c.window_size
        gh, gw, gshift = last_geo
        pad_b, pad_r = (ws - gh % ws) % ws, (ws - gw % ws) % ws
        Hp, Wp = gh + pad_b, gw + pad_r
        sh = gshift if ws < Hp else 0
        sw = gshift if ws < Wp else 0
        g = _window_reverse(last_qkv, ws, Hp, Wp)
        if sh or sw:
            g = jnp.roll(g, (sh, sw), axis=(1, 2))
        qkv_grid = g[:, :gh, :gw, :]

        if tap_delta is not None:
            x = x + tap_delta  # explainability tap (final feature map)
        features = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        pooled = jnp.mean(x, axis=(1, 2))
        logits = (
            nn.Dense(c.num_classes, name="head")(pooled)
            if c.num_classes else pooled
        )
        # re-assemble last block's per-window qkv to image token order for
        # the LOST feature path (`main_lost.py:501-566` consumes (1, T, 3C))
        n = features.shape[0]
        return logits, {
            "features": features,
            "attn": last_attn,
            "qkv": last_qkv.reshape(n, -1, last_qkv.shape[-1]),
            "qkv_grid": qkv_grid,  # (N, H', W', 3C) image token order
        }


@register_model("swin_v2_t")
def swin_v2_t(num_classes=1000, input_size=(256, 256)):
    cfg = SwinV2Config(num_classes=num_classes)
    return ModelSpec(
        name="swin_v2_t",
        module=SwinTransformerV2(cfg=cfg),
        input_size=tuple(input_size),
        num_classes=num_classes,
        prune_exclude=("qkv", "cpb"),
        patch_size=cfg.patch_size,
        family="swin",
        extra={"num_heads": cfg.num_heads[-1], "embed_dim": cfg.embed_dim},
    )
