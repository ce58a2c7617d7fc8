"""Hand-built torch implementation of torchvision's swin_v2_t forward
(inference mode), consuming a torchvision-layout state dict.

torchvision is not installed in this image, so this transcribes the exact
eval-time math of torchvision.models.swin_transformer (SwinTransformer with
ShiftedWindowAttentionV2, PatchMergingV2, res-post-norm blocks) as the
independent oracle for the flax implementation + importer
(`vipers/models/swin.py`, `vipers/core/checkpoint.py:import_swin_v2_t`).
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

DEPTHS = (2, 2, 6, 2)
HEADS = (3, 6, 12, 24)
WS = 8


def _relative_coords_table(ws):
    coords = torch.arange(-(ws - 1), ws, dtype=torch.float32)
    table = torch.stack(torch.meshgrid(coords, coords, indexing="ij"), dim=-1)
    table = table / (ws - 1)
    table *= 8.0
    return (
        torch.sign(table) * torch.log2(torch.abs(table) + 1.0) / 3.0
    ).reshape(-1, 2)


def _relative_position_index(ws):
    coords = torch.stack(
        torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij")
    ).flatten(1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.permute(1, 2, 0) + (ws - 1)
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]


def _shifted_window_attention_v2(x, sd, prefix, num_heads, shift):
    """x: (B, H, W, C). torchvision shifted_window_attention with
    logit_scale (v2): pad -> per-axis shift zeroing -> windows -> cosine
    attention + CPB -> reverse -> crop. k-bias zeroed at every call."""
    B, H, W, C = x.shape
    ws = WS
    pad_r = (ws - W % ws) % ws
    pad_b = (ws - H % ws) % ws
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    _, pH, pW, _ = x.shape
    sh = shift if ws < pH else 0
    sw = shift if ws < pW else 0
    if sh or sw:
        x = torch.roll(x, shifts=(-sh, -sw), dims=(1, 2))

    nWh, nWw = pH // ws, pW // ws
    xw = (
        x.view(B, nWh, ws, nWw, ws, C)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(B * nWh * nWw, ws * ws, C)
    )

    qkv_w = sd[f"{prefix}.attn.qkv.weight"]
    qkv_b = sd[f"{prefix}.attn.qkv.bias"].clone()
    length = qkv_b.numel() // 3
    qkv_b[length : 2 * length].zero_()  # v2 zeroes the k bias each forward
    t = ws * ws
    qkv = F.linear(xw, qkv_w, qkv_b)
    qkv = qkv.reshape(xw.size(0), t, 3, num_heads, C // num_heads).permute(
        2, 0, 3, 1, 4
    )
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
    logit_scale = torch.clamp(
        sd[f"{prefix}.attn.logit_scale"], max=math.log(100.0)
    ).exp()
    attn = attn * logit_scale

    table = _relative_coords_table(ws)
    cpb = F.relu(
        F.linear(table, sd[f"{prefix}.attn.cpb_mlp.0.weight"],
                 sd[f"{prefix}.attn.cpb_mlp.0.bias"])
    )
    cpb = F.linear(cpb, sd[f"{prefix}.attn.cpb_mlp.2.weight"])
    idx = _relative_position_index(ws)
    rpb = cpb[idx.flatten()].view(t, t, -1).permute(2, 0, 1)
    attn = attn + (16.0 * torch.sigmoid(rpb)).unsqueeze(0)

    if sh or sw:
        mask = torch.zeros(pH, pW)
        cnt = 0
        for hs in ((0, -ws), (-ws, -sh), (-sh, None)):
            for wsl in ((0, -ws), (-ws, -sw), (-sw, None)):
                mask[hs[0]:hs[1], wsl[0]:wsl[1]] = cnt
                cnt += 1
        mw = (
            mask.view(nWh, ws, nWw, ws)
            .permute(0, 2, 1, 3)
            .reshape(nWh * nWw, ws * ws)
        )
        amask = mw.unsqueeze(1) - mw.unsqueeze(2)
        amask = amask.masked_fill(amask != 0, -100.0)
        attn = attn.view(B, nWh * nWw, num_heads, t, t) + amask.unsqueeze(1)[None]
        attn = attn.view(-1, num_heads, t, t)
    attn = attn.softmax(dim=-1)

    out = (attn @ v).transpose(1, 2).reshape(xw.size(0), t, C)
    out = F.linear(out, sd[f"{prefix}.attn.proj.weight"],
                   sd[f"{prefix}.attn.proj.bias"])
    out = (
        out.view(B, nWh, nWw, ws, ws, C)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(B, pH, pW, C)
    )
    if sh or sw:
        out = torch.roll(out, shifts=(sh, sw), dims=(1, 2))
    return out[:, :H, :W, :].contiguous()


def _ln(x, sd, key):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{key}.weight"],
                        sd[f"{key}.bias"], eps=1e-5)


def _block(x, sd, prefix, num_heads, shift):
    y = _shifted_window_attention_v2(x, sd, prefix, num_heads, shift)
    x = x + _ln(y, sd, f"{prefix}.norm1")  # res-post-norm, sd-prob 0 at eval
    z = F.linear(x, sd[f"{prefix}.mlp.0.weight"], sd[f"{prefix}.mlp.0.bias"])
    z = F.gelu(z)
    z = F.linear(z, sd[f"{prefix}.mlp.3.weight"], sd[f"{prefix}.mlp.3.bias"])
    return x + _ln(z, sd, f"{prefix}.norm2")


def _patch_merge(x, sd, prefix):
    H, W = x.shape[1], x.shape[2]
    x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
    x0 = x[..., 0::2, 0::2, :]
    x1 = x[..., 1::2, 0::2, :]
    x2 = x[..., 0::2, 1::2, :]
    x3 = x[..., 1::2, 1::2, :]
    x = torch.cat([x0, x1, x2, x3], dim=-1)
    x = F.linear(x, sd[f"{prefix}.reduction.weight"])
    return _ln(x, sd, f"{prefix}.norm")


@torch.no_grad()
def swin_v2_t_forward(sd, x_nchw):
    """Returns (logits, features_nhwc, last_qkv) matching torchvision
    swin_v2_t eval forward; last_qkv is the final block's per-window qkv
    projection output (the reference's dump, `main_lost.py:512-513`)."""
    x = F.conv2d(x_nchw, sd["features.0.0.weight"], sd["features.0.0.bias"],
                 stride=4)
    x = x.permute(0, 2, 3, 1)
    x = _ln(x, sd, "features.0.2")
    for si, depth in enumerate(DEPTHS):
        f = 1 + 2 * si
        for bi in range(depth):
            shift = 0 if bi % 2 == 0 else WS // 2
            x = _block(x, sd, f"features.{f}.{bi}", HEADS[si], shift)
        if si < len(DEPTHS) - 1:
            x = _patch_merge(x, sd, f"features.{2 + 2 * si}")
    features = x
    x = _ln(x, sd, "norm")
    pooled = x.mean(dim=(1, 2))
    logits = F.linear(pooled, sd["head.weight"], sd["head.bias"])
    return logits, features, None


def random_torchvision_swin_sd(seed=0, num_classes=10):
    """Random state dict in torchvision swin_v2_t layout (small init so
    activations stay in a comparable range)."""
    g = torch.Generator().manual_seed(seed)

    def t(*shape, scale=0.05):
        return torch.randn(*shape, generator=g) * scale

    sd = {
        "features.0.0.weight": t(96, 3, 4, 4),
        "features.0.0.bias": t(96),
        "features.0.2.weight": 1.0 + t(96),
        "features.0.2.bias": t(96),
        "norm.weight": 1.0 + t(768),
        "norm.bias": t(768),
        "head.weight": t(num_classes, 768),
        "head.bias": t(num_classes),
    }
    dim = 96
    for si, depth in enumerate(DEPTHS):
        f = 1 + 2 * si
        for bi in range(depth):
            p = f"features.{f}.{bi}"
            sd.update({
                f"{p}.norm1.weight": 1.0 + t(dim),
                f"{p}.norm1.bias": t(dim),
                f"{p}.norm2.weight": 1.0 + t(dim),
                f"{p}.norm2.bias": t(dim),
                f"{p}.attn.qkv.weight": t(3 * dim, dim),
                f"{p}.attn.qkv.bias": t(3 * dim),
                f"{p}.attn.proj.weight": t(dim, dim),
                f"{p}.attn.proj.bias": t(dim),
                f"{p}.attn.logit_scale": torch.full(
                    (HEADS[si], 1, 1), math.log(10.0)
                ) + t(HEADS[si], 1, 1, scale=0.01),
                f"{p}.attn.cpb_mlp.0.weight": t(512, 2, scale=0.2),
                f"{p}.attn.cpb_mlp.0.bias": t(512, scale=0.2),
                f"{p}.attn.cpb_mlp.2.weight": t(HEADS[si], 512, scale=0.2),
                f"{p}.mlp.0.weight": t(4 * dim, dim),
                f"{p}.mlp.0.bias": t(4 * dim),
                f"{p}.mlp.3.weight": t(dim, 4 * dim),
                f"{p}.mlp.3.bias": t(dim),
            })
        if si < len(DEPTHS) - 1:
            m = f"features.{2 + 2 * si}"
            sd.update({
                f"{m}.reduction.weight": t(2 * dim, 4 * dim),
                f"{m}.norm.weight": 1.0 + t(2 * dim),
                f"{m}.norm.bias": t(2 * dim),
            })
            dim *= 2
    return sd
