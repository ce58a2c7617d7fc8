"""Analytic FLOP accounting shared by bench.py and tools/profile_lost.py —
one definition so the headline MFU and the trace-report MFU can never
silently diverge."""

from __future__ import annotations

# TPU v5e bf16 MXU peak, FLOP/s
V5E_BF16_PEAK = 197e12


def vit_train_flops_per_image(
    d: int, layers: int, grid_tokens: int, patch: int,
    mlp_ratio: int = 4, seq_pad_multiple: int = 128,
) -> float:
    """Fwd+bwd FLOPs/image for the classification TRAIN step, by the
    standard MFU convention (bwd = 2x fwd for every matmul: one
    input-grad and one weight-grad dot per forward dot) — the same 3x
    rule the round-3 verdict used (13.8 GFLOP/img for ViT-S/16 224px).
    The fused attention kernel's backward actually recomputes the score
    matrix (5 dots vs the convention's 4), so reported train MFU is
    slightly conservative — consistent with how everyone quotes MFU."""
    return 3.0 * vit_forward_flops_per_image(
        d=d, layers=layers, grid_tokens=grid_tokens, patch=patch,
        mlp_ratio=mlp_ratio, seq_pad_multiple=seq_pad_multiple,
    )


def vit_forward_flops_per_image(
    d: int, layers: int, grid_tokens: int, patch: int,
    mlp_ratio: int = 4, seq_pad_multiple: int = 128,
) -> float:
    """Forward FLOPs/image for the LOST ViT pipeline: full ``layers``-block
    forward (before XLA dead-code-elims the unused tail), attention at the
    flash-padded sequence length, plus the patchify conv.

    ``grid_tokens``: gh*gw patch tokens (CLS added here)."""
    t = grid_tokens + 1
    t_pad = -(-t // seq_pad_multiple) * seq_pad_multiple
    dense_macs = layers * t * (3 * d * d + d * d + 2 * mlp_ratio * d * d)
    attn_macs = layers * 2 * t_pad * t_pad * d
    patch_macs = t * (patch * patch * 3) * d
    return 2.0 * (dense_macs + attn_macs + patch_macs)
