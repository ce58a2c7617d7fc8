"""torchvision-style Vision Transformer, TPU-native, multi-output forward.

Capability parity with the reference's modified vendored ViT
(`/root/reference/vision_transformer.py:40-330`):
  * builders vit_s/b/l/h at patch 14/16/32
    (`/root/reference/vision_transformer.py:611-778`),
  * rectangular (H, W) image sizes (`:228-232`),
  * exposure of the last encoder block's attention input and per-head
    attention weights. The reference does this by ``torch.save``-ing
    ``concat((x,x,x))`` of the post-LN1 activations and the attention
    weights to ``/scratch/*.pt`` on every block forward (`:113-115`) and
    re-loading them from disk downstream (`/root/reference/main_lost.py:455-456`).
    Here the jitted forward simply *returns* them:
        logits, aux = model.apply(vars, x)
        aux = {"qkv_input": (N, T, D)   last block's ln_1 output,
               "attn":      (N, nh, T, T) last block's per-head softmax,
               "cls":       (N, D)      final CLS feature}

Pruning parity: the attention in-projection lives in torch's
``nn.MultiheadAttention`` (a fused parameter, not an ``nn.Linear`` module),
so the reference's prunable-module scan (`/root/reference/train.py:264-268`)
never prunes it — only ``out_proj``, the MLP linears, ``conv_proj`` and the
head. We mirror that by naming the in-projection Dense ``qkv`` and excluding
it via ``ModelSpec.prune_exclude=("qkv",)``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vipers.core.registry import ModelSpec, register_model


class _ProjParams(nn.Module):
    """Dense-compatible parameter container (``kernel`` (in, features),
    ``bias`` (features,), same initializers and param paths as
    ``nn.Dense``) whose owner applies the kernel with a custom einsum so
    the head transpose rides the matmul's output layout."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Self-attention matching torch ``nn.MultiheadAttention`` semantics.

    Fused qkv projection (kernel columns ordered q,k,v like torch's
    ``in_proj_weight`` rows), per-head softmax returned like
    ``need_weights=True, average_attn_weights=False``
    (`/root/reference/vision_transformer.py:114`).
    """

    num_heads: int
    dropout_rate: float = 0.0
    # Per-head width. None => hidden_dim // num_heads (the standard tying).
    # Structurally slimmed models (pruning/structured.py) remove whole
    # heads, so h*hd < d — the projections become rectangular while each
    # surviving head keeps its original width.
    head_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False, token_mask=None,
                 need_attn: bool = True):
        n, t, d = x.shape
        h = self.num_heads
        hd = self.head_dim or d // h
        inner = h * hd
        # Parameters stay Dense-shaped ((D, 3*inner) qkv kernel in q|k|v
        # column order, (inner, D) out kernel) so checkpoints, masks, and
        # the torch importer are untouched; only the APPLICATION layout
        # differs.
        qkv_kernel, qkv_bias = _ProjParams(3 * inner, name="qkv")(d)
        out_kernel, out_bias = _ProjParams(d, name="out")(inner)
        scale = float(hd) ** -0.5  # static python scalar: jit-safe

        # Blockwise Pallas attention where it pays: beats XLA's
        # einsum+softmax from ~mid sequence lengths and is O(T) memory for
        # long sequences (SURVEY §5). Below ~512 tokens the kernel
        # dispatch overhead dominates the INFERENCE step — keep the einsum
        # there. Training was A/B-measured too: despite the einsum
        # materializing the (T, T) attention matrix in both directions,
        # the library kernel's dq/dkv backward LOSES at ViT train shapes
        # (T=197 -> pad 256: 1957 -> 1284 img/s bf16 B=128, docs/PERF.md)
        # — same threshold for both modes; VIPERS_FLASH_MIN_T overrides.
        # Short-T bf16 TRAINING instead goes to the single-block fused
        # kernel below (ops/attention_train.py: 1925 -> 2031 img/s).
        import os

        from vipers.ops.flash_attention import flash_min_t
        from vipers.parallel.sp import sequence_axis

        # Under sequence parallelism every Pallas kernel gates off: a
        # pallas_call is opaque to the GSPMD partitioner (it would force a
        # full token re-gather); the einsum paths partition cleanly.
        seq_parallel = sequence_axis() is not None
        min_t = flash_min_t()
        use_flash = (
            not need_attn
            and not (train and self.dropout_rate > 0)
            and t >= min_t
            and not seq_parallel
        )

        from vipers.ops.flash_attention import packed_layout_supported

        if (use_flash and inner == d and packed_layout_supported(d, h)
                and os.environ.get("VIPERS_PACKED_ATTENTION") == "1"):
            # Experimental token-major packed path (docs/PERF.md round 3):
            # ONE plain MXU matmul with head-pair-permuted weight columns
            # feeds the packed Pallas kernel, which emits (N, T, D)
            # h-major — the out-projection is again a plain matmul. No
            # head transposes or two-contracting-dim einsums anywhere.
            # MEASURED SLOWER than the library kernel at ViT-S (the
            # in-repo kernel reaches ~17 TFLOP/s vs the library's ~55 —
            # scheduling, not layout, dominates at hd=64), so it is
            # opt-in until the kernel closes that gap.
            from vipers.ops.flash_attention import (
                flash_attention_packed, packed_qkv_permutation,
            )

            perm = packed_qkv_permutation(d, h)
            qkv_p = x @ qkv_kernel[:, perm] + qkv_bias[perm]
            y = flash_attention_packed(
                qkv_p, valid=token_mask, num_heads=h, scale=scale
            )
            out = jnp.einsum("ntd,df->ntf", y, out_kernel) + out_bias
            return out, None

        # Head-major q/k/v straight out of the projection: the einsum
        # contracts d and EMITS (N, h, T, hd), folding the head-split
        # transpose into the matmul's output layout instead of three
        # separate (N, T, h, hd)->(N, h, T, hd) copies.
        w = qkv_kernel.reshape(d, 3, h, hd)
        b = qkv_bias.reshape(3, h, hd)
        qkv = jnp.einsum("ntd,dshe->snhte", x, w) + b[:, None, :, None, :]

        from vipers.ops.attention_train import (
            attention_train_enabled, attention_train_packed,
            fused_attention_supported,
        )

        if (train and not need_attn and not use_flash
                and not seq_parallel
                and self.dropout_rate == 0
                and fused_attention_supported(t, hd)
                and attention_train_enabled(x.dtype)):
            # Short-T training attention: one single-block Pallas program
            # per (batch, head) with a ONE-PASS fused backward — the
            # (T, T) matrix never reaches HBM in either direction. The
            # einsum path's 5 HBM-bound backward matmuls/layer and the
            # saved-q/k/v re-layout copies (together ~2/5 of the bf16
            # train step, docs/PERF.md round-3 train trace) disappear.
            # The PACKED entry consumes the projection einsum's (3, N, h,
            # T, hd) output whole — q/k/v are index-map views inside the
            # kernel and dqkv comes back packed, so the three qkv[i]
            # slice copies + their scatter-add transpose (12
            # slice_bitcast_fusions, ~10% of the round-4 step trace)
            # vanish too.
            out = attention_train_packed(qkv, valid=token_mask, scale=scale)
            attn = None
            out = jnp.einsum(
                "nhte,hef->ntf", out, out_kernel.reshape(h, hd, d)
            ) + out_bias
            return out, attn

        q, k, v = qkv[0], qkv[1], qkv[2]

        if use_flash:
            from vipers.ops.flash_attention import flash_attention

            out = flash_attention(q, k, v, valid=token_mask, scale=scale)
            attn = None
        else:
            logits = jnp.einsum(
                "nhqd,nhkd->nhqk", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            if token_mask is not None:
                # Bucket-pad keys get -1e9: exp underflows to exactly 0.0,
                # so valid-token outputs equal the unbucketed run (pad
                # contributions are exact zeros in every reduction).
                logits = jnp.where(token_mask[:, None, None, :], logits, -1e9)
            attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            attn_used = attn
            if train and self.dropout_rate > 0:
                attn_used = nn.Dropout(self.dropout_rate, deterministic=False)(attn)
            out = jnp.einsum("nhqk,nhkd->nhqd", attn_used, v)
            if not need_attn:
                attn = None  # keep the contract: no attn output requested
        # Output projection directly from the head-major layout — the
        # back-transpose folds into this matmul the same way.
        out = jnp.einsum(
            "nhte,hef->ntf", out, out_kernel.reshape(h, hd, d)
        ) + out_bias
        return out, attn


class MLPBlock(nn.Module):
    """Linear -> GELU -> dropout -> Linear -> dropout
    (`/root/reference/vision_transformer.py:40-52` via torchvision MLP)."""

    mlp_dim: int
    out_dim: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, prefused: bool = False):
        if prefused:
            # ``x`` is already gelu(fc1(ln_2(xraw))) from the fused Pallas
            # kernel (ops/fused_mlp.py); fc1's params exist in the tree
            # (created at init through the unfused branch) and were
            # consumed by the kernel via the parent's variable dict.
            y = x
        else:
            y = nn.Dense(self.mlp_dim, name="fc1")(x)
            # Exact erf GELU in f32 (torch-reference bit parity); tanh GELU
            # in bf16 — the two differ by <= ~4.8e-4 absolute (sub-ulp at
            # bf16 activation magnitudes), and the erf transcendental costs
            # ~27% of end-to-end bf16 LOST throughput on v5e (1062 -> 1344
            # img/s at B=128, docs/PERF.md round 3).
            y = nn.gelu(y, approximate=y.dtype == jnp.bfloat16)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.Dense(self.out_dim, name="fc2")(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y


class EncoderBlock(nn.Module):
    """Pre-norm transformer block (`/root/reference/vision_transformer.py:86-122`)."""

    num_heads: int
    mlp_dim: int
    dropout_rate: float = 0.0
    attention_dropout_rate: float = 0.0
    head_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False, token_mask=None, tap_delta=None,
                 need_attn: bool = True):
        ln1 = nn.LayerNorm(epsilon=1e-6, name="ln_1")(x)
        if tap_delta is not None:
            # explainability tap: GradCAM's ViT target layer is the last
            # block's ln_1 (`/root/reference/explain.py:205-206`,
            # `explainations_evaluation_metrics.py:931-952`).
            ln1 = ln1 + tap_delta
        y, attn = MultiHeadAttention(
            self.num_heads, self.attention_dropout_rate,
            head_dim=self.head_dim, name="attention"
        )(ln1, train=train, token_mask=token_mask, need_attn=need_attn)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        x = x + y
        ln2 = nn.LayerNorm(epsilon=1e-6, name="ln_2")
        mlp = MLPBlock(self.mlp_dim, x.shape[-1], self.dropout_rate, name="mlp")
        from vipers.ops.fused_mlp import fused_ln_dense_gelu, fused_supported
        from vipers.parallel.sp import sequence_axis

        if (not self.is_initializing() and not train and fused_supported(x)
                and sequence_axis() is None):
            # Fused ln_2 -> fc1 -> GELU Pallas pass (ops/fused_mlp.py):
            # ln_2's output never round-trips HBM.  Param values come from
            # this block's variable dict — ln_2/fc1 modules still own them
            # (same tree as the unfused branch), and the gate guarantees no
            # flax interceptor (int8/QAT) needs to see the Dense call.
            # INFERENCE ONLY (`not train`): under autodiff the kernel's
            # recompute-based custom VJP adds an extra fc1 matmul plus an
            # unfused f32 tanh-GELU gradient to every backward — measured
            # 1949 -> 1481 img/s on the bf16 AMP train step (docs/PERF.md).
            p = self.variables["params"]
            z = fused_ln_dense_gelu(
                x, p["ln_2"]["scale"], p["ln_2"]["bias"],
                p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
            )
            z = mlp(z, train=train, prefused=True)
        else:
            z = mlp(ln2(x), train=train)
        return x + z, ln1, attn


def _auto_seq_pad(seq_len: int, dtype, train: bool, need_attn: bool, cfg):
    """One-shot 128-multiple token padding for TRAINING forwards where a
    Pallas attention kernel will engage.  Both kernels pad q/k/v to a 128
    multiple internally with identical masking, so pre-padding once at the
    embedding is compute-identical per call — but it removes the pad+slice
    HBM round trips XLA otherwise emits around every kernel invocation
    (profiled at 8.7% pad + part of 5.1% copy of the bf16 train-step
    device time at T=197, docs/PERF.md).  Inference stays unpadded: the
    einsum path (T < flash threshold) would pay real extra FLOPs, and the
    LOST driver already pads its flash-path forwards explicitly."""
    if not train or need_attn or seq_len % 128 == 0:
        return None
    if cfg.attention_dropout_rate > 0:
        return None  # einsum path (dropout needs the probs) — don't pad
    from vipers.parallel.sp import sequence_axis

    if sequence_axis() is not None:
        return None
    from vipers.ops.flash_attention import flash_min_t

    pad_t = -(-seq_len // 128) * 128
    min_t = flash_min_t()
    if seq_len < min_t <= pad_t:
        # Padding would push training across the flash threshold onto the
        # library kernel's two-pass backward — measured slower than the
        # einsum at short T (docs/PERF.md).  Leave the gate decision to
        # the true sequence length.
        return None
    if seq_len >= min_t:
        return 128  # library flash kernel path
    from vipers.ops.attention_train import (
        attention_train_enabled,
        fused_attention_supported,
    )

    hd = cfg.head_dim or cfg.hidden_dim // cfg.num_heads
    if fused_attention_supported(seq_len, hd) and attention_train_enabled(dtype):
        return 128
    return None


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    num_layers: int = 12
    num_heads: int = 12
    hidden_dim: int = 768
    mlp_dim: int = 3072
    num_classes: int = 1000
    dropout_rate: float = 0.0
    attention_dropout_rate: float = 0.0
    representation_size: Optional[int] = None
    # Per-head width override; None => hidden_dim // num_heads. Set by
    # structured head slimming (pruning/structured.py), where surviving
    # heads keep their width while num_heads shrinks.
    head_dim: Optional[int] = None


class VisionTransformer(nn.Module):
    """ViT with rectangular-input support and aux outputs.

    Input is NHWC. ``image_size`` fixes the pos-embedding parameter shape;
    at other resolutions pass interpolated pos-embeddings via
    ``override_pos_embedding`` (see ``models.interpolate``) — the TPU
    replacement for the reference's per-image model rebuild
    (`/root/reference/main_lost.py:58-100`).
    """

    cfg: ViTConfig
    image_size: Tuple[int, int] = (224, 224)

    @nn.compact
    def __call__(self, x, train: bool = False, override_pos_embedding=None,
                 token_mask=None, tap_delta=None, need_attn: bool = True,
                 seq_pad_multiple: Optional[int] = None):
        """``seq_pad_multiple``: pad the token axis ONCE (zeros, masked
        invalid) to this multiple before the encoder and slice once after.
        The flash kernel then sees an already-aligned length, removing the
        per-block pad+slice pairs XLA otherwise emits around every
        attention call (profiled at ~23% of LOST pipeline device time at
        T=769->896), and every dense matmul runs at a tile-aligned T.
        Valid-token outputs equal the unpadded run up to f32
        reduction-order rounding (pad keys are masked out of attention and
        all other ops are per-token; XLA's reduction trees regroup at the
        padded length — ~1e-5 rel, tested)."""
        c = self.cfg
        p = c.patch_size
        n, h, w, _ = x.shape
        if h % p or w % p:
            raise ValueError(f"input {h}x{w} not divisible by patch size {p}")
        gh, gw = h // p, w // p
        seq_len = gh * gw + 1
        if seq_pad_multiple is None and not self.is_initializing():
            seq_pad_multiple = _auto_seq_pad(seq_len, x.dtype, train,
                                             need_attn, c)

        # Patchify: conv stride=patch (`vision_transformer.py:279-298`).
        x = nn.Conv(
            c.hidden_dim, (p, p), strides=(p, p), padding="VALID", name="conv_proj"
        )(x)
        x = x.reshape(n, gh * gw, c.hidden_dim)

        cls = self.param(
            "class_token", nn.initializers.zeros, (1, 1, c.hidden_dim), x.dtype
        )
        x = jnp.concatenate([jnp.tile(cls, (n, 1, 1)), x], axis=1)

        default_seq = (self.image_size[0] // p) * (self.image_size[1] // p) + 1
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, default_seq, c.hidden_dim),
            x.dtype,
        )
        if override_pos_embedding is not None:
            pos = override_pos_embedding
        if pos.shape[1] != seq_len:
            raise ValueError(
                f"pos embedding has {pos.shape[1]} tokens but input needs {seq_len}; "
                "pass override_pos_embedding=interpolate_pos_embedding(...)"
            )
        x = x + pos
        x = nn.Dropout(c.dropout_rate, deterministic=not train)(x)

        if seq_pad_multiple:
            from vipers.ops.tokens import pad_tokens

            x, token_mask = pad_tokens(x, token_mask, seq_len, seq_pad_multiple)

        # Sequence parallelism: anchor the token axis onto the SP mesh axis
        # before the encoder and at every block boundary; GSPMD propagates
        # the sharding through the per-token ops and inserts the attention
        # collectives (vipers/parallel/sp.py). No-ops when SP is inactive.
        from vipers.parallel.sp import shard_tokens

        x = shard_tokens(x)
        qkv_input = attn = None
        for i in range(c.num_layers):
            x, ln1, attn_i = EncoderBlock(
                c.num_heads,
                c.mlp_dim,
                c.dropout_rate,
                c.attention_dropout_rate,
                head_dim=c.head_dim,
                name=f"encoder_layer_{i}",
            )(x, train=train, token_mask=token_mask,
              tap_delta=tap_delta if i == c.num_layers - 1 else None,
              need_attn=need_attn and i == c.num_layers - 1)
            x = shard_tokens(x)
            if i == c.num_layers - 1:
                # The reference's /scratch dump is clobbered each block; only
                # the last block's write survives for consumers
                # (`main_lost.py:455-456`). We keep exactly that.
                qkv_input, attn = ln1, attn_i
        if seq_pad_multiple:
            from vipers.ops.tokens import unpad_tokens

            x, qkv_input, attn = unpad_tokens(x, qkv_input, attn, seq_len)
        x = nn.LayerNorm(epsilon=1e-6, name="ln")(x)

        cls_feat = x[:, 0]
        y = cls_feat
        if c.representation_size is not None:
            y = nn.Dense(c.representation_size, name="pre_logits")(y)
            y = jnp.tanh(y)
        logits = (
            nn.Dense(c.num_classes, name="head")(y) if c.num_classes else y
        )
        return logits, {"qkv_input": qkv_input, "attn": attn, "cls": cls_feat}


def stacked_qkv_dump(qkv_input):
    """Reproduce the reference's on-disk "qkv" artifact: ``concat((x,x,x))``
    along the batch axis of the last block's ln_1 output
    (`/root/reference/vision_transformer.py:113`)."""
    return jnp.concatenate([qkv_input] * 3, axis=0)


def split_qkv_torchvision(qkv_dump, num_heads: int):
    """Reproduce `/root/reference/main_lost.py:478-490` exactly.

    The reference reshapes the (3*N, T, D) stacked dump to
    (N, T, 3, nh, hd) *without* any permutation first — a layout scramble of
    the three identical copies — then permutes to (3, N, nh, T, hd) and
    re-flattens each of q/k/v to (N, T, D).  Downstream LOST CorLoc numbers
    depend on this exact scramble, so we replicate it bit-for-bit.
    """
    three_n, t, d = qkv_dump.shape
    n = three_n // 3
    nh = num_heads
    qkv = qkv_dump.reshape(n, t, 3, nh, -1).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]

    def flat(z):  # (N, nh, T, hd) -> transpose(1,2) -> (N, T, nh, hd) -> (N, T, D)
        return z.transpose(0, 2, 1, 3).reshape(n, t, d)

    return flat(q), flat(k), flat(v)


def scrambled_qkv_gather(x_compact, t1, which: str = "k"):
    """On-device, single-image equivalent of
    ``split_qkv_torchvision(stacked_qkv_dump(x))[which]``.

    The reference's reshape of the stacked (3, T1, D) dump into
    (T1, 3, nh, hd) reads the identical copies out of phase — algebraically
    it is the pure row gather ``out[t] = x[(3*t + c) % T1]`` with c = 0/1/2
    for q/k/v and the feature dim untouched (the head split+re-flatten is a
    row-major identity).  That closed form makes the scramble jittable with
    a *traced* valid-token count ``t1``, so one compiled program serves
    every image in a bucket (`/root/reference/main_lost.py:478-490`).

    Args:
      x_compact: (T, D) last-block ln_1 tokens, rows [0, t1) being the
        tier-1 (CLS + valid) tokens in raster order; rows >= t1 arbitrary.
      t1: traced int — number of tier-1 tokens (1 + gh*gw).
      which: "q" | "k" | "v".
    Returns (T, D); rows >= t1 are garbage and must be masked downstream.
    """
    c_sel = {"q": 0, "k": 1, "v": 2}[which]
    t = x_compact.shape[0]
    src = (3 * jnp.arange(t) + c_sel) % t1
    return x_compact[src]


# Published torchvision IMAGENET1K_V1 metrics for the matching checkpoints
# (the reference's WeightsEnum metadata, `vision_transformer.py:363-608`) —
# carried so downstream tooling can report expected accuracy after import.
_PUBLISHED_ACC = {
    "vit_b_16": {"acc1": 81.072, "acc5": 95.318},
    "vit_b_32": {"acc1": 75.912, "acc5": 92.466},
    "vit_l_16": {"acc1": 79.662, "acc5": 94.638},
    "vit_l_32": {"acc1": 76.972, "acc5": 93.07},
}


def _build(name, cfg: ViTConfig, image_size=(224, 224)):
    module = VisionTransformer(cfg=cfg, image_size=tuple(image_size))
    extra = {"num_heads": cfg.num_heads, "hidden_dim": cfg.hidden_dim,
             "num_layers": cfg.num_layers}
    if name in _PUBLISHED_ACC:
        extra["published"] = _PUBLISHED_ACC[name]
    return ModelSpec(
        name=name,
        module=module,
        input_size=tuple(image_size),
        num_classes=cfg.num_classes,
        prune_exclude=("qkv",),
        # Both attention projections are einsum-applied _ProjParams (the
        # head-major layout): the int8 interceptor can't execute them, so
        # their weights must stay float — quantizing them would bake QDQ
        # rounding error into a float matmul for zero int8 benefit.
        quantize_exclude=("qkv", "attention/out"),
        patch_size=cfg.patch_size,
        family="vit",
        extra=extra,
    )


@register_model("vit_s_16")
def vit_s_16(num_classes=1000, image_size=(224, 224), **kw):
    """ViT-Small/16 — the BASELINE flagship for LOST throughput."""
    cfg = ViTConfig(16, 12, 6, 384, 1536, num_classes, **kw)
    return _build("vit_s_16", cfg, image_size)


@register_model("vit_b_16")
def vit_b_16(num_classes=1000, image_size=(224, 224), **kw):
    cfg = ViTConfig(16, 12, 12, 768, 3072, num_classes, **kw)
    return _build("vit_b_16", cfg, image_size)


@register_model("vit_b_32")
def vit_b_32(num_classes=1000, image_size=(224, 224), **kw):
    cfg = ViTConfig(32, 12, 12, 768, 3072, num_classes, **kw)
    return _build("vit_b_32", cfg, image_size)


@register_model("vit_l_16")
def vit_l_16(num_classes=1000, image_size=(224, 224), **kw):
    cfg = ViTConfig(16, 24, 16, 1024, 4096, num_classes, **kw)
    return _build("vit_l_16", cfg, image_size)


@register_model("vit_l_32")
def vit_l_32(num_classes=1000, image_size=(224, 224), **kw):
    cfg = ViTConfig(32, 24, 16, 1024, 4096, num_classes, **kw)
    return _build("vit_l_32", cfg, image_size)


@register_model("vit_h_14")
def vit_h_14(num_classes=1000, image_size=(224, 224), **kw):
    cfg = ViTConfig(14, 32, 16, 1280, 5120, num_classes, **kw)
    return _build("vit_h_14", cfg, image_size)
