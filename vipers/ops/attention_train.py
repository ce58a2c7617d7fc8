"""Single-block fused attention for SHORT sequences, with a one-pass
fused backward — the training-path complement to ``ops/flash_attention``.

Motivation (docs/PERF.md round-3 train trace): at ViT train shapes
(T=197, hd=64, B=128) the XLA einsum path materializes the (T, T)
attention matrix in BOTH directions — 5 HBM-bound batched matmuls per
layer at ~14 TFLOP/s plus 12 pure layout-copy fusions re-tiling the
saved q/k/v residuals (~14% of the step).  The library flash kernel
(`jax.experimental.pallas.ops.tpu.flash_attention`) is built for LONG
sequences: its streaming online-softmax forward plus two-pass backward
(dq pass + dkv pass, each re-reading and re-softmaxing everything)
measured 1957 -> 1284 img/s at these shapes.

At T <= ~1024 the WHOLE problem fits in VMEM per (batch, head) program:
q/k/v (T, 64) tiles plus one (T, T) f32 score matrix.  So this kernel
does the obvious thing the long-sequence kernels cannot: one program
computes the exact softmax (no online rescaling), and ONE backward
program recomputes the probabilities from the saved logsumexp and emits
dq, dk, dv together.  The (T, T) matrix never exists in HBM in either
direction; the only residuals are the layer's own q/k/v plus (T,) lse
and the output.

Numerics match the masked-einsum path (`models/vit.py`): bf16 MXU dots
with f32 accumulation, f32 softmax, probabilities cast back to the
input dtype for the P@V dot, pad keys masked to -1e9 (exp underflows to
exact 0).  Gradient contract: like every flash kernel here, pad-QUERY
rows assume zero cotangents — true for all real consumers because pad
rows are sliced away downstream (`unpad_tokens`).

The torch reference computes the same attention via
``nn.MultiheadAttention`` (`/root/reference/vision_transformer.py:103`).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vipers.ops.flash_attention import NEG_INF
from vipers.ops.tokens import round_up as _round_up

# Probed compile limit on v5e (16 MB VMEM): T=1024 fits at block_b<=2
# (forward AND backward); beyond that the ~5 live (T, T) f32 temporaries
# alone exceed the budget at any block_b. See _pick_block_b for the
# joint (block_b, T) cap.
MAX_T = 1024


def _fwd_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref, *,
                scale, block_b):
    for g in range(block_b):                            # unrolled: static G
        q = q_ref[g, 0] * q_ref.dtype.type(scale)      # (T, hd) input dtype
        k = k_ref[g, 0]
        s = jax.lax.dot_general(                        # (T, T) f32 accum
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ok = valid_ref[g]                               # (1, T)
        s = jnp.where(ok != 0, s, NEG_INF)              # mask pad keys
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(                        # P @ V, f32 accum
            p.astype(v_ref.dtype), v_ref[g, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # normalize on the (T, hd) OUTPUT, not the (T, T) matrix: T/hd x
        # fewer VPU divides, and the f32 divide after the rounded-bf16 dot
        # is (marginally) more accurate than rounding P/l before it
        o_ref[g, 0] = (o / l).astype(o_ref.dtype)
        lse_ref[g, 0] = (m + jnp.log(l))[:, 0][None, :]


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref, valid_ref,
                dq_ref, dk_ref, dv_ref, *, scale, block_b):
    dt = q_ref.dtype
    for g in range(block_b):
        q = q_ref[g, 0] * dt.type(scale)
        k = k_ref[g, 0]
        v = v_ref[g, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ok = valid_ref[g]
        s = jnp.where(ok != 0, s, NEG_INF)
        p = jnp.exp(s - lse_ref[g, 0][0][:, None])      # exact probs (T, T)
        do = do_ref[g, 0]
        o = o_ref[g, 0]
        # D_i = sum_j dO_ij * O_ij  (f32)
        d = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=1, keepdims=True)
        pb = p.astype(dt)
        dv_ref[g, 0] = jax.lax.dot_general(             # P^T @ dO
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(                       # dO @ V^T
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = ((dp - d) * p).astype(dt)                  # (T, T)
        dq_ref[g, 0] = (jax.lax.dot_general(            # dS @ K, then *scale
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dq_ref.dtype)
        dk_ref[g, 0] = jax.lax.dot_general(             # dS^T @ (Q*scale)
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _fwd_kernel_packed(q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref, *,
                       scale, block_b):
    """Packed-input forward: q/k/v refs are three VIEWS of the same
    (3, B, H, T, hd) buffer (index maps pick s=0/1/2), so the caller
    never materializes per-tensor slices."""
    for g in range(block_b):
        q = q_ref[0, g, 0] * q_ref.dtype.type(scale)
        k = k_ref[0, g, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ok = valid_ref[g]
        s = jnp.where(ok != 0, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, g, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # see _fwd_kernel: normalization deferred to the (T, hd) output
        o_ref[g, 0] = (o / l).astype(o_ref.dtype)
        lse_ref[g, 0] = (m + jnp.log(l))[:, 0][None, :]


def _bwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                       valid_ref, dqkv_ref, *, scale, block_b):
    """Packed backward: dq/dk/dv land in ONE (3, B, H, T, hd) output so
    the qkv projection's einsum-VJP consumes it whole — no
    stack/concat/dynamic-update-slice copies on the gradient path."""
    dt = q_ref.dtype
    for g in range(block_b):
        q = q_ref[0, g, 0] * dt.type(scale)
        k = k_ref[0, g, 0]
        v = v_ref[0, g, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ok = valid_ref[g]
        s = jnp.where(ok != 0, s, NEG_INF)
        p = jnp.exp(s - lse_ref[g, 0][0][:, None])
        do = do_ref[g, 0]
        o = o_ref[g, 0]
        d = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=1, keepdims=True)
        pb = p.astype(dt)
        dqkv_ref[2, g, 0] = jax.lax.dot_general(    # dV = P^T @ dO
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dqkv_ref.dtype)
        dp = jax.lax.dot_general(                   # dO @ V^T
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = ((dp - d) * p).astype(dt)
        dqkv_ref[0, g, 0] = (jax.lax.dot_general(   # dQ = dS @ K, * scale
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dqkv_ref.dtype)
        dqkv_ref[1, g, 0] = jax.lax.dot_general(    # dK = dS^T @ (Q*scale)
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dqkv_ref.dtype)


def _pick_block_b(b: int, t: int) -> int:
    """Rows of the batch handled per program: amortizes Mosaic
    per-program overhead over several (T, hd) problems (the dots are
    intrinsically small at hd=64).  Capped by VMEM: probed on v5e, the
    BACKWARD program (10 double-buffered (bb, T, hd) IO blocks plus ~5
    live (T, T) f32 temporaries) OOMs exactly when block_b * T > 2048
    — (512, 8), (640, 8), (896, 4) fail; (256, 8), (768, 4)*, (896, 2),
    (1024, 2) fit.  (*768*4=3072 fits but is excluded by the
    conservative cap; the train shapes that matter are <= 2048.)"""
    for g in (8, 4, 2):
        if b % g == 0 and g * t <= 2048:
            return g
    return 1


def _specs(bb, t, hd):
    qkv = pl.BlockSpec((bb, 1, t, hd), lambda i, j: (i, j, 0, 0))
    lse = pl.BlockSpec((bb, 1, 1, t), lambda i, j: (i, j, 0, 0))
    ok = pl.BlockSpec((bb, 1, t), lambda i, j: (i, 0, 0))
    return qkv, lse, ok


def _fwd(q, k, v, valid, scale, interpret):
    b, h, t, hd = q.shape
    bb = _pick_block_b(b, t)
    qkv_spec, lse_spec, ok_spec = _specs(bb, t, hd)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_b=bb),
        grid=(b // bb, h),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, ok_spec],
        out_specs=[qkv_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, hd), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, t), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, valid)
    return o, lse


def _bwd(q, k, v, o, lse, do, valid, scale, interpret):
    b, h, t, hd = q.shape
    bb = _pick_block_b(b, t)
    qkv_spec, lse_spec, ok_spec = _specs(bb, t, hd)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, block_b=bb),
        grid=(b // bb, h),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, qkv_spec, lse_spec,
                  qkv_spec, ok_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
        out_shape=[jax.ShapeDtypeStruct((b, h, t, hd), q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, o, lse, do, valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attn(q, k, v, valid, scale, interpret):
    o, _ = _fwd(q, k, v, valid, scale, interpret)
    return o


def _attn_vjp_fwd(q, k, v, valid, scale, interpret):
    o, lse = _fwd(q, k, v, valid, scale, interpret)
    return o, (q, k, v, o, lse, valid)


def _attn_vjp_bwd(scale, interpret, res, g):
    q, k, v, o, lse, valid = res
    dq, dk, dv = _bwd(q, k, v, o, lse, g.astype(q.dtype), valid,
                      scale, interpret)
    return dq, dk, dv, None


_attn.defvjp(_attn_vjp_fwd, _attn_vjp_bwd)


def _specs_packed(bb, t, hd):
    """Block specs over the packed (3, B, H, T, hd) buffer: ``slab(s)``
    is a VIEW of the s-th q/k/v slab (the index map pins the leading
    block coordinate), so the packed tensor feeds the kernel directly —
    no per-tensor slice copies ahead of the custom call."""
    def slab(s):
        return pl.BlockSpec(
            (1, bb, 1, t, hd), lambda i, j, s=s: (s, i, j, 0, 0))
    dqkv = pl.BlockSpec((3, bb, 1, t, hd), lambda i, j: (0, i, j, 0, 0))
    o = pl.BlockSpec((bb, 1, t, hd), lambda i, j: (i, j, 0, 0))
    lse = pl.BlockSpec((bb, 1, 1, t), lambda i, j: (i, j, 0, 0))
    ok = pl.BlockSpec((bb, 1, t), lambda i, j: (i, 0, 0))
    return slab, dqkv, o, lse, ok


def _fwd_packed(qkv, valid, scale, interpret):
    _, b, h, t, hd = qkv.shape
    bb = _pick_block_b(b, t)
    slab, _, o_spec, lse_spec, ok_spec = _specs_packed(bb, t, hd)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_packed, scale=scale, block_b=bb),
        grid=(b // bb, h),
        in_specs=[slab(0), slab(1), slab(2), ok_spec],
        out_specs=[o_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, h, 1, t), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, qkv, qkv, valid)
    return o, lse


def _bwd_packed(qkv, o, lse, do, valid, scale, interpret):
    _, b, h, t, hd = qkv.shape
    bb = _pick_block_b(b, t)
    slab, dqkv_spec, o_spec, lse_spec, ok_spec = _specs_packed(bb, t, hd)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_packed, scale=scale, block_b=bb),
        grid=(b // bb, h),
        in_specs=[slab(0), slab(1), slab(2), o_spec, lse_spec, o_spec,
                  ok_spec],
        out_specs=[dqkv_spec],
        out_shape=[jax.ShapeDtypeStruct((3, b, h, t, hd), qkv.dtype)],
        interpret=interpret,
    )(qkv, qkv, qkv, o, lse, do, valid)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _attn_packed(qkv, valid, scale, interpret):
    o, _ = _fwd_packed(qkv, valid, scale, interpret)
    return o


def _attn_packed_vjp_fwd(qkv, valid, scale, interpret):
    o, lse = _fwd_packed(qkv, valid, scale, interpret)
    return o, (qkv, o, lse, valid)


def _attn_packed_vjp_bwd(scale, interpret, res, g):
    qkv, o, lse, valid = res
    dqkv = _bwd_packed(qkv, o, lse, g.astype(qkv.dtype), valid, scale,
                       interpret)
    return dqkv, None


_attn_packed.defvjp(_attn_packed_vjp_fwd, _attn_packed_vjp_bwd)


def fused_attention_supported(t: int, hd: int) -> bool:
    """True when the single-block kernel applies: the padded (T, T) score
    matrix must fit in VMEM and hd must be a legal block minor dim
    (a 128 multiple, or the full last axis — always true here)."""
    return _round_up(t, 128) <= MAX_T and hd % 8 == 0


def attention_train_enabled(dtype) -> bool:
    """Product-path gate, mirroring ``fused_mlp.fused_supported``: bf16
    compute only (the f32 path keeps the einsum for torch bit-parity
    tests), single-device TPU (a ``pallas_call`` has no pjit partitioning
    rule), ``VIPERS_FUSED_ATTN=0`` kill switch, interpret override for
    CPU tests."""
    import os

    if os.environ.get("VIPERS_FUSED_ATTN") == "0":
        return False
    if os.environ.get("VIPERS_FUSED_ATTN_INTERPRET") == "1":
        return True
    return (
        dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and jax.device_count() == 1
    )


def attention_train(
    q, k, v,
    valid: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """(B, H, T, hd) fused attention for short T, differentiable with a
    one-pass fused backward.  ``valid``: (B, T) bool key mask.  Pads T to
    a 128 multiple internally; pad-query output rows are garbage by the
    masking design and must receive zero cotangents (true when the
    caller slices them away).  Falls back to the reference einsum on
    non-TPU backends unless ``interpret=True``."""
    b, h, t, hd = q.shape
    if not fused_attention_supported(t, hd):
        # Fail with intent instead of an opaque Mosaic VMEM OOM: past
        # MAX_T the (T, T) f32 temporaries exceed VMEM at any block_b.
        raise ValueError(
            f"attention_train: T={t} (pads to {_round_up(t, 128)}) / hd={hd} "
            f"outside the probed VMEM envelope (MAX_T={MAX_T}, hd%8==0); "
            "use ops.flash_attention for long sequences"
        )
    scale = float(hd) ** -0.5 if scale is None else scale
    if interpret is None:
        import os

        interpret = os.environ.get("VIPERS_FUSED_ATTN_INTERPRET") == "1"

    if not interpret and jax.devices()[0].platform != "tpu":
        from vipers.ops.flash_attention import attention_reference

        mask = valid[:, None, None, :] if valid is not None else None
        out, _ = attention_reference(q, k, v, scale=scale, mask=mask)
        return out

    pad_t = _round_up(t, 128)
    if valid is None:
        valid = jnp.ones((b, t), bool)
    if pad_t != t:
        padder = lambda z: jnp.pad(
            z, ((0, 0), (0, 0), (0, pad_t - t), (0, 0)))
        q, k, v = padder(q), padder(k), padder(v)
        valid = jnp.pad(valid, ((0, 0), (0, pad_t - t)))
    ok = valid[:, None, :].astype(jnp.int8)             # (B, 1, T)
    out = _attn(q, k, v, ok, scale, interpret)
    return out[:, :, :t, :]


def attention_train_packed(
    qkv,
    valid: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """``attention_train`` over a PACKED (3, B, H, T, hd) q|k|v tensor —
    the layout the ViT qkv projection einsum emits directly
    (`models/vit.py` ``"ntd,dshe->snhte"``).  Same kernels and numerics;
    what changes is the data path: the forward reads q/k/v as index-map
    VIEWS of the packed buffer and the backward emits ONE packed dqkv,
    so the ``q, k, v = qkv[0], qkv[1], qkv[2]`` slice copies and their
    scatter-add transpose (round-4 train trace: 12 `slice_bitcast_fusion`
    ops, ~10% of the bf16 B=128 step) never reach HBM in either
    direction.  Training forwards already token-pad to a 128 multiple
    (`ops/tokens.py`), so at train shapes NO copy of qkv is made at all.
    """
    s3, b, h, t, hd = qkv.shape
    if s3 != 3:
        raise ValueError(f"attention_train_packed: leading dim {s3} != 3")
    if not fused_attention_supported(t, hd):
        raise ValueError(
            f"attention_train_packed: T={t} (pads to {_round_up(t, 128)}) "
            f"/ hd={hd} outside the probed VMEM envelope (MAX_T={MAX_T}, "
            "hd%8==0); use ops.flash_attention for long sequences"
        )
    scale = float(hd) ** -0.5 if scale is None else scale
    if interpret is None:
        import os

        interpret = os.environ.get("VIPERS_FUSED_ATTN_INTERPRET") == "1"

    if not interpret and jax.devices()[0].platform != "tpu":
        from vipers.ops.flash_attention import attention_reference

        mask = valid[:, None, None, :] if valid is not None else None
        out, _ = attention_reference(
            qkv[0], qkv[1], qkv[2], scale=scale, mask=mask)
        return out

    pad_t = _round_up(t, 128)
    if valid is None:
        valid = jnp.ones((b, t), bool)
    if pad_t != t:
        qkv = jnp.pad(
            qkv, ((0, 0), (0, 0), (0, 0), (0, pad_t - t), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_t - t)))
    ok = valid[:, None, :].astype(jnp.int8)             # (B, 1, T)
    out = _attn_packed(qkv, ok, scale, interpret)
    return out[:, :, :t, :]
