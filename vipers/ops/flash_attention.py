"""Blockwise (flash) attention Pallas kernel for TPU.

Replaces the materialized (T x T) softmax of ``nn.MultiheadAttention``
(`/root/reference/vision_transformer.py:103,114`) on the hot paths where the
per-head attention matrix is NOT a requested output (training, eval,
LOST-k/q/v feature extraction).  Consumers that need the weights (attention
heatmaps `explain.py:400-443`, dino_seg `object_discovery.py:137-185`) use
the reference einsum path via ``need_attn=True`` in the models.

Kernel: standard online-softmax flash attention. Grid = (batch*heads,
q-blocks); the k/v stream is a ``fori_loop`` inside the kernel over k-blocks
held in VMEM, with running max/denominator in f32. Sequence lengths are
padded to the block size and masked with -1e9 (exp underflows to exact 0).

Backward uses recomputation through ``jax.custom_vjp``: the residuals are
(q, k, v, out, logsumexp) and gradients are computed with a second Pallas
pass — standard FlashAttention-2 style dataflow.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e9
FLASH_MIN_T = 512


def flash_min_t() -> int:
    """T threshold where the blockwise kernel beats XLA's einsum
    (A/B-measured on v5e, docs/PERF.md); ``VIPERS_FLASH_MIN_T`` overrides
    it for experiments.  Consulted by BOTH the models' kernel selection
    (models/vit.py, models/dino_vit.py) and the LOST driver's seq-pad
    decision (discovery/driver.py) so the three stay consistent."""
    import os

    return int(os.environ.get("VIPERS_FLASH_MIN_T", FLASH_MIN_T))


def attention_reference(q, k, v, scale: Optional[float] = None, mask=None):
    """Einsum attention returning (out, probs) — the parity path."""
    *_, hd = q.shape
    scale = (hd ** -0.5) if scale is None else scale
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out, probs


def _fwd_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref, *, block_k, scale):
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, hd)
    t_k = k_ref.shape[1]
    block_q, hd = q.shape
    n_kb = t_k // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        ok = valid_ref[0, 0, pl.ds(i * block_k, block_k)]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = jnp.where(ok[None, :], s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        l_cur = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return acc, m_cur, l_cur

    acc0 = jnp.zeros((block_q, hd), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l, 1e-20)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0, :, 0] = m + jnp.log(l_safe)


def _flash_fwd(q, k, v, valid, scale, block_q, block_k):
    b, h, t, hd = q.shape
    bq = min(block_q, t)
    grid = (b * h, t // bq)
    qf = q.reshape(b * h, t, hd)
    kf = k.reshape(b * h, t, hd)
    vf = v.reshape(b * h, t, hd)
    validf = jnp.broadcast_to(valid[:, None, :], (b, h, t)).reshape(b * h, 1, t)

    assert t % bq == 0 and t % min(block_k, t) == 0, (t, bq, block_k)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=min(block_k, t), scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t, hd), q.dtype),
            jax.ShapeDtypeStruct((b * h, t, 1), jnp.float32),
        ],
    )(qf, kf, vf, validf)
    return out.reshape(b, h, t, hd), lse.reshape(b, h, t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, valid, scale, block_q, block_k):
    out, _lse = _flash_fwd(q, k, v, valid, scale, block_q, block_k)
    return out


def _flash_vjp_fwd(q, k, v, valid, scale, block_q, block_k):
    out, lse = _flash_fwd(q, k, v, valid, scale, block_q, block_k)
    return out, (q, k, v, valid, out, lse)


def _flash_vjp_bwd(scale, block_q, block_k, res, g):
    """Recomputation backward. Sequence lengths here are ViT-scale (<= a few
    thousand), so one XLA-fused einsum recompute is bandwidth-fine; a full
    Pallas dq/dk/dv kernel is a later optimization."""
    q, k, v, valid, out, lse = res
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32), preferred_element_type=jnp.float32)
    s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    p = jnp.exp(s - lse[..., None])
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32))
    delta = jnp.sum(g32 * out.astype(jnp.float32), axis=-1)  # (b,h,q)
    ds = p * (dp - delta[..., None])
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def _official_blocks(pad_t: int):
    """Block sizes for the library kernel: kv blocks must be multiples of
    128 and divide pad_t (pad_t is a 128-multiple, so full-length kv is
    always legal); q blocks just divide pad_t — half-length q blocks
    measured fastest at ViT scale (896 tokens: bq=448 beat 896 and 128;
    re-checked at B=32 in the full pipeline, 448 vs 896 within jitter)."""
    bq = pad_t // 2 if pad_t % 2 == 0 and pad_t > 256 else pad_t
    return bq, pad_t


def valid_to_segment_ids(valid):
    """(B, T) bool key/query mask -> library SegmentIds: valid tokens are
    segment 0, pad tokens segment 1. Cross-segment attention is masked, so
    valid queries never read pad keys; pad queries produce garbage rows the
    consumer masks out (same contract as the -1e9 mask path)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    seg = (~valid).astype(jnp.int32)
    return SegmentIds(q=seg, kv=seg)


def _official_kernel_call(q, k, v, valid, scale):
    """Raw library-kernel dispatch on already 128-multiple-padded inputs."""
    from jax.experimental.pallas.ops.tpu import flash_attention as ofa

    b, h, pad_t, hd = q.shape
    segment_ids = None if valid is None else valid_to_segment_ids(valid)
    bq, bk = _official_blocks(pad_t)
    bs = ofa.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_q_dkv=bq, block_k_dkv=bk,
        block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk,
    )
    return ofa.flash_attention(
        q, k, v, segment_ids=segment_ids, sm_scale=scale, block_sizes=bs
    )


def flash_attention_official(q, k, v, valid=None, scale: Optional[float] = None):
    """Blockwise attention via the tuned library kernel
    (jax.experimental.pallas.ops.tpu.flash_attention), with our (B, T)
    validity mask lowered to segment ids. TPU only; measured ~15% faster
    than the XLA einsum+softmax at ViT-S LOST shapes (T=769 -> pad 896)
    and O(T) memory in both directions (the library ships fused Pallas
    dq/dkv backward kernels).

    Gradient contract (hardware-verified on v5e, see
    tests/test_flash_attention.py::test_official_kernel_grads_tpu): with
    zero cotangents on pad-query rows — true for every real consumer,
    because pad rows are garbage by the segment-id design and are sliced
    or masked downstream — dq/dk/dv match f32 autodiff of the masked
    einsum to bf16 precision (rel ~2e-3). Cotangents ON pad rows are
    meaningless for both this kernel and the einsum path (the two paths
    intentionally differ on pad-query rows: segment ids make pad queries
    attend pad keys, -1e9 key masking makes them attend valid keys)."""
    b, h, t, hd = q.shape
    scale = (hd ** -0.5) if scale is None else scale
    pad_t = _round_up(t, 128)
    if valid is None and pad_t == t:
        padded_valid = None
    else:
        if valid is None:
            valid = jnp.ones((b, t), bool)
        padded_valid = jnp.pad(valid, ((0, 0), (0, pad_t - t)))
    if pad_t != t:
        padder = lambda z: jnp.pad(z, ((0, 0), (0, 0), (0, pad_t - t), (0, 0)))
        q, k, v = padder(q), padder(k), padder(v)
    out = _official_kernel_call(q, k, v, padded_valid, scale)
    return out[:, :, :t, :]


def flash_attention(
    q, k, v,
    valid: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    use_official: bool = True,
):
    """(B, H, T, D) attention without materializing (T, T).

    valid: (B, T) bool key mask (True = attend). T is padded internally to a
    block multiple. On non-TPU backends falls back to the reference einsum
    (Pallas TPU kernels don't run on CPU outside interpret mode). On TPU the
    tuned library kernel is used by default; ``use_official=False`` selects
    this module's own kernel (kept as the dependency-free fallback and for
    interpret-mode testing).
    """
    b, h, t, hd = q.shape
    scale = (hd ** -0.5) if scale is None else scale

    platform = jax.devices()[0].platform
    if platform != "tpu":
        mask = valid[:, None, None, :] if valid is not None else None
        out, _ = attention_reference(q, k, v, scale=scale, mask=mask)
        return out
    if use_official:
        return flash_attention_official(q, k, v, valid=valid, scale=scale)

    if valid is None:
        valid = jnp.ones((b, t), bool)
    bq = min(block_q, _round_up(t, 8))
    # pad to a q-block multiple, then clamp the k-block to a divisor of the
    # padded length (bq always divides it) — keeps padding <= bq extra
    # tokens instead of lcm blowups for odd block combinations
    pad_t = _round_up(t, bq)
    bk = min(block_k, pad_t)
    if pad_t % bk:
        bk = bq
    if pad_t != t:
        padder = lambda z: jnp.pad(z, ((0, 0), (0, 0), (0, pad_t - t), (0, 0)))
        q, k, v = padder(q), padder(k), padder(v)
        valid = jnp.pad(valid, ((0, 0), (0, pad_t - t)))
    out = _flash(q, k, v, valid, scale, bq, bk)
    return out[:, :, :t, :]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ------------------------- packed token-major kernel -----------------------
#
# Motivation (docs/PERF.md round 3): with head-major (B, H, T, hd) attention
# the surrounding projections need (T, H) layout changes; XLA either emits
# explicit transposes (~14% "data formatting") or, given head-major einsums,
# lowers the two-contracting-dim projections through its convolution emitter
# ("EmitAllBatchInSublanes") at ~46 TFLOP/s — the transpose cost migrates
# into the matmuls. This kernel removes the layout change entirely:
#
#   * qkv stays (B, T, 3D) straight from ONE plain MXU matmul whose weight
#     COLUMNS are pre-permuted into per-head-pair stripes
#     [p: q(128) | k(128) | v(128)], each stripe covering 128//hd heads,
#   * the kernel grid is (B, n_pairs, q-blocks); q/k/v arrive as 128-lane
#     column stripes of the SAME packed array via three BlockSpecs,
#   * the output is written token-major (B, T, D) with heads collapsed
#     h-major, so the out-projection is again one plain matmul.
#
# No transpose, reshape-copy, or conv-emitter lowering anywhere in the
# attention block.

def packed_qkv_permutation(d: int, num_heads: int) -> "jnp.ndarray":
    """Column permutation taking a fused qkv kernel laid out
    [q(D) | k(D) | v(D)] (torch ``in_proj_weight`` order) to the packed
    stripe layout. Returns int32 (3D,) indices; ``W_packed = W[:, perm]``."""
    hd = d // num_heads
    pack = 128 // hd
    assert hd * pack == 128 and num_heads % pack == 0, (d, num_heads)
    cols = []
    for p in range(num_heads // pack):
        for s in range(3):  # q, k, v
            for h in range(p * pack, (p + 1) * pack):
                base = s * d + h * hd
                cols.extend(range(base, base + hd))
    return jnp.asarray(cols, jnp.int32)


def packed_layout_supported(d: int, num_heads: int) -> bool:
    hd = d // num_heads
    return (
        hd <= 128 and 128 % hd == 0
        and num_heads % (128 // hd) == 0
    )


def _packed_fwd_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, *,
                       scale, hd):
    """One (batch, head-pair, q-block) program: exact-softmax attention for
    the ``128 // hd`` heads living in this 128-lane stripe, one big
    (bq, t) score matrix per head (kv is VMEM-resident — ViT sequence
    lengths are far below the VMEM limit, the long-sequence regime routes
    to the streaming head-major kernel)."""
    pack = 128 // hd
    q_all = q_ref[0]  # (bq, 128) compute dtype
    k_all = k_ref[0]  # (t, 128)
    v_all = v_ref[0]
    ok = valid_ref[0, 0, :]  # (t,)

    for h in range(pack):  # static unroll: pack is 1 or 2 in practice
        lo = h * hd
        q = q_all[:, lo:lo + hd]
        k = k_all[:, lo:lo + hd]
        v = v_all[:, lo:lo + hd]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = jnp.where(ok[None, :], s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-20)
        o = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        # normalize on the (bq, hd) output instead of the (bq, t) matrix:
        # t/hd x fewer VPU divides (round-5 softmax-VPU lever)
        o_ref[0, :, lo:lo + hd] = (o / l).astype(o_ref.dtype)


def _packed_fwd(qkv, valid, scale, num_heads, block_q, block_k,
                interpret: bool = False):
    del block_k  # kv is always full-length in this kernel
    b, t, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    pack = 128 // hd
    n_pairs = num_heads // pack
    bq = min(block_q, t)
    assert t % bq == 0, (t, bq)
    validf = valid[:, None, :]  # (b, 1, t)

    grid = (b, n_pairs, t // bq)
    out = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale, hd=hd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 128), lambda ib, ip, jq: (ib, jq, 3 * ip),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 128), lambda ib, ip, jq: (ib, 0, 3 * ip + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 128), lambda ib, ip, jq: (ib, 0, 3 * ip + 2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda ib, ip, jq: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, 128), lambda ib, ip, jq: (ib, jq, ip),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, validf)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _packed_flash(qkv, valid, scale, num_heads, block_q, block_k,
                  interpret=False):
    return _packed_fwd(qkv, valid, scale, num_heads, block_q, block_k,
                       interpret)


def _unpack_bhtd(qkv, num_heads):
    """(B, T, 3D) packed stripes -> (q, k, v) each (B, H, T, hd), for the
    einsum-reference backward (layout changes are fine off the hot path)."""
    b, t, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    pack = 128 // hd
    n_pairs = num_heads // pack
    z = qkv.reshape(b, t, n_pairs, 3, pack, hd)
    z = z.transpose(3, 0, 2, 4, 1, 5)  # (3, b, n_pairs, pack, t, hd)
    z = z.reshape(3, b, num_heads, t, hd)
    return z[0], z[1], z[2]


def _pack_bhtd(dq, dk, dv, num_heads):
    """Inverse of `_unpack_bhtd` for the gradient."""
    b, h, t, hd = dq.shape
    pack = 128 // hd
    n_pairs = h // pack
    z = jnp.stack([dq, dk, dv])  # (3, b, h, t, hd)
    z = z.reshape(3, b, n_pairs, pack, t, hd)
    z = z.transpose(1, 4, 2, 0, 3, 5)  # (b, t, n_pairs, 3, pack, hd)
    return z.reshape(b, t, 3 * h * hd)


def _packed_vjp_fwd(qkv, valid, scale, num_heads, block_q, block_k,
                    interpret=False):
    out = _packed_fwd(qkv, valid, scale, num_heads, block_q, block_k,
                      interpret)
    return out, (qkv, valid, out)


def _packed_vjp_bwd(scale, num_heads, block_q, block_k, interpret, res, g):
    """Einsum-recompute backward (training/explain paths; the packed
    kernel's purpose is inference throughput)."""
    qkv, valid, out = res
    q, k, v = _unpack_bhtd(qkv, num_heads)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32), preferred_element_type=jnp.float32)
    s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    b, t, d = out.shape
    hd = d // num_heads
    pack = 128 // hd
    g_bhtd = (
        g.reshape(b, t, num_heads // pack, pack, hd)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b, num_heads, t, hd)
        .astype(jnp.float32)
    )
    o_bhtd = (
        out.reshape(b, t, num_heads // pack, pack, hd)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b, num_heads, t, hd)
        .astype(jnp.float32)
    )
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g_bhtd)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g_bhtd, v.astype(jnp.float32))
    delta = jnp.sum(g_bhtd * o_bhtd, axis=-1)
    ds = p * (dp - delta[..., None])
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    dqkv = _pack_bhtd(dq, dk, dv, num_heads).astype(qkv.dtype)
    return dqkv, None


_packed_flash.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)


def flash_attention_packed(qkv, valid=None, *, num_heads: int,
                           scale: Optional[float] = None,
                           interpret: bool = False):
    """Token-major blockwise attention on a packed (B, T, 3D) qkv array
    (columns permuted by ``packed_qkv_permutation``). Returns (B, T, D)
    with heads collapsed h-major — ready for a plain out-projection matmul.
    Falls back to the reference einsum off-TPU."""
    b, t, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    scale = (hd ** -0.5) if scale is None else scale
    if not interpret and jax.devices()[0].platform != "tpu":
        # interpret=True must still reach the kernel off-TPU (Pallas
        # interpret mode exists exactly for that) — otherwise the public
        # wrapper silently validates the einsum against itself
        q, k, v = _unpack_bhtd(qkv, num_heads)
        mask = valid[:, None, None, :] if valid is not None else None
        out, _ = attention_reference(q, k, v, scale=scale, mask=mask)
        pack = 128 // hd
        out = (
            out.reshape(b, num_heads // pack, pack, t, hd)
            .transpose(0, 3, 1, 2, 4)
            .reshape(b, t, d)
        )
        return out
    if valid is None:
        valid = jnp.ones((b, t), bool)
    pad_t = _round_up(t, 128)
    # library-kernel heuristic: half-length q blocks at ViT scale (two
    # programs per (batch, stripe) keep the kv stripe VMEM-resident while
    # overlapping q/o DMA with compute)
    bq = pad_t // 2 if pad_t > 256 else pad_t
    if pad_t != t:
        qkv = jnp.pad(qkv, ((0, 0), (0, pad_t - t), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_t - t)))
    out = _packed_flash(qkv, valid, scale, num_heads, bq, DEFAULT_BLOCK_K,
                        interpret)
    return out[:, :t, :]
