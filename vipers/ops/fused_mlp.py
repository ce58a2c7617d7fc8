"""Fused LayerNorm -> Dense -> GELU Pallas TPU kernel.

Motivation (docs/PERF.md "Remaining ceiling"): after the round-3 GELU and
head-major-projection fixes, the v5e trace is ~41% dense fusions at
~185 TFLOP/s (speed of light) and ~16% standalone LayerNorm loop fusions
running at HBM bandwidth — time nothing hides behind.  The matmuls'
own HBM streaming is fully overlapped with MXU work, so the only
harvestable traffic is the LN pass itself: read x, write ln(x), read
ln(x) again as the matmul input.  This kernel computes

    gelu( LayerNorm(x) @ W + b )            (tanh-approx GELU, bf16 path)

in one pass: x rows are read once into VMEM, normalized in f32
registers, and fed straight to the MXU — ln(x) never exists in HBM.
The LayerNorm affine folds into the weights outside the kernel
(``(gamma*xhat+beta) @ W == xhat @ (gamma[:,None]*W) + beta@W``), so the
kernel only normalizes.

Used by the ViT encoder's MLP block (``models/vit.py``) for the
ln_2 -> fc1 -> GELU prefix on the bf16 TPU path; the reference computes
the same three ops sequentially via torch LayerNorm/Linear/GELU
(`/root/reference/vision_transformer.py:40-52,86-122`).

Backward (``custom_vjp``) recomputes the normalization and runs plain
XLA einsums — the train path keeps its 185 TFLOP/s matmul gradients, and
the kernel stays forward-only.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)


def _gelu_tanh_f32(y):
    inner = _SQRT_2_OVER_PI * (y + 0.044715 * (y * y * y))
    return 0.5 * y * (1.0 + jnp.tanh(inner))


def _kernel(x_ref, w_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # (bm, d)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=1, keepdims=True) - mu * mu, 0.0)
    xhat = (x - mu) * jax.lax.rsqrt(var + eps)
    y = jnp.dot(
        xhat.astype(w_ref.dtype), w_ref[...],
        preferred_element_type=jnp.float32,
    ) + b_ref[...].astype(jnp.float32)
    o_ref[...] = _gelu_tanh_f32(y).astype(o_ref.dtype)


def _pick_block_m(m: int) -> Optional[int]:
    for bm in (512, 256, 128):
        if m % bm == 0:
            return bm
    return None


def _interceptors_active() -> Optional[bool]:
    """True/False if flax's interceptor stack is readable, None if the
    private attribute moved (flax has no public probe for this)."""
    from flax.linen import module as _flax_module

    stack = getattr(_flax_module, "_global_interceptor_stack", None)
    if stack is None:
        return None
    return bool(stack)


_warned_no_probe = False


def fused_supported(x) -> bool:
    """Gate for the product path: bf16 compute (the tanh-GELU regime,
    docs/PERF.md round 3), a TPU backend, no flax interceptors (the int8
    paths intercept ``nn.Dense.__call__`` — `train/quantize.py:354` —
    and must keep seeing fc1 as a Dense call), and 128-divisible rows."""
    if x.dtype != jnp.bfloat16:
        return False
    if _pick_block_m(x.shape[0] * x.shape[1] if x.ndim == 3 else x.shape[0]) is None:
        return False
    active = _interceptors_active()
    if active is None:
        # Can't prove no interceptor is watching Dense calls — disable the
        # fused path, but say so once instead of silently losing it.
        global _warned_no_probe
        if not _warned_no_probe:
            _warned_no_probe = True
            import warnings

            warnings.warn(
                "flax.linen.module._global_interceptor_stack is gone in "
                "this flax version; disabling the fused LN->fc1->GELU "
                "kernel (ops/fused_mlp.py) until the probe is updated."
            )
        return False
    if active:
        return False
    import os

    if os.environ.get("VIPERS_FUSED_MLP") == "0":
        return False
    if os.environ.get("VIPERS_FUSED_MLP_INTERPRET") == "1":
        return True
    # Single-device only: under pjit with sharded activations a
    # pallas_call has no partitioning rule, so XLA would replicate
    # (all-gather) the batch. Multi-chip runs keep the XLA LN sequence
    # until the op is shard_map-wrapped.
    return jax.default_backend() == "tpu" and jax.device_count() == 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_core(x2d, w_eff, b_eff, eps):
    return _fused_fwd_impl(x2d, w_eff, b_eff, eps)


def _fused_fwd_impl(x2d, w_eff, b_eff, eps):
    import os

    m, d = x2d.shape
    f = w_eff.shape[1]
    bm = _pick_block_m(m)
    assert bm is not None, (m, "caller must check fused_supported")
    interpret = os.environ.get("VIPERS_FUSED_MLP_INTERPRET") == "1"
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, f), x2d.dtype),
        interpret=interpret,
    )(x2d, w_eff, b_eff.reshape(1, f))


def _ln_stats(x2d, eps):
    x = x2d.astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=1, keepdims=True) - mu * mu, 0.0)
    r = jax.lax.rsqrt(var + eps)
    return (x - mu) * r, r


def _make_bwd():
    def bwd(eps, res, dy):
        x2d, w_eff, b_eff = res
        xhat, r = _ln_stats(x2d, eps)
        xh = xhat.astype(w_eff.dtype)
        y = jnp.dot(
            xh, w_eff, preferred_element_type=jnp.float32
        ) + b_eff.astype(jnp.float32)
        t = jnp.tanh(_SQRT_2_OVER_PI * (y + 0.044715 * y * y * y))
        # d/dy [0.5 y (1 + t)]  = 0.5 (1 + t) + 0.5 y (1 - t^2) * inner'
        inner_p = _SQRT_2_OVER_PI * (1.0 + 3 * 0.044715 * y * y)
        dgelu = 0.5 * (1.0 + t) + 0.5 * y * (1.0 - t * t) * inner_p
        g = dy.astype(jnp.float32) * dgelu  # (m, f)
        gb = g.astype(w_eff.dtype)
        dw = jnp.einsum("md,mf->df", xh, gb,
                        preferred_element_type=jnp.float32)
        db = jnp.sum(g, axis=0)
        dxhat = jnp.einsum(
            "mf,df->md", gb, w_eff, preferred_element_type=jnp.float32
        )
        m1 = jnp.mean(dxhat, axis=1, keepdims=True)
        m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
        dx = r * (dxhat - m1 - xhat * m2)
        return (
            dx.astype(x2d.dtype),
            dw.astype(w_eff.dtype),
            db.astype(b_eff.dtype),
        )

    def fwd(x2d, w_eff, b_eff, eps):
        return _fused_fwd_impl(x2d, w_eff, b_eff, eps), (x2d, w_eff, b_eff)

    return fwd, bwd


_fused_core.defvjp(*_make_bwd())


def fused_ln_dense_gelu(x, ln_scale, ln_bias, kernel, bias, *, eps=1e-6):
    """``gelu_tanh(LayerNorm(x; scale, bias) @ kernel + bias)`` in one
    Pallas pass over rows.  ``x`` is (..., d); returns (..., f).

    The LN affine is folded into the matmul operands in f32 (exact), so
    only the normalization runs in-kernel; gradients flow through the
    folding ops to scale/bias/kernel/bias automatically, and through the
    kernel via a recompute-based custom VJP (plain XLA einsums).
    """
    d = x.shape[-1]
    f = kernel.shape[1]
    lead = x.shape[:-1]
    w_eff = (
        ln_scale.astype(jnp.float32)[:, None] * kernel.astype(jnp.float32)
    ).astype(x.dtype)
    b_eff = (
        ln_bias.astype(jnp.float32) @ kernel.astype(jnp.float32)
        + bias.astype(jnp.float32)
    ).astype(jnp.float32)
    out = _fused_core(x.reshape(-1, d), w_eff, b_eff, float(eps))
    return out.reshape(*lead, f)
