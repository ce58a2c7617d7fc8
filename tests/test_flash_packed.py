"""Packed token-major flash attention kernel (ops/flash_attention.py):
permutation/packing round-trips, interpret-mode kernel parity against the
einsum reference, custom-vjp gradients, and the model-level opt-in path.

The kernel is currently an OPT-IN experiment (VIPERS_PACKED_ATTENTION=1):
on v5e it measured ~17 TFLOP/s vs the library kernel's ~55 at ViT-S
shapes, so the product path keeps the library kernel (docs/PERF.md)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipers.ops.flash_attention import (
    _packed_flash,
    _unpack_bhtd,
    attention_reference,
    flash_attention_packed,
    packed_layout_supported,
    packed_qkv_permutation,
)

B, T, D, H = 2, 256, 384, 6
HD = D // H


def _ref_setup(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(3 * D,)) * 0.1, jnp.float32)
    valid = jnp.asarray(rng.random((B, T)) > 0.2)
    perm = packed_qkv_permutation(D, H)
    qkv_p = x @ W[:, perm] + bias[perm]
    qkv = x @ W + bias
    q, k, v = jnp.split(qkv, 3, axis=-1)
    heads = lambda z: z.reshape(B, T, H, HD).transpose(0, 2, 1, 3)
    q, k, v = heads(q), heads(k), heads(v)
    ref, _ = attention_reference(q, k, v, scale=HD ** -0.5,
                                 mask=valid[:, None, None, :])
    ref_ntd = ref.transpose(0, 2, 1, 3).reshape(B, T, D)
    return qkv_p, (q, k, v), valid, ref_ntd


def test_packed_layout_support_matrix():
    assert packed_layout_supported(384, 6)    # ViT-S: hd=64, pack=2
    assert packed_layout_supported(768, 12)   # ViT-B
    assert packed_layout_supported(1024, 16)  # ViT-L
    assert not packed_layout_supported(1280, 16)  # ViT-H: hd=80
    assert not packed_layout_supported(192, 3)    # odd head count at pack=2


def test_packed_permutation_roundtrip():
    """W[:, perm] packing must be exactly undone by _unpack_bhtd."""
    qkv_p, (q, k, v), _valid, _ = _ref_setup()
    q2, k2, v2 = _unpack_bhtd(qkv_p, H)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)


def test_packed_fallback_matches_reference():
    """Off-TPU the packed entry point runs the einsum reference through the
    unpack/repack layout plumbing — output must equal the reference."""
    qkv_p, _, valid, ref_ntd = _ref_setup()
    out = flash_attention_packed(qkv_p, valid=valid, num_heads=H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_ntd),
                               atol=1e-4)


@pytest.mark.slow
def test_packed_kernel_interpret_mode():
    """The Pallas kernel itself (interpret mode): exact softmax per head
    within each 128-lane stripe, token-major output."""
    qkv_p, _, valid, ref_ntd = _ref_setup()
    out = _packed_flash(qkv_p, valid, HD ** -0.5, H, 128, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_ntd),
                               atol=1e-4)


@pytest.mark.slow
def test_packed_custom_vjp_grads():
    """Gradients through the packed custom_vjp (einsum-recompute backward)
    match autodiff of the reference on valid rows."""
    qkv_p, _, valid, _ = _ref_setup()

    def loss(qkv_p):
        o = _packed_flash(qkv_p, valid, HD ** -0.5, H, 128, 128, True)
        return jnp.sum(jnp.where(valid[..., None], o, 0.0) ** 2)

    def loss_ref(qkv_flat):
        qq, kk, vv = _unpack_bhtd(qkv_flat, H)
        o, _ = attention_reference(qq, kk, vv, scale=HD ** -0.5,
                                   mask=valid[:, None, None, :])
        o = o.transpose(0, 2, 1, 3).reshape(B, T, D)
        return jnp.sum(jnp.where(valid[..., None], o, 0.0) ** 2)

    g = jax.grad(loss)(qkv_p)
    g_ref = jax.grad(loss_ref)(qkv_p)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-3)


@pytest.mark.slow
def test_model_packed_optin_matches_default(monkeypatch):
    """VIPERS_PACKED_ATTENTION=1 must produce the same ViT features as the
    default path (CPU: both route to einsum references)."""
    from vipers.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(16, 2, 6, 384, 512, 0)
    module = VisionTransformer(cfg=cfg, image_size=(384, 384))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 384, 384, 3)), jnp.float32
    )
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    # t = 577 >= 512 so the flash branch engages
    monkeypatch.delenv("VIPERS_PACKED_ATTENTION", raising=False)
    base, _aux = module.apply(variables, x, train=False, need_attn=False)
    monkeypatch.setenv("VIPERS_PACKED_ATTENTION", "1")
    packed, _aux = module.apply(variables, x, train=False, need_attn=False)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                               rtol=2e-4, atol=2e-4)
