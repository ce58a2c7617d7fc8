"""Fused short-T training attention (ops/attention_train.py): interpret-mode
forward/gradient parity against the masked-einsum reference, support gating,
and the MultiHeadAttention train-path wiring.

The kernel exists because at ViT train shapes (T=197) the XLA einsum
materializes the (T, T) attention matrix in both directions and the library
flash kernel's two-pass backward loses outright (docs/PERF.md round-3 train
trace; measured 1925 -> 2031 img/s bf16 B=128 with this kernel).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vipers.ops.attention_train as at
from vipers.ops.flash_attention import attention_reference

B, H, T, HD = 4, 3, 197, 64


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("VIPERS_FUSED_ATTN_INTERPRET", "1")
    monkeypatch.delenv("VIPERS_FUSED_ATTN", raising=False)


def _qkv(rng, b=B, t=T):
    return tuple(
        jnp.asarray(rng.normal(size=(b, H, t, HD)).astype(np.float32))
        for _ in range(3)
    )


def test_forward_matches_reference_masked():
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng)
    valid = jnp.asarray(rng.random((B, T)) > 0.15)
    out = at.attention_train(q, k, v, valid=valid)
    ref, _ = attention_reference(q, k, v, mask=valid[:, None, None, :])
    diff = float(jnp.max(jnp.abs(out - ref)))
    assert diff < 2e-5, diff


def test_forward_unmasked_and_nondivisible_batch():
    # B=3 exercises the block_b=1 fallback of _pick_block_b.
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, b=3)
    out = at.attention_train(q, k, v)
    ref, _ = attention_reference(q, k, v)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5


def test_gradients_match_reference():
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng)
    valid = jnp.asarray(rng.random((B, T)) > 0.1)
    g = jnp.asarray(rng.normal(size=(B, H, T, HD)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.vdot(at.attention_train(q, k, v, valid=valid), g)

    def loss_ref(q, k, v):
        out, _ = attention_reference(q, k, v, mask=valid[:, None, None, :])
        return jnp.vdot(out, g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, c in zip("dq dk dv".split(), gf, gr):
        diff = float(jnp.max(jnp.abs(a - c)))
        assert diff < 5e-5, (name, diff)


def test_packed_forward_matches_reference():
    """attention_train_packed over the (3, B, H, T, hd) projection layout
    equals the masked-einsum reference (interpret mode runs the real
    index-map-view kernels)."""
    rng = np.random.default_rng(4)
    q, k, v = _qkv(rng)
    valid = jnp.asarray(rng.random((B, T)) > 0.15)
    qkv = jnp.stack([q, k, v])
    out = at.attention_train_packed(qkv, valid=valid)
    ref, _ = attention_reference(q, k, v, mask=valid[:, None, None, :])
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5


def test_packed_gradients_match_reference():
    """The packed one-output backward (dqkv written slab-wise by the
    kernel) equals stacking the reference's dq/dk/dv."""
    rng = np.random.default_rng(5)
    q, k, v = _qkv(rng)
    valid = jnp.asarray(rng.random((B, T)) > 0.1)
    g = jnp.asarray(rng.normal(size=(B, H, T, HD)).astype(np.float32))

    def loss_packed(qkv):
        return jnp.vdot(at.attention_train_packed(qkv, valid=valid), g)

    def loss_ref(q, k, v):
        out, _ = attention_reference(q, k, v, mask=valid[:, None, None, :])
        return jnp.vdot(out, g)

    gp = jax.grad(loss_packed)(jnp.stack([q, k, v]))
    gr = jnp.stack(jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v))
    diff = float(jnp.max(jnp.abs(gp - gr)))
    assert diff < 5e-5, diff


def test_packed_rejects_bad_shapes():
    ok = jnp.zeros((3, 2, 1, 64, 64), jnp.float32)
    with pytest.raises(ValueError, match="leading dim"):
        at.attention_train_packed(ok[:2])
    big = jnp.zeros((3, 1, 1, 1025, 64), jnp.float32)
    with pytest.raises(ValueError, match="VMEM envelope"):
        at.attention_train_packed(big)


def test_block_b_vmem_cap():
    """block_b * T <= 2048: the probed v5e VMEM envelope for the backward
    program (e.g. block_b=8 at T=512 OOMs on hardware)."""
    assert at._pick_block_b(128, 256) == 8
    assert at._pick_block_b(128, 512) == 4
    assert at._pick_block_b(128, 896) == 2
    assert at._pick_block_b(128, 1024) == 2
    assert at._pick_block_b(3, 256) == 1  # nondivisible batch
    for b, t in ((128, 256), (64, 512), (32, 896), (16, 1024)):
        assert at._pick_block_b(b, t) * t <= 2048


def test_supported_gate():
    assert at.fused_attention_supported(197, 64)
    assert at.fused_attention_supported(1024, 64)
    assert not at.fused_attention_supported(1025, 64)  # pads past MAX_T
    assert not at.fused_attention_supported(197, 65)
    # direct calls outside the envelope fail with intent, not a Mosaic OOM
    big = jnp.zeros((1, 1, 1025, 64), jnp.float32)
    with pytest.raises(ValueError, match="VMEM envelope"):
        at.attention_train(big, big, big)


def test_flash_min_t_override(monkeypatch):
    """VIPERS_FLASH_MIN_T steers all three consumers through one helper."""
    from vipers.discovery.driver import _seq_pad
    from vipers.ops.flash_attention import flash_min_t

    assert flash_min_t() == 512
    assert _seq_pad((1, 224, 224), 16, need_attn=False) is None  # T=197
    monkeypatch.setenv("VIPERS_FLASH_MIN_T", "128")
    assert flash_min_t() == 128
    assert _seq_pad((1, 224, 224), 16, need_attn=False) == 128


def test_enabled_gate(monkeypatch):
    # interpret override wins regardless of backend/dtype
    assert at.attention_train_enabled(jnp.float32)
    monkeypatch.delenv("VIPERS_FUSED_ATTN_INTERPRET")
    # on CPU without the override: disabled
    assert not at.attention_train_enabled(jnp.bfloat16)
    monkeypatch.setenv("VIPERS_FUSED_ATTN_INTERPRET", "1")
    monkeypatch.setenv("VIPERS_FUSED_ATTN", "0")
    assert not at.attention_train_enabled(jnp.bfloat16)


def test_mha_train_wiring(monkeypatch):
    """train=True engages the fused kernel; train=False (short T) keeps the
    einsum; the kill switch restores the einsum; outputs agree."""
    import vipers.models.vit as vit_mod

    calls = {"n": 0}
    orig = at.attention_train_packed

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(
        "vipers.ops.attention_train.attention_train_packed", spy
    )
    mha = vit_mod.MultiHeadAttention(num_heads=H)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, T, H * HD)).astype(np.float32))
    variables = mha.init(jax.random.PRNGKey(0), x, need_attn=False)

    out_f, attn = mha.apply(variables, x, train=True, need_attn=False)
    assert calls["n"] == 1, "fused kernel did not engage on train"
    assert attn is None

    out_e, _ = mha.apply(variables, x, train=False, need_attn=False)
    assert calls["n"] == 1, "fused kernel ran at inference (short T)"

    monkeypatch.setenv("VIPERS_FUSED_ATTN", "0")
    out_k, _ = mha.apply(variables, x, train=True, need_attn=False)
    assert calls["n"] == 1, "kill switch did not disable the fused path"

    a, e = np.asarray(out_f), np.asarray(out_e)
    assert np.abs(a - e).max() < 1e-4 * max(np.abs(e).max(), 1.0)
    assert np.abs(a - np.asarray(out_k)).max() < 1e-4


def test_mha_need_attn_keeps_einsum(monkeypatch):
    """need_attn=True (the LOST/explain contract) must keep the einsum —
    the kernel never materializes the attention matrix to return."""
    import vipers.models.vit as vit_mod

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("fused kernel ran with need_attn=True")

    monkeypatch.setattr(
        "vipers.ops.attention_train.attention_train_packed", boom)
    mha = vit_mod.MultiHeadAttention(num_heads=H)
    x = jnp.zeros((1, 64, H * HD), jnp.float32)
    variables = mha.init(jax.random.PRNGKey(0), x, need_attn=False)
    _, attn = mha.apply(variables, x, train=True, need_attn=True)
    assert attn is not None
