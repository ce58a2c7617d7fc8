"""Fused LN->fc1->GELU Pallas kernel (ops/fused_mlp.py): correctness vs
the unfused composition, gradient contract, and product-path gating.

Runs in interpret mode on CPU (VIPERS_FUSED_MLP_INTERPRET). Tolerances
account for XLA-CPU's reduced-precision f32 matmuls (bf16-class under the
default precision config).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vipers.ops.fused_mlp as fm

D, F = 384, 1536


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("VIPERS_FUSED_MLP_INTERPRET", "1")
    monkeypatch.delenv("VIPERS_FUSED_MLP", raising=False)


def _params(rng):
    g = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.3 + 1)
    b = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    W = jnp.asarray((rng.normal(size=(D, F)) / np.sqrt(D)).astype(np.float32))
    bb = jnp.asarray(rng.normal(size=(F,)).astype(np.float32) * 0.1)
    return g, b, W, bb


def _ref(x, g, b, W, bb, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
    xhat = (xf - mu) * jax.lax.rsqrt(var + eps)
    return fm._gelu_tanh_f32((g * xhat + b) @ W + bb)


def test_forward_matches_reference_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 128, D)).astype(np.float32))
    g, b, W, bb = _params(rng)
    out = fm.fused_ln_dense_gelu(x, g, b, W, bb)
    ref = _ref(x, g, b, W, bb)
    rel = jnp.max(jnp.abs(out - ref) / (jnp.abs(ref) + 1e-3))
    assert float(rel) < 2e-3  # CPU reduced-precision matmul headroom


def test_forward_matches_reference_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 256, D)).astype(np.float32),
                    jnp.bfloat16)
    g, b, W, bb = _params(rng)
    out = fm.fused_ln_dense_gelu(x, g, b, W.astype(jnp.bfloat16), bb)
    ref = _ref(x.astype(jnp.float32), g, b, W, bb)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) < 0.05 * scale


def test_gradients_match_reference():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(128, D)).astype(np.float32))
    g, b, W, bb = _params(rng)

    def loss_fused(*a):
        return (fm.fused_ln_dense_gelu(*a) * 0.01).sum()

    def loss_ref(*a):
        return (_ref(*a) * 0.01).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, g, b, W, bb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, g, b, W, bb)
    for name, a, c in zip("x g b W bb".split(), gf, gr):
        rel = float(jnp.max(jnp.abs(a - c) / (jnp.abs(c) + 1e-4)))
        assert rel < 5e-3, (name, rel)


def test_interceptor_probe_works_on_installed_flax():
    """If flax renames its private interceptor stack, the gate falls back
    to disabled-with-a-warning; this test makes that loud instead of a
    silent perf regression."""
    assert fm._interceptors_active() is not None


def test_block_m_and_gating():
    ok = jnp.zeros((2, 64, D), jnp.bfloat16)  # M=128 divisible
    bad_rows = jnp.zeros((2, 65, D), jnp.bfloat16)  # M=130 not divisible
    f32 = jnp.zeros((2, 64, D), jnp.float32)
    assert fm.fused_supported(ok)
    assert not fm.fused_supported(bad_rows)
    assert not fm.fused_supported(f32)
    # interceptors (the int8/QAT hook) must disable the fused path
    import flax.linen as nn

    with nn.intercept_methods(lambda f, a, k, c: f(*a, **k)):
        assert not fm.fused_supported(ok)
    # explicit kill switch
    os.environ["VIPERS_FUSED_MLP"] = "0"
    try:
        assert not fm.fused_supported(ok)
    finally:
        del os.environ["VIPERS_FUSED_MLP"]


def test_encoder_block_fused_matches_unfused(monkeypatch):
    """The product wiring: EncoderBlock takes the fused branch in bf16,
    produces the same block output as the unfused XLA sequence, and leaves
    the parameter tree untouched (ln_2/fc1 params still owned by their
    modules)."""
    import vipers.models.vit as vit_mod

    calls = {"n": 0}
    orig = fm.fused_ln_dense_gelu

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    blk = vit_mod.EncoderBlock(num_heads=6, mlp_dim=F)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 64, D)).astype(np.float32)
    )
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    assert set(v["params"]["ln_2"]) == {"scale", "bias"}
    assert set(v["params"]["mlp"]["fc1"]) == {"kernel", "bias"}
    vb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)
    xb = x.astype(jnp.bfloat16)

    monkeypatch.setattr(vit_mod, "fused_ln_dense_gelu", spy, raising=False)
    monkeypatch.setattr(fm, "fused_ln_dense_gelu", spy)
    out_f, _, _ = blk.apply(vb, xb, train=False)
    assert calls["n"] == 1, "fused path did not engage"

    monkeypatch.setenv("VIPERS_FUSED_MLP", "0")
    out_u, _, _ = blk.apply(vb, xb, train=False)
    assert calls["n"] == 1, "kill switch did not disable the fused path"

    a = np.asarray(out_f.astype(jnp.float32))
    c = np.asarray(out_u.astype(jnp.float32))
    assert np.abs(a - c).max() < 0.02 * max(np.abs(c).max(), 1.0)


def test_encoder_block_fused_is_inference_only(monkeypatch):
    """train=True must NOT take the fused branch: the kernel's
    recompute-based custom VJP adds an extra fc1 matmul and an unfused f32
    tanh-GELU gradient to every backward (measured 1949 -> 1481 img/s on
    the bf16 AMP train step, docs/PERF.md)."""
    import vipers.models.vit as vit_mod

    calls = {"n": 0}
    orig = fm.fused_ln_dense_gelu

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    blk = vit_mod.EncoderBlock(num_heads=6, mlp_dim=F)
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 64, D)).astype(np.float32)
    )
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    vb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)
    xb = x.astype(jnp.bfloat16)

    monkeypatch.setattr(fm, "fused_ln_dense_gelu", spy)
    blk.apply(vb, xb, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert calls["n"] == 0, "fused kernel engaged on the training forward"
    blk.apply(vb, xb, train=False)
    assert calls["n"] == 1, "fused kernel should still engage at inference"


def test_dino_block_fused_matches_unfused(monkeypatch):
    """Same wiring in the DINO block (norm2 -> fc1 -> GELU inline)."""
    import vipers.models.dino_vit as dv

    calls = {"n": 0}
    orig = fm.fused_ln_dense_gelu

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    blk = dv.DinoBlock(num_heads=6)
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 64, D)).astype(np.float32)
    )
    v = blk.init(jax.random.PRNGKey(0), x)
    vb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)
    xb = x.astype(jnp.bfloat16)

    monkeypatch.setattr(fm, "fused_ln_dense_gelu", spy)
    out_f, _, _, _ = blk.apply(vb, xb)
    assert calls["n"] == 1, "fused path did not engage in DinoBlock"

    monkeypatch.setenv("VIPERS_FUSED_MLP", "0")
    out_u, _, _, _ = blk.apply(vb, xb)
    a = np.asarray(out_f.astype(jnp.float32))
    c = np.asarray(out_u.astype(jnp.float32))
    assert np.abs(a - c).max() < 0.02 * max(np.abs(c).max(), 1.0)
