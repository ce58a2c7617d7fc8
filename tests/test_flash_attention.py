"""Flash-attention kernel vs the reference einsum (fallback on CPU; the
Pallas path is exercised in interpret mode and on real TPU by bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipers.ops.flash_attention import attention_reference, flash_attention


def _rand(b, h, t, d, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    return mk(), mk(), mk()


def test_cpu_fallback_matches_reference():
    q, k, v = _rand(2, 3, 17, 8)
    out = flash_attention(q, k, v)
    want, _ = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5, rtol=1e-4)


def test_cpu_fallback_with_mask():
    q, k, v = _rand(2, 2, 10, 4, seed=1)
    valid = jnp.asarray(np.random.default_rng(2).random((2, 10)) > 0.3)
    out = flash_attention(q, k, v, valid=valid)
    want, _ = attention_reference(q, k, v, mask=valid[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5, rtol=1e-4)


def test_pallas_interpret_matches_reference():
    """Run the actual kernel dataflow in interpreter mode on CPU."""
    from vipers.ops.flash_attention import _flash_fwd

    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _rand(1, 2, 256, 64, seed=3)
    valid = jnp.ones((1, 256), bool)
    with pltpu.force_tpu_interpret_mode():
        out, lse = _flash_fwd(q, k, v, valid, 64 ** -0.5, 128, 128)
    want, probs = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5, rtol=1e-3)
    # logsumexp consistency
    logits = np.einsum("bhqd,bhkd->bhqk", np.asarray(q) * 64 ** -0.5, np.asarray(k))
    want_lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1)
    np.testing.assert_allclose(np.asarray(lse), want_lse, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_vit_flash_path_matches_attn_path():
    """need_attn=False (flash/fallback) == need_attn=True logits."""
    from vipers.core.registry import build_model

    spec = build_model("vit_s_16", num_classes=5, image_size=(32, 32))
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 32, 32, 3)), jnp.float32)
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    l1, aux1 = spec.module.apply(variables, x, train=False, need_attn=True)
    l2, aux2 = spec.module.apply(variables, x, train=False, need_attn=False)
    assert aux1["attn"] is not None and aux2["attn"] is None
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5, rtol=1e-4)


def test_flash_gradients_match_reference():
    q, k, v = _rand(1, 2, 32, 8, seed=5)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v)[0] ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)
