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


def test_flash_custom_vjp_backward_matches_autodiff():
    """_flash_vjp_bwd (the recomputation backward the TPU path uses) must
    produce the same dq/dk/dv as autodiff through the reference attention —
    round-1 gap: the custom-vjp backward was never executed by any test."""
    from vipers.ops.flash_attention import (
        NEG_INF, _flash_vjp_bwd, attention_reference,
    )

    rng = np.random.default_rng(0)
    b, h, t, hd = 2, 3, 24, 16
    q = jnp.asarray(rng.normal(size=(b, h, t, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, hd)), jnp.float32)
    valid = jnp.asarray(rng.random((b, t)) > 0.2)
    cot = jnp.asarray(rng.normal(size=(b, h, t, hd)), jnp.float32)
    scale = hd ** -0.5

    def ref_sum(q, k, v):
        out, _ = attention_reference(q, k, v, scale=scale,
                                     mask=valid[:, None, None, :])
        return jnp.sum(out * cot)

    dq_ad, dk_ad, dv_ad = jax.grad(ref_sum, argnums=(0, 1, 2))(q, k, v)

    # residuals as the flash forward would produce them
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    out, _ = attention_reference(q, k, v, scale=scale,
                                 mask=valid[:, None, None, :])
    dq, dk, dv, dvalid = _flash_vjp_bwd(scale, 128, 128,
                                        (q, k, v, valid, out, lse), cot)
    assert dvalid is None
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ad), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ad), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ad), atol=2e-5)


_TPU_GRAD_SCRIPT = r"""
import jax, jax.numpy as jnp, numpy as np
if jax.devices()[0].platform != "tpu":
    print("NO_TPU"); raise SystemExit(0)
from vipers.ops.flash_attention import attention_reference, flash_attention_official

rng = np.random.default_rng(7)
b, h, t, hd = 2, 6, 769, 64  # ViT-S/16 LOST shape (pads to 896)
mk = lambda: jnp.asarray(rng.normal(size=(b, h, t, hd)), jnp.bfloat16)
q, k, v = mk(), mk(), mk()
valid = np.ones((b, t), bool)
valid[0, 700:] = False  # in-bucket pad tokens, as the bucketed LOST path makes
valid = jnp.asarray(valid)
cot = jnp.asarray(rng.normal(size=(b, h, t, hd)), jnp.float32)
# zero cotangents on pad-query rows — the real-consumer contract
cot = cot * valid[:, None, :, None]

def loss_official(q, k, v):
    out = flash_attention_official(q, k, v, valid=valid)
    return jnp.sum(out.astype(jnp.float32) * cot)

def loss_ref(q, k, v):
    out, _ = attention_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                                 v.astype(jnp.float32),
                                 mask=valid[:, None, None, :])
    return jnp.sum(out * cot)

go = jax.jit(jax.grad(loss_official, argnums=(0, 1, 2)))(q, k, v)
gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
for name, a, b_ in zip("qkv", go, gr):
    a = np.asarray(a, np.float32); b_ = np.asarray(b_, np.float32)
    rel = np.linalg.norm(a - b_) / max(np.linalg.norm(b_), 1e-12)
    print(f"d{name} rel {rel:.5f}")
    assert rel < 2e-2, (name, rel)
print("GRADS_OK")
"""


@pytest.mark.slow
def test_official_kernel_grads_tpu():
    """Hardware verification of the library-kernel gradient contract
    documented in flash_attention_official: with zero cotangents on
    pad-query rows, dq/dk/dv match f32 autodiff of the masked einsum to
    bf16 precision. Runs on the real TPU (driver env); skips elsewhere."""
    import os
    import subprocess
    import sys

    from tests.conftest import tpu_tunnel_alive

    if os.environ.get("PALLAS_AXON_POOL_IPS") and not tpu_tunnel_alive():
        pytest.skip("TPU tunnel relay down — subprocess would hang")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _TPU_GRAD_SCRIPT], cwd=repo, env=env,
            capture_output=True, text=True, timeout=600,
        )
    except subprocess.TimeoutExpired:
        # A dead TPU tunnel makes backend init hang forever (jax.devices()
        # never returns, so the NO_TPU guard never prints) — that's an
        # environment failure, not a gradient-contract failure. But if the
        # tunnel is ALIVE, a timeout means the kernel/backward really hung
        # (or the chip is badly contended) — surface that, don't skip the
        # suite's only hardware verification of the gradient contract.
        if tpu_tunnel_alive():
            raise
        pytest.skip("TPU backend init timed out (tunnel down)")
    if "NO_TPU" in proc.stdout:
        pytest.skip("no TPU attached")
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "GRADS_OK" in proc.stdout, proc.stdout


def test_valid_to_segment_ids_matches_masked_reference():
    """The segment-id lowering of our (B, T) validity mask must reproduce
    the -1e9 key-mask semantics — checked against the library's own pure
    mha_reference (runs on CPU)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as ofa

    from vipers.ops.flash_attention import (
        attention_reference, valid_to_segment_ids,
    )

    rng = np.random.default_rng(3)
    b, h, t, hd = 2, 2, 16, 8
    q = jnp.asarray(rng.normal(size=(b, h, t, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, hd)), jnp.float32)
    valid = jnp.asarray(rng.random((b, t)) > 0.3)
    scale = hd ** -0.5

    want, _ = attention_reference(q, k, v, scale=scale,
                                  mask=valid[:, None, None, :])
    got = ofa.mha_reference(q, k, v, ab=None,
                            segment_ids=valid_to_segment_ids(valid),
                            sm_scale=scale)
    # compare only valid query rows (pad queries are don't-care garbage)
    vm = np.asarray(valid)
    for bi in range(b):
        np.testing.assert_allclose(
            np.asarray(got)[bi, :, vm[bi]], np.asarray(want)[bi, :, vm[bi]],
            atol=1e-5,
        )
