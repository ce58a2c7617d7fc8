"""Data ops + quantization tests: IoU family, mixup/cutmix, RASampler
stream invariants, LR schedules vs torch semantics, kmeans, fake-quant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipers.data.boxes import bbox_iou
from vipers.data.mixup import mixup_cutmix_batch
from vipers.data.sampler import ra_sampler_indices, shard_indices_for_host
from vipers.train.optim import OptimConfig, make_lr_schedule


# ------------------------------------------------------------------ IoU

def test_iou_basics():
    b1 = [0, 0, 10, 10]
    b2 = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = bbox_iou(b1, b2)
    assert iou[0] == pytest.approx(1.0, rel=1e-5)
    assert iou[1] == pytest.approx(25 / 175, rel=1e-3)
    assert iou[2] == pytest.approx(0.0, abs=1e-6)


def test_giou_diou_ciou_bounds():
    b1 = [0, 0, 10, 10]
    b2 = np.asarray([[20, 0, 30, 10]])
    giou = bbox_iou(b1, b2, GIoU=True)[0]
    diou = bbox_iou(b1, b2, DIoU=True)[0]
    ciou = bbox_iou(b1, b2, CIoU=True)[0]
    assert giou < 0 and diou < 0 and ciou < 0  # disjoint -> negative penalty
    same = bbox_iou(b1, np.asarray([b1]), GIoU=True)[0]
    assert same == pytest.approx(1.0, rel=1e-5)
    # GIoU = IoU - (C - U)/C computed independently
    inter = 0.0
    union = 200.0 + 2e-7  # both areas have +eps on height
    c_area = 30 * 10
    # reproduce eps terms: h has +1e-7
    assert giou == pytest.approx(0 - (c_area - union) / c_area, abs=1e-3)


# ------------------------------------------------------------ mixup/cutmix

def test_mixup_convex_combination():
    rng = jax.random.PRNGKey(0)
    x = jnp.stack([jnp.zeros((8, 8, 3)), jnp.ones((8, 8, 3))])
    y = jnp.asarray([0, 1])
    mx, my = mixup_cutmix_batch(rng, x, y, num_classes=2,
                                mixup_alpha=1.0, cutmix_alpha=0.0)
    my = np.asarray(my)
    # targets stay a convex combination summing to 1
    np.testing.assert_allclose(my.sum(axis=1), 1.0, rtol=1e-5)
    lam = my[0, 0]
    # image 0 = lam*zeros + (1-lam)*ones
    np.testing.assert_allclose(np.asarray(mx)[0], (1 - lam), atol=1e-5)


def test_cutmix_lambda_matches_box_area():
    rng = jax.random.PRNGKey(3)
    x = jnp.stack([jnp.zeros((16, 16, 3)), jnp.ones((16, 16, 3))])
    y = jnp.asarray([0, 1])
    mx, my = mixup_cutmix_batch(rng, x, y, num_classes=2,
                                mixup_alpha=0.0, cutmix_alpha=1.0)
    mx, my = np.asarray(mx), np.asarray(my)
    # fraction of pasted pixels in image 0 == 1 - lambda == my[0, 1]
    pasted = mx[0].mean()
    np.testing.assert_allclose(pasted, my[0, 1], atol=1e-5)


# --------------------------------------------------------------- sampler

def test_ra_sampler_invariants():
    n, reps, world = 40, 3, 4
    streams = [ra_sampler_indices(n, world, r, epoch=0, repetitions=reps)
               for r in range(world)]
    # n < 256: the reference's floor(len/256)*256 truncation selects zero
    # samples; we fall back to the full repeated stream so small datasets
    # still train (sampler.py small-n guard)
    num_samples = int(np.ceil(n * reps / world))
    for s in streams:
        assert len(s) == num_samples
    n = 512
    streams = [ra_sampler_indices(n, world, r, epoch=1, repetitions=reps)
               for r in range(world)]
    allidx = [i for s in streams for i in s]
    assert len(allidx) == int(512 // 256 * 256 / world) * world
    # each selected sample appears at most `reps` times across ranks
    from collections import Counter

    counts = Counter(allidx)
    assert max(counts.values()) <= reps


def test_shard_indices_cover_dataset():
    n, world = 103, 8
    streams = [shard_indices_for_host(n, world, r, epoch=0) for r in range(world)]
    allidx = sorted(i for s in streams for i in s)
    assert set(allidx) == set(range(n))  # full coverage with padding
    assert len(allidx) == int(np.ceil(n / world)) * world


# --------------------------------------------------------------- schedules

def test_lr_schedule_step_cosine_warmup():
    cfg = OptimConfig(lr=1.0, lr_scheduler="steplr", lr_step_size=2,
                      lr_gamma=0.1, epochs=10)
    sch = make_lr_schedule(cfg, steps_per_epoch=5)
    assert float(sch(0)) == pytest.approx(1.0)
    assert float(sch(10)) == pytest.approx(0.1)  # epoch 2
    assert float(sch(20)) == pytest.approx(0.01)  # epoch 4

    cfg = OptimConfig(lr=1.0, lr_scheduler="cosineannealinglr", lr_min=0.0,
                      epochs=10, lr_warmup_epochs=2, lr_warmup_method="linear",
                      lr_warmup_decay=0.5)
    sch = make_lr_schedule(cfg, steps_per_epoch=1)
    assert float(sch(0)) == pytest.approx(0.5)  # warmup start factor
    assert float(sch(2)) == pytest.approx(1.0)  # cosine at e=0
    assert float(sch(10)) == pytest.approx(0.0, abs=1e-6)  # T_max reached


# ----------------------------------------------------------------- kmeans

def test_kmeans_separates_blobs():
    from vipers.discovery.kmeans import kmeans2, whiten

    rng = np.random.default_rng(0)
    a = rng.normal(size=(30, 4)) + 10
    b = rng.normal(size=(30, 4)) - 10
    x = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    _cent, labels = kmeans2(jax.random.PRNGKey(0), whiten(x), k=2, iters=10)
    labels = np.asarray(labels)
    assert len(set(labels[:30])) == 1 and len(set(labels[30:])) == 1
    assert labels[0] != labels[-1]


def test_kmeans_and_whiten_match_scipy_in_loop():
    """scipy's own `cluster.vq.kmeans2` / `whiten`
    (`/root/reference/cluster_for_OD.py:26,188-196`) run on the SAME data
    and the SAME explicit initial centroids agree with the jitted Lloyd
    implementation: identical final centroids (to fp tolerance) and
    identical labels under them."""
    from scipy.cluster.vq import kmeans2 as scipy_kmeans2, whiten as scipy_whiten

    from vipers.discovery.kmeans import kmeans2_init, whiten

    rng = np.random.default_rng(42)
    x = rng.normal(size=(80, 6)) * rng.uniform(0.5, 3.0, size=6)
    np.testing.assert_allclose(
        np.asarray(whiten(jnp.asarray(x))), scipy_whiten(x), rtol=1e-6
    )

    xw = scipy_whiten(x)
    init = xw[rng.permutation(80)[:4]].copy()
    iters = 7
    ref_cent, ref_labels = scipy_kmeans2(
        xw, init.copy(), iter=iters, minit="matrix", missing="warn"
    )
    cent, labels = kmeans2_init(jnp.asarray(xw), jnp.asarray(init), iters=iters)
    np.testing.assert_allclose(np.asarray(cent), ref_cent, rtol=1e-6, atol=1e-8)
    # scipy's OWN returned labels: the last assignment (the one the final
    # centroids were computed from) — must match exactly, including any
    # boundary points that would flip under a final-centroid re-assignment
    np.testing.assert_array_equal(np.asarray(labels), ref_labels)


def test_cluster_input_matches_reference_expression():
    """`cluster_boxes` feeds kmeans exactly what the reference does
    (`cluster_for_OD.py:189-191`): vq.whiten(x) row-L2-normalized."""
    from scipy.cluster.vq import whiten as scipy_whiten

    from vipers.discovery.cluster import cluster_input

    x = np.random.default_rng(3).normal(size=(40, 384)).astype(np.float32)
    ref = scipy_whiten(x)
    ref = ref / np.linalg.norm(ref, axis=1)[:, None]
    np.testing.assert_allclose(
        np.asarray(cluster_input(jnp.asarray(x))), ref, rtol=2e-5, atol=1e-6
    )


# ----------------------------------------------------------- quantization

def test_fake_quant_ste_and_roundtrip():
    from vipers.train.quantize import fake_quant, per_channel_weight_scale

    w = jnp.asarray(np.random.default_rng(0).normal(size=(6, 4)).astype(np.float32))
    s = per_channel_weight_scale(w)
    q = fake_quant(w, s)
    # quantization error bounded by scale/2 per channel
    err = np.abs(np.asarray(q - w))
    assert np.all(err <= np.asarray(s) / 2 + 1e-6)
    # STE: gradient of sum(fake_quant) wrt w is ~1 inside the clip range
    g = jax.grad(lambda w: fake_quant(w, s).sum())(w)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)


def test_int8_bake_and_dequant():
    from vipers.train.quantize import dequantize_params, quantize_params_int8

    params = {"fc": {"kernel": jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 8)).astype(np.float32)),
        "bias": jnp.zeros((8,))}}
    q, scales = quantize_params_int8(params)
    assert q[("fc", "kernel")].dtype == jnp.int8
    deq = dequantize_params(params, q, scales)
    err = np.abs(np.asarray(deq["fc"]["kernel"] - params["fc"]["kernel"]))
    assert err.max() <= float(np.asarray(scales[("fc", "kernel")]).max()) / 2 + 1e-6


def _qat_fixture():
    from vipers.core.registry import build_model
    from vipers.pruning import init_masks, magnitude_prune
    from vipers.pruning.masks import apply_masks
    from vipers.train.optim import make_optimizer
    from vipers.train.quantize import init_observers, observer_sites
    from vipers.train.steps import TrainState

    spec = build_model("resnet18", num_classes=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 32, 3)), jnp.float32)
    y = jnp.asarray([0, 1, 2, 3])
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    params, bs = variables["params"], variables["batch_stats"]
    masks = magnitude_prune(params, init_masks(params), 0.5)
    params = apply_masks(params, masks)
    cfg = OptimConfig(opt="sgd", lr=0.01, epochs=1)
    tx = make_optimizer(cfg, params, make_lr_schedule(cfg, 1))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=bs, masks=masks, opt_state=tx.init(params))
    sites = observer_sites(spec.module, {"params": params, "batch_stats": bs},
                           x, train=False, need_attn=False)
    observers = init_observers(sites)
    return spec, tx, state, observers, x, y


@pytest.mark.slow
def test_qat_step_quantizes_activations_and_keeps_masks():
    """QAT composes with pruning: pruned weights stay zero, observers see
    real ranges, and activations are fake-quantized in the forward
    (round-1 gap: the QAT loop never touched ObserverState)."""
    from vipers.pruning.masks import _flat
    from vipers.train.quantize import make_qat_train_step

    spec, tx, state, observers, x, y = _qat_fixture()
    assert observers  # conv/dense sites discovered
    qat = make_qat_train_step(spec.module, tx, num_classes=4)
    obs0 = observers
    for i in range(3):
        state, observers, metrics = qat(state, observers, (x, y),
                                        jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))
    # observers actually updated (ranges initialized and non-degenerate)
    moved = [
        k for k in observers
        if bool(observers[k].initialized)
        and float(observers[k].max_val - observers[k].min_val) > 0
    ]
    assert len(moved) == len(observers)
    assert all(not bool(o.initialized) for o in obs0.values())
    # pruned weights still exactly zero
    flat = _flat(state.params)
    for path, mask in state.masks.items():
        vals = np.asarray(flat[path])[~np.asarray(mask)]
        np.testing.assert_allclose(vals, 0.0, atol=1e-7)


@pytest.mark.slow
def test_qat_freeze_schedules():
    """observer_update=False freezes ranges; bn_frozen=True freezes batch
    stats (train_quantization.py:110-125 semantics)."""
    from vipers.train.quantize import make_qat_train_step

    spec, tx, state, observers, x, y = _qat_fixture()
    warm = make_qat_train_step(spec.module, tx, num_classes=4)
    state, observers, _ = warm(state, observers, (x, y), jax.random.PRNGKey(0))

    frozen = make_qat_train_step(spec.module, tx, num_classes=4,
                                 observer_update=False, bn_frozen=True)
    state2, observers2, _ = frozen(state, observers, (x, y),
                                   jax.random.PRNGKey(1))
    for k in observers:
        assert float(observers2[k].min_val) == float(observers[k].min_val)
        assert float(observers2[k].max_val) == float(observers[k].max_val)
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(state2.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # unfrozen variant does move BN stats
    state3, _, _ = warm(state, observers, (x, y), jax.random.PRNGKey(1))
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(state.batch_stats),
                        jax.tree.leaves(state3.batch_stats))
    ]
    assert max(diffs) > 0


def test_fake_quant_activation_changes_forward():
    """quantized_apply(apply_act_fake_quant=True) must alter the forward
    (activations snap to the uint8 grid) once observers are calibrated."""
    import flax.linen as nn

    from vipers.train.quantize import (
        init_observers, observer_sites, quantized_apply,
    )

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, need_attn=False):
            h = nn.Dense(16, name="fc1")(x)
            h = nn.relu(h)
            return nn.Dense(4, name="fc2")(h), {}

    m = Tiny()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 12)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    sites = observer_sites(m, v, x)
    obs = init_observers(sites)
    # calibrate (observe only)
    _, obs = quantized_apply(m, v, x, obs, update_observers=True,
                             apply_act_fake_quant=False)
    (logits_q, _), _ = quantized_apply(m, v, x, obs, update_observers=False,
                                       apply_act_fake_quant=True)
    logits, _ = m.apply(v, x)
    assert not np.allclose(np.asarray(logits_q), np.asarray(logits))
    # but close: one QDQ round per site
    np.testing.assert_allclose(np.asarray(logits_q), np.asarray(logits),
                               atol=0.2)


def test_int8_dense_matches_qdq_within_tolerance():
    """The real-int8 dot_general path (uint8 act x int8 weight, int32
    accumulate) must match QDQ inference to ~1%."""
    import flax.linen as nn

    from vipers.train.quantize import (
        dequantize_params, init_observers, int8_apply, observer_sites,
        ptq_calibrate, quantize_params_int8,
    )

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, need_attn=False):
            h = nn.Dense(32, name="fc1")(x)
            h = nn.relu(h)
            return nn.Dense(8, name="fc2")(h), {}

    m = Tiny()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 24)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    obs = init_observers(observer_sites(m, v, x))
    obs = ptq_calibrate(
        m, v, obs,
        [(jnp.asarray(rng.normal(size=(16, 24)), jnp.float32), None)
         for _ in range(4)],
        num_batches=4,
    )
    q, scales = quantize_params_int8(v["params"])
    qdq_logits, _ = m.apply({"params": dequantize_params(v["params"], q, scales)}, x)
    int8_logits, _ = int8_apply(m, v, x, q, scales, obs)
    ref_scale = float(np.abs(np.asarray(qdq_logits)).max())
    err = float(np.abs(np.asarray(int8_logits) - np.asarray(qdq_logits)).max())
    assert err <= 0.02 * ref_scale + 0.05

    # calibration must affect the int8 result (round-1 gap: observer result
    # was printed and discarded)
    from vipers.train.quantize import init_observers as init2
    obs_fresh = init2(observer_sites(m, v, x))
    # un-calibrated observers (scale 1e-9-ish) produce garbage
    bad_logits, _ = int8_apply(m, v, x, q, scales, obs_fresh)
    assert not np.allclose(np.asarray(bad_logits), np.asarray(int8_logits),
                           atol=0.1)


def test_int8_conv_exact_integer_math():
    """The real-int8 conv path (explicit zero-point-valued padding +
    uniform per-channel correction) must reproduce the affine-quant
    reference conv(DQ(x), DQ(w)) EXACTLY (integer arithmetic; only f32
    dequant rounding differs) — incl. stride, dilation and asymmetric
    explicit pads."""
    from vipers.train.quantize import (
        ACT_QMAX, ACT_QMIN, ObserverState, int8_conv,
        per_channel_weight_scale,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 13, 11, 3)) * 2 + 0.7, jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    ws = per_channel_weight_scale(w)
    w_q = jnp.clip(jnp.round(w / ws), -128, 127).astype(jnp.int8)
    obs = ObserverState.init().update(x)
    s, zp = obs.qparams()

    pads, strides, dil = ((2, 1), (1, 2)), (2, 1), (1, 2)
    got = int8_conv(x, w_q, ws.reshape(-1), s, zp, bias, pads, strides, dil)

    xq = jnp.clip(jnp.round(x / s + zp), ACT_QMIN, ACT_QMAX)
    x_dq = (xq - zp) * s
    w_dq = w_q.astype(jnp.float32) * ws
    want = jax.lax.conv_general_dilated(
        x_dq, w_dq, window_strides=strides,
        padding=pads, rhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-5)


def test_int8_apply_cnn_stack_matches_qdq():
    """int8_apply executes convs (explicit pads, SAME default, depthwise
    groups) AND dense in integer arithmetic; end-to-end must track QDQ
    inference within ~2%."""
    import flax.linen as nn

    from vipers.train.quantize import (
        dequantize_params, init_observers, int8_apply, observer_sites,
        ptq_calibrate, quantize_params_int8,
    )

    class TinyCNN(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, need_attn=False):
            h = nn.Conv(8, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], name="c1")(x)
            h = nn.relu(h)
            h = nn.Conv(8, (3, 3), feature_group_count=8, name="dw")(h)  # SAME
            h = nn.relu(h)
            h = jnp.mean(h, axis=(1, 2))
            return nn.Dense(4, name="fc")(h), {}

    m = TinyCNN()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    obs = init_observers(observer_sites(m, v, x))
    obs = ptq_calibrate(
        m, v, obs,
        [(jnp.asarray(rng.normal(size=(4, 16, 16, 3)), jnp.float32), None)
         for _ in range(4)],
        num_batches=4,
    )
    q, scales = quantize_params_int8(v["params"])
    assert ("c1", "kernel") in q and ("dw", "kernel") in q
    qdq, _ = m.apply({"params": dequantize_params(v["params"], q, scales)}, x)
    got, _ = int8_apply(m, v, x, q, scales, obs)
    ref_scale = float(np.abs(np.asarray(qdq)).max())
    err = float(np.abs(np.asarray(got) - np.asarray(qdq)).max())
    assert err <= 0.02 * ref_scale + 0.05, err


def test_int8_dynamic_apply_matches_simulated_quant():
    """Dynamic-int8 serving (no calibration): for one Dense the integer
    path must EXACTLY equal the simulated computation
    ``DQ_dyn(x) @ (w_q * s_w) + b`` with qparams from the live tensor."""
    import flax.linen as nn

    from vipers.train.quantize import (
        ACT_QMAX, ACT_QMIN, dynamic_qparams, int8_dynamic_apply,
        quantize_params_int8,
    )

    class One(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(16, name="fc")(x)

    m = One()
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(8, 24)) * 3 + 1, jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    q, scales = quantize_params_int8(v["params"])
    got = int8_dynamic_apply(m, v, x, q, scales)

    s, zp = dynamic_qparams(x)
    xq = jnp.clip(jnp.round(x / s + zp), ACT_QMIN, ACT_QMAX)
    x_dq = (xq - zp) * s
    w_dq = q[("fc", "kernel")].astype(jnp.float32) * scales[("fc", "kernel")]
    want = x_dq @ w_dq + v["params"]["fc"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_vit_quant_exclude_keeps_einsum_projections_float():
    """The torchvision ViT applies qkv AND out via custom einsums
    (models/vit._ProjParams) that the int8 interceptor cannot execute, so
    weight quantization must skip both — otherwise QDQ rounding error is
    baked into a float matmul for zero int8 benefit. DINO's projections
    are real nn.Dense modules and stay quantized (qkv aside, which mirrors
    the reference's prune/quant exemption)."""
    from vipers.core.registry import build_model
    from vipers.train.quantize import quantize_params_int8

    spec = build_model("vit_s_16", num_classes=10, image_size=(32, 32))
    v = spec.init(jax.random.PRNGKey(0))
    q, _scales = quantize_params_int8(v["params"], exclude=spec.quant_exclude)
    joined = ["/".join(p) for p in q]
    assert not any("attention" in p for p in joined), joined[:4]
    assert any("fc1" in p or "mlp" in p for p in joined)

    dspec = build_model("dino_vit_tiny")
    dv = dspec.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 32, 32, 3), jnp.float32))
    dq, _ = quantize_params_int8(dv["params"], exclude=dspec.quant_exclude)
    djoined = ["/".join(p) for p in dq]
    assert any(p.endswith("proj/kernel") for p in djoined)
    assert not any("qkv" in p for p in djoined)


# ------------------------------------------------------------- native decode

def test_resize_shorter_truncates_like_torchvision():
    """torchvision's shorter-side resize TRUNCATES the long side
    (`int(size * long / short)`, F_pil.resize) — rounding would shift the
    center crop on ~half of aspect ratios vs reference preprocessing."""
    from PIL import Image

    from vipers.data.preprocess import resize_shorter

    cases = [  # (w, h, size) -> torchvision-exact output (w, h)
        ((64, 99), 32, (32, 49)),    # 32*99/64 = 49.546 -> 49, NOT 50
        ((99, 64), 32, (49, 32)),
        ((500, 375), 256, (341, 256)),  # classic VOC aspect
        ((375, 500), 256, (256, 341)),
        ((100, 100), 64, (64, 64)),
    ]
    for (w, h), size, want in cases:
        img = Image.new("RGB", (w, h))
        assert resize_shorter(img, size).size == want, (w, h, size)


def test_center_crop_rounds_half_even_like_torchvision():
    """torchvision F.center_crop origin is int(round(d/2.0)) — Python
    banker's rounding, one off plain floor when d mod 4 in {2, 3}."""
    from vipers.data.preprocess import center_crop

    arr = np.arange(20 * 24 * 3, dtype=np.uint8).reshape(20, 24, 3)
    # h=20, crop=14 -> d=6, round(3.0)=3; w=24 -> d=10, round(5.0)=5
    out = center_crop(arr, 14)
    np.testing.assert_array_equal(out, arr[3:17, 5:19])
    # h=20, crop=13 -> d=7, round(3.5)=4 (half-even); w d=11, round(5.5)=6
    out = center_crop(arr, 13)
    np.testing.assert_array_equal(out, arr[4:17, 6:19])
    # h=20, crop=15 -> d=5, round(2.5)=2 (half-even down); w d=9, round(4.5)=4
    out = center_crop(arr, 15)
    np.testing.assert_array_equal(out, arr[2:17, 4:19])


def test_device_normalize_matches_torch_op_order():
    """ConvertImageDtype then Normalize: ((x/255) - mean) / std. XLA
    strength-reduces both divisions to reciprocal multiplies (~1 ulp
    relative error each), so agreement with torch's true-division result
    is a few ulp of the pre-subtraction magnitude (the x/255-mean
    cancellation amplifies RELATIVE error near zero, so the bound is
    absolute: a few ulp at |x/255|<=1 divided by std~0.23 is ~2e-6)."""
    import torch

    from vipers.data.preprocess import IMAGENET_MEAN, IMAGENET_STD, make_device_normalize

    rng = np.random.default_rng(3)
    batch = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    ours = np.asarray(make_device_normalize()(batch))
    t = torch.from_numpy(batch).to(torch.float32) / 255.0
    t = ((t - torch.tensor(IMAGENET_MEAN)) / torch.tensor(IMAGENET_STD)).numpy()
    np.testing.assert_allclose(ours, t, rtol=0, atol=2e-6)


def test_native_decoder_matches_shapes_and_falls_back(tmp_path):
    from PIL import Image

    from vipers.data import native

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(120, 180, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(arr).save(p, quality=95)
    out = native.decode_eval(p, 96, 80)
    assert out.shape == (80, 80, 3) and out.dtype == np.uint8
    if native.available():
        assert native.jpeg_dims(p) == (180, 120)
    t = native.decode_train(p, np.random.default_rng(1), 64)
    assert t.shape == (64, 64, 3)
    # non-JPEG falls back to PIL path
    p2 = str(tmp_path / "y.png")
    Image.fromarray(arr).save(p2)
    out2 = native.decode_eval(p2, 96, 80)
    assert out2.shape == (80, 80, 3)


# ------------------------------------------------------------ auto-augment

def test_auto_augment_policies(rng):
    from vipers.data.autoaugment import POLICIES, apply_policy

    arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    for name in POLICIES:
        out = apply_policy(name, arr, np.random.default_rng(0))
        assert out.shape == arr.shape and out.dtype == np.uint8, name
    with pytest.raises(ValueError):
        apply_policy("bogus", arr, np.random.default_rng(0))


def test_train_decode_with_auto_augment(tmp_path, rng):
    from PIL import Image

    from vipers.data.preprocess import train_decode

    p = str(tmp_path / "a.jpg")
    Image.fromarray((rng.random((80, 80, 3)) * 255).astype(np.uint8)).save(p)
    out = train_decode(p, np.random.default_rng(0), crop_size=32,
                       auto_augment="ra")
    assert out.shape == (32, 32, 3)


def test_image_dataset_single(tmp_path, rng):
    from PIL import Image

    from vipers.data.detection import ImageDataset

    p = str(tmp_path / "one.jpg")
    Image.fromarray((rng.random((20, 30, 3)) * 255).astype(np.uint8)).save(p)
    ds = ImageDataset(p)
    (img, name), = list(ds)
    assert img.shape == (20, 30, 3) and name == "one.jpg"
    assert abs(float(img.mean())) < 5  # normalized


def test_imagefolder_listing_cache(tmp_path, rng):
    from PIL import Image

    from vipers.data.imagefolder import ImageFolder

    root = tmp_path / "ds"
    for c in ("x", "y"):
        (root / c).mkdir(parents=True)
        Image.fromarray((rng.random((8, 8, 3)) * 255).astype(np.uint8)).save(
            root / c / "a.jpg")
    cache = str(tmp_path / "cache")
    ds1 = ImageFolder(str(root), cache_dir=cache)
    import os

    assert len(os.listdir(cache)) == 1
    # second construction loads from the cache (remove the files to prove it)
    (root / "x" / "a.jpg").unlink()
    ds2 = ImageFolder(str(root), cache_dir=cache)
    assert ds2.samples == ds1.samples


def test_quantize_artifact_roundtrip(tmp_path):
    """The PTQ/QAT artifacts (`vipers quantize`) carry params + masks +
    batch_stats + observers, and load_lost_checkpoint restores all four —
    BN models were previously unrestorable from the saved files."""
    import jax.numpy as jnp

    from vipers.core.checkpoint import save_checkpoint
    from vipers.discovery.driver import load_lost_checkpoint

    params = {"conv": {"kernel": jnp.ones((3, 3, 2, 4))}}
    artifact = {
        "params": params,
        "masks": {"conv/kernel": np.ones((3, 3, 2, 4), bool)},
        "batch_stats": {"bn": {"mean": jnp.zeros((4,)),
                               "var": jnp.ones((4,))}},
        "observers": {"conv": {"min": np.float32(-1.5),
                               "max": np.float32(2.5)}},
    }
    path = str(tmp_path / "quantized_post_train_model")
    save_checkpoint(path, artifact)
    variables, masks, observers = load_lost_checkpoint(path, None, None)
    assert "batch_stats" in variables
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["bn"]["var"]), np.ones((4,)))
    assert ("conv", "kernel") in masks and masks[("conv", "kernel")].dtype == bool
    assert float(observers["conv"]["max"]) == 2.5
