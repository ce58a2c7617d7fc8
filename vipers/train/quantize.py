"""int8 quantization: QAT (weight + activation fake-quant with observer /
BN freeze schedules), PTQ calibration, and real-int8 execution.

Counterpart of `/root/reference/train_quantization.py:15-154`, which uses
torch.ao (fbgemm/qnnpack kernels):
  * QAT: fuse -> prepare_qat -> train with observer/BN-freeze schedules
    (observers frozen after ``num_observer_update_epochs``, BN stats frozen
    after ``num_batch_norm_update_epochs`` — `:110-125`) -> per-epoch int8
    convert + eval (`:129-135`),
  * PTQ: calibrate observers on N batches -> convert (`:83-104`).

TPU-native design:
  * weights: per-output-channel symmetric int8 fake-quant with a
    straight-through estimator (torch default QAT weight scheme),
  * activations: per-tensor affine uint8 fake-quant at every conv/dense
    input AND output, driven by moving-average min/max observers carried
    through the jitted step as a pytree (torch
    MovingAverageMinMaxObserver / FusedMovingAvgObsFakeQuantize). The
    sites are injected with ``flax.linen.intercept_methods`` — no model
    rewrites,
  * observer freeze = a static flag variant of the step (no observer
    updates compiled in); BN freeze = forward with running stats and no
    batch-stats mutation (torch ``freeze_bn_stats`` semantics),
  * convert = bake int8 weights + scales; Dense AND Conv layers then
    execute as REAL int8 ``lax.dot_general`` / ``conv_general_dilated``
    (int8 x int8, int32 accumulate on the MXU int8 path) with the
    activation zero-point folded into a per-output-channel correction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
from flax import traverse_util

ACT_QMIN, ACT_QMAX = 0, 255  # uint8 activations (torch default affine)


@jax.custom_vjp
def _round_ste(x):
    return jnp.round(x)


def _round_fwd(x):
    return jnp.round(x), None


def _round_bwd(_res, g):
    return (g,)  # straight-through


_round_ste.defvjp(_round_fwd, _round_bwd)


def fake_quant(x, scale, zero_point=0.0, qmin=-128, qmax=127):
    """Quantize-dequantize with STE gradients (torch FakeQuantize):
    d(out)/dx = 1 inside [qmin, qmax] inclusive, 0 outside (jnp.clip would
    give 0.5 at the exact boundary)."""
    inv = x / scale + zero_point
    q = jnp.clip(_round_ste(inv), qmin, qmax)
    out = (q - zero_point) * scale
    inside = (inv >= qmin) & (inv <= qmax)
    # value from `out`, gradient from the STE passthrough where inside
    passthrough = x + jax.lax.stop_gradient(out - x)
    return jnp.where(inside, passthrough, jax.lax.stop_gradient(out))


def per_channel_weight_scale(w, axis: int = -1, qmax: int = 127):
    """Symmetric per-output-channel scales (fbgemm weight scheme)."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    return jnp.maximum(amax / qmax, 1e-9)


def fake_quant_weights(params, exclude=()) -> dict:
    """Fake-quantize every conv/dense kernel per-channel int8."""
    flat = dict(traverse_util.flatten_dict(params))
    for path, leaf in flat.items():
        if path[-1] != "kernel" or leaf.ndim not in (2, 4):
            continue
        if any(p in "/".join(path) for p in exclude):
            continue
        scale = per_channel_weight_scale(leaf)
        flat[path] = fake_quant(leaf, scale)
    return traverse_util.unflatten_dict(flat)


@flax.struct.dataclass
class ObserverState:
    """Per-site moving-average min/max (torch MovingAverageMinMaxObserver,
    averaging_constant=0.01). The first update snaps to the batch range
    (torch's uninitialized sentinel), later updates EMA. A pytree, so
    observers flow through jitted steps."""

    min_val: jnp.ndarray
    max_val: jnp.ndarray
    initialized: jnp.ndarray  # bool scalar

    @staticmethod
    def init():
        return ObserverState(
            jnp.zeros(()), jnp.zeros(()), jnp.zeros((), bool)
        )

    def update(self, x, momentum: float = 0.01):
        mn = jnp.min(x).astype(jnp.float32)
        mx = jnp.max(x).astype(jnp.float32)
        new_min = jnp.where(
            self.initialized, self.min_val + momentum * (mn - self.min_val), mn
        )
        new_max = jnp.where(
            self.initialized, self.max_val + momentum * (mx - self.max_val), mx
        )
        return ObserverState(new_min, new_max, jnp.ones((), bool))

    def qparams(self, qmin=ACT_QMIN, qmax=ACT_QMAX) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # torch affine qparams: range always includes 0
        mn = jnp.minimum(self.min_val, 0.0)
        mx = jnp.maximum(self.max_val, 0.0)
        scale = jnp.maximum((mx - mn) / (qmax - qmin), 1e-9)
        zp = jnp.clip(jnp.round(qmin - mn / scale), qmin, qmax)
        return scale, zp


def static_qparams_from_observers(observers):
    """Calibrated observer ranges (``{site: {"min", "max"}}`` as written
    into checkpoints by ``vipers quantize``) -> ``{site: (scale, zp)}``
    static activation qparams for the real-int8 serving paths (torch
    static-quantization semantics: no per-batch min/max on the hot path).
    ``:in`` suffixes are stripped; ``:out`` observer sites are skipped
    (only input qparams feed the integer matmul/conv)."""
    if not observers:
        return None
    out = {}
    for site, mm in observers.items():
        site = site[:-3] if site.endswith(":in") else site
        if site.endswith(":out"):
            continue
        obs = ObserverState(
            jnp.asarray(mm["min"], jnp.float32),
            jnp.asarray(mm["max"], jnp.float32),
            jnp.ones((), bool),
        )
        out[site] = obs.qparams()
    return out or None


def quantize_params_int8(params, exclude=()):
    """Bake int8 weights + scales for inference ("convert"). Returns
    (int8_params, scales) flat dicts keyed by kernel path."""
    flat = traverse_util.flatten_dict(params)
    q, scales = {}, {}
    for path, leaf in flat.items():
        if path[-1] != "kernel" or leaf.ndim not in (2, 4):
            continue
        if any(p in "/".join(path) for p in exclude):
            continue
        s = per_channel_weight_scale(leaf)
        q[path] = jnp.clip(jnp.round(leaf / s), -128, 127).astype(jnp.int8)
        scales[path] = s
    return q, scales


def dequantize_params(params, q, scales):
    """Swap baked int8 kernels back into a param tree (QDQ inference)."""
    flat = dict(traverse_util.flatten_dict(params))
    for path, qw in q.items():
        flat[path] = qw.astype(jnp.float32) * scales[path]
    return traverse_util.unflatten_dict(flat)


# ------------------------------------------------ activation observation

def _is_site(mod, context) -> bool:
    return isinstance(mod, (nn.Dense, nn.Conv)) and context.method_name == "__call__"


def observer_sites(module, variables, x, exclude=(), **apply_kwargs):
    """Trace one forward to discover every conv/dense activation site.
    ``exclude`` filters here so the observer dict's key set matches what
    ``quantized_apply`` emits — otherwise the pytree structure would shrink
    after the first step (retrace + lost checkpoint entries)."""
    sites = []

    def ic(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        if _is_site(context.module, context):
            path = "/".join(context.module.path)
            if not any(e in path for e in exclude):
                sites.append(path)
        return out

    with nn.intercept_methods(ic):
        # eval_shape: discover sites by TRACING (no FLOPs, and — under a
        # multi-process mesh — no eager ops on non-addressable global
        # params, which would raise)
        jax.eval_shape(
            lambda v, xx: module.apply(v, xx, **apply_kwargs), variables, x)
    return sites


def init_observers(sites) -> Dict[str, ObserverState]:
    """Input ("...:in") and output ("...:out") observers per site: outputs
    drive the QAT fake-quant, inputs supply the int8 matmul qparams."""
    return {f"{s}:{io}": ObserverState.init() for s in sites for io in ("in", "out")}


def _frozen_batchnorm(mod, x):
    """Eval-mode BatchNorm from the module's own running stats — the
    torch ``freeze_bn_stats`` analogue: stats neither used from the batch
    nor updated, while the rest of the net stays in train mode."""
    mean = mod.get_variable("batch_stats", "mean")
    var = mod.get_variable("batch_stats", "var")
    y = (x - mean) * jax.lax.rsqrt(var + mod.epsilon)
    if mod.use_scale:
        y = y * mod.get_variable("params", "scale")
    if mod.use_bias:
        y = y + mod.get_variable("params", "bias")
    return y.astype(x.dtype)


def quantized_apply(
    module,
    variables,
    x,
    observers: Dict[str, ObserverState],
    update_observers: bool = True,
    apply_act_fake_quant: bool = True,
    exclude=(),
    freeze_bn: bool = False,
    **apply_kwargs,
):
    """Forward with activation observation (+ optional fake-quant) at every
    conv/dense site. Returns (apply outputs, new observer dict).

    ``update_observers=False`` compiles the frozen-observer variant
    (reference `train_quantization.py:120-122`); ``apply_act_fake_quant=
    False`` is PTQ calibration (observe only, torch prepare());
    ``freeze_bn`` swaps every BatchNorm for its running-stats eval form
    while dropout/stochastic-depth keep their train behavior (torch
    ``freeze_bn_stats``, `:123-125`)."""
    new_obs: Dict[str, ObserverState] = {}

    def ic(next_fn, args, kwargs, context):
        mod = context.module
        if (
            freeze_bn and isinstance(mod, nn.BatchNorm)
            and context.method_name == "__call__"
        ):
            return _frozen_batchnorm(mod, args[0])
        if not _is_site(mod, context):
            return next_fn(*args, **kwargs)
        path = "/".join(mod.path)
        if f"{path}:out" not in observers or any(e in path for e in exclude):
            return next_fn(*args, **kwargs)
        obs_in = observers[f"{path}:in"]
        new_obs[f"{path}:in"] = (
            obs_in.update(args[0]) if update_observers else obs_in
        )
        out = next_fn(*args, **kwargs)
        obs_out = observers[f"{path}:out"]
        obs_out = obs_out.update(out) if update_observers else obs_out
        new_obs[f"{path}:out"] = obs_out
        if apply_act_fake_quant:
            scale, zp = obs_out.qparams()
            out = fake_quant(out, scale, zp, ACT_QMIN, ACT_QMAX)
        return out

    with nn.intercept_methods(ic):
        out = module.apply(variables, x, **apply_kwargs)
    return out, new_obs


# --------------------------------------------------------- real int8 path

def int8_dense(x, w_q, w_scale, act_scale, act_zp, bias=None):
    """Dense executed in integer arithmetic: uint8 activations x int8
    weights with int32 accumulation (the TPU MXU int8 path), dequantized
    once at the output.

    y = s_x * s_w * [ (x_q - 128) @ w_q  +  (128 - zp_x) * colsum(w_q) ] + b

    The 128 shift keeps the activation operand in int8 range so the matmul
    is a true int8 x int8 -> int32 ``dot_general``; the zero-point term is
    a per-column rank-1 correction.
    """
    # quantize the index in f32: in bf16 the intermediate x/scale + zp near
    # the top of the uint8 range has ulp 1.0, which could shift the rounded
    # bin by a full step — the f32 cast is elementwise-cheap vs the matmul
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / act_scale + act_zp),
        ACT_QMIN, ACT_QMAX,
    )
    xs = (xq - 128.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xs, w_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    colsum = jnp.sum(w_q.astype(jnp.int32), axis=0).astype(jnp.float32)
    acc = acc + (128.0 - act_zp) * colsum
    y = acc * (act_scale * w_scale.reshape(1, -1))
    if bias is not None:
        y = y + bias
    return y


def _explicit_conv_pads(mod, x, w_q):
    """Resolve a flax ``nn.Conv`` padding spec to explicit (lo, hi) pairs
    for the spatial dims, given the static input/kernel shapes."""
    pad = mod.padding
    kh, kw = w_q.shape[0], w_q.shape[1]
    strides = mod.strides or (1, 1)
    if isinstance(strides, int):
        strides = (strides, strides)
    dil = mod.kernel_dilation or (1, 1)
    if isinstance(dil, int):
        dil = (dil, dil)
    if pad == "VALID":
        return ((0, 0), (0, 0)), strides, dil
    if isinstance(pad, str):
        if pad != "SAME":
            return None  # CIRCULAR etc. — leave to the QDQ path
        pairs = []
        for size, k, s, d in zip(x.shape[1:3], (kh, kw), strides, dil):
            eff_k = (k - 1) * d + 1
            out = -(-size // s)
            total = max((out - 1) * s + eff_k - size, 0)
            pairs.append((total // 2, total - total // 2))
        return tuple(pairs), strides, dil
    if isinstance(pad, int):
        return ((pad, pad), (pad, pad)), strides, dil
    pairs = tuple(
        (p, p) if isinstance(p, int) else tuple(p) for p in pad
    )
    return pairs, strides, dil


def int8_conv(x, w_q, w_scale, act_scale, act_zp, bias, pads, strides, dil,
              groups: int = 1):
    """Conv executed in integer arithmetic (int8 x int8 -> int32 on the MXU
    int8 path), mirroring ``int8_dense``.

    The activation is quantized affine-uint8, shifted by 128 into int8
    range, and the spatial padding is applied EXPLICITLY with the shifted
    zero-point value (a real-zero input pixel quantizes to zp, so pad
    pixels hold ``zp - 128`` like every other real zero). The 128-shift is
    then uniform over all positions, so its correction is a single
    per-output-channel term ``(128 - zp) * sum_hwi(w_q)`` — no second conv.
    """
    # f32 index arithmetic for the same ulp reason as int8_dense
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / act_scale + act_zp),
        ACT_QMIN, ACT_QMAX,
    )
    xs = (xq - 128.0).astype(jnp.int8)
    pad_val = (act_zp - 128.0).astype(jnp.int8)
    xs = jax.lax.pad(
        xs, pad_val,
        ((0, 0, 0), (pads[0][0], pads[0][1], 0), (pads[1][0], pads[1][1], 0),
         (0, 0, 0)),
    )
    acc = jax.lax.conv_general_dilated(
        xs, w_q, window_strides=strides, padding="VALID",
        rhs_dilation=dil, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    ksum = jnp.sum(w_q.astype(jnp.int32), axis=(0, 1, 2)).astype(jnp.float32)
    acc = acc + (128.0 - act_zp) * ksum
    y = acc * (act_scale * w_scale.reshape(1, 1, 1, -1))
    if bias is not None:
        y = y + bias
    return y


def _int8_interceptor(q, scales, qparams_for):
    """Shared Dense/Conv integer-execution interceptor. ``qparams_for(site,
    x) -> (scale, zp) | None`` supplies the activation qparams (observer-
    or dynamically-derived); None means run the site as plain QDQ."""

    def ic(next_fn, args, kwargs, context):
        mod = context.module
        # Dense/Conv only — notably NOT the attention projections, which
        # live in a parameter-container module (`models/vit._ProjParams`)
        # and are applied via custom einsums; they run float, exactly like
        # torch ao, where MultiheadAttention's in_proj isn't an nn.Linear
        # and out_proj is NonDynamicallyQuantizableLinear.
        if not _is_site(mod, context):
            return next_fn(*args, **kwargs)
        kpath = tuple(mod.path) + ("kernel",)
        if kpath not in q:
            return next_fn(*args, **kwargs)
        xin = args[0]
        qp = qparams_for("/".join(mod.path), xin)
        if qp is None:
            return next_fn(*args, **kwargs)
        s, zp = qp
        bias = (
            mod.get_variable("params", "bias")
            if mod.has_variable("params", "bias") else None
        )
        if isinstance(mod, nn.Dense):
            out = int8_dense(xin, q[kpath], scales[kpath], s, zp, bias)
            return out.astype(xin.dtype)
        if isinstance(mod, nn.Conv) and q[kpath].ndim == 4:
            if mod.input_dilation not in (None, 1, (1, 1)):
                return next_fn(*args, **kwargs)
            resolved = _explicit_conv_pads(mod, xin, q[kpath])
            if resolved is None:
                return next_fn(*args, **kwargs)
            pads, strides, dil = resolved
            out = int8_conv(xin, q[kpath], scales[kpath], s, zp, bias,
                            pads, strides, dil, mod.feature_group_count)
            return out.astype(xin.dtype)
        return next_fn(*args, **kwargs)

    return ic


def int8_apply(module, variables, x, q, scales, observers, **apply_kwargs):
    """Inference with every quantized Dense AND Conv executed in real int8
    (integer ``dot_general`` / ``conv_general_dilated`` with int32
    accumulation). ``observers`` supplies the per-site input qparams
    gathered by QAT/PTQ; sites without a baked kernel or observer (or with
    an unsupported padding mode) fall back to QDQ."""
    qd = dequantize_params(variables["params"], q, scales)

    def qparams_for(site, _x):
        obs = observers.get(f"{site}:in")
        return None if obs is None else obs.qparams()

    with nn.intercept_methods(_int8_interceptor(q, scales, qparams_for)):
        return module.apply({**variables, "params": qd}, x, **apply_kwargs)


def dynamic_qparams(x, token_mask=None):
    """Per-tensor affine uint8 qparams from the LIVE activation (dynamic
    quantization, torch ``quantize_per_tensor_dynamic`` semantics): range
    snapped to include 0 so real zeros stay exact. ``token_mask`` (B, T)
    excludes bucket-/seq-pad token rows of a (B, T, C) activation from the
    min/max so garbage pad values can't widen the range."""
    x32 = x.astype(jnp.float32)
    if token_mask is not None:
        valid = token_mask[..., None].astype(bool)
        big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
        mn = jnp.minimum(jnp.min(jnp.where(valid, x32, big)), 0.0)
        mx = jnp.maximum(jnp.max(jnp.where(valid, x32, -big)), 0.0)
    else:
        mn = jnp.minimum(jnp.min(x32), 0.0)
        mx = jnp.maximum(jnp.max(x32), 0.0)
    scale = jnp.maximum((mx - mn) / (ACT_QMAX - ACT_QMIN), 1e-9)
    zp = jnp.clip(jnp.round(ACT_QMIN - mn / scale), ACT_QMIN, ACT_QMAX)
    return scale, zp


def int8_dynamic_apply(module, variables, x, q, scales, exclude=(),
                       qparams_token_masks=None, static_qparams=None,
                       **apply_kwargs):
    """Inference with quantized Dense/Conv executed in real int8 using
    DYNAMIC per-tensor activation qparams (no calibration pass needed) —
    the serving mode for flows with no training data at hand (e.g. the
    LOST pipeline over frozen/pruned backbones). Weight int8 + scales come
    baked from ``quantize_params_int8``; every other op (layernorm,
    softmax/flash attention, GELU) runs in the network's float dtype.
    ``qparams_token_masks`` maps token-count T -> (B, T) validity mask;
    (B, T, C) activations whose T matches get pad rows excluded from the
    dynamic range (supply both the raw and seq-padded T when the model
    pads internally). ``static_qparams`` maps site path -> (scale, zp)
    from calibrated PTQ/QAT observers; matching sites skip the dynamic
    min/max entirely (torch static-quantization semantics), others stay
    dynamic.

    Measured on v5e at the ViT-S/16 LOST shape (B=32, T=769): ~854 img/s
    vs ~970 bf16 — at this model scale the per-site min/max reductions and
    QDQ elementwise traffic outweigh the int8 MXU gain, so int8 here is a
    memory/serving option (4x smaller weights), not a throughput win; bf16
    stays the speed headline."""
    qd = dequantize_params(variables["params"], q, scales)
    qd = jax.tree.map(
        lambda a, b: a.astype(b.dtype),
        qd, variables["params"],
    )

    def qparams_for(site, xin):
        if any(e in site for e in exclude):
            return None
        if static_qparams is not None and site in static_qparams:
            # calibrated range from the checkpoint's observers: no
            # per-batch min/max reduction on the hot path
            return static_qparams[site]
        m = None
        if qparams_token_masks and xin.ndim == 3:
            m = qparams_token_masks.get(xin.shape[1])
            if m is not None and m.shape[0] != xin.shape[0]:
                m = None
        return dynamic_qparams(xin, m)

    with nn.intercept_methods(_int8_interceptor(q, scales, qparams_for)):
        return module.apply({**variables, "params": qd}, x, **apply_kwargs)


# ------------------------------------------------------------- QAT step

def make_qat_train_step(
    module,
    tx,
    num_classes: int,
    label_smoothing: float = 0.0,
    exclude=(),
    observer_update: bool = True,
    bn_frozen: bool = False,
):
    """Jitted QAT step: masked grads (pruning composes), per-channel int8
    weight fake-quant with STE, activation fake-quant from moving
    observers. ``observer_update``/``bn_frozen`` are compile-time flags —
    the epoch driver swaps step variants exactly where the reference flips
    torch's enable/disable_observer and freeze_bn_stats
    (`train_quantization.py:110-125`)."""
    from vipers.pruning.masked_optim import mask_gradients
    from vipers.pruning.masks import apply_masks
    from vipers.train.steps import accuracy_topk, cross_entropy
    import optax

    def loss_fn(params, batch_stats, masks, observers, batch, rng):
        images, labels = batch
        qparams = fake_quant_weights(apply_masks(params, masks), exclude)
        variables = {"params": qparams}
        # bn_frozen freezes ONLY BatchNorm (running-stats forward, no stat
        # updates) — dropout/stochastic depth keep training, matching torch
        # freeze_bn_stats rather than a model-wide eval() switch.
        kwargs = dict(train=True, rngs={"dropout": rng}, need_attn=False)
        mutable_bs = batch_stats is not None and not bn_frozen
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            if mutable_bs:
                kwargs["mutable"] = ["batch_stats"]
        out, new_obs = quantized_apply(
            module, variables, images, observers,
            update_observers=observer_update, exclude=exclude,
            freeze_bn=bn_frozen, **kwargs,
        )
        if mutable_bs:
            (logits, _aux), new_vars = out
            new_bs = new_vars["batch_stats"]
        else:
            logits, _aux = out
            new_bs = batch_stats
        loss = cross_entropy(logits, labels, num_classes, label_smoothing)
        return loss, (logits, new_bs, new_obs)

    def step(state, observers, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (logits, new_bs, new_obs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, state.masks, observers, batch, rng)
        grads = mask_gradients(grads, state.masks)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = mask_gradients(updates, state.masks)
        params = optax.apply_updates(state.params, updates)
        acc1, acc5 = accuracy_topk(logits, batch[1])
        metrics = {"loss": loss, "acc1": acc1, "acc5": acc5}
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_bs,
            opt_state=opt_state,
        )
        return new_state, new_obs, metrics

    return jax.jit(step)


# One jitted program per (module, num_classes); q/scales/observers are
# TRACED arguments so the per-epoch convert->eval loop
# (`train_quantization.py:129-135`) reuses the compiled program every epoch
# instead of re-tracing (~20-40 s/compile on TPU) on each fresh closure.
# Bounded LRU: sweeps that build a fresh module per pruning iteration must
# not pin every (module, executable) pair for the process lifetime.
_INT8_EVAL_STEP_CACHE: dict = {}
_INT8_EVAL_STEP_CACHE_MAX = 4


def make_int8_eval_step(module, q, scales, observers, num_classes: int):
    """Eval step running Dense/Conv layers in real int8 — plugs into
    ``train.loop.evaluate`` (per-epoch converted-model eval,
    `train_quantization.py:129-135`). Successive calls with the same module
    return wrappers over one cached jitted program."""
    from vipers.train.steps import cross_entropy
    from vipers.pruning.masks import apply_masks

    key = (id(module), num_classes)
    cached = _INT8_EVAL_STEP_CACHE.get(key)
    if cached is None or cached[0] is not module:

        @jax.jit
        def step(state, batch, q, scales, observers):
            images, labels = batch
            variables = {"params": apply_masks(state.params, state.masks)}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            logits, _aux = int8_apply(
                module, variables, images, q, scales, observers,
                train=False, need_attn=False,
            )
            loss = cross_entropy(logits, labels, num_classes)
            if labels.ndim == 2:
                labels = jnp.argmax(labels, axis=1)
            _, pred = jax.lax.top_k(logits, min(5, logits.shape[-1]))
            correct = pred == labels[:, None]
            return {
                "loss_sum": loss * labels.shape[0],
                "top1": jnp.sum(correct[:, :1]),
                "top5": jnp.sum(correct),
                "n": jnp.asarray(labels.shape[0], jnp.int32),
            }

        _INT8_EVAL_STEP_CACHE[key] = cached = (module, step)
        while len(_INT8_EVAL_STEP_CACHE) > _INT8_EVAL_STEP_CACHE_MAX:
            _INT8_EVAL_STEP_CACHE.pop(next(iter(_INT8_EVAL_STEP_CACHE)))
    else:
        # LRU touch: re-insert so the hottest program is evicted last
        _INT8_EVAL_STEP_CACHE[key] = _INT8_EVAL_STEP_CACHE.pop(key)

    _module, step = cached
    return lambda state, batch: step(state, batch, q, scales, observers)


def ptq_calibrate(module, variables, observers, batches, num_batches: int = 32,
                  exclude=()):
    """PTQ calibration: observe every conv/dense site over N batches
    (`train_quantization.py:83-104`); no fake-quant applied."""

    @jax.jit
    def calib_step(observers, images):
        _out, new_obs = quantized_apply(
            module, variables, images, observers,
            update_observers=True, apply_act_fake_quant=False,
            exclude=exclude, train=False, need_attn=False,
        )
        return new_obs

    for i, (images, _labels) in enumerate(batches):
        if i >= num_batches:
            break
        observers = calib_step(observers, jnp.asarray(images))
    return observers


# ------------------------------------------------------------- CLI driver

def run_quantize(args) -> int:
    import os

    import numpy as np

    from vipers.core.config import config_from_args
    from vipers.train.driver import (
        _train_loader, _val_loader, build_session, resume_session,
    )
    from vipers.train.loop import evaluate

    cfg = config_from_args(args)
    os.makedirs(cfg.output_dir, exist_ok=True)
    s = build_session(cfg)
    # Parallel wiring (the reference runs QAT under DDP —
    # `train_quantization.py:72-73`): build_session already sharded
    # s.state / wrapped s.eval_step for --data-parallel / multi-process
    # runs; the quantize-specific programs (calibration, QAT step, int8
    # eval) ride the same mesh.  Aux state (observers, int8 tables) is
    # replicated so one SPMD program serves every device.
    from vipers.parallel.mesh import replicate

    repl_put = (
        (lambda t: jax.device_put(t, replicate(s.mesh)))
        if s.mesh is not None else (lambda t: t)
    )

    def shard_batch(images, labels):
        """Host batch -> (normalized global images, global labels)."""
        if s.shard_io is not None:
            import numpy as _np

            images, labels = s.shard_io((images, _np.asarray(labels)))
            return s.normalize(images), labels
        return s.normalize(images), jnp.asarray(labels)

    if not cfg.resume:
        # quantizing random weights silently "works" but is meaningless —
        # the reference always loads a trained model first
        # (`train_quantization.py:53,76-81`).
        raise SystemExit(
            "vipers quantize requires --resume <checkpoint> (a trained, "
            "possibly pruned model to quantize)"
        )
    resume_session(s, cfg.resume)

    module = s.spec.module
    exclude = s.spec.quant_exclude
    h = w = cfg.train_crop_size
    # Calibration must observe the PRUNED network: masks are forward-only,
    # so raw params keep stale nonzero values at pruned slots; probing with
    # them would collect activation ranges for a different network than the
    # one the int8 program executes (the torch reference's prune hooks mask
    # inside forward, so its calibration sees the pruned net too).
    from vipers.pruning.masks import apply_masks as _apply_masks

    probe_vars = {"params": _apply_masks(s.state.params, s.state.masks)}
    if s.state.batch_stats is not None:
        probe_vars["batch_stats"] = s.state.batch_stats
    sites = observer_sites(
        module, probe_vars, jnp.zeros((1, h, w, 3)), exclude=exclude,
        train=False, need_attn=False,
    )
    observers = repl_put(init_observers(sites))
    print(f"{len(sites)} quantizable activation sites")

    if args.mode == "ptq":
        # calibration observes GLOBAL batches: every process sees the same
        # assembled batch -> identical observer ranges everywhere (min/max
        # are exact reductions, so this is bit-equal to single-process)
        batches = (shard_batch(i, l) for i, l in _train_loader(s, 0))
        observers = ptq_calibrate(
            module, probe_vars, observers, batches,
            args.calibration_batches, exclude,
        )
        from vipers.pruning.masks import apply_masks

        # Quantize the PRUNED network: masks are forward-only (raw params
        # keep stale nonzero values at pruned slots), so scales and int8
        # kernels must come from the masked weights — otherwise the int8
        # eval executes the unpruned network and scales are inflated by
        # dead weights.
        masked = apply_masks(s.state.params, s.state.masks)
        q, scales = quantize_params_int8(masked, exclude)
        qdq = s.state.replace(params=dequantize_params(masked, q, scales))
        acc1, acc5, loss = evaluate(s.eval_step, qdq, _val_loader(s),
                                    normalize_fn=s.normalize)
        print(f"PTQ QDQ:  acc1 {acc1:.3f} acc5 {acc5:.3f}")
        int8_step = make_int8_eval_step(module, q, scales, observers,
                                        cfg.num_classes)
        if s.shard_io is not None:
            base_int8, int8_step = int8_step, (
                lambda st, b: base_int8(st, s.shard_io(b)))
        acc1_i, acc5_i, _ = evaluate(int8_step, s.state, _val_loader(s),
                                     normalize_fn=s.normalize)
        print(f"PTQ int8: acc1 {acc1_i:.3f} acc5 {acc5_i:.3f} "
              f"(Dense/Conv layers executed in int8)")
        from vipers.core.checkpoint import save_checkpoint

        artifact = {
            "params": qdq.params,
            "masks": {"/".join(k): v for k, v in s.state.masks.items()},
            "observers": {k: {"min": o.min_val, "max": o.max_val}
                          for k, o in observers.items()},
        }
        if s.state.batch_stats is not None:
            # BN models (the usual quantize targets) are unrestorable
            # without their statistics
            artifact["batch_stats"] = s.state.batch_stats
        if jax.process_count() > 1:
            # collective gather-to-host before the (every-rank) orbax save —
            # same recipe as the train driver's _checkpoint_fn
            from vipers.parallel.mesh import host_replicated_tree

            artifact = host_replicated_tree(artifact)
        save_checkpoint(
            os.path.join(cfg.output_dir, "quantized_post_train_model"),
            artifact,
        )
        if s.arch_overrides and jax.process_index() == 0:
            from vipers.pruning.structured import write_sidecar

            write_sidecar(
                os.path.join(cfg.output_dir, "quantized_post_train_model"),
                cfg.model, s.arch_overrides,
            )
        return 0

    # ---- QAT (`train_quantization.py:106-154`)
    from vipers.train.loop import train_one_epoch

    n_obs_epochs = getattr(args, "num_observer_update_epochs", 4)
    n_bn_epochs = getattr(args, "num_batch_norm_update_epochs", 3)
    state = s.state
    step_cache = {}
    for epoch in range(cfg.optim.epochs):
        observer_update = epoch < n_obs_epochs
        bn_frozen = epoch >= n_bn_epochs
        key = (observer_update, bn_frozen)
        if key not in step_cache:
            step_cache[key] = make_qat_train_step(
                module, s.tx, cfg.num_classes, cfg.optim.label_smoothing,
                exclude, observer_update=observer_update, bn_frozen=bn_frozen,
            )
        if not observer_update and epoch == n_obs_epochs:
            print(f"Disabling observer for subseq epochs, epoch = {epoch}")
        if bn_frozen and epoch == n_bn_epochs:
            print(f"Freezing BN for subseq epochs, epoch = {epoch}")
        qat_step = step_cache[key]

        # inline epoch loop: the step signature carries observers; batches
        # assemble into GLOBAL arrays under --data-parallel / multi-process
        # (the reference's DDP-wrapped QAT, `train_quantization.py:72-73`)
        rng = jax.random.fold_in(s.rng, epoch)
        for i, (images, labels) in enumerate(_train_loader(s, epoch)):
            batch = shard_batch(images, labels)
            state, observers, metrics = qat_step(state, observers, batch, rng)
            if cfg.print_freq and i % cfg.print_freq == 0:
                print(f"QAT epoch {epoch} [{i}] loss "
                      f"{float(metrics['loss']):.4f}")

        # per-epoch convert -> int8 eval (`train_quantization.py:129-135`);
        # conversion runs on the MASKED weights (see the PTQ branch note)
        from vipers.pruning.masks import apply_masks

        masked = apply_masks(state.params, state.masks)
        evaluate(s.eval_step,
                 state.replace(params=fake_quant_weights(masked, exclude)),
                 _val_loader(s), epoch, normalize_fn=s.normalize,
                 log_suffix="QAT")
        q, scales = quantize_params_int8(masked, exclude)
        int8_step = make_int8_eval_step(module, q, scales, observers,
                                        cfg.num_classes)
        if s.shard_io is not None:
            int8_step = (lambda base: lambda st, b: base(st, s.shard_io(b)))(
                int8_step)
        evaluate(int8_step, state, _val_loader(s), epoch,
                 normalize_fn=s.normalize, log_suffix="INT8")

        from vipers.core.checkpoint import save_checkpoint

        qat_artifact = {
            "params": state.params,
            "masks": {"/".join(k): v for k, v in state.masks.items()},
            "epoch": np.int32(epoch),
            "observers": {k: {"min": o.min_val, "max": o.max_val}
                          for k, o in observers.items()},
        }
        if state.batch_stats is not None:
            qat_artifact["batch_stats"] = state.batch_stats
        if jax.process_count() > 1:
            from vipers.parallel.mesh import host_replicated_tree

            qat_artifact = host_replicated_tree(qat_artifact)
        save_checkpoint(
            os.path.join(cfg.output_dir, "qat_checkpoint"),
            qat_artifact,
            use_async=True,
        )
        if s.arch_overrides and jax.process_index() == 0:
            from vipers.pruning.structured import write_sidecar

            write_sidecar(os.path.join(cfg.output_dir, "qat_checkpoint"),
                          cfg.model, s.arch_overrides)
    from vipers.core.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()  # flush async saves before interpreter teardown
    s.state = state
    return 0
