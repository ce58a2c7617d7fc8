"""Optimizer + LR-schedule factories and weight-decay grouping.

Counterparts of the reference factories:
  * optimizers SGD(+nesterov) / RMSprop(eps=0.0316, alpha=0.9) / AdamW
    (`/root/reference/train.py:372-392`),
  * schedulers StepLR / CosineAnnealingLR / ExponentialLR behind a
    Linear/Constant warmup via SequentialLR (`/root/reference/train.py:395-431`);
    the reference steps per *epoch*, so the optax schedule here is a function
    of epoch index and the step fn receives lr via ``schedule(step //
    steps_per_epoch)`` folded into the schedule itself,
  * per-group weight decay: norm params, biases, transformer embeddings
    (`/root/reference/utils.py:405-464`, wiring at
    `/root/reference/train.py:446-458`) — realized as a per-leaf decay-rate
    pytree instead of param groups.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import optax
from flax import traverse_util


@dataclasses.dataclass
class OptimConfig:
    opt: str = "sgd"  # sgd | sgd_nesterov | rmsprop | adamw
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 1e-4
    norm_weight_decay: Optional[float] = None
    bias_weight_decay: Optional[float] = None
    transformer_embedding_decay: Optional[float] = None
    label_smoothing: float = 0.0
    clip_grad_norm: Optional[float] = None
    # schedule
    lr_scheduler: str = "steplr"  # steplr | cosineannealinglr | exponentiallr
    lr_step_size: int = 30
    lr_gamma: float = 0.1
    lr_min: float = 0.0
    lr_warmup_epochs: int = 0
    lr_warmup_method: str = "constant"  # linear | constant
    lr_warmup_decay: float = 0.01
    epochs: int = 90


def make_lr_schedule(cfg: OptimConfig, steps_per_epoch: int):
    """Per-epoch schedule semantics (scheduler.step() once per epoch)."""

    def main_lr(epoch):
        e = epoch - cfg.lr_warmup_epochs
        sch = cfg.lr_scheduler.lower()
        if sch == "steplr":
            return cfg.lr * cfg.lr_gamma ** jnp.floor(e / cfg.lr_step_size)
        if sch == "cosineannealinglr":
            t_max = max(cfg.epochs - cfg.lr_warmup_epochs, 1)
            cos = 0.5 * (1 + jnp.cos(jnp.pi * jnp.minimum(e, t_max) / t_max))
            return cfg.lr_min + (cfg.lr - cfg.lr_min) * cos
        if sch == "exponentiallr":
            return cfg.lr * cfg.lr_gamma ** e
        raise RuntimeError(f"Invalid lr scheduler {cfg.lr_scheduler!r}")

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        if cfg.lr_warmup_epochs > 0:
            w = cfg.lr_warmup_epochs
            if cfg.lr_warmup_method == "linear":
                # torch LinearLR: factor goes start_factor -> 1 over w epochs.
                frac = jnp.minimum(epoch, w) / w
                factor = cfg.lr_warmup_decay + (1.0 - cfg.lr_warmup_decay) * frac
                warm = cfg.lr * factor
            elif cfg.lr_warmup_method == "constant":
                warm = cfg.lr * cfg.lr_warmup_decay
            else:
                raise RuntimeError(f"Invalid warmup method {cfg.lr_warmup_method!r}")
            return jnp.where(epoch < w, warm, main_lr(epoch))
        return main_lr(epoch)

    return schedule


_NORM_HINTS = ("bn", "norm", "ln")


def _is_norm_param(path) -> bool:
    """Heuristic matching the reference's norm_classes check
    (`utils.py:411-418`): our norm layers are named bn*/ln*/norm*."""
    if path[-1] not in ("scale", "bias"):
        return False
    parent = path[-2] if len(path) > 1 else ""
    return any(h in parent.lower() for h in _NORM_HINTS) or path[-1] == "scale"


def weight_decay_rates(params, cfg: OptimConfig):
    """Per-leaf decay-rate pytree implementing set_weight_decay semantics:
    custom keys win over norm grouping, which wins over the default."""
    flat = traverse_util.flatten_dict(params)
    rates = {}
    for path in flat:
        joined = "/".join(path)
        rate = cfg.weight_decay
        if _is_norm_param(path) and cfg.norm_weight_decay is not None:
            rate = cfg.norm_weight_decay
        if path[-1] == "bias" and cfg.bias_weight_decay is not None:
            rate = cfg.bias_weight_decay
        if cfg.transformer_embedding_decay is not None and any(
            k in joined
            for k in ("class_token", "pos_embedding", "cls_token", "pos_embed",
                      "relative_position_bias")
        ):
            rate = cfg.transformer_embedding_decay
        rates[path] = rate
    return traverse_util.unflatten_dict(rates)


def add_decayed_weights_per_leaf(rates) -> optax.GradientTransformation:
    """Like optax.add_decayed_weights but with a per-leaf rate pytree."""
    import jax

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("params required for weight decay")
        updates = jax.tree.map(lambda u, p, r: u + r * p, updates, params, rates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: OptimConfig, params, schedule, masks_fn=None):
    """Build the optax chain: [clip] -> decay+optimizer -> [mask updates].

    torch parity notes:
      * SGD couples weight decay into the gradient *before* momentum
        (torch.optim.SGD), hence decay -> trace order,
      * RMSprop adds eps *outside* the sqrt (eps_in_sqrt=False) with
        eps=0.0316, alpha=0.9 (`train.py:387-389`),
      * AdamW uses decoupled decay scaled by lr.
    """
    from vipers.pruning.masked_optim import masked_updates

    opt = cfg.opt.lower()
    rates = weight_decay_rates(params, cfg)
    chain = []
    if cfg.clip_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    if opt.startswith("sgd"):
        chain += [
            add_decayed_weights_per_leaf(rates),
            optax.trace(decay=cfg.momentum, nesterov="nesterov" in opt),
            optax.scale_by_learning_rate(schedule),
        ]
    elif opt == "rmsprop":
        chain += [
            add_decayed_weights_per_leaf(rates),
            optax.scale_by_rms(decay=0.9, eps=0.0316, eps_in_sqrt=False),
            optax.trace(decay=cfg.momentum),
            optax.scale_by_learning_rate(schedule),
        ]
    elif opt == "adamw":
        # decoupled decay with per-leaf rates: scale decay by 1.0 and rely on
        # rates; adamw applies after the second-moment rescale like torch.
        chain += [
            optax.scale_by_adam(),
            add_decayed_weights_per_leaf(rates),
            optax.scale_by_learning_rate(schedule),
        ]
    else:
        raise RuntimeError(f"Invalid optimizer {cfg.opt!r}; sgd/rmsprop/adamw only")
    if masks_fn is not None:
        chain.append(masked_updates(masks_fn))
    return optax.chain(*chain)
