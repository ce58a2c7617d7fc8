"""Jitted train/eval steps.

The reference's per-batch body (`/root/reference/train.py:35-141`) —
autocast forward, CE loss (+label smoothing), backward, clip, step, EMA —
becomes two pure functions compiled once.  Masks are applied inside the
forward so gradients flow to raw params and the masked-update transform
keeps pruned weights at zero (see ``pruning.masked_optim``).

AMP note: the reference needs a CUDA GradScaler (`train.py:50-62`); on TPU
we compute in bf16 (optional) with f32 master params — no loss scaling.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from vipers.pruning.masked_optim import mask_gradients
from vipers.pruning.masks import apply_masks


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    masks: Any  # {path: bool array}; pytree of arrays -> traced, swappable
    opt_state: Any
    ema_params: Any = None
    ema_batch_stats: Any = None


def cross_entropy(logits, labels, num_classes: int, label_smoothing: float = 0.0):
    """CE over int labels or soft (mixup/cutmix) targets, torch semantics
    (`nn.CrossEntropyLoss(label_smoothing=...)`)."""
    if labels.ndim == 1:
        target = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    else:
        target = labels.astype(logits.dtype)
    if label_smoothing > 0:
        target = target * (1.0 - label_smoothing) + label_smoothing / num_classes
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def accuracy_topk(logits, targets, topk=(1, 5)):
    """Top-k accuracy in %, one-hot targets reduced via argmax
    (`/root/reference/utils.py:173-189`)."""
    if targets.ndim == 2:
        targets = jnp.argmax(targets, axis=1)
    maxk = min(max(topk), logits.shape[-1])
    _, pred = jax.lax.top_k(logits, maxk)  # (B, maxk)
    correct = pred == targets[:, None]
    out = []
    for k in topk:
        k = min(k, maxk)
        out.append(100.0 * jnp.sum(correct[:, :k].astype(jnp.float32)) / targets.shape[0])
    return out


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    num_classes: int,
    label_smoothing: float = 0.0,
    compute_dtype=jnp.float32,
    ema_decay: Optional[float] = None,
    ema_every: int = 1,
    ema_warmup_steps: int = 0,
    donate: bool = True,
):
    """Returns jitted ``step(state, batch, dropout_rng) -> (state, metrics)``.

    ``apply_fn(variables, x, train, rngs, mutable) -> ((logits, aux), new_vars)``
    is the flax module apply.  BatchNorm batch statistics are computed over
    the *global* jit batch, so under a data-sharded mesh this is SyncBN
    (`/root/reference/train.py:598-599`) by construction.
    """

    def loss_fn(params, batch_stats, masks, batch, rng):
        images, labels = batch
        masked = apply_masks(params, masks)
        if compute_dtype != jnp.float32:
            # REAL mixed precision: the forward/backward runs on a
            # compute_dtype COPY of the params (f32 master params keep
            # full-precision updates; autodiff through the cast returns
            # f32 grads). Casting only the images would promote every
            # matmul back to f32 against the f32 weights — measured
            # indistinguishable from the f32 step.
            masked = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                masked,
            )
        variables = {"params": masked}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            (logits, _aux), new_vars = apply_fn(
                variables, images.astype(compute_dtype), train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
                need_attn=False,
            )
            new_bs = new_vars["batch_stats"]
        else:
            logits, _aux = apply_fn(
                variables, images.astype(compute_dtype), train=True,
                rngs={"dropout": rng}, need_attn=False,
            )
            new_bs = None
        loss = cross_entropy(logits, labels, num_classes, label_smoothing)
        return loss, (logits, new_bs)

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, state.masks, batch, rng)
        # Zero grads at pruned slots before clipping/momentum — matches the
        # reference, where the reparametrized backward yields zero grads.
        grads = mask_gradients(grads, state.masks)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # Mask the final update too: after a re-prune, stale momentum (and
        # any decay term) at newly-pruned slots must not move the weight off
        # exact zero. Masks are traced arrays, so iterative pruning swaps
        # them without recompilation.
        updates = mask_gradients(updates, state.masks)
        params = optax.apply_updates(state.params, updates)

        ema_params, ema_bs = state.ema_params, state.ema_batch_stats
        if ema_decay is not None and ema_params is not None:
            do_ema = (state.step % ema_every) == 0
            # During LR warmup the reference keeps copying weights into the
            # EMA (n_averaged reset, train.py:69-73): decay 0 until then.
            decay_eff = jnp.where(state.step < ema_warmup_steps, 0.0, ema_decay)

            def upd(e, p):
                return jnp.where(do_ema, decay_eff * e + (1 - decay_eff) * p, e)

            ema_params = jax.tree.map(upd, ema_params, params)
            if ema_bs is not None and new_bs is not None:
                ema_bs = jax.tree.map(upd, ema_bs, new_bs)

        acc1, acc5 = accuracy_topk(logits, batch[1])
        metrics = {"loss": loss, "acc1": acc1, "acc5": acc5}
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_bs if new_bs is not None else state.batch_stats,
            opt_state=opt_state,
            ema_params=ema_params,
            ema_batch_stats=ema_bs,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn, num_classes: int, label_smoothing: float = 0.0,
                   compute_dtype=jnp.float32, use_ema: bool = False):
    """Jitted eval: per-batch (loss_sum, top1_correct, top5_correct, n).

    Rows with ``label == -1`` are sentinel padding (multi-process ragged
    tails, `parallel/mesh.batch_sharder`) and are masked out of the loss
    sum, the top-k counts, and ``n`` — so multi-process eval sums stay
    exact instead of inheriting torch DistributedSampler's duplicate-sample
    bias (`/root/reference/train.py:127-137` only warns about it).
    """

    def step(state: TrainState, batch):
        images, labels = batch
        params = state.ema_params if use_ema else state.params
        bs = state.ema_batch_stats if use_ema else state.batch_stats
        masked = apply_masks(params, state.masks)
        if compute_dtype != jnp.float32:
            # bf16 params copy, like the train step — image-only casting
            # promotes everything back to f32 against f32 weights
            masked = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                masked,
            )
        variables = {"params": masked}
        if bs is not None:
            variables["batch_stats"] = bs
        logits, _aux = apply_fn(variables, images.astype(compute_dtype), train=False,
                                need_attn=False)
        if labels.ndim == 2:
            valid = jnp.max(labels, axis=1) >= 0
            target = labels.astype(jnp.float32)
            labels = jnp.argmax(labels, axis=1)
            safe = labels
        else:
            valid = labels >= 0
            safe = jnp.maximum(labels, 0)
            target = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
        if label_smoothing > 0:
            target = target * (1.0 - label_smoothing) + label_smoothing / num_classes
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        per_example = -jnp.sum(target * logp, axis=-1)
        loss_sum = jnp.sum(jnp.where(valid, per_example, 0.0))
        _, pred = jax.lax.top_k(logits, min(5, logits.shape[-1]))
        correct = (pred == safe[:, None]) & valid[:, None]
        top1 = jnp.sum(correct[:, :1])
        top5 = jnp.sum(correct)
        n = jnp.sum(valid.astype(jnp.int32))
        return {"loss_sum": loss_sum, "top1": top1, "top5": top5, "n": n}

    return jax.jit(step)
