"""Epoch-level loops: train_one_epoch / evaluate / train_model_to_completion.

Counterparts of `/root/reference/train.py:35-141` and `:434-527`, built on
the jitted step functions from ``train.steps``.  Host code here only moves
batches and aggregates metrics; all math is on device.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from vipers.core.metrics import MeterSet, MetricsWriter
from vipers.train.steps import TrainState


def train_one_epoch(
    train_step,
    state: TrainState,
    loader: Iterable,
    rng,
    epoch: int,
    normalize_fn=None,
    mixup_fn=None,
    print_freq: int = 100,
    writer: Optional[MetricsWriter] = None,
):
    meters = MeterSet()
    header = f"Epoch: [{epoch}]"
    # Metric fetches are GROUPED: a per-step `device_get` would insert a
    # host sync into every step (the reference's per-iteration
    # `loss.item()` habit, `train.py:80-85`) — on a TPU that caps
    # pipelining, and through a tunneled chip a device->host read costs
    # seconds.  Steps dispatch async (donated state chains on device);
    # pending metric dicts are fetched in ONE device_get per print window
    # (so every printed value is exactly what the per-step fetch printed)
    # and once at epoch end, keeping the aggregates exact.
    flush_every = print_freq if print_freq and print_freq > 0 else 32
    pending: list = []

    def flush():
        if not pending:
            return
        fetched = jax.device_get([m for _b, m in pending])
        for (bsz, _m), met in zip(pending, fetched):
            meters.update(
                n=bsz,
                loss=float(met["loss"]),
                acc1=float(met["acc1"]),
                acc5=float(met["acc5"]),
            )
        pending.clear()

    t_prev = time.time()
    for i, (images, labels) in enumerate(
        meters.log_every(loader, print_freq, header, pre_print=flush)
    ):
        if normalize_fn is not None:
            # per-batch rng stream enables RandomErasing inside normalize
            erase_rng = jax.random.fold_in(jax.random.fold_in(rng, 0x45), i)
            images = normalize_fn(images, rng=erase_rng)
        if mixup_fn is not None:
            mix_rng = jax.random.fold_in(jax.random.fold_in(rng, 0x4d), i)
            images, labels = mixup_fn(mix_rng, images, labels)
        state, metrics = train_step(state, (images, labels), rng)
        bsz = images.shape[0]
        pending.append((bsz, metrics))
        if len(pending) >= flush_every:
            flush()
        # wall-clock pace between dispatches (under async pipelining the
        # flush steps absorb the device time; the smoothed meter is the
        # honest steady-state rate)
        now = time.time()
        meters.update(**{"img/s": bsz / max(now - t_prev, 1e-9)})
        t_prev = now
    flush()
    if writer:
        writer.write(
            "train", step=epoch,
            acc1=meters.meters["acc1"].global_avg,
            acc5=meters.meters["acc5"].global_avg,
            loss=meters.meters["loss"].global_avg,
        )
    return state, meters


def evaluate(
    eval_step,
    state: TrainState,
    loader: Iterable,
    epoch: Optional[int] = None,
    normalize_fn=None,
    log_suffix: str = "",
    writer: Optional[MetricsWriter] = None,
    expected_samples: Optional[int] = None,
):
    """Full-split eval; returns (acc1, acc5, loss). Sums are exact (counts,
    not batch-averaged) — matches `/root/reference/train.py:92-141` incl. the
    dataset-coverage warning after distributed reduction."""
    totals = {"loss_sum": 0.0, "top1": 0, "top5": 0, "n": 0}
    # batches dispatch async; the tiny per-batch sum dicts stay on device
    # and come back in ONE grouped device_get (a per-batch fetch would
    # sync every step — seconds each through a tunneled chip)
    outs = []
    for images, labels in loader:
        if normalize_fn is not None:
            images = normalize_fn(images)
        outs.append(eval_step(state, (images, labels)))
    for out in jax.device_get(outs):
        for k in totals:
            totals[k] += out[k]
    # Cross-process reduction (`utils.py:394-402` semantics): with a global
    # mesh the loader already covers each sample once per epoch; multi-host
    # pipelines psum these on device before this point.
    n = max(int(totals["n"]), 1)
    if expected_samples is not None and int(totals["n"]) != expected_samples:
        print(
            f"Warning: dataset has {expected_samples} samples but {totals['n']} "
            "were used for validation — results may be biased."
        )
    acc1 = 100.0 * totals["top1"] / n
    acc5 = 100.0 * totals["top5"] / n
    loss = float(totals["loss_sum"]) / n
    print(f"Test:{log_suffix} Acc@1 {acc1:.3f} Acc@5 {acc5:.3f}")
    if writer:
        writer.write("test" + log_suffix, step=epoch, acc1=acc1, acc5=acc5, loss=loss)
    return acc1, acc5, loss


def train_model_to_completion(
    train_step,
    eval_step,
    state: TrainState,
    make_train_loader: Callable[[int], Iterable],
    eval_loader_fn: Callable[[], Iterable],
    epochs: int,
    rng,
    initial_epoch: int = 0,
    normalize_fn=None,
    mixup_fn=None,
    checkpoint_fn=None,
    sparsity: float = 0.0,
    writer: Optional[MetricsWriter] = None,
    print_freq: int = 100,
    eval_step_ema=None,
    expected_eval_samples: Optional[int] = None,
):
    """Epoch driver (`/root/reference/train.py:434-527`): per-epoch
    train -> eval (-> EMA eval) -> checkpoint (every 10 epochs + last)."""
    t_start = time.time()
    last_acc1 = float("nan")
    for epoch in range(initial_epoch, epochs):
        epoch_rng = jax.random.fold_in(rng, epoch)
        state, _ = train_one_epoch(
            train_step, state, make_train_loader(epoch), epoch_rng, epoch,
            normalize_fn=normalize_fn, mixup_fn=mixup_fn,
            print_freq=print_freq, writer=writer,
        )
        last_acc1, _, _ = evaluate(
            eval_step, state, eval_loader_fn(), epoch,
            normalize_fn=normalize_fn, writer=writer,
            expected_samples=expected_eval_samples,
        )
        if eval_step_ema is not None and state.ema_params is not None:
            evaluate(
                eval_step_ema, state, eval_loader_fn(), epoch,
                normalize_fn=normalize_fn, log_suffix="EMA", writer=writer,
            )
        if checkpoint_fn is not None and (epoch % 10 == 0 or epoch == epochs - 1):
            checkpoint_fn(state, epoch, sparsity)
        if checkpoint_fn is not None:
            checkpoint_fn(state, epoch, sparsity, latest=True)
    if checkpoint_fn is not None:
        # flush the async rolling-latest save before handing state back
        from vipers.core.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()
    print(f"Training time {time.time() - t_start:.0f}s")
    return state, last_acc1
