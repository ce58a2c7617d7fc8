"""Pipeline parallelism (GPipe) for ViT training over a ``("pipe",)`` mesh.

Beyond the reference's capability set (SURVEY §2.2: upstream ships data
parallelism only): the encoder's LAYER axis is partitioned into S stages,
one stage per device along the ``pipe`` mesh axis, and the batch is split
into M microbatches that stream through the stages GPipe-style.  Each of
the S + M - 1 pipeline ticks every device applies its stage to its current
activation and hands the result to the next stage over
``jax.lax.ppermute`` (ICI neighbour hops — the scaling-book pipelining
recipe).  The whole schedule is a ``jax.lax.scan`` inside one
``jax.shard_map``, so forward AND backward (autodiff of scan + ppermute
gives the reverse pipeline for free) are a single compiled program.

The per-block math is a pure-function transcription of
``models/vit.EncoderBlock``'s einsum path (head-major q/k/v projections,
erf/tanh GELU by dtype) — parity against ``module.apply`` is asserted in
``tests/test_pipeline.py``.  Pallas kernels stay off here for the same
reason as sequence parallelism (``parallel/sp.py``): a ``pallas_call`` is
opaque to the partitioner; einsums partition cleanly and ``lax.scan`` over
the stage's stacked block params keeps one copy of the block program.

Dryrun-scale layout note: microbatch inputs are fed replicated and the
last stage's outputs are re-replicated with a ``psum`` so embed/head
stay simple replicated compute.  At production scale the feed/collect
ends would be sharded to the first/last stage only; the inter-stage
traffic (the part that matters, M·(S-1) activation hops) is already
minimal and rides ``ppermute``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

if TYPE_CHECKING:  # annotation-only: keep the package import flax-free
    from vipers.models.vit import ViTConfig


def _layer_norm(x, scale, bias, eps=1e-6):
    """flax ``nn.LayerNorm`` semantics: statistics and normalization in
    f32 regardless of input dtype (bf16 E[x²] would cost up to a full
    quant step of error per block under --amp), result in x.dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - jnp.square(mean),
        0.0,
    )
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def vit_block_forward(bp, x, num_heads: int):
    """One pre-norm encoder block from its param subtree — the pure-function
    twin of ``models/vit.EncoderBlock`` (einsum attention path, no dropout).

    ``bp``: ``params["encoder_layer_i"]`` (optionally stacked upstream).
    ``x``: (N, T, D).
    """
    d = x.shape[-1]
    h = num_heads
    hd = d // h
    scale = float(hd) ** -0.5

    ln1 = _layer_norm(x, bp["ln_1"]["scale"], bp["ln_1"]["bias"])
    w = bp["attention"]["qkv"]["kernel"].reshape(d, 3, h, hd)
    b = bp["attention"]["qkv"]["bias"].reshape(3, h, hd)
    qkv = jnp.einsum("ntd,dshe->snhte", ln1, w) + b[:, None, :, None, :]
    q, k, v = qkv[0], qkv[1], qkv[2]
    logits = jnp.einsum(
        "nhqd,nhkd->nhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
    out = jnp.einsum(
        "nhte,hef->ntf", out, bp["attention"]["out"]["kernel"].reshape(h, hd, d)
    ) + bp["attention"]["out"]["bias"]
    x = x + out

    ln2 = _layer_norm(x, bp["ln_2"]["scale"], bp["ln_2"]["bias"])
    y = ln2 @ bp["mlp"]["fc1"]["kernel"] + bp["mlp"]["fc1"]["bias"]
    # same GELU selection as models/vit.MLPBlock: exact erf in f32 (torch
    # parity), tanh in bf16 (docs/PERF.md round 3)
    y = jax.nn.gelu(y, approximate=y.dtype == jnp.bfloat16)
    y = y @ bp["mlp"]["fc2"]["kernel"] + bp["mlp"]["fc2"]["bias"]
    return x + y


def split_vit_params(params, num_layers: int):
    """(outer, stacked): ``stacked`` carries every ``encoder_layer_i``
    subtree stacked on a new leading layer axis (scan/stage layout);
    ``outer`` is everything else (conv_proj, class_token, pos_embedding,
    final ln, pre_logits?, head?)."""
    blocks = [params[f"encoder_layer_{i}"] for i in range(num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    outer = {k: v for k, v in params.items()
             if not k.startswith("encoder_layer_")}
    return outer, stacked


def _embed(outer, x, cfg: ViTConfig):
    """conv_proj patchify + CLS + pos embedding (models/vit.py:319-344)."""
    p = cfg.patch_size
    x = jax.lax.conv_general_dilated(
        x, outer["conv_proj"]["kernel"], (p, p), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + outer["conv_proj"]["bias"]
    n, gh, gw, d = x.shape
    x = x.reshape(n, gh * gw, d)
    cls = jnp.broadcast_to(outer["class_token"], (n, 1, d)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    return x + outer["pos_embedding"]


def _head(outer, x, cfg: ViTConfig):
    """final LayerNorm + (pre_logits?) + classifier (models/vit.py:380-389)."""
    x = _layer_norm(x, outer["ln"]["scale"], outer["ln"]["bias"])
    y = x[:, 0]
    if cfg.representation_size is not None:
        y = jnp.tanh(
            y @ outer["pre_logits"]["kernel"] + outer["pre_logits"]["bias"]
        )
    if cfg.num_classes:
        y = y @ outer["head"]["kernel"] + outer["head"]["bias"]
    return y


def _pipeline_encoder(stage_params, xmb, *, mesh: Mesh, axis: str,
                      num_heads: int, remat: bool = False,
                      data_axis: Optional[str] = None):
    """GPipe schedule under shard_map: ``stage_params`` leaves are
    [S, L/S, ...] sharded on ``axis``; ``xmb`` is (M, mb, T, D) replicated
    (or sharded on ``data_axis`` along mb for combined DP x PP — each data
    column of the mesh runs an independent pipeline on its batch slice;
    stage params replicate across columns and their cotangents psum back).
    Returns (M, mb, T, D) with the same layout as ``xmb``.  ``remat``
    recomputes each block in the backward instead of stashing its
    internals per microbatch — the standard activation-memory lever when
    stages are deep."""
    num_stages = mesh.shape[axis]
    perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]
    x_spec = P(None, data_axis) if data_axis else P()

    def body(sp, xmb):
        sp = jax.tree.map(lambda a: a[0], sp)  # this device's [L/S, ...]
        idx = jax.lax.axis_index(axis)
        m, mb, t, d = xmb.shape

        block = vit_block_forward
        if remat:
            block = jax.checkpoint(block, static_argnums=(2,))

        def apply_stage(z):
            def one_block(h, bp):
                return block(bp, h, num_heads), None

            z, _ = jax.lax.scan(one_block, z, sp)
            return z

        def tick(carry, ti):
            cur, out_buf = carry
            feed = jax.lax.dynamic_index_in_dim(
                xmb, jnp.minimum(ti, m - 1), 0, keepdims=False
            )
            inp = jnp.where(idx == 0, feed, cur)
            out = apply_stage(inp)
            # the last stage emits microbatch ti-(S-1) at tick ti
            wi = ti - (num_stages - 1)
            updated = jax.lax.dynamic_update_index_in_dim(
                out_buf, out, jnp.maximum(wi, 0), 0
            )
            take = jnp.logical_and(idx == num_stages - 1, wi >= 0)
            out_buf = jnp.where(take, updated, out_buf)
            cur = jax.lax.ppermute(out, axis, perm)
            return (cur, out_buf), None

        cur0 = jnp.zeros((mb, t, d), xmb.dtype)
        (_, out_buf), _ = jax.lax.scan(
            tick, (cur0, jnp.zeros_like(xmb)),
            jnp.arange(m + num_stages - 1),
        )
        # only stage S-1 holds real outputs; psum re-replicates
        out_buf = jnp.where(idx == num_stages - 1, out_buf,
                            jnp.zeros_like(out_buf))
        return jax.lax.psum(out_buf, axis)

    return jax.shard_map(
        body, mesh=mesh, in_specs=(P(axis), x_spec), out_specs=x_spec,
        check_vma=False,
    )(stage_params, xmb)


def pp_vit_apply(params, x, *, cfg: "ViTConfig", mesh: Mesh,
                 axis: str = "pipe", microbatch: Optional[int] = None,
                 remat: bool = False, data_axis: Optional[str] = None):
    """Pipelined forward of the torchvision-style ViT: logits from NHWC
    images, numerically matching ``module.apply`` (no dropout, no aux
    outputs — the training loss path).  ``data_axis``: shard every
    microbatch over this second mesh axis too (DP x PP over a
    ("data", "pipe") mesh)."""
    num_stages = mesh.shape[axis]
    if cfg.num_layers % num_stages:
        raise ValueError(
            f"num_layers={cfg.num_layers} not divisible by "
            f"{num_stages} pipeline stages"
        )
    outer, stacked = split_vit_params(params, cfg.num_layers)
    per_stage = cfg.num_layers // num_stages
    stacked = jax.tree.map(
        lambda a: a.reshape((num_stages, per_stage) + a.shape[1:]), stacked
    )

    # Pin the batch layout once at entry.  Without this, inputs that
    # arrive sharded for a DIFFERENT mesh (e.g. the eval loader's
    # (data, model) layout) let GSPMD propagate a conflicting choice into
    # the microbatch reshape around the shard_map, and the partitioner
    # falls back to "involuntary full rematerialization" (replicate +
    # repartition) on every pipeline boundary instead of one clean
    # reshard here.
    batch_spec = P(data_axis) if data_axis else P()
    x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, batch_spec))
    h = _embed(outer, x, cfg)
    n, t, d = h.shape
    dd = mesh.shape[data_axis] if data_axis else 1
    if microbatch:
        mb = microbatch
        if n % mb:
            raise ValueError(f"batch {n} not divisible by microbatch {mb}")
        if mb % dd:
            raise ValueError(
                f"microbatch {mb} not divisible by data-parallel degree {dd}"
            )
    else:
        # default: the largest multiple-of-dd divisor of n not exceeding
        # n // S, so any valid batch works out of the box (static shapes —
        # plain python)
        if n % dd:
            raise ValueError(
                f"batch {n} not divisible by data-parallel degree {dd}"
            )
        mb = max(dd, (n // num_stages) // dd * dd)
        while n % mb or mb % dd:
            mb -= dd
    xmb = h.reshape(n // mb, mb, t, d)
    xmb = jax.lax.with_sharding_constraint(
        xmb, NamedSharding(mesh, P(None, data_axis) if data_axis else P())
    )
    out = _pipeline_encoder(stacked, xmb, mesh=mesh, axis=axis,
                            num_heads=cfg.num_heads, remat=remat,
                            data_axis=data_axis)
    out = jax.lax.with_sharding_constraint(
        out.reshape(n, t, d), NamedSharding(mesh, batch_spec)
    )
    return _head(outer, out, cfg)


def make_pp_train_step(cfg: "ViTConfig", tx, num_classes: int, mesh: Mesh,
                       axis: str = "pipe", microbatch: Optional[int] = None,
                       label_smoothing: float = 0.0,
                       compute_dtype=jnp.float32, donate: bool = True,
                       remat: bool = False,
                       data_axis: Optional[str] = None):
    """Pipelined pruned-ViT training step with the same TrainState/metrics
    contract as ``train.steps.make_train_step`` (ViT only — no batch_stats,
    no dropout; the ``rng`` argument is accepted for signature parity).
    The backward pipeline comes from autodiff of the scan+ppermute
    schedule; mask handling mirrors the dense step (zero grads AND zero
    updates at pruned slots)."""
    import optax

    from vipers.pruning.masked_optim import mask_gradients
    from vipers.pruning.masks import apply_masks
    from vipers.train.steps import accuracy_topk, cross_entropy

    def loss_fn(params, masks, images, labels):
        p = apply_masks(params, masks)
        if compute_dtype != jnp.float32:
            # bf16 AMP, same recipe as train.steps: compute on a bf16 copy,
            # f32 master params take the update
            p = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, p,
            )
        logits = pp_vit_apply(p, images.astype(compute_dtype), cfg=cfg,
                              mesh=mesh, axis=axis, microbatch=microbatch,
                              remat=remat, data_axis=data_axis)
        return cross_entropy(logits, labels, num_classes, label_smoothing), logits

    def step(state, batch, rng):
        del rng  # no dropout on the pipelined path
        images, labels = batch
        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.masks, images, labels)
        grads = mask_gradients(grads, state.masks)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = mask_gradients(updates, state.masks)
        params = optax.apply_updates(state.params, updates)
        acc1, acc5 = accuracy_topk(logits, labels)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, {"loss": loss, "acc1": acc1, "acc5": acc5}

    # donate the TrainState like the dense step: pipeline parallelism
    # exists to FIT models, so holding old+new params/momentum copies
    # would defeat it
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_pp_eval_step(cfg: "ViTConfig", num_classes: int, mesh: Mesh,
                      axis: str = "pipe", microbatch: Optional[int] = None,
                      label_smoothing: float = 0.0,
                      compute_dtype=jnp.float32,
                      data_axis: Optional[str] = None):
    """Pipelined eval step with ``train.steps.make_eval_step``'s metrics
    contract — under --pipeline-parallel the epoch-end evaluation must not
    fall back to the single-device dense forward (a model that needs S
    stages to train would OOM a single chip at eval time)."""
    from vipers.pruning.masks import apply_masks
    from vipers.train.steps import cross_entropy

    @jax.jit
    def step(state, batch):
        images, labels = batch
        p = apply_masks(state.params, state.masks)
        if compute_dtype != jnp.float32:
            p = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, p,
            )
        logits = pp_vit_apply(p, images.astype(compute_dtype), cfg=cfg,
                              mesh=mesh, axis=axis, microbatch=microbatch,
                              data_axis=data_axis)
        loss = cross_entropy(logits, labels, num_classes, label_smoothing)
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

    return step
