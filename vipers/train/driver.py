"""Pruning control flows: SNIP-then-train and iterative magnitude ("LRR").

Counterpart of `/root/reference/train.py:530-713`:
  * snip: prune once on one batch, then train to completion (`:618-654`),
  * magnitude: while sparsity < threshold: train to completion -> prune 20%
    of remaining -> recount (`:656-708`).

Everything stateful lives in a ``TrainState``; masks are swapped between
iterations without rebuilding the compiled step (they are traced arrays).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vipers.core.checkpoint import save_checkpoint
from vipers.core.config import TrainConfig
from vipers.core.metrics import MetricsWriter
from vipers.core.registry import build_model, get_model_builder
from vipers.data.imagefolder import ImageFolder, ImageFolderLoader
from vipers.data.mixup import mixup_cutmix_batch
from vipers.data.preprocess import eval_decode, make_device_normalize, train_decode
from vipers.data.sampler import shard_indices_for_host
from vipers.pruning import (
    apply_masks,
    compute_sparsity_global,
    init_masks,
    magnitude_prune,
    snip_prune,
)
from vipers.train.ema import ema_decay_for
from vipers.train.loop import evaluate, train_model_to_completion
from vipers.train.optim import make_lr_schedule, make_optimizer
from vipers.train.steps import TrainState, cross_entropy, make_eval_step, make_train_step


@dataclasses.dataclass
class Session:
    """Everything a pruning run needs, wired once."""

    cfg: TrainConfig
    spec: object
    tx: object
    state: TrainState
    train_step: object
    eval_step: object
    eval_step_ema: object
    normalize: object
    mixup: Optional[object]
    rng: jax.Array
    writer: MetricsWriter
    train_ds: ImageFolder
    val_ds: ImageFolder
    # re-applies the session's device placements (TP/DP shardings) to a
    # TrainState whose leaves were replaced with host arrays — resume must
    # call it or --model-parallel placements are silently lost
    state_sharder: Optional[object] = None
    # set when the session was resumed from a `vipers slim` checkpoint:
    # every checkpoint this session writes must carry the same .slim.json
    # sidecar or downstream consumers rebuild the dense module and crash
    arch_overrides: Optional[dict] = None
    # multi-device/multi-process batch placement (parallel/mesh.batch_sharder);
    # host-local batches that bypass the wrapped step fns (the SNIP saliency
    # batch) must go through it too, or masks diverge across processes
    shard_io: Optional[object] = None
    # the device mesh behind shard_io (None when running unsharded) — lets
    # secondary drivers (quantize) replicate their own aux state (observers,
    # int8 tables) onto the same global placement
    mesh: Optional[object] = None


def build_session(cfg: TrainConfig) -> Session:
    import inspect

    model_kw = {"num_classes": cfg.num_classes}
    if cfg.resnet_dilate != 1 and cfg.model.startswith("resnet"):
        # dilated evaluation sweeps (`evaluate_models.py:373-379`)
        model_kw["dilate"] = cfg.resnet_dilate
    from vipers.pruning.structured import arch_sidecar

    arch = arch_sidecar(getattr(cfg, "resume", "") or "")
    if arch:
        # resuming a structurally slimmed checkpoint (`vipers slim`):
        # rebuild the module at the slim widths so fine-tuning (the
        # standard recover-accuracy step after structured pruning) works
        model_kw["arch_overrides"] = arch
        print(f"slim architecture: {arch}")
    # ViT/swin pos-embeddings are sized at construction; build the model at
    # the training crop so non-224 runs work (the torch reference hard-codes
    # 224 and asserts on it — `vision_transformer.py:282-283`).
    builder_params = inspect.signature(
        get_model_builder(cfg.model)).parameters
    size = (cfg.train_crop_size, cfg.train_crop_size)
    if "image_size" in builder_params:
        model_kw["image_size"] = size
    elif "input_size" in builder_params:
        model_kw["input_size"] = size
    if (("image_size" in model_kw or "input_size" in model_kw)
            and cfg.val_crop_size != cfg.train_crop_size):
        # pos-embeddings are sized at construction: the epoch-end eval
        # would crash after a full epoch of training. Fail fast instead
        # (the torch reference hard-codes 224 for BOTH and asserts —
        # `vision_transformer.py:282-283`).
        raise SystemExit(
            f"{cfg.model}: --val-crop-size ({cfg.val_crop_size}) must equal "
            f"--train-crop-size ({cfg.train_crop_size}) — this family's "
            "pos-embeddings are sized at construction; pass matching crop "
            "sizes (CNN families accept any eval size)"
        )
    spec = build_model(cfg.model, **model_kw)
    rng = jax.random.PRNGKey(cfg.seed)
    init_rng, run_rng = jax.random.split(rng)
    h = w = cfg.train_crop_size
    from vipers.core.registry import init_variables

    variables = init_variables(
        spec.module, {"params": init_rng, "dropout": init_rng},
        jnp.zeros((1, h, w, 3), jnp.float32),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    masks = init_masks(params, exclude=spec.prune_exclude)

    train_ds = ImageFolder(os.path.join(cfg.data_path, "train"),
                           cache_dir=cfg.cache_dataset)
    val_ds = ImageFolder(os.path.join(cfg.data_path, "val"),
                         cache_dir=cfg.cache_dataset)
    # one optimizer step consumes a GLOBAL batch (batch_size per process);
    # schedules must count global steps or multi-process LR curves compress
    steps_per_epoch = max(
        len(train_ds) // (cfg.batch_size * jax.process_count()), 1)

    schedule = make_lr_schedule(cfg.optim, steps_per_epoch)
    # No masks_fn here: the step fn masks grads AND final updates with the
    # traced state.masks (see train.steps), so mask swaps need no retrace.
    tx = make_optimizer(cfg.optim, params, schedule)
    opt_state = tx.init(params)

    ema_decay = None
    ema_params = ema_bs = None
    if cfg.model_ema:
        ema_decay = ema_decay_for(
            cfg.model_ema_decay, jax.process_count(), cfg.batch_size,
            cfg.model_ema_steps, cfg.optim.epochs,
        )
        # real copies: aliasing params would donate the same buffer twice
        ema_params = jax.tree.map(jnp.copy, params)
        ema_bs = jax.tree.map(jnp.copy, batch_stats) if batch_stats else None

    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats,
        masks=masks, opt_state=opt_state,
        ema_params=ema_params, ema_batch_stats=ema_bs,
    )

    compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32
    if cfg.pipeline_parallel > 1:
        # GPipe pipeline parallelism (vipers/parallel/pp.py): the encoder's
        # layer axis split into one stage per device; scan+ppermute
        # schedule, autodiff gives the reverse pipeline. ViT-only (the
        # stage math is the pure-function EncoderBlock) and incompatible
        # with EMA/dropout — guard loudly rather than silently diverge.
        import numpy as _np
        from jax.sharding import Mesh as _Mesh

        from vipers.parallel.pp import make_pp_eval_step, make_pp_train_step

        if spec.family != "vit":
            raise SystemExit(
                f"--pipeline-parallel stages the ViT encoder; model "
                f"{cfg.model!r} (family {spec.family!r}) is not supported"
            )
        if cfg.model_ema:
            raise SystemExit("--pipeline-parallel does not support --model-ema")
        vcfg = spec.module.cfg
        if vcfg.dropout_rate or vcfg.attention_dropout_rate:
            raise SystemExit(
                "--pipeline-parallel requires dropout 0 (no rng plumbing "
                "through the pipelined schedule)"
            )
        stages = cfg.pipeline_parallel
        if vcfg.num_layers % stages:
            raise SystemExit(
                f"{vcfg.num_layers} encoder layers do not divide into "
                f"{stages} pipeline stages"
            )
        devs = jax.devices()
        pp_data = max(cfg.pp_data, 1)
        need = stages * pp_data
        if len(devs) < need:
            raise SystemExit(
                f"--pipeline-parallel {stages}"
                + (f" --pp-data {pp_data}" if pp_data > 1 else "")
                + f" needs {need} devices, have {len(devs)}"
            )
        if pp_data > 1:
            # combined DP x PP: each data column of the (data, pipe) mesh
            # runs its own pipeline on its batch slice; stage params
            # replicate across columns, cotangents psum back over "data"
            pp_mesh = _Mesh(
                _np.asarray(devs[:need]).reshape(pp_data, stages),
                ("data", "pipe"),
            )
            data_axis = "data"
        else:
            pp_mesh = _Mesh(_np.asarray(devs[:stages]), ("pipe",))
            data_axis = None
        train_step = make_pp_train_step(
            vcfg, tx, cfg.num_classes, mesh=pp_mesh,
            microbatch=cfg.pp_microbatch or None,
            label_smoothing=cfg.optim.label_smoothing,
            compute_dtype=compute_dtype, remat=cfg.pp_remat,
            data_axis=data_axis,
        )
        # the epoch-end evaluation must be pipelined too: a model that
        # needs S stages to train would OOM the single-device dense eval
        eval_step = make_pp_eval_step(
            vcfg, cfg.num_classes, mesh=pp_mesh,
            microbatch=cfg.pp_microbatch or None,
            label_smoothing=cfg.optim.label_smoothing,
            compute_dtype=compute_dtype, data_axis=data_axis,
        )
    else:
        train_step = make_train_step(
            spec.module.apply, tx, cfg.num_classes, cfg.optim.label_smoothing,
            compute_dtype=compute_dtype, ema_decay=ema_decay,
            ema_every=cfg.model_ema_steps,
            ema_warmup_steps=cfg.optim.lr_warmup_epochs * steps_per_epoch,
        )
        eval_step = make_eval_step(
            spec.module.apply, cfg.num_classes, cfg.optim.label_smoothing,
            compute_dtype,
        )
    eval_step_ema = make_eval_step(
        spec.module.apply, cfg.num_classes, cfg.optim.label_smoothing,
        compute_dtype, use_ema=True,
    )

    state_sharder = None
    shard_io = None
    mesh = None
    if cfg.data_parallel or cfg.model_parallel > 1 or jax.process_count() > 1:
        # In-process multi-device training (vipers train --data-parallel
        # [--model-parallel k]): batches shard over the mesh's data axis,
        # ViT params optionally tensor-parallel over the model axis; XLA
        # inserts the gradient reductions / Megatron collectives. SyncBN
        # falls out for free (batch statistics reduce over the global jit
        # batch). Mutually exclusive with --pipeline-parallel (use
        # --pp-data for DP x PP).
        #
        # Multi-PROCESS runs (launched under torchrun-style env + rendezvous,
        # mesh.maybe_initialize_distributed) take this branch automatically:
        # the mesh spans the global device set and batch_sharder assembles
        # each global batch from the per-host loader shards — the analogue
        # of the reference's DDP wrap (`/root/reference/train.py:606`).
        if cfg.pipeline_parallel > 1:
            raise SystemExit(
                "--data-parallel/--model-parallel cannot combine with "
                "--pipeline-parallel; use --pp-data for DP x PP"
            )
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vipers.parallel.mesh import (
            batch_sharder, make_mesh, vit_param_sharding,
        )

        devs = jax.devices()
        if cfg.model_parallel > 1 and spec.family != "vit":
            raise SystemExit(
                "--model-parallel shards ViT attention/MLP features; "
                f"model {cfg.model!r} (family {spec.family!r}) has no "
                "tensor-parallel spec"
            )
        mesh = make_mesh(devs, model_parallel=cfg.model_parallel)
        repl = NamedSharding(mesh, P())
        if cfg.model_parallel > 1:
            param_sh = vit_param_sharding(mesh, state.params)
        else:
            param_sh = jax.tree.map(lambda _: repl, state.params)

        def _sh_of(path):
            node = param_sh
            for k in path:
                node = node[k]
            return node

        def _put(tree, sh):
            return (None if tree is None
                    else jax.device_put(tree, sh))

        def _shard_state(st):
            return st.replace(
                params=jax.device_put(st.params, param_sh),
                masks={p: jax.device_put(m, _sh_of(p))
                       for p, m in st.masks.items()},
                # optimizer/EMA state replicated (momentum of TP-sharded
                # params could shard too; replication is correct and keeps
                # optax's tree opaque)
                opt_state=_put(st.opt_state, repl),
                batch_stats=_put(st.batch_stats, repl),
                ema_params=_put(st.ema_params, repl),
                ema_batch_stats=_put(st.ema_batch_stats, repl),
                step=jax.device_put(st.step, repl),
            )

        state = _shard_state(state)
        state_sharder = _shard_state
        shard_io = batch_sharder(mesh)
        n_data = mesh.shape["data"]
        nproc = jax.process_count()
        per_proc = max(n_data // nproc, 1)
        if nproc > 1 and cfg.batch_size % per_proc:
            # batch_sharder pads ragged per-process shards with label=-1
            # sentinel rows; the EVAL step masks those, the TRAIN step
            # must never see them (they would dilute the loss mean, feed
            # label smoothing real gradients from black images, and
            # pollute BatchNorm batch statistics), so reject up front.
            raise SystemExit(
                f"--batch-size {cfg.batch_size} (per process) must be a "
                f"multiple of the {per_proc} local devices per process: "
                "ragged train shards would be sentinel-padded and the "
                "pad rows would pollute the loss/BN statistics"
            )

        def _wrap_step(fn, with_rng):
            if with_rng:
                return lambda st, batch, rng: fn(st, shard_io(batch), rng)
            return lambda st, batch: fn(st, shard_io(batch))

        train_step = _wrap_step(train_step, True)
        eval_step = _wrap_step(eval_step, False)
        eval_step_ema = _wrap_step(eval_step_ema, False)
        print(f"train mesh: data={n_data} x model={cfg.model_parallel} "
              f"over {len(devs)} devices"
              + (f", {jax.process_count()} processes"
                 if jax.process_count() > 1 else ""))

    normalize = make_device_normalize(random_erase_prob=cfg.random_erase)
    mixup = None
    if cfg.mixup_alpha > 0 or cfg.cutmix_alpha > 0:
        mixup = partial(
            mixup_cutmix_batch, num_classes=cfg.num_classes,
            mixup_alpha=cfg.mixup_alpha, cutmix_alpha=cfg.cutmix_alpha,
        )

    # master-only side effects (`/root/reference/utils.py:236-242`): only
    # process 0 writes the JSONL stream — two ranks appending to the same
    # file would interleave records
    writer = MetricsWriter(
        (cfg.metrics_path or os.path.join(cfg.output_dir, "metrics.jsonl"))
        if jax.process_index() == 0 else None
    )
    return Session(
        cfg=cfg, spec=spec, tx=tx, state=state, train_step=train_step,
        eval_step=eval_step, eval_step_ema=eval_step_ema, normalize=normalize,
        mixup=mixup, rng=run_rng, writer=writer,
        train_ds=train_ds, val_ds=val_ds, state_sharder=state_sharder,
        arch_overrides=arch, shard_io=shard_io, mesh=mesh,
    )


def _train_loader(s: Session, epoch: int):
    cfg = s.cfg
    if cfg.ra_sampler:
        # repeated augmentation: each sample appears ra_reps times across
        # hosts per epoch (`/root/reference/train.py:228-236`, sampler.py).
        # RA keeps the reference's per-sample striding, so — like the
        # reference's RASampler — it makes no single-process-equivalence
        # claim; the repeats still draw distinct augmentations (each copy
        # lands at a distinct (rank, batch-pos) rng position).
        from vipers.data.sampler import ra_sampler_indices

        idx = ra_sampler_indices(
            len(s.train_ds), jax.process_count(), jax.process_index(),
            epoch, seed=cfg.seed, repetitions=cfg.ra_reps,
        )
    else:
        # batch-interleaved blocks (multi-process): the global batch
        # assembled by batch_sharder equals the single-process batch,
        # element for element — DDP-equivalence (see data/sampler.py).
        # drop_last matches the single-process loader (drop_last=True
        # below): without it the sampler pads the tail up to a full
        # global batch and every epoch trains one extra step on
        # wrap-duplicated samples, desyncing steps_per_epoch/LR.
        idx = shard_indices_for_host(
            len(s.train_ds), jax.process_count(), jax.process_index(),
            epoch, seed=cfg.seed, batch_size=cfg.batch_size,
            drop_last=True,
        )
    # C++ decode is bilinear-only; other interpolation modes use PIL
    if cfg.native_decode and cfg.interpolation == "bilinear":
        from vipers.data import native

        decode = partial(native.decode_train, crop_size=cfg.train_crop_size,
                         auto_augment=cfg.auto_augment,
                         ra_magnitude=cfg.ra_magnitude,
                         augmix_severity=cfg.augmix_severity)
    else:
        decode = partial(train_decode, crop_size=cfg.train_crop_size,
                         auto_augment=cfg.auto_augment,
                         ra_magnitude=cfg.ra_magnitude,
                         augmix_severity=cfg.augmix_severity,
                         interpolation=cfg.interpolation)
    return ImageFolderLoader(
        s.train_ds, idx, cfg.batch_size, decode_fn=decode,
        num_workers=cfg.workers, drop_last=True, seed=cfg.seed + epoch,
        rank=jax.process_index(), world=jax.process_count(),
    )


def _val_loader(s: Session):
    cfg = s.cfg
    idx = shard_indices_for_host(
        len(s.val_ds), jax.process_count(), jax.process_index(), 0,
        seed=cfg.seed, shuffle=False,
        pad_with_sentinel=jax.process_count() > 1,
    )
    if cfg.native_decode and cfg.interpolation == "bilinear":
        from vipers.data import native

        decode = lambda p, rng: native.decode_eval(
            p, cfg.val_resize_size, cfg.val_crop_size)
    else:
        decode = lambda p, rng: eval_decode(
            p, cfg.val_resize_size, cfg.val_crop_size,
            interpolation=cfg.interpolation)
    return ImageFolderLoader(
        s.val_ds, idx, cfg.batch_size, decode_fn=decode,
        num_workers=cfg.workers, drop_last=False,
    )


def _snip_loss_fn(s: Session):
    cfg = s.cfg

    def loss_fn(params, batch):
        images, labels = batch
        variables = {"params": params}
        if s.state.batch_stats is not None:
            variables["batch_stats"] = s.state.batch_stats
        out = s.spec.module.apply(
            variables, images, train=True,
            rngs={"dropout": jax.random.PRNGKey(cfg.seed)},
            # mutable must be False (not []) when there are no batch_stats:
            # flax returns an (out, vars) tuple for ANY collection value.
            mutable=["batch_stats"] if s.state.batch_stats is not None else False,
        )
        logits = out[0][0] if s.state.batch_stats is not None else out[0]
        return cross_entropy(logits, labels, cfg.num_classes, cfg.optim.label_smoothing)

    return loss_fn


def _checkpoint_fn(s: Session, method: str, tag):
    cfg = s.cfg

    def save(state, epoch, sparsity, latest=False):
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "masks": {"/".join(k): v for k, v in state.masks.items()},
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": np.int32(epoch),
            "sparsity": np.float32(sparsity),
        }
        if state.ema_params is not None:
            tree["ema_params"] = state.ema_params
        if state.ema_batch_stats is not None:
            # EMA evaluation of BN models reads ema_batch_stats
            # (steps.py make_eval_step(use_ema=True)); dropping it from the
            # checkpoint would silently reset EMA-BN stats across resume.
            tree["ema_batch_stats"] = state.ema_batch_stats
        if jax.process_count() > 1:
            # collective: every rank gathers cross-process leaves to host
            # (TP shards etc.) and then EVERY rank calls the orbax save —
            # orbax runs a global sync barrier under a multi-process
            # runtime and its primary-host logic writes each (now host-
            # local) leaf once.  Gating the call on rank 0 deadlocks the
            # barrier.  This is the save_on_master split
            # (`/root/reference/utils.py:240-242`) in orbax's idiom.
            from vipers.parallel.mesh import host_replicated_tree

            tree = host_replicated_tree(tree)
        if latest:
            # rolling latest: async so the epoch loop never blocks on IO
            name = f"{cfg.model}_checkpoint_{method}_{tag}"
            save_checkpoint(os.path.join(cfg.output_dir, name), tree, use_async=True)
        else:
            name = f"{cfg.model}_epoch_{epoch}_{method}_{tag}"
            save_checkpoint(os.path.join(cfg.output_dir, name), tree)
        if s.arch_overrides and jax.process_index() == 0:
            # slim fine-tune: propagate the sidecar so lost/evaluate/
            # explain rebuild this checkpoint at the slim widths.
            # Rank 0 only — unlike the orbax save above this is a bare
            # file write, and concurrent ranks writing the same path can
            # tear it (save_on_master, `/root/reference/utils.py:240-242`)
            from vipers.pruning.structured import write_sidecar

            write_sidecar(os.path.join(cfg.output_dir, name), cfg.model,
                          s.arch_overrides)

    return save


def run_snip(s: Session, initial_epoch: int = 0):
    """SNIP path (`train.py:618-654`): prune once -> train to completion."""
    from vipers.core.profiling import device_trace

    cfg = s.cfg
    if initial_epoch == 0:
        images, labels = next(iter(_train_loader(s, 0)))
        batch = (s.normalize(images), jnp.asarray(labels))
        if s.shard_io is not None:
            # saliency over the GLOBAL batch: all processes compute the
            # same threshold -> identical masks everywhere (the reference
            # silently lets per-rank SNIP masks diverge under DDP)
            batch = s.shard_io(batch)
        masks = snip_prune(
            _snip_loss_fn(s), s.state.params, batch, cfg.target_sparsity,
            exclude=s.spec.prune_exclude,
        )
        s.state = s.state.replace(masks=masks)
    masks = s.state.masks
    sparsity = compute_sparsity_global(s.state.params, masks)
    print(f"Sparsity after SNIP pruning: {sparsity:.2f}%")
    s.writer.write("prune", step=0, method="snip", sparsity=sparsity)

    with device_trace(cfg.profile_dir or None):
        state, acc1 = train_model_to_completion(
            s.train_step, s.eval_step, s.state,
            lambda e: _train_loader(s, e), lambda: _val_loader(s),
            cfg.optim.epochs, s.rng, initial_epoch=initial_epoch,
        normalize_fn=s.normalize, mixup_fn=s.mixup,
            checkpoint_fn=_checkpoint_fn(s, "snip", cfg.target_sparsity),
            sparsity=sparsity, writer=s.writer, print_freq=cfg.print_freq,
            eval_step_ema=s.eval_step_ema if cfg.model_ema else None,
            expected_eval_samples=len(s.val_ds),
        )
    s.state = state
    return sparsity, acc1


def run_magnitude(s: Session, resuming: bool = False, initial_epoch: int = 0):
    """LRR path (`train.py:656-708`): loop train -> prune -> recount.

    ``initial_epoch`` applies to the *first* iteration only: a
    mid-iteration resume continues from the restored epoch with the
    restored opt_state/step (reference `train.py:469`
    ``range(initial_epoch, epochs)``); later iterations restart at 0.
    """
    from vipers.core.profiling import device_trace

    cfg = s.cfg
    sparsity = compute_sparsity_global(s.state.params, s.state.masks)
    it = cfg.starting_pruning_iteration
    rows = []
    first = True
    while sparsity < cfg.pruning_threshold:
        print(f"Pruning iteration: {it} (sparsity {sparsity:.2f}%)")
        # The reference recreates optimizer + lr_scheduler for every
        # train_model_to_completion call (train.py:460-461): restart the
        # schedule (step=0) and momentum for each pruning iteration —
        # except when resuming mid-iteration, where the restored
        # opt_state/step must survive.
        if not (first and resuming):
            s.state = s.state.replace(
                step=jnp.zeros((), jnp.int32),
                opt_state=s.tx.init(s.state.params),
            )
        start = initial_epoch if (first and resuming) else 0
        first = False
        with device_trace((cfg.profile_dir or None) if it == cfg.starting_pruning_iteration else None):
            state, acc1 = train_model_to_completion(
                s.train_step, s.eval_step, s.state,
                lambda e: _train_loader(s, e), lambda: _val_loader(s),
                cfg.optim.epochs, jax.random.fold_in(s.rng, it),
                initial_epoch=start,
                normalize_fn=s.normalize, mixup_fn=s.mixup,
                # filename contract: {model}_epoch_{e}_pruning_iteration_{NN}
                # (`/root/reference/main_lost.py:346`, `evaluate_models.py:230`)
                checkpoint_fn=_checkpoint_fn(s, "pruning_iteration", f"{it:02d}"),
                sparsity=sparsity, writer=s.writer, print_freq=cfg.print_freq,
                eval_step_ema=s.eval_step_ema if cfg.model_ema else None,
                expected_eval_samples=len(s.val_ds),
            )
        rows.append((acc1, sparsity))
        masks = magnitude_prune(state.params, state.masks, cfg.pruning_rate)
        # Bake: zero pruned weights immediately (torch remask-on-forward).
        params = apply_masks(state.params, masks)
        s.state = state.replace(params=params, masks=masks)
        sparsity = compute_sparsity_global(params, masks)
        s.writer.write("prune", step=it, method="magnitude", sparsity=sparsity)
        it += 1
    if jax.process_index() == 0:
        MetricsWriter.export_performance_txt(
            os.path.join(cfg.output_dir, "performance.txt"), rows
        )
    return sparsity, rows


def resume_session(s: Session, path: str) -> int:
    """Restore model/optimizer/epoch/EMA/masks from a checkpoint — the
    crash-recovery story (`/root/reference/train.py:505-521` keys +
    `--resume` at `:801`). Returns the epoch to continue from."""
    from vipers.core.checkpoint import restore_checkpoint, restore_like

    tree = restore_checkpoint(path)
    masks = {
        tuple(k.split("/")): jnp.asarray(v, bool)
        for k, v in (tree.get("masks") or {}).items()
    } or s.state.masks
    opt_state = s.state.opt_state
    if tree.get("opt_state") is not None:
        # orbax returns plain dicts/lists; rebuild the optax NamedTuples
        opt_state = restore_like(s.state.opt_state, tree["opt_state"])
    s.state = s.state.replace(
        params=tree["params"],
        batch_stats=tree.get("batch_stats", s.state.batch_stats),
        masks=masks,
        opt_state=opt_state,
        step=jnp.asarray(tree.get("step", s.state.step), jnp.int32),
        ema_params=tree.get("ema_params", s.state.ema_params),
        ema_batch_stats=tree.get("ema_batch_stats", s.state.ema_batch_stats),
    )
    if s.state_sharder is not None:
        # restore handed back host arrays; re-apply the session's TP/DP
        # device placements or --model-parallel is silently lost on resume
        s.state = s.state_sharder(s.state)
    start_epoch = int(tree.get("epoch", -1)) + 1
    print(f"Resumed from {path} at epoch {start_epoch} "
          f"(sparsity {float(tree.get('sparsity', 0.0)):.2f}%)")
    return start_epoch


def run(cfg: TrainConfig):
    from vipers.core.checkpoint import wait_for_checkpoints
    import atexit

    atexit.register(wait_for_checkpoints)
    if cfg.debug_nans:
        from vipers.core.profiling import enable_nan_check

        enable_nan_check(True)
    os.makedirs(cfg.output_dir, exist_ok=True)
    s = build_session(cfg)
    start_epoch = 0
    # reference precedence (torchvision train.py): --start-epoch seeds the
    # epoch counter, but a --resume checkpoint's epoch OVERWRITES it
    if cfg.start_epoch >= 0:
        start_epoch = cfg.start_epoch
    if cfg.resume:
        start_epoch = resume_session(s, cfg.resume)
    if cfg.test_only:
        return evaluate(s.eval_step, s.state, _val_loader(s), normalize_fn=s.normalize)
    if cfg.pruning_method == "snip":
        return run_snip(s, initial_epoch=start_epoch)
    if cfg.pruning_method == "magnitude":
        return run_magnitude(s, resuming=bool(cfg.resume),
                             initial_epoch=start_epoch)
    raise ValueError(f"Unsupported pruning method {cfg.pruning_method!r}")
