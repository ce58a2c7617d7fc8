"""Checkpoint sweep evaluation.

Counterpart of `/root/reference/evaluate_models.py:178-364`: glob the
pruning-iteration checkpoints, load each (masks are first-class — no
prune-identity dance), compute sparsity, evaluate top-1/5, append
``split/acc1 ... custom_x_axis {sparsity}`` lines to
``{model}_dilation_{d}.txt`` (`evaluate_models.py:79-82`) and a
performance.txt for the plotting layer.

Dilation: ``cfg.resnet_dilate`` builds the dilated ResNet
(`evaluate_models.py:373-379`) — the same flag that stamps the output
filename actually constructs the model.

VOC branch (`evaluate_models.py:207-228,357-361`): the reference's VOC
path is degenerate as written (its loop unpacks the detection loader's
``(im_name, image)`` pairs as ``(image, target)`` and would crash in
``criterion``); we implement the evident intent — run the classifier over
VOC images with eval preprocessing and score against the first annotated
object's VOC class index — and keep the txt contract.
"""

from __future__ import annotations

import glob as globlib
import json
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from vipers.core.config import TrainConfig
from vipers.core.metrics import MetricsWriter
from vipers.pruning import compute_sparsity_global
from vipers.train.loop import evaluate

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def _voc_eval_batches(cfg: TrainConfig, normalize_fn,
                      dataset: str = "VOC07", split: str = "trainval"):
    """Yield (images, labels) batches from a VOC detection set, labels =
    first GT object's VOC class index (eval preset preprocessing).

    Multi-process: each host decodes only its batch-interleaved shard of
    the annotated items (the reference's DistributedSampler on the test
    set, `/root/reference/evaluate_models.py:159-160`); ragged tails pad
    with label ``-1`` sentinel rows (zero image) that the eval step masks
    out, so every host yields the same number of equally-shaped batches —
    the lockstep the global-mesh collectives require."""
    from vipers.data.detection import DiscoveryDataset
    from vipers.data.preprocess import eval_decode
    from vipers.data.sampler import shard_indices_for_host

    ds = DiscoveryDataset(dataset, split, cfg.data_path, no_hard=False)
    items = []  # (path, voc_label) for every annotated image, dataset order
    for path, im_name in ds:
        gt, cls = ds.extract_gt(im_name)
        if gt is None or len(gt) == 0:
            continue
        items.append((
            path, VOC_CLASSES.index(cls[0]) if cls[0] in VOC_CLASSES else 0))
    nproc, rank = jax.process_count(), jax.process_index()
    idx = shard_indices_for_host(
        len(items), nproc, rank, 0, shuffle=False,
        pad_with_sentinel=nproc > 1)
    shape = (cfg.val_crop_size, cfg.val_crop_size, 3)
    images, labels = [], []
    for i in idx:
        if i < 0:  # sentinel pad row: zero image, label -1 (masked)
            images.append(np.zeros(shape, np.uint8))
            labels.append(-1)
        else:
            path, label = items[i]
            images.append(eval_decode(
                path, cfg.val_resize_size, cfg.val_crop_size,
                interpolation=cfg.interpolation))
            labels.append(label)
        if len(images) == cfg.batch_size:
            yield normalize_fn(np.stack(images)), jnp.asarray(labels, jnp.int32)
            images, labels = [], []
    if images:
        yield normalize_fn(np.stack(images)), jnp.asarray(labels, jnp.int32)


def _eval_only_session(cfg: TrainConfig, with_val: bool = False,
                       arch_overrides: dict = None, val_ds=None):
    """Model + eval step + normalize WITHOUT the training machinery a sweep
    never uses (optimizer/EMA/train ImageFolder — ``build_session`` would
    require a ``train/`` split to exist and scan it per invocation).
    ``with_val``: also open ``{data_path}/val`` as an ImageFolder so
    ``_val_loader`` works; the VOC branch's data_path is a detection root
    with no class dirs at all, so it stays off there."""
    import types

    from vipers.core.registry import build_model
    from vipers.data.preprocess import make_device_normalize
    from vipers.pruning import init_masks
    from vipers.train.steps import TrainState, make_eval_step

    model_kw = {"num_classes": cfg.num_classes}
    if arch_overrides:
        # structurally slimmed checkpoint (`vipers slim` sidecar): rebuild
        # the module at the slim widths so parameter shapes match
        model_kw["arch_overrides"] = arch_overrides
    if cfg.resnet_dilate != 1 and cfg.model.startswith("resnet"):
        model_kw["dilate"] = cfg.resnet_dilate
    # a sweep only ever evaluates, so fixed-pos-embedding families (ViT,
    # swin) must be constructed at the EVAL crop — the size every batch
    # actually has — not the training crop
    import inspect

    from vipers.core.registry import get_model_builder

    builder_params = inspect.signature(
        get_model_builder(cfg.model)).parameters
    size = (cfg.val_crop_size, cfg.val_crop_size)
    if "image_size" in builder_params:
        model_kw["image_size"] = size
    elif "input_size" in builder_params:
        model_kw["input_size"] = size
    spec = build_model(cfg.model, **model_kw)
    h = w = cfg.val_crop_size
    from vipers.core.registry import init_variables

    variables = init_variables(
        spec.module, jax.random.PRNGKey(cfg.seed), jnp.zeros((1, h, w, 3)),
        train=False,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        masks=init_masks(variables["params"], exclude=spec.prune_exclude),
        opt_state=None,
    )
    if val_ds is None and with_val:
        from vipers.data.imagefolder import ImageFolder

        val_ds = ImageFolder(os.path.join(cfg.data_path, "val"),
                             cache_dir=cfg.cache_dataset)
    eval_step = make_eval_step(spec.module.apply, cfg.num_classes)
    if cfg.data_parallel or jax.process_count() > 1:
        # evaluate sweeps honor --data-parallel too: batches shard over
        # every local device, params replicate (same recipe as the train
        # driver's mesh block).  Multi-PROCESS sweeps (the reference DDP-
        # wraps its evaluation, `/root/reference/evaluate_models.py:314-316`
        # + `:159-160` DistributedSampler) take this branch automatically:
        # `_val_loader`/`_voc_eval_batches` yield host-local shards
        # (`shard_indices_for_host`, sentinel-padded tails) and
        # batch_sharder assembles the global batch, so metrics come out of
        # the jitted step globally reduced — identical on every rank.
        from vipers.parallel.mesh import batch_sharder, make_mesh, replicate

        mesh = make_mesh(jax.devices())
        state = jax.device_put(state, replicate(mesh))
        shard_io = batch_sharder(mesh)
        base_eval = eval_step
        eval_step = lambda st, batch: base_eval(st, shard_io(batch))  # noqa: E731
    return types.SimpleNamespace(
        cfg=cfg, spec=spec, state=state, val_ds=val_ds,
        eval_step=eval_step,
        normalize=make_device_normalize(),
    )


def sweep_checkpoints(sweep_dir: str, model: str) -> list:
    """Find a pruning sweep's checkpoints under ``sweep_dir``, covering both
    the reference's layout and ours (shared contract with
    ``discovery/driver._templated_checkpoint``):

    - reference CNNs: ``{sweep_dir}/{model}/model_epoch_89_pruning_iteration_
      {NN}.pth`` — literal ``model`` stem, ``{model}`` subdirectory
      (`/root/reference/evaluate_models.py:230`)
    - reference ViTs: ``{sweep_dir}/{model}/{model}_epoch_299_pruning_
      iteration_{NN}.pth`` (`main_lost.py:344-356`)
    - native flat layout: ``{sweep_dir}/{model}_epoch_*_pruning_iteration_*``
      orbax dirs written by our train driver

    Sorted by pruning iteration; falls back to any ``*_epoch_*`` checkpoints
    of the model when no iteration-templated ones exist."""
    from vipers.core.checkpoint import reference_sweep_stem

    patterns = [
        os.path.join(sweep_dir, model, reference_sweep_stem(model, vit=False)),
        os.path.join(sweep_dir, model, reference_sweep_stem(model, vit=True)),
        os.path.join(sweep_dir, reference_sweep_stem(model, vit=True)),
    ]
    found = []
    for pat in patterns:
        found.extend(globlib.glob(pat))
    # orbax checkpoints are directories; .pth are files — keep both, but
    # drop orbax-internal subpaths that the subdir pattern may have caught
    ckpts = sorted(
        {p for p in found if re.search(r"pruning_iteration_(\d+)(\.pth|\.pt)?$", p)},
        key=lambda p: int(re.search(r"pruning_iteration_(\d+)", p).group(1)),
    )
    if not ckpts:
        ckpts = sorted(
            set(globlib.glob(os.path.join(sweep_dir, f"{model}_epoch_*")))
            | set(globlib.glob(os.path.join(sweep_dir, model, "*_epoch_*")))
        )
    # `vipers slim` outputs evaluate alongside whatever sweep layout is
    # present — flat OR the reference's {model}/ subdir — at their slim
    # widths via the .slim.json sidecar (the sidecar files themselves are
    # not checkpoints)
    ckpts += sorted(
        p
        for pat in (os.path.join(sweep_dir, f"{model}_slim_*"),
                    os.path.join(sweep_dir, model, "*_slim_*"))
        for p in globlib.glob(pat)
        if not p.endswith(".json") and p not in ckpts
    )
    return ckpts


def run_sweep(cfg: TrainConfig, dilation: int = None, models_path: str = "",
              voc_dataset: str = "VOC07", voc_set: str = "trainval"):
    from vipers.train.driver import _val_loader
    from vipers.discovery.driver import load_lost_checkpoint

    dilation = cfg.resnet_dilate if dilation is None else dilation
    if cfg.eval_dataset == "voc" and cfg.num_classes != len(VOC_CLASSES):
        # the VOC branch scores argmax logits against VOC indices 0-19 —
        # meaningless for any other head width (the reference's own branch
        # crashes outright, `evaluate_models.py:207-228`)
        raise ValueError(
            f"--eval-dataset voc requires num_classes == {len(VOC_CLASSES)} "
            f"(got {cfg.num_classes}): the classifier head must emit VOC "
            "class logits for the accuracy rows to mean anything"
        )
    s = _eval_only_session(cfg, with_val=cfg.eval_dataset != "voc")
    # sweep dir: --models-path (evaluate_models.py:230) or the output dir
    sweep_dir = models_path or cfg.output_dir
    ckpts = sweep_checkpoints(sweep_dir, cfg.model)
    out_txt = os.path.join(cfg.output_dir, f"{cfg.model}_dilation_{dilation}.txt")
    voc = cfg.eval_dataset == "voc"
    split = "voc" if voc else "test"
    rows = []
    from vipers.pruning.structured import arch_sidecar

    # metrics come out of the jitted step globally reduced (identical on
    # every rank) — only rank 0 appends the txt artifacts, the
    # save_on_master split (`/root/reference/utils.py:240-242`)
    rank0 = jax.process_index() == 0
    slim_sessions = {}
    if rank0:
        os.makedirs(cfg.output_dir, exist_ok=True)
    with open(out_txt if rank0 else os.devnull, "a") as f:
        for ckpt in ckpts:
            sess = s
            arch = arch_sidecar(ckpt)
            if arch:
                # slimmed iteration: a per-architecture eval session so the
                # module's parameter shapes match the slim tree (cached —
                # one retrace per distinct slim width in the sweep)
                key = json.dumps(arch, sort_keys=True)
                if key not in slim_sessions:
                    slim_sessions[key] = _eval_only_session(
                        cfg, with_val=not voc, arch_overrides=arch,
                        val_ds=s.val_ds,  # reuse the scanned dataset
                    )
                sess = slim_sessions[key]
            variables, masks, _obs = load_lost_checkpoint(ckpt, sess.spec, None)
            state = sess.state.replace(
                params=variables["params"],
                batch_stats=variables.get("batch_stats",
                                          sess.state.batch_stats),
                masks=masks or sess.state.masks,
            )
            sparsity = compute_sparsity_global(state.params, state.masks)
            if voc:
                acc1, acc5, loss = evaluate(
                    sess.eval_step, state,
                    _voc_eval_batches(cfg, sess.normalize, voc_dataset,
                                      voc_set),
                )
            else:
                acc1, acc5, loss = evaluate(
                    sess.eval_step, state, _val_loader(sess),
                    normalize_fn=sess.normalize,
                    expected_samples=len(sess.val_ds),
                )
            for name, val in (("acc1", acc1), ("acc5", acc5), ("loss", loss)):
                f.write(f"{split}/{name} {val} custom_x_axis {sparsity}\n")
            rows.append((acc1, sparsity))
            print(f"{ckpt}: sparsity {sparsity:.2f}% acc1 {acc1:.3f}")
    if rows and rank0:
        MetricsWriter.export_performance_txt(
            os.path.join(cfg.output_dir, "performance.txt"), rows
        )
    return rows
