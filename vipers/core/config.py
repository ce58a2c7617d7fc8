"""Single dataclass config replacing the reference's per-script argparse
duplication (`/root/reference/train.py:716-871` and four near-copies; see
SURVEY §5 'Config / flag system').  All hard-coded cluster paths from the
reference (`/scratch/...`, `/home/cassano/...`) are parameters here.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional

from vipers.train.optim import OptimConfig


@dataclasses.dataclass
class TrainConfig:
    # model/data
    model: str = "resnet18"
    data_path: str = "/data/imagenet"
    num_classes: int = 1000
    train_crop_size: int = 224
    val_resize_size: int = 256
    val_crop_size: int = 224
    batch_size: int = 32
    workers: int = 16
    # pruning
    pruning_method: str = "snip"  # snip | magnitude
    target_sparsity: float = 0.9  # SNIP
    pruning_rate: float = 0.2  # magnitude per-iteration
    pruning_threshold: float = 95.0  # magnitude stop (% sparsity)
    starting_pruning_iteration: int = 0
    # optimization
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    # augmentation
    auto_augment: str = ""  # ra | ta_wide | augmix | imagenet
    ra_magnitude: int = 9  # RandAugment magnitude (`train.py:753`)
    augmix_severity: int = 3  # AugMix severity (`train.py:754`)
    interpolation: str = "bilinear"  # resize mode (`train.py:807`)
    mixup_alpha: float = 0.0
    cutmix_alpha: float = 0.0
    random_erase: float = 0.0
    # repeated-augmentation sampling (`/root/reference/train.py:228-236`)
    ra_sampler: bool = False
    ra_reps: int = 3
    # dataset listing cache dir (`/root/reference/train.py:144-150`)
    cache_dataset: str = ""
    # ResNet dilation for evaluation sweeps
    # (`/root/reference/evaluate_models.py:373-379`)
    resnet_dilate: int = 1
    # evaluate on VOC instead of an ImageFolder val split
    # (`/root/reference/evaluate_models.py:207-228`)
    eval_dataset: str = "imagenet"  # imagenet | voc
    # EMA
    model_ema: bool = False
    model_ema_steps: int = 32
    model_ema_decay: float = 0.99998
    # runtime
    seed: int = 42
    amp: bool = False  # bf16 compute on TPU
    # pipeline parallelism: number of GPipe stages for the ViT train step
    # (vipers/parallel/pp.py); 0 = off. TPU addition beyond the reference's
    # DP-only taxonomy (SURVEY §2.2).
    pipeline_parallel: int = 0
    pp_microbatch: int = 0  # 0 = largest divisor of batch <= batch // stages
    pp_remat: bool = False  # recompute blocks in backward (activation memory)
    pp_data: int = 0  # data-parallel degree combined with PP ((data, pipe) mesh)
    # in-process multi-device training over a (data, model) mesh:
    # --data-parallel shards batches over every local device;
    # --model-parallel k additionally tensor-parallels ViT params k-way
    data_parallel: bool = False
    model_parallel: int = 1
    native_decode: bool = False  # C++ libjpeg fast path (csrc/decode.cc)
    profile_dir: str = ""  # jax.profiler device trace of the (first) training run
    debug_nans: bool = False  # jax debug_nans sanitizer
    print_freq: int = 100
    output_dir: str = "./output"
    resume: str = ""
    # manual epoch override (`train.py:804` --start-epoch); -1 = from resume
    start_epoch: int = -1
    test_only: bool = False
    # logging
    metrics_path: Optional[str] = None


def add_train_args(p: argparse.ArgumentParser):
    p.add_argument("--model", default="resnet18")
    p.add_argument("--data-path", default="/data/imagenet")
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--workers", type=int, default=16)
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--pruning-method", default="snip", choices=["snip", "magnitude"])
    p.add_argument("--target-sparsity", type=float, default=0.9)
    p.add_argument("--pruning-rate", type=float, default=0.2)
    p.add_argument("--pruning-threshold", type=float, default=95.0)
    p.add_argument("--starting-pruning-iteration", type=int, default=0)
    p.add_argument("--opt", default="sgd")
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", "--wd", type=float, default=1e-4,
                   dest="weight_decay")
    p.add_argument("--norm-weight-decay", type=float, default=None)
    p.add_argument("--bias-weight-decay", type=float, default=None)
    p.add_argument("--transformer-embedding-decay", type=float, default=None)
    p.add_argument("--label-smoothing", type=float, default=0.0)
    p.add_argument("--clip-grad-norm", type=float, default=None)
    p.add_argument("--lr-scheduler", default="steplr")
    p.add_argument("--lr-step-size", type=int, default=30)
    p.add_argument("--lr-gamma", type=float, default=0.1)
    p.add_argument("--lr-min", type=float, default=0.0)
    p.add_argument("--lr-warmup-epochs", type=int, default=0)
    p.add_argument("--lr-warmup-method", default="constant")
    p.add_argument("--lr-warmup-decay", type=float, default=0.01)
    p.add_argument("--auto-augment", default="",
                   help="ra | ta_wide | augmix | imagenet (presets.py:30-48)")
    p.add_argument("--ra-magnitude", type=int, default=9,
                   help="RandAugment magnitude (train.py:753)")
    p.add_argument("--augmix-severity", type=int, default=3,
                   help="AugMix severity (train.py:754)")
    p.add_argument("--interpolation", default="bilinear",
                   choices=["nearest", "bilinear", "bicubic", "lanczos",
                            "hamming", "box"],
                   help="PIL resize mode for train/eval presets; the C++ "
                        "--native-decode fast path is bilinear-only and "
                        "falls back to PIL for other modes")
    p.add_argument("--mixup-alpha", type=float, default=0.0)
    p.add_argument("--cutmix-alpha", type=float, default=0.0)
    p.add_argument("--random-erase", type=float, default=0.0)
    p.add_argument("--ra-sampler", action="store_true",
                   help="repeated-augmentation sampling (sampler.py:7-62)")
    p.add_argument("--ra-reps", type=int, default=3,
                   help="repetitions per sample for --ra-sampler")
    p.add_argument("--cache-dataset", default="",
                   help="dir for the sha1-keyed file-listing cache "
                        "(train.py:144-150)")
    p.add_argument("--resnet-dilate", type=int, default=1, choices=[1, 2, 4],
                   help="replace_stride_with_dilation for evaluation sweeps")
    p.add_argument("--eval-dataset", default="imagenet",
                   choices=["imagenet", "voc"],
                   help="evaluate sweep on ImageFolder val or VOC"
                        " (evaluate_models.py:207-228)")
    p.add_argument("--model-ema", action="store_true")
    p.add_argument("--model-ema-steps", type=int, default=32)
    p.add_argument("--model-ema-decay", type=float, default=0.99998)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--amp", action="store_true", help="bf16 compute")
    p.add_argument("--pipeline-parallel", type=int, default=0,
                   help="GPipe pipeline stages for ViT training over a "
                        "(pipe,) device mesh (0 = off); encoder layers "
                        "must divide evenly into stages")
    p.add_argument("--pp-microbatch", type=int, default=0,
                   help="microbatch size for --pipeline-parallel "
                        "(0 = largest divisor of batch <= batch // stages)")
    p.add_argument("--pp-remat", action="store_true",
                   help="rematerialize encoder blocks in the pipelined "
                        "backward (trade recompute FLOPs for activation "
                        "memory)")
    p.add_argument("--pp-data", type=int, default=0,
                   help="combine --pipeline-parallel with D-way data "
                        "parallelism over a (data, pipe) mesh (needs "
                        "D * stages devices; each data column runs its own "
                        "pipeline on its batch slice)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard train/eval batches over ALL local devices "
                        "of a (data, model) mesh (in-process DP; multi-host "
                        "DP comes from the distributed launcher)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="tensor-parallel degree for ViT params over the "
                        "mesh's model axis (Megatron-style column/row "
                        "split, parallel/mesh.py:vit_param_sharding)")
    p.add_argument("--native-decode", action="store_true",
                   help="C++ libjpeg decode fast path (approximate resize)")
    p.add_argument("--profile-dir", default="",
                   help="capture a jax.profiler device trace of the training run")
    p.add_argument("--debug-nans", action="store_true",
                   help="fail fast on NaNs anywhere under jit")
    p.add_argument("--print-freq", type=int, default=100)
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--resume", default="")
    p.add_argument("--start-epoch", type=int, default=-1,
                   help="override the resume epoch (train.py:804); "
                        "-1 = take it from the checkpoint")
    p.add_argument("--test-only", action="store_true")
    p.add_argument("--train-crop-size", type=int, default=224)
    p.add_argument("--val-resize-size", type=int, default=256)
    p.add_argument("--val-crop-size", type=int, default=224)
    return p


def config_from_args(args: argparse.Namespace) -> TrainConfig:
    optim = OptimConfig(
        opt=args.opt, lr=args.lr, momentum=args.momentum,
        weight_decay=args.weight_decay, norm_weight_decay=args.norm_weight_decay,
        bias_weight_decay=args.bias_weight_decay,
        transformer_embedding_decay=args.transformer_embedding_decay,
        label_smoothing=args.label_smoothing, clip_grad_norm=args.clip_grad_norm,
        lr_scheduler=args.lr_scheduler, lr_step_size=args.lr_step_size,
        lr_gamma=args.lr_gamma, lr_min=args.lr_min,
        lr_warmup_epochs=args.lr_warmup_epochs,
        lr_warmup_method=args.lr_warmup_method,
        lr_warmup_decay=args.lr_warmup_decay, epochs=args.epochs,
    )
    return TrainConfig(
        model=args.model, data_path=args.data_path, num_classes=args.num_classes,
        train_crop_size=args.train_crop_size, val_resize_size=args.val_resize_size,
        val_crop_size=args.val_crop_size, batch_size=args.batch_size,
        workers=args.workers, pruning_method=args.pruning_method,
        target_sparsity=args.target_sparsity, pruning_rate=args.pruning_rate,
        pruning_threshold=args.pruning_threshold,
        starting_pruning_iteration=args.starting_pruning_iteration,
        optim=optim, auto_augment=getattr(args, "auto_augment", ""),
        ra_magnitude=getattr(args, "ra_magnitude", 9),
        augmix_severity=getattr(args, "augmix_severity", 3),
        interpolation=getattr(args, "interpolation", "bilinear"),
        mixup_alpha=args.mixup_alpha, cutmix_alpha=args.cutmix_alpha,
        random_erase=args.random_erase,
        ra_sampler=getattr(args, "ra_sampler", False),
        ra_reps=getattr(args, "ra_reps", 3),
        cache_dataset=getattr(args, "cache_dataset", ""),
        resnet_dilate=getattr(args, "resnet_dilate", 1),
        eval_dataset=getattr(args, "eval_dataset", "imagenet"),
        model_ema=args.model_ema,
        model_ema_steps=args.model_ema_steps, model_ema_decay=args.model_ema_decay,
        seed=args.seed, amp=args.amp,
        pipeline_parallel=getattr(args, "pipeline_parallel", 0),
        pp_microbatch=getattr(args, "pp_microbatch", 0),
        pp_remat=getattr(args, "pp_remat", False),
        pp_data=getattr(args, "pp_data", 0),
        data_parallel=getattr(args, "data_parallel", False),
        model_parallel=getattr(args, "model_parallel", 1),
        native_decode=getattr(args, "native_decode", False),
        profile_dir=getattr(args, "profile_dir", ""),
        debug_nans=getattr(args, "debug_nans", False),
        print_freq=args.print_freq,
        output_dir=args.output_dir, resume=args.resume,
        start_epoch=getattr(args, "start_epoch", -1),
        test_only=args.test_only,
    )
