"""Unified CLI: one parser, subcommands for every pipeline stage.

Replaces the reference's eight separate argparse entry points
(train.py, evaluate_models.py, main_lost.py, main_corloc_evaluation.py,
explain.py, explainations_evaluation_metrics.py, train_quantization.py,
cluster_for_OD.py) with::

    python -m vipers.cli.main <subcommand> --flags
"""

from __future__ import annotations

import argparse
import os
import sys


def _enable_compilation_cache():
    """Persist XLA compiles across CLI invocations. On a (tunneled) TPU a
    cold ViT compile costs 20-40 s and a LOST run touches several bucket
    shapes — without a persistent cache every invocation repays all of it.
    Default ~/.cache/vipers/jax; override with VIPERS_JAX_CACHE, disable
    with VIPERS_JAX_CACHE=0."""
    cache = os.environ.get(
        "VIPERS_JAX_CACHE", os.path.expanduser("~/.cache/vipers/jax")
    )
    if not cache or cache == "0":
        return
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # persist EVERYTHING: on this class of host even trivial-op
        # compiles cost ~0.4 s, and a cold LOST run dispatches dozens
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"warning: compilation cache disabled ({e})")


def main(argv=None):
    p = argparse.ArgumentParser("vipers", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    from vipers.core.config import add_train_args

    add_train_args(sub.add_parser("train", help="prune + fine-tune a classifier"))
    ev = sub.add_parser("evaluate", help="sweep checkpoints, eval top-1/5")
    add_train_args(ev)
    ev.add_argument("--models-path", default="",
                    help="dir holding the checkpoint sweep to glob "
                         "(evaluate_models.py --models-path); defaults to "
                         "--output-dir")
    ev.add_argument("--dataset", default="VOC07",
                    choices=["VOC07", "VOC12"],
                    help="detection dataset for --eval-dataset voc (VOC "
                         "only: classification labels come from the VOC "
                         "class names; COCO GT carries bare category ids)")
    ev.add_argument("--set", default="trainval", dest="voc_set",
                    help="detection split for --eval-dataset voc")

    lost = sub.add_parser("lost", help="LOST object discovery + CorLoc")
    lost.add_argument("--model", default="vit_s_16")
    lost.add_argument("--arch", default="vit",
                      help="feature family: vit|dino|swin|resnet|vgg16")
    lost.add_argument("--dataset", default="VOC07", choices=["VOC07", "VOC12", "COCO20k"])
    lost.add_argument("--set", default="trainval")
    lost.add_argument("--data-path", required=False, default="/data")
    lost.add_argument("--checkpoint", default="")
    lost.add_argument("--patch-size", type=int, default=16)
    lost.add_argument("--which-features", default="k", choices=["k", "q", "v"])
    lost.add_argument("--k-patches", type=int, default=100)
    lost.add_argument("--dinoseg", action="store_true")
    lost.add_argument("--dinoseg-head", type=int, default=4)
    lost.add_argument("--dinoseg-reference-bugs", action="store_true",
                      help="bit-exact reference component selection incl. "
                           "its off-by-ones (object_discovery.py:162-171)")
    lost.add_argument("--no-hard", action="store_true")
    lost.add_argument("--coco-annotations", default=None,
                      help="COCO instances json (required for COCO20k)")
    lost.add_argument("--coco20k-list", default=None,
                      help="20k filename list (datasets.py:366-396)")
    lost.add_argument("--output-dir", default="./outputs")
    lost.add_argument("--iteration", type=int, default=0)
    lost.add_argument("--visualize", default=None, choices=[None, "fms", "seed_expansion", "pred"])
    lost.add_argument("--batch-size", type=int, default=8,
                      help="images per jitted LOST batch (per bucket shape)")
    lost.add_argument("--workers", type=int, default=8,
                      help="host decode/prefetch threads feeding the device")
    lost.add_argument("--host-normalize", action="store_true",
                      help="feed the batched pipelines host-normalized "
                           "float32 instead of the default uint8 fast feed "
                           "(native C decode + on-device normalization; "
                           "bit-equal, 4x less host traffic)")
    lost.add_argument("--image-path", default=None,
                      help="run LOST on ONE image instead of a dataset "
                           "(forces --no-evaluation, no preds.pkl; "
                           "main_lost.py:297-311)")
    lost.add_argument("--no-evaluation", action="store_true",
                      help="skip CorLoc scoring / results txt")
    lost.add_argument("--save-predictions", default=True,
                      type=lambda s: s.lower() not in ("false", "0", "no"),
                      help="write preds.pkl (default true)")
    lost.add_argument("--models-dir", default="",
                      help="root of the reference checkpoint sweep; with "
                           "--pruning-iteration, resolves the templated "
                           "filename (main_lost.py:344-356)")
    lost.add_argument("--pruning-iteration", type=int, default=None,
                      help="sweep iteration: picks the checkpoint under "
                           "--models-dir and stamps results_iteration_NN.txt")
    lost.add_argument("--resnet-dilate", type=int, default=1,
                      choices=[1, 2, 4],
                      help="dilated resnet feature map for the CNN path")
    lost.add_argument("--cnn-bucket", type=int, default=4,
                      help="CNN path: round the conv feature grid up to "
                           "this multiple (input zero-padded; one compile "
                           "per bucket instead of per unique image shape). "
                           "Boundary features deviate slightly from "
                           "native-resolution (docs/PERF.md A/B)")
    lost.add_argument("--exact-shapes", action="store_true",
                      help="CNN path: reference-parity regime — run every "
                           "image at its native resolution (exact features, "
                           "one compile per unique shape)")
    lost.add_argument("--swin-all-windows", action="store_true",
                      help="swin: run LOST on the FULL last-stage token "
                           "grid in image order (beyond-reference-correct; "
                           "default keeps the reference's first-window "
                           "regime, main_lost.py:501-566)")
    lost.add_argument("--strict", action="store_true",
                      help="crash on seed-in-background images like the "
                           "reference (`object_discovery.py:110-112`) instead "
                           "of collecting and reporting them at the end")
    lost.add_argument("--dtype", default="f32",
                      choices=["f32", "bf16", "int8"],
                      help="compute dtype for the feature forward (bf16 is "
                           "the bench headline; LOST thresholds are "
                           "parity-insensitive at box granularity; int8 "
                           "executes dense/conv as dynamic-quantized "
                           "integer matmuls, rest bf16 — a MEMORY option "
                           "on v5e, not a speed win: measured -12%% vs "
                           "bf16 at ViT-S/D=384, -4%% at ViT-B/D=768; the "
                           "QDQ gap shrinks with width but never crosses "
                           "at this family's scales, docs/PERF.md)")
    lost.add_argument("--data-parallel", action="store_true",
                      help="shard LOST batches over all devices of a "
                           "(data,) mesh")
    lost.add_argument("--sequence-parallel", action="store_true",
                      help="shard the TOKEN axis over all devices (for "
                           "batch-1 native-resolution images where data "
                           "parallelism has nothing to split); mutually "
                           "exclusive with --data-parallel")

    corloc = sub.add_parser("corloc", help="re-score saved predictions vs GT")
    corloc.add_argument("--preds", "--pred-file", dest="preds", required=True,
                        help="preds.pkl or detectron json (auto-detected; "
                             "reference --type-pred)")
    corloc.add_argument("--dataset", default="VOC07")
    corloc.add_argument("--set", default="trainval")
    corloc.add_argument("--data-path", default="/data")
    corloc.add_argument("--no-hard", action="store_true")
    corloc.add_argument("--coco-annotations", default=None)
    corloc.add_argument("--coco20k-list", default=None)

    expl = sub.add_parser("explain", help="attribution heatmaps per checkpoint")
    expl.add_argument("--model", default="resnet50")
    expl.add_argument("--checkpoint", default="")
    expl.add_argument("--data-path", default="/data/imagenet")
    expl.add_argument("--methods", nargs="+",
                      default=["gradcam", "guided_gradcam", "ig", "attention"],
                      help="any of: gradcam guided_gradcam ig attention lrp")
    expl.add_argument("--num-classes-sample", type=int, default=200)
    expl.add_argument("--output-dir", default="./explanations")
    expl.add_argument("--untrained", action="store_true",
                      help="random-init baseline model "
                           "(explain.py:108-116,167-189)")
    expl.add_argument("--seed", type=int, default=0,
                      help="init seed for --untrained; stamps the output dir")
    expl.add_argument("--models-path", default="",
                      help="sweep root for --pruning-iteration -1 "
                           "(explain.py:117-150)")
    expl.add_argument("--pruning-iteration", type=int, default=None,
                      help="-1 with --models-path: explain every templated "
                           "sweep checkpoint into per-iteration subdirs")

    ee = sub.add_parser("explain-eval", help="RMA/RRA scoring on VOC masks")
    ee.add_argument("--model", default="vit_b_32")
    ee.add_argument("--checkpoint", default="")
    ee.add_argument("--voc-root", default="/data/VOC2012")
    ee.add_argument("--num-images", type=int, default=101)
    ee.add_argument("--pooling", default="sum,abs")
    ee.add_argument("--iteration", type=int, default=0)
    ee.add_argument("--output-dir", default="./explanations_eval")

    eeb = sub.add_parser(
        "explain-eval-batch",
        help="directory-batch heatmap evaluation: all six poolings with "
             "summary-statistic tables + JSON "
             "(explainations_evaluation_metrics.py:307-373)",
    )
    eeb.add_argument("--heatmap-dir", required=True,
                     help="directory of <idx>.npy pooled/raw heatmaps")
    eeb.add_argument("--ground-truth-dir", required=True,
                     help="directory of <idx>.npy ground-truth masks")
    eeb.add_argument("--output-dir", default="./explanations_eval")
    eeb.add_argument("--output-name", default="",
                     help="prefix for the _ORDERED/_FIXED txt and "
                          "_datapoint/_statistic JSON artifacts")
    eeb.add_argument("--metric", default="rank", choices=["rank", "mass"])
    eeb.add_argument("--indices", nargs="*", default=None,
                     help="explicit datapoint indices (default: every "
                          "numeric .npy in --heatmap-dir)")
    eeb.add_argument("--num-images", type=int, default=0,
                     help="cap on auto-discovered indices (0 = all)")

    quant = sub.add_parser("quantize", help="int8 QAT / PTQ")
    from vipers.core.config import add_train_args as ata
    ata(quant)
    quant.add_argument("--mode", default="qat", choices=["qat", "ptq"])
    quant.add_argument("--post-training-quantize", action="store_const",
                       const="ptq", dest="mode",
                       help="alias for --mode ptq (train_quantization.py)")
    quant.add_argument("--calibration-batches", "--num-calibration-batches",
                       dest="calibration_batches", type=int, default=32)
    quant.add_argument("--num-observer-update-epochs", type=int, default=4,
                       help="epochs before freezing activation observers "
                            "(train_quantization.py:120-122)")
    quant.add_argument("--num-batch-norm-update-epochs", type=int, default=3,
                       help="epochs before freezing BN statistics "
                            "(train_quantization.py:123-125)")

    slim = sub.add_parser(
        "slim",
        help="structured slimming: physically remove MLP neurons / "
             "attention heads so sparsity becomes MXU throughput "
             "(pruning/structured.py; no reference counterpart)",
    )
    slim.add_argument("--model", required=True)
    slim.add_argument("--checkpoint", required=True,
                      help="orbax dir or imported .pth (masked weights ok)")
    slim.add_argument("--num-classes", type=int, default=1000)
    slim.add_argument("--mlp-keep", type=float, default=None,
                      help="ViT/Swin: fraction of MLP hidden neurons to keep")
    slim.add_argument("--heads-keep", type=float, default=None,
                      help="ViT: fraction of attention heads to keep")
    slim.add_argument("--conv-keep", type=float, default=None,
                      help="VGG: fraction of conv output channels to keep")
    slim.add_argument("--fc-keep", type=float, default=None,
                      help="VGG: fraction of fc1/fc2 hidden units to keep")
    slim.add_argument("--inner-keep", type=float, default=None,
                      help="ResNet: fraction of each block's residual-free "
                           "inner channels to keep")
    slim.add_argument("--round-to", type=int, default=128,
                      help="align slimmed widths to this lane multiple "
                           "(128 = TPU native; 1 disables)")
    slim.add_argument("--output-dir", default=".")

    exp = sub.add_parser(
        "export",
        help="compile a self-contained StableHLO serving artifact from a "
             "(pruned / slimmed / quantize-calibrated) checkpoint "
             "(core/export.py; the reference's release export is a bare "
             "state_dict, utils.py:323-391)",
    )
    exp.add_argument("--model", required=True)
    exp.add_argument("--checkpoint", default="",
                     help="orbax dir or .pth; masks baked in, .slim.json "
                          "sidecar picked up automatically")
    exp.add_argument("--num-classes", type=int, default=0,
                     help="head width when exporting without a checkpoint "
                          "(0 = registry default)")
    exp.add_argument("--batch-size", type=int, default=8,
                     help="static serving batch (one artifact per batch "
                          "shape, AOT-compile style)")
    exp.add_argument("--image-size", type=int, nargs=2, default=None,
                     metavar=("H", "W"))
    exp.add_argument("--dtype", default="bf16",
                     choices=["f32", "bf16", "int8"],
                     help="compute dtype; int8 = real integer Dense/Conv "
                          "with observer-calibrated or dynamic qparams")
    exp.add_argument("--platforms", nargs="+", default=None,
                     choices=["cpu", "tpu", "cuda", "rocm"],
                     help="lowering platforms (default: current backend); "
                          "pass several for one multi-platform artifact")
    exp.add_argument("--pipeline", default="classify",
                     choices=["classify", "lost"],
                     help="classify = logits forward; lost = the batched "
                          "LOST discovery program (boxes/seeds out) at a "
                          "fixed serving shape")
    exp.add_argument("--k-patches", type=int, default=100,
                     help="[lost] seed-expansion pool size")
    exp.add_argument("--which-features", default="k",
                     choices=["k", "q", "v"],
                     help="[lost] qkv feature modality")
    exp.add_argument("--resnet-dilate", type=int, default=1)
    exp.add_argument("--output-dir", required=True)
    exp.add_argument("--verify", action="store_true",
                     help="deserialize the artifact and check its output "
                          "against direct model apply")

    clus = sub.add_parser("cluster", help="k-means pseudo-labels for discovered boxes")
    clus.add_argument("--preds", "--pred-file", dest="preds", required=True)
    clus.add_argument("--nb-clusters", type=int, default=20)
    clus.add_argument("--data-path", default="/data")
    clus.add_argument("--dataset", default="VOC07")
    clus.add_argument("--set", default="trainval")
    clus.add_argument("--no-hard", action="store_true")
    clus.add_argument("--arch", default="dino_vit_small",
                      help="embedding backbone registry name "
                           "(cluster_for_OD.py --arch)")
    clus.add_argument("--patch-size", type=int, default=16)
    clus.add_argument("--random-seed", type=int, default=0,
                      help="k-means init seed (cluster_for_OD.py)")
    clus.add_argument("--feature-cache", default="",
                      help="pkl path caching the crop embeddings "
                           "(cluster_for_OD.py:120-140)")
    clus.add_argument("--checkpoint", default="",
                      help="pretrained DINO weights for crop embedding")
    clus.add_argument("--coco-annotations", default=None)
    clus.add_argument("--coco20k-list", default=None)

    mvh = sub.add_parser("mvh", help="model-vs-human distortion benchmarks")
    from vipers.core.config import add_train_args as _ata_mvh
    _ata_mvh(mvh)
    mvh.add_argument("--pruning-step", type=int, default=0)
    mvh.add_argument("--checkpoint", default="")
    mvh.add_argument("--stimuli-root", default=None,
                     help="dir with cue-conflict/edge/... stimulus ImageFolders")
    mvh.add_argument("--max-batches", type=int, default=0)

    plot = sub.add_parser("plot", help="sparsity-vs-metric curves / heatmap reports")
    plot.add_argument("--kind", default="lost",
                      choices=["lost", "mass_rank", "mvh", "mvh-compare",
                               "heatmaps"])
    plot.add_argument("--model", default="resnet50")
    plot.add_argument("--models", nargs="+", default=None,
                      help="[mvh-compare] models to overlay (e.g. resnet18 "
                           "resnet50 — mvh_performance_rn50_vs_rn18.py)")
    plot.add_argument("--benchmarks", nargs="+", default=None,
                      help="[mvh-compare] benchmark rows to overlay (e.g. "
                           "silhouette colour false-colour — "
                           "mvh_triple_comparison.py)")
    plot.add_argument("--max-prune", type=int, default=26,
                      help="[mvh-compare] pruning steps scanned "
                           "(reference scripts' max_prune)")
    plot.add_argument("--results-dir", default="./outputs")
    plot.add_argument("--performance-txt", default="performance.txt")
    plot.add_argument("--out", default="plot.png")
    plot.add_argument("--method", default="gradcam",
                      help="[heatmaps] attribution method subdir")
    plot.add_argument("--cls", default="",
                      help="[heatmaps] class subdir; empty = every class "
                           "found (explainations_heatmaps_gif_and_plot.py)")
    plot.add_argument("--gif", action="store_true",
                      help="[heatmaps] also write animated GIFs")

    args = p.parse_args(argv)

    # Multi-host rendezvous before any backend use (reference calls
    # init_distributed_mode first thing in every entry point,
    # `utils.py:245-269`); a no-op for single-process runs.
    from vipers.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    _enable_compilation_cache()

    if args.cmd == "train":
        from vipers.core.config import config_from_args
        from vipers.train.driver import run

        run(config_from_args(args))
        return 0
    if args.cmd == "evaluate":
        from vipers.core.config import config_from_args
        from vipers.train.evaluate_models import run_sweep

        rows = run_sweep(config_from_args(args),
                         models_path=getattr(args, "models_path", ""),
                         voc_dataset=getattr(args, "dataset", "VOC07"),
                         voc_set=getattr(args, "voc_set", "trainval"))
        for acc1, sparsity in rows:
            print(f"acc1 {acc1:.3f}\tsparsity {sparsity:.2f}")
        return 0  # rows land in the txt artifacts; a non-empty sweep is success
    if args.cmd == "lost":
        from vipers.discovery.driver import run_lost

        return run_lost(args)
    if args.cmd == "corloc":
        from vipers.discovery.corloc import run_corloc_cli

        return run_corloc_cli(args)
    if args.cmd == "explain":
        from vipers.explain.driver import run_explain

        return run_explain(args)
    if args.cmd == "explain-eval":
        from vipers.explain.driver import run_explain_eval

        return run_explain_eval(args)
    if args.cmd == "explain-eval-batch":
        from vipers.explain.driver import run_explain_eval_batch

        return run_explain_eval_batch(args)
    if args.cmd == "quantize":
        from vipers.train.quantize import run_quantize

        return run_quantize(args)
    if args.cmd == "slim":
        from vipers.pruning.structured import run_slim_cli

        return run_slim_cli(args)
    if args.cmd == "export":
        from vipers.core.export import run_export

        return run_export(args)
    if args.cmd == "cluster":
        from vipers.discovery.cluster import run_cluster_cli

        return run_cluster_cli(args)
    if args.cmd == "mvh":
        from vipers.train.mvh_cli import run_mvh_cli

        return run_mvh_cli(args)
    if args.cmd == "plot":
        from vipers.viz.plots import run_plot_cli

        return run_plot_cli(args)
    raise SystemExit(2)


if __name__ == "__main__":
    sys.exit(main())
