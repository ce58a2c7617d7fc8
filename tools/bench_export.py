"""A/B: exported StableHLO artifact replay vs the direct jitted program.

The serving claim behind `vipers export` (core/export.py) is that the
artifact IS the program — same lowered StableHLO, so replay through
``jax.export.deserialize(...).call`` should match the in-process jitted
throughput. This measures both sides on the real chip for the two
exported surfaces:

  * classify: pruned ViT-S/16 bf16 forward at 224px (the `evaluate` path)
  * lost:     the batched LOST program at the canonical VOC shape
              (512x384 -> 769 tokens), boxes/seeds out (the `lost` path)
  * lost_cnn: the round-4 batched CNN LOST program (resnet50 bottom
              features, masked slab LayerNorm, vmapped lost_core) at its
              canonical bucket shape — the round-5 CNN export surface

Usage: python tools/bench_export.py [--batch 128]
       [--pipelines classify lost lost_cnn]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--pipelines", nargs="+",
                    default=["classify", "lost", "lost_cnn"],
                    choices=["classify", "lost", "lost_cnn"])
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vipers.core.export import (export_lost_pipeline, export_serving,
                                    load_artifact, make_lost_serving_forward,
                                    make_serving_forward, save_artifact)
    from vipers.core.registry import build_model
    from vipers.pruning import init_masks, magnitude_prune

    cache = __import__("bench")  # repo-root bench.py: shared cache setup
    cache._enable_compilation_cache()

    b = args.batch

    def time_fn(fn, x, n_imgs):
        jax.block_until_ready(fn(x))  # compile/warm
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn(x)
            jax.block_until_ready(out)
            best = max(best, n_imgs * args.reps / (time.perf_counter() - t0))
        return best

    import tempfile

    from vipers.core.export import make_cnn_lost_serving_forward

    for pipeline in args.pipelines:
        hw = (224, 224) if pipeline == "classify" else (512, 384)
        if pipeline == "lost_cnn":
            # (512, 384) is stride-aligned for resnet (ceil(px/32)), so it
            # is its own canonical bucket input — zero extra pad
            spec = build_model("resnet50", num_classes=1000)
        else:
            spec = build_model("vit_s_16", num_classes=1000, image_size=hw)
        variables = spec.module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=False)
        masks = magnitude_prune(
            variables["params"],
            init_masks(variables["params"], exclude=spec.prune_exclude),
            amount=0.5,
        )
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(b, *hw, 3)), jnp.float32)

        if pipeline == "classify":
            direct = jax.jit(make_serving_forward(
                spec, variables, masks=masks, dtype=jnp.bfloat16))
            blob, meta = export_serving(
                spec, variables, batch_size=b, masks=masks,
                dtype=jnp.bfloat16)
        elif pipeline == "lost_cnn":
            direct = jax.jit(make_cnn_lost_serving_forward(
                spec, variables, masks=masks, dtype=jnp.bfloat16,
                batch_size=b, image_size=hw))
            blob, meta = export_lost_pipeline(
                spec, variables, batch_size=b, image_size=hw, masks=masks,
                dtype=jnp.bfloat16)
        else:
            direct = jax.jit(make_lost_serving_forward(
                spec, variables, masks=masks, dtype=jnp.bfloat16,
                batch_size=b, image_size=hw))
            blob, meta = export_lost_pipeline(
                spec, variables, batch_size=b, image_size=hw, masks=masks,
                dtype=jnp.bfloat16)

        with tempfile.TemporaryDirectory() as td:
            save_artifact(td, blob, meta)
            replay, _ = load_artifact(td)
            d = time_fn(direct, x, b)
            r = time_fn(replay, x, b)
        print(f"{pipeline}: direct jit {d:7.1f} img/s | artifact replay "
              f"{r:7.1f} img/s ({100 * r / d:5.1f}%) | "
              f"{len(blob) / 1e6:.1f} MB artifact", flush=True)


if __name__ == "__main__":
    main()
