"""int8 vs bf16 on the shipped LOST pipeline, across model scale.

Round-3 verdict: at ViT-S (D=384) int8 serving LOSES to bf16 (854 vs
1335 img/s) because QDQ traffic dominates the small matmuls; show where
(whether) the crossover happens on v5e.  This measures the same shipped
`make_batched_pipeline` program as bench.py at ViT-S/16 and ViT-B/16
(D=768 — the reference's primary model, `train_quantization.py:26-28`
quantizes exactly this family), int8 (real integer matmuls, dynamic
activation qparams) vs bf16.

Run:  python tools/bench_int8.py [--models vit_s_16 vit_b_16] [--batch 64]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

H, W, PATCH = 512, 384, 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+",
                    default=["vit_s_16", "vit_b_16"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-batches", type=int, default=4)
    args = ap.parse_args()

    from vipers.core.registry import build_model
    from vipers.discovery.driver import LostFeatureExtractor
    from vipers.pruning import init_masks, magnitude_prune

    rng_np = np.random.default_rng(1)
    imgs = rng_np.normal(size=(args.batch, H, W, 3)).astype(np.float32)

    for model in args.models:
        spec = build_model(model, num_classes=1000, image_size=(H, W))
        variables = jax.jit(
            lambda r, x: spec.module.init(r, x, train=False)
        )(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
        masks = magnitude_prune(
            variables["params"],
            init_masks(variables["params"], exclude=spec.prune_exclude),
            amount=0.5,
        )
        for dtype, tag in ((jnp.bfloat16, "bf16"), ("int8", "int8")):
            ex = LostFeatureExtractor(
                spec, variables, masks, arch="vit", which_features="k",
                compute_dtype=dtype,
            )
            pipe = ex.make_batched_pipeline(k_patches=100)
            inputs = ex.prepare_batch(list(imgs), PATCH)
            t0 = time.perf_counter()
            jax.block_until_ready(pipe(ex.variables, *inputs))
            compile_s = time.perf_counter() - t0
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.n_batches):
                    out = pipe(ex.variables, *inputs)
                jax.block_until_ready(out)
                best = max(
                    best,
                    args.batch * args.n_batches / (time.perf_counter() - t0),
                )
            print(f"{model:10s} {tag:5s} B={args.batch}: {best:7.1f} img/s "
                  f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
