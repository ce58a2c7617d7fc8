"""A/B the structured-slimming payoff on the shipped LOST pipeline.

Same program as bench.py (LostFeatureExtractor.make_batched_pipeline,
ViT-S/16 at 512x384, B=128, bf16) measured twice: the 50%-magnitude-masked
dense model vs `vipers slim --mlp-keep 0.5 --heads-keep 0.5 --round-to 128`
of that same checkpoint (mlp 1536->768, heads 6->4). Unstructured masks
never speed up the MXU — this prints what physically smaller matmuls buy.
(bench.py's nightly line carries the bf16 pair; this tool adds f32.)

Run ON the TPU (not under the test env's CPU pin):
    python tools/bench_slim.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: shapes + timing helper)

H, W = bench.H, bench.W


def main():
    bench._enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vipers.core.registry import build_model
    from vipers.pruning import init_masks, magnitude_prune
    from vipers.pruning.structured import slim_vit

    spec = build_model("vit_s_16", num_classes=1000, image_size=(H, W))
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32),
        train=False,
    )
    masks = magnitude_prune(
        variables["params"],
        init_masks(variables["params"], exclude=spec.prune_exclude),
        amount=bench.SPARSITY,
    )
    slim_vars, slim_masks, overrides, report = slim_vit(
        variables, masks, spec.module.cfg,
        mlp_keep=0.5, heads_keep=0.5, round_to=128,
    )
    slim_spec = build_model(
        "vit_s_16", num_classes=1000, image_size=(H, W),
        arch_overrides=overrides,
    )
    imgs_np = np.random.default_rng(1).normal(
        size=(bench.BATCH, H, W, 3)).astype(np.float32)

    out = {"overrides": overrides,
           "param_reduction_pct": round(100 * report.param_reduction, 1)}
    for tag, dtype in (("bf16", jnp.bfloat16), ("f32", None)):
        dense, _e, _p = bench.measure_pipeline_throughput(
            spec, variables, masks, imgs_np, dtype)
        slim, _e, _p = bench.measure_pipeline_throughput(
            slim_spec, slim_vars, slim_masks, imgs_np, dtype)
        out[tag] = {"dense_masked": round(dense, 1), "slim": round(slim, 1),
                    "speedup": round(slim / dense, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
