"""Training-step throughput: masked (pruned) ViT-S/16 classification step
at 224 px, f32 vs bf16 AMP, on the real chip.

Run:  python tools/bench_train.py [--batch 64 128] [--model vit_s_16]

Measures the SHIPPED `vipers.train.steps.make_train_step` program (masked
grads + optimizer update) — the same step `vipers train` runs per batch.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_s_16")
    ap.add_argument("--batch", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler device trace of one bf16 "
                         "step at the last batch size (trace_report.py reads it)")
    ap.add_argument("--dtypes", nargs="+", default=["f32", "bf16"],
                    choices=["f32", "bf16"])
    ap.add_argument("--slim", action="store_true",
                    help="structurally slim first (mlp 0.5, heads 0.5, "
                         "128-lane aligned) and measure the fine-tune step")
    args = ap.parse_args()

    from vipers.core.registry import build_model
    from vipers.pruning import init_masks, magnitude_prune
    from vipers.train.optim import OptimConfig, make_lr_schedule, make_optimizer
    from vipers.train.steps import TrainState, make_train_step

    import inspect

    from vipers.core.registry import get_model_builder

    hw = args.image_size
    size_kw = ("image_size" if "image_size" in inspect.signature(
        get_model_builder(args.model)).parameters else "input_size")
    spec = build_model(args.model, num_classes=1000, **{size_kw: (hw, hw)})
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3), jnp.float32),
        train=False,
    )
    masks = magnitude_prune(
        variables["params"],
        init_masks(variables["params"], exclude=spec.prune_exclude),
        amount=0.5,
    )
    if args.slim:
        from vipers.pruning import structured

        if spec.family == "resnet":
            variables, masks, overrides, report = structured.slim_resnet(
                variables, masks, inner_keep=0.5, round_to=128)
        elif spec.family == "swin":
            variables, masks, overrides, report = structured.slim_swin(
                variables, masks, spec.module.cfg,
                mlp_keep=0.5, round_to=128)
        else:
            variables, masks, overrides, report = structured.slim_vit(
                variables, masks, spec.module.cfg,
                mlp_keep=0.5, heads_keep=0.5, round_to=128)
        spec = build_model(args.model, num_classes=1000,
                           arch_overrides=overrides, **{size_kw: (hw, hw)})
        print(f"slim: -{100 * report.param_reduction:.1f}% params", flush=True)
    ocfg = OptimConfig(opt="sgd", lr=0.1, weight_decay=1e-4, epochs=10,
                       lr_scheduler="cosineannealinglr")
    schedule = make_lr_schedule(ocfg, steps_per_epoch=100)
    tx = make_optimizer(ocfg, variables["params"], schedule)

    def fresh_state():
        # the jitted step donates its input state buffers, so every state
        # must be built from COPIES of the pristine params/masks
        copy = lambda t: jax.tree.map(jnp.copy, t)
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=copy(variables["params"]),
            batch_stats=copy(variables.get("batch_stats")),
            masks=copy(masks), opt_state=tx.init(variables["params"]),
        )

    for amp in (False, True):
        tag = "bf16" if amp else "f32"
        if tag not in args.dtypes:
            continue
        step = make_train_step(
            spec.module.apply, tx, num_classes=1000,
            compute_dtype=jnp.bfloat16 if amp else jnp.float32,
        )
        rng = jax.random.PRNGKey(1)
        for b in args.batch:
            state = fresh_state()
            x = jnp.asarray(
                np.random.default_rng(0).normal(size=(b, hw, hw, 3)),
                jnp.float32,
            )
            y = jnp.zeros((b,), jnp.int32)
            # the step donates its input state; always chain forward
            t0 = time.perf_counter()
            s, _m = step(state, (x, y), rng)
            jax.block_until_ready(s.params)
            compile_s = time.perf_counter() - t0
            best = 0.0
            iters = 6
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    s, _m = step(s, (x, y), rng)
                jax.block_until_ready(s.params)
                best = max(best, b * iters / (time.perf_counter() - t0))
            print(f"{tag} B={b}: {best:.1f} img/s "
                  f"(compile {compile_s:.1f}s)", flush=True)
            if args.profile_dir and amp and b == args.batch[-1]:
                with jax.profiler.trace(args.profile_dir):
                    s, _m = step(s, (x, y), rng)
                    jax.block_until_ready(s.params)
                print(f"device trace -> {args.profile_dir}")


if __name__ == "__main__":
    main()
