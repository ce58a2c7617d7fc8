"""Profile the SHIPPED LOST pipeline: forward vs scramble vs LOST-core
split, f32 vs bf16, across batch sizes.

Run on the real TPU:  python tools/profile_lost.py [--profile-dir DIR]

Measures `vipers.discovery.driver.LostFeatureExtractor.make_batched_pipeline`
— the same program `vipers lost` and `bench.py` run. Pass --profile-dir to
additionally capture a jax.profiler device trace of one timed window
(open with XProf/TensorBoard).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

from vipers.core.registry import build_model
from vipers.discovery.driver import LostFeatureExtractor
from vipers.models.vit import scrambled_qkv_gather
from vipers.pruning import init_masks, magnitude_prune

from vipers.core.flops import V5E_BF16_PEAK, vit_forward_flops_per_image

H, W, PATCH = 512, 384, 16
GH, GW = H // PATCH, W // PATCH


def flops_per_image(spec) -> float:
    """Analytic forward FLOPs/image for the MFU readout — one shared
    definition with bench.py (vipers/core/flops.py)."""
    return vit_forward_flops_per_image(
        d=spec.extra.get("hidden_dim", 384),
        layers=spec.extra.get("num_layers", 12),
        grid_tokens=GH * GW, patch=PATCH,
    )


def bench(f, *args, iters=6):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile-dir", default="")
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
    args = ap.parse_args()

    spec = build_model("vit_s_16", num_classes=1000, image_size=(H, W))
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32), train=False
    )
    masks = magnitude_prune(
        variables["params"],
        init_masks(variables["params"], exclude=spec.prune_exclude),
        amount=0.5,
    )

    for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
        ex = LostFeatureExtractor(
            spec, variables, masks, arch="vit", which_features="k",
            compute_dtype=dtype,
        )
        pipe = ex.make_batched_pipeline(k_patches=100)
        cdt = ex.compute_dtype

        @jax.jit
        def fwd_only(variables, images, pos):
            from vipers.discovery.driver import _seq_pad

            _, aux = spec.module.apply(
                variables, images.astype(cdt), train=False,
                override_pos_embedding=pos.astype(cdt),
                token_mask=None, need_attn=False,
                # mirror the shipped pipeline's one-shot token padding so
                # the fwd/scramble/lost_core split measures the same program
                seq_pad_multiple=_seq_pad(images.shape, PATCH, False),
            )
            return aux["qkv_input"]

        @jax.jit
        def fwd_feats(variables, images, pos):
            x = fwd_only.__wrapped__(variables, images, pos)
            t1 = jnp.asarray(1 + GH * GW)
            return jax.vmap(
                lambda xi: scrambled_qkv_gather(xi, t1, "k")[1:]
            )(x)

        for b in args.batches:
            imgs = list(
                np.random.default_rng(1).normal(size=(b, H, W, 3)).astype(np.float32)
            )
            inputs = ex.prepare_batch(imgs, PATCH)
            t_full = bench(pipe, ex.variables, *inputs)
            t_fwd = bench(fwd_only, ex.variables, inputs[0], inputs[1])
            t_feat = bench(fwd_feats, ex.variables, inputs[0], inputs[1])
            tput = b / t_full * 1e3
            mfu = flops_per_image(spec) * tput / V5E_BF16_PEAK
            print(
                f"{tag} B={b}: full {t_full:.2f} ms ({tput:.1f} img/s)"
                f" | fwd {t_fwd:.2f} ms | +scramble {t_feat:.2f} ms"
                f" | lost_core {t_full - t_feat:.2f} ms"
                f" | MFU {mfu * 100:.1f}% of v5e bf16 peak"
            )
            if args.profile_dir and tag == "bf16" and b == args.batches[-1]:
                with jax.profiler.trace(args.profile_dir):
                    jax.block_until_ready(pipe(ex.variables, *inputs))
                print(f"device trace -> {args.profile_dir}")


if __name__ == "__main__":
    main()
