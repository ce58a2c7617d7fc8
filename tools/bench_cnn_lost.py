"""CNN-LOST compile economics: exact shapes vs feature-grid bucketing.

The reference runs CNN LOST at native resolution (`main_lost.py:570-600`),
which on an XLA backend means ONE COMPILE PER UNIQUE IMAGE SHAPE.  VOC07
trainval has hundreds of distinct shapes; at ~10-20 s/compile on a
tunneled v5e that regime is compile-bound.  `--cnn-bucket` (default 4)
pads the input so the conv feature grid lands on a bucket multiple: the
compile count collapses to the number of BUCKETS.

Run:  python tools/bench_cnn_lost.py [--n 24] [--model resnet50_bottom]

Prints, for the same synthetic shape sample drawn from the real VOC07
aspect-ratio/size distribution: unique compile signatures, wall-clock, and
per-image steady-state time for both regimes.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import numpy as np

# Representative VOC07 image sizes (the dataset caps the long side at 500
# and keeps native aspect ratios; these are the most common trainval
# shapes plus a tail of odd ones — the point is MANY DISTINCT shapes).
VOC_SHAPES = [
    (375, 500), (333, 500), (500, 375), (500, 333), (369, 500), (480, 364),
    (364, 480), (330, 500), (500, 332), (375, 499), (335, 500), (345, 500),
    (500, 338), (281, 500), (500, 281), (374, 500), (500, 374), (339, 500),
    (358, 500), (500, 358), (400, 500), (500, 400), (336, 500), (353, 500),
    (500, 353), (313, 500), (500, 313), (366, 500), (500, 366), (321, 500),
    (480, 360), (360, 480), (486, 500), (500, 486), (324, 500), (500, 324),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50_bottom")
    ap.add_argument("--arch", default="resnet")
    ap.add_argument("--n", type=int, default=24,
                    help="number of distinct shapes to run (<= %d)"
                         % len(VOC_SHAPES))
    ap.add_argument("--bucket", type=int, default=4)
    ap.add_argument("--regimes", nargs="+",
                    default=["batched", "bucket", "exact"],
                    choices=["batched", "bucket", "exact"])
    ap.add_argument("--batch", type=int, default=8,
                    help="images per program in the batched regime")
    args = ap.parse_args()

    import jax.numpy as jnp

    from vipers.core.registry import build_model
    from vipers.discovery.driver import LostFeatureExtractor
    from vipers.discovery.lost import lost

    shapes = VOC_SHAPES[: args.n]
    rng = np.random.default_rng(0)
    imgs = [rng.normal(size=(h, w, 3)).astype(np.float32) for h, w in shapes]

    spec = build_model(args.model, input_size=(224, 224))
    # jit the init: EAGER flax init through a tunneled chip is minutes of
    # per-op round trips (measured 105 s for resnet50)
    variables = jax.jit(
        lambda r, x: spec.module.init(r, x, train=False)
    )(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))

    for regime in args.regimes:
        if regime == "batched":
            # the shipped product path (run_lost use_batched_cnn): one
            # program per (canonical bucket, batch) — whole batches of
            # same-bucket images through conv features + vmapped LOST
            ex = LostFeatureExtractor(
                spec, variables, arch=args.arch, which_features="k",
                compute_dtype=jnp.bfloat16, cnn_bucket=args.bucket,
            )
            pipe = ex.make_batched_cnn_pipeline(k_patches=100)
            groups: dict = {}
            for img in imgs:
                groups.setdefault(
                    ex.cnn_bucket_key(*img.shape[:2]), []).append(img)
            batches = []
            for key, members in groups.items():
                mem = (members * ((args.batch // len(members)) + 1))[
                    : args.batch]
                batches.append(ex.prepare_cnn_batch(mem, key))
            t0 = time.perf_counter()
            for b in batches:
                jax.device_get(pipe(ex.variables, *b))
            cold = time.perf_counter() - t0
            # device_get, not block_until_ready: the tunneled platform's
            # block_until_ready returns before remote execution finishes
            # (measured 0.1 ms/img phantom vs 1.9 ms/img real)
            reps = 4
            t0 = time.perf_counter()
            for _ in range(reps):
                outs = [pipe(ex.variables, *b) for b in batches]
            jax.device_get(outs)
            warm = time.perf_counter() - t0
            n = args.batch * len(batches) * reps
            print(
                f"batched: {len(groups)} buckets x B={args.batch} -> "
                f"{len(batches)} compile signatures | cold {cold:6.1f}s | "
                f"warm {1000 * warm / n:6.1f} ms/img "
                f"({n / warm:6.1f} img/s)",
                flush=True,
            )
            continue
        cb = args.bucket if regime == "bucket" else 1
        ex = LostFeatureExtractor(
            spec, variables, arch=args.arch, which_features="k",
            compute_dtype=jnp.bfloat16, cnn_bucket=cb,
        )
        sigs = set()
        t0 = time.perf_counter()
        for i, img in enumerate(imgs):
            if cb > 1:  # one signature per canonical bucket input
                fh = ex._cnn_fdim(img.shape[0])
                fw = ex._cnn_fdim(img.shape[1])
                sig = (ex._cnn_canon_input(-(-fh // cb) * cb),
                       ex._cnn_canon_input(-(-fw // cb) * cb))
            else:  # one XLA compile per unique native shape
                sig = img.shape[:2]
            new = sig not in sigs
            sigs.add(sig)
            feats, dims, vdims, scales, _ = ex.extract(img, 16)
            lost(feats, dims, scales, (3, *img.shape[:2]),
                 valid_dims=vdims)
            print(f"  [{regime}] {i + 1}/{len(imgs)} "
                  f"{img.shape[:2]} -> input sig {sig} grid "
                  f"{tuple(map(int, dims))} valid {tuple(map(int, vdims))}"
                  f"{' (new signature)' if new else ''} "
                  f"t={time.perf_counter() - t0:.0f}s", flush=True)
        cold = time.perf_counter() - t0
        # steady state: every shape already compiled
        t0 = time.perf_counter()
        for img in imgs:
            feats, dims, vdims, scales, _ = ex.extract(img, 16)
            lost(feats, dims, scales, (3, *img.shape[:2]),
                 valid_dims=vdims)
        warm = time.perf_counter() - t0
        print(
            f"{regime:6s}: {len(shapes)} shapes -> {len(sigs)} compile "
            f"signatures | cold sweep {cold:6.1f}s "
            f"({cold / len(shapes):5.2f} s/img) | warm sweep {warm:6.1f}s "
            f"({1000 * warm / len(shapes):6.1f} ms/img)",
            flush=True,
        )


if __name__ == "__main__":
    main()
