"""Headline benchmark: pruned ViT-S/16 LOST inference, images/sec/chip.

BASELINE.md north star: >=5x images/sec/chip vs the PyTorch reference for
pruned ViT-S/16 LOST inference.  This bench measures the SHIPPED product
path (`vipers.discovery.driver.LostFeatureExtractor.make_batched_pipeline`,
the same jitted program `vipers lost` runs): masked ViT forward +
on-device qkv-scramble + LOST (affinity, scoring, expansion, connected
component, box) as ONE batched program at the canonical VOC shape
(512x384, patch 16 -> 769 tokens), in f32 and bf16.

The reference implementation cannot run here (no CUDA GPU), so the recorded
baseline is the reference's *pipeline shape* executed faithfully in torch on
this host: per-image batch-1 forward, the torch.save/torch.load /scratch
side channel (`/root/reference/vision_transformer.py:113-115`), host numpy
scoring and scipy connected components.  It is measured once and cached in
``bench_baseline.json``.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import json
import os
import sys
import time


def _enable_compilation_cache():
    """First TPU compile through the tunnel is ~minutes; persist it."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

H, W, PATCH = 512, 384, 16
GH, GW = H // PATCH, W // PATCH


def measure_pipeline_throughput(spec, variables, masks, imgs_np, dtype):
    """Best-of-3 img/s of the SHIPPED batched LOST pipeline for one model/
    dtype (warm-up compile excluded; best-of-3 rides out the tunneled
    chip's dispatch jitter). Shared by bench.py's dense/slim measurements
    and tools/bench_slim.py."""
    import jax

    from vipers.discovery.driver import LostFeatureExtractor

    ex = LostFeatureExtractor(
        spec, variables, masks, arch="vit", which_features="k",
        compute_dtype=dtype,
    )
    pipe = ex.make_batched_pipeline(k_patches=K_PATCHES)
    inputs = ex.prepare_batch(list(imgs_np), PATCH)
    jax.block_until_ready(pipe(ex.variables, *inputs))  # compile+warm
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N_BATCHES):
            out = pipe(ex.variables, *inputs)
        jax.block_until_ready(out)
        best = max(best, (BATCH * N_BATCHES) / (time.perf_counter() - t0))
    return best, ex, pipe
# Best measured throughput point after the round-3 head-major einsum
# projections: throughput now scales with batch (B=32 983 < B=64 1017 <
# B=128 1068 ~ B=256 1074 img/s bf16 on v5e) — the fixed per-dispatch
# overhead amortizes; 128 is the knee.
BATCH = 128
N_BATCHES = 4
SPARSITY = 0.5
K_PATCHES = 100


def bench_tpu():
    """Benchmarks the SHIPPED `vipers.discovery` batched pipeline — the
    exact code `vipers lost` runs (LostFeatureExtractor.make_batched_pipeline:
    masked ViT forward + on-device qkv scramble + vmapped lost_core, only
    4-int boxes leaving the chip) — in f32 and bf16."""
    _enable_compilation_cache()
    import statistics

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vipers.core.registry import build_model
    from vipers.pruning import init_masks, magnitude_prune

    spec = build_model("vit_s_16", num_classes=1000, image_size=(H, W))
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = spec.module.init(rng, x0, train=False)
    masks = magnitude_prune(
        variables["params"],
        init_masks(variables["params"], exclude=spec.prune_exclude),
        amount=SPARSITY,
    )

    imgs_np = np.random.default_rng(1).normal(size=(BATCH, H, W, 3)).astype(
        np.float32
    )

    results = {}
    p50_ms = None
    for tag, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        results[tag], ex, pipe = measure_pipeline_throughput(
            spec, variables, masks, imgs_np, dtype
        )  # single-chip

        if tag == "bf16":
            # p50 single-image latency on the headline (bf16) path
            one, pos1, tm1, vhw1 = ex.prepare_batch([imgs_np[0]], PATCH)
            jax.block_until_ready(pipe(ex.variables, one, pos1, tm1, vhw1))
            lats = []
            for _ in range(20):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    pipe(ex.variables, one, pos1, tm1, vhw1)
                )
                lats.append(time.perf_counter() - t0)
            p50_ms = statistics.median(lats) * 1000.0

    # `vipers slim` payoff on the same shipped pipeline (bf16): structured
    # removal of half the MLP neurons + 2 of 6 heads, 128-lane aligned
    # (the full A/B incl. f32 lives in tools/bench_slim.py).
    from vipers.pruning.structured import slim_vit

    slim_vars, slim_masks, overrides, _rep = slim_vit(
        variables, masks, spec.module.cfg,
        mlp_keep=0.5, heads_keep=0.5, round_to=128,
    )
    slim_spec = build_model(
        "vit_s_16", num_classes=1000, image_size=(H, W),
        arch_overrides=overrides,
    )
    results["slim_bf16"], _ex, _pipe = measure_pipeline_throughput(
        slim_spec, slim_vars, slim_masks, imgs_np, jnp.bfloat16
    )
    return results, p50_ms


E2E_N_IMAGES = int(os.environ.get("VIPERS_BENCH_E2E_N", "512"))
E2E_IMG_HW = (375, 500)  # typical VOC landscape -> the 512x384 bucket


def _e2e_jpeg_dir():
    """One-time synthetic JPEG corpus for the end-to-end bench: VOC07
    layout (JPEGImages + trainval.txt; `--no-evaluation` never opens
    Annotations) of photo-like images — smooth low-frequency content with
    an object square, so libjpeg work is realistic rather than
    noise-worst-case."""
    import numpy as np
    from PIL import Image

    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.join(here, ".bench_cache", "voc_e2e")
    marker = os.path.join(root, "ImageSets", "Main", "trainval.txt")
    if os.path.exists(marker):
        return root
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    rng = np.random.default_rng(0)
    h, w = E2E_IMG_HW
    names = []
    for i in range(E2E_N_IMAGES):
        small = rng.integers(0, 255, size=(24, 32, 3), dtype=np.uint8)
        img = np.asarray(
            Image.fromarray(small).resize((w, h), Image.BILINEAR))
        img = img.copy()
        y0, x0 = int(rng.integers(0, h - 120)), int(rng.integers(0, w - 160))
        img[y0:y0 + 120, x0:x0 + 160] = (230, 60, 40)
        name = f"e2e{i:05d}"
        names.append(name)
        Image.fromarray(img).save(
            os.path.join(root, "JPEGImages", name + ".jpg"), quality=90)
    with open(marker, "w") as f:
        f.write("\n".join(names))
    return root


def bench_e2e_lost():
    """TRUE end-to-end JPEG->boxes rate: the SHIPPED `vipers lost` driver
    (`discovery.driver.run_lost` — C decode threads + uint8 device feed +
    batched pipeline + double-buffered flush) over a JPEG directory, timed
    wall-clock including every host cost the reference's loop pays
    (`/root/reference/main_lost.py:383-450` decodes inside its loop).
    First call warms the compile caches; the second call is the measured
    one.  Round-4 verdict ask #1: the headline device-resident rate must
    ship next to the number a user actually gets from JPEGs on this host
    (1 core here — PERF.md sizes the cores-per-chip needed to feed the
    chip at the device rate)."""
    import argparse

    from vipers.discovery.driver import run_lost

    root = _e2e_jpeg_dir()
    args = argparse.Namespace(
        model="vit_s_16", arch="vit", dataset="VOC07", set="trainval",
        data_path=root, checkpoint="", patch_size=16, which_features="k",
        k_patches=K_PATCHES, dinoseg=False, dinoseg_head=4,
        dinoseg_reference_bugs=False, no_hard=False, coco_annotations=None,
        coco20k_list=None, output_dir=os.path.join(root, "out"),
        iteration=0, visualize=None, batch_size=BATCH,
        workers=max(os.cpu_count(), 2), image_path=None, no_evaluation=True,
        save_predictions=False, models_dir="", pruning_iteration=None,
        resnet_dilate=1, cnn_bucket=4, exact_shapes=False,
        swin_all_windows=False, dtype="bf16", strict=False,
        sequence_parallel=False, data_parallel=False, host_normalize=False,
    )
    run_lost(args)  # warm: compiles cached, page cache hot
    t0 = time.perf_counter()
    run_lost(args)
    dt = time.perf_counter() - t0
    return E2E_N_IMAGES / dt


TRAIN_HW = 224
TRAIN_BATCH = 128


def bench_train_step():
    """bf16 B=128 pruned ViT-S/16 224px TRAIN step img/s — the SHIPPED
    `vipers.train.steps.make_train_step` program (masked grads + masked
    optimizer update), same as `vipers train` runs per batch and the same
    config tools/bench_train.py profiles.  Recorded in the bench JSON
    (round-4 ask) so the driver can see train-perf regressions."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vipers.core.registry import build_model
    from vipers.pruning import init_masks, magnitude_prune
    from vipers.train.optim import OptimConfig, make_lr_schedule, make_optimizer
    from vipers.train.steps import TrainState, make_train_step

    hw, b = TRAIN_HW, TRAIN_BATCH
    spec = build_model("vit_s_16", num_classes=1000, image_size=(hw, hw))
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3), jnp.float32),
        train=False,
    )
    masks = magnitude_prune(
        variables["params"],
        init_masks(variables["params"], exclude=spec.prune_exclude),
        amount=SPARSITY,
    )
    ocfg = OptimConfig(opt="sgd", lr=0.1, weight_decay=1e-4, epochs=10,
                       lr_scheduler="cosineannealinglr")
    tx = make_optimizer(ocfg, variables["params"],
                        make_lr_schedule(ocfg, steps_per_epoch=100))
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats"), masks=masks,
        opt_state=tx.init(variables["params"]),
    )
    step = make_train_step(spec.module.apply, tx, num_classes=1000,
                           compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(1)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, hw, hw, 3)), jnp.float32)
    y = jnp.zeros((b,), jnp.int32)
    s, _ = step(state, (x, y), rng)        # compile+warm (donates state)
    jax.block_until_ready(s.params)
    best, iters = 0.0, 6
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            s, _m = step(s, (x, y), rng)
        jax.block_until_ready(s.params)
        best = max(best, b * iters / (time.perf_counter() - t0))
    return best


def bench_torch_reference(n_images: int = 3) -> float:
    """The reference pipeline shape in torch on this host (see module doc)."""
    import numpy as np
    import scipy.ndimage
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    d_model, nheads, layers, mlp = 384, 6, 12, 1536
    T = GH * GW + 1

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(d_model, eps=1e-6)
            self.attn = nn.MultiheadAttention(d_model, nheads, batch_first=True)
            self.ln_2 = nn.LayerNorm(d_model, eps=1e-6)
            self.mlp = nn.Sequential(
                nn.Linear(d_model, mlp), nn.GELU(), nn.Linear(mlp, d_model)
            )

        def forward(self, x, dump_path):
            y = self.ln_1(x)
            torch.save(torch.concat((y, y, y)), dump_path)  # the side channel
            a, _w = self.attn(y, y, y, need_weights=True, average_attn_weights=False)
            x = x + a
            return x + self.mlp(self.ln_2(x))

    class RefViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Conv2d(3, d_model, PATCH, PATCH)
            self.cls = nn.Parameter(torch.zeros(1, 1, d_model))
            self.pos = nn.Parameter(torch.zeros(1, T, d_model))
            self.blocks = nn.ModuleList([Block() for _ in range(layers)])
            self.ln = nn.LayerNorm(d_model, eps=1e-6)

        def forward(self, x, dump_path):
            n = x.shape[0]
            x = self.proj(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls.expand(n, -1, -1), x], 1) + self.pos
            for b in self.blocks:
                x = b(x, dump_path)
            return self.ln(x)

    model = RefViT().eval()
    # prune 50% of Linear/Conv weights like the reference's masked models
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.Linear, nn.Conv2d)):
                w = m.weight
                k = w.numel() // 2
                thr = w.abs().flatten().kthvalue(k).values
                m.weight.mul_((w.abs() > thr).float())

    dump = "/tmp/bench_qkv_vit.pt"
    imgs = torch.randn(n_images, 3, H, W)
    with torch.no_grad():  # warmup: keep torch/MKL one-time init out of
        model(imgs[:1], dump)  # the timed window (the TPU side warms too)
    t0 = time.perf_counter()
    with torch.no_grad():
        for i in range(n_images):
            model(imgs[i : i + 1], dump)
            feat = torch.load(dump)  # (3, T, D) disk round-trip like main_lost
            qkv = feat.reshape(1, T, 3, nheads, -1).permute(2, 0, 3, 1, 4)
            k = qkv[1].transpose(1, 2).reshape(1, T, -1)[0, 1:].numpy()
            A = k @ k.T
            Ac = A.copy()
            np.fill_diagonal(Ac, 0)
            Ac[Ac < 0] = 0
            cent = -np.sum(Ac > 0, axis=1)
            order = np.argsort(-cent, kind="stable")
            seed = order[0]
            pot = order[:K_PATCHES]
            sim = pot[A[seed, pot] > 0]
            M = A[sim, :].sum(0)
            lab, _ = scipy.ndimage.label(M.reshape(GH, GW) > 0)
            cc = lab[np.unravel_index(seed, (GH, GW))]
            np.where(lab == cc)
    dt = time.perf_counter() - t0
    return n_images / dt


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    baseline_path = os.path.join(here, "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["reference_imgs_per_sec"]
    else:
        baseline = bench_torch_reference()
        with open(baseline_path, "w") as f:
            json.dump(
                {
                    "reference_imgs_per_sec": baseline,
                    "note": "reference pipeline shape in torch-CPU on this host "
                    "(per-image batch-1, file side channel, scipy CC)",
                },
                f,
            )
    results, p50_ms = bench_tpu()
    train_imgs_per_sec = bench_train_step()
    e2e_imgs_per_sec = bench_e2e_lost()
    # Headline stays the mask-exact pipeline (same function as the
    # reference's pruned model); the structurally slimmed rate is reported
    # alongside, not substituted.
    value = max(results["f32"], results["bf16"])
    # MFU: achieved model FLOP/s over the chip's bf16 peak (absolute
    # utilization — the number that matters alongside img/s/chip; the
    # vs_baseline multiplier is a torch-CPU stand-in of the reference
    # pipeline shape, the only reference runtime on this GPU-less host).
    # Computed from the bf16 throughput specifically: dividing an f32
    # rate by the bf16 peak would understate utilization 2x.
    from vipers.core.flops import (
        V5E_BF16_PEAK,
        vit_forward_flops_per_image,
        vit_train_flops_per_image,
    )

    flops_per_image = vit_forward_flops_per_image(
        d=384, layers=12, grid_tokens=GH * GW, patch=PATCH
    )
    train_flops_per_image = vit_train_flops_per_image(
        d=384, layers=12,
        grid_tokens=(TRAIN_HW // PATCH) ** 2, patch=PATCH,
    )
    print(
        json.dumps(
            {
                "metric": "pruned_vit_s16_lost_inference",
                "value": round(value, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(value / baseline, 3),
                "p50_latency_ms": round(p50_ms, 3),
                "f32_imgs_per_sec": round(results["f32"], 3),
                "bf16_imgs_per_sec": round(results["bf16"], 3),
                "mfu_pct_v5e_bf16": round(
                    100.0 * results["bf16"] * flops_per_image / V5E_BF16_PEAK, 1
                ),
                # `vipers slim` (mlp 1536->768, heads 6->4, -42% params) on
                # the SAME shipped pipeline — sparsity harvested as
                # physical throughput (docs/PERF.md)
                # bf16 B=128 pruned ViT-S/16 224px TRAIN step (round-4
                # ask: track train perf per round; 3x-fwd MFU convention)
                "train_imgs_per_sec": round(train_imgs_per_sec, 3),
                "train_mfu_pct": round(
                    100.0 * train_imgs_per_sec * train_flops_per_image
                    / V5E_BF16_PEAK, 1
                ),
                "slim_bf16_imgs_per_sec": round(results["slim_bf16"], 3),
                "slim_speedup": round(
                    results["slim_bf16"] / results["bf16"], 3
                ),
                # TRUE end-to-end JPEG->boxes wall-clock rate of the
                # shipped `vipers lost` driver on THIS host (decode is
                # host-bound: docs/PERF.md sizes cores-per-chip)
                "e2e_imgs_per_sec": round(e2e_imgs_per_sec, 3),
                "host_cores": os.cpu_count(),
                "path": "vipers.discovery.LostFeatureExtractor.make_batched_pipeline (shipped)",
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
