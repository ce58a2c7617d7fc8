#!/usr/bin/env python
"""Pretrained-weight acquisition for real deployments.

The reference loads DINO weights from fbaipublicfiles at model-build time
(`/root/reference/networks.py:54-79`) and torchvision weights via the
weight enums. vipers is importer-based: download the ``.pth`` once, then
every CLI entry accepts it via ``--checkpoint`` (the torch importer in
``vipers/core/checkpoint.py`` maps torchvision/DINO key conventions onto
the flax trees, including prune-reparametrized checkpoints).

Usage (network required; this build environment is egress-free, so run it
on a connected host and ship the files):

    python scripts/fetch_weights.py --model dino_vit_small_16 --out ./weights
    python scripts/fetch_weights.py --all --out ./weights
    vipers lost --model dino_vit_small --arch dino \
        --checkpoint weights/dino_deitsmall16_pretrain.pth ...

Optionally pass ``--convert`` to also write an orbax checkpoint directory
next to each ``.pth`` (uses the same importer the CLI uses lazily).
"""

import argparse
import os
import sys
import urllib.request

# DINO self-supervised checkpoints (`/root/reference/networks.py:56-65`).
DINO_BASE = "https://dl.fbaipublicfiles.com/dino/"
# torchvision supervised checkpoints (`vision_transformer.py` weight enums
# + torchvision resnet/vgg/swin URLs).
TV_BASE = "https://download.pytorch.org/models/"

WEIGHTS = {
    "dino_vit_small_16": DINO_BASE + "dino_deitsmall16_pretrain/dino_deitsmall16_pretrain.pth",
    "dino_vit_small_8": DINO_BASE + "dino_deitsmall8_300ep_pretrain/dino_deitsmall8_300ep_pretrain.pth",
    "dino_vit_base_16": DINO_BASE + "dino_vitbase16_pretrain/dino_vitbase16_pretrain.pth",
    "dino_vit_base_8": DINO_BASE + "dino_vitbase8_pretrain/dino_vitbase8_pretrain.pth",
    "dino_resnet50": DINO_BASE + "dino_resnet50_pretrain/dino_resnet50_pretrain.pth",
    "vit_b_16": TV_BASE + "vit_b_16-c867db91.pth",
    "vit_b_32": TV_BASE + "vit_b_32-d86f8d99.pth",
    "vit_l_16": TV_BASE + "vit_l_16-852ce7e3.pth",
    "vit_l_32": TV_BASE + "vit_l_32-c7638314.pth",
    "resnet18": TV_BASE + "resnet18-f37072fd.pth",
    "resnet50": TV_BASE + "resnet50-0676ba61.pth",
    "vgg16": TV_BASE + "vgg16-397923af.pth",
    "swin_v2_t": TV_BASE + "swin_v2_t-b137f0e2.pth",
}

# fetch-name -> vipers registry model name for --convert
MODEL_NAME = {
    "dino_vit_small_16": "dino_vit_small",
    "dino_vit_small_8": "dino_vit_small",
    "dino_vit_base_16": "dino_vit_base",
    "dino_vit_base_8": "dino_vit_base",
    "dino_resnet50": "resnet50",
}


def fetch(name: str, out_dir: str, convert: bool = False) -> str:
    url = WEIGHTS[name]
    os.makedirs(out_dir, exist_ok=True)
    dest = os.path.join(out_dir, os.path.basename(url))
    if os.path.exists(dest):
        print(f"{dest} exists, skipping download")
    else:
        print(f"{url} -> {dest}")
        tmp = dest + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, dest)
    if convert:
        from vipers.core.checkpoint import (
            import_torch_checkpoint, save_checkpoint, to_jax,
        )

        model = MODEL_NAME.get(name, name)
        params, batch_stats, masks = import_torch_checkpoint(dest, model)
        tree = {"params": to_jax(params)}
        if batch_stats is not None:
            tree["batch_stats"] = to_jax(batch_stats)
        if masks:
            tree["masks"] = {"/".join(k): v for k, v in masks.items()}
        orbax_dir = dest.rsplit(".", 1)[0]
        save_checkpoint(orbax_dir, tree)
        print(f"converted -> {orbax_dir}")
    return dest


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", choices=sorted(WEIGHTS), default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out", default="./weights")
    ap.add_argument("--convert", action="store_true",
                    help="also write an orbax checkpoint dir per .pth")
    args = ap.parse_args(argv)
    names = sorted(WEIGHTS) if args.all else ([args.model] if args.model else [])
    if not names:
        ap.error("pass --model NAME or --all")
    for n in names:
        fetch(n, args.out, convert=args.convert)
    return 0


if __name__ == "__main__":
    sys.exit(main())
