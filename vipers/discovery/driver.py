"""LOST driver: per-image object discovery + CorLoc over VOC/COCO.

Counterpart of `/root/reference/main_lost.py:204-703` and
`/root/reference/main_lost_original.py` with the TPU-first redesign:
  * no file side channel — the jitted ViT forward *returns* the last
    block's attention input / qkv (vs torch.save to /scratch,
    `vision_transformer.py:113-115` -> `main_lost.py:455-456`),
  * no per-image model rebuild — resolution changes are a pos-embedding
    interpolation (jitted) + shape-bucketed compile cache (vs
    `main_lost.py:412-415` rebuilding a torch ViT per image),
  * padding tier 1 (to patch multiple) participates in the affinity exactly
    like the reference (`main_lost.py:399-407`); padding tier 2 (to the
    bucket grid) is masked out inside ``lost_core`` so results equal exact
    per-image shapes.

Feature modalities (`main_lost.py:478-499`):
  * vit:   scrambled split of the stacked ln_1 dump -> k/q/v, drop CLS,
  * dino:  true qkv projection split -> k/q/v, drop CLS,
  * resnet/vgg16: headless feature map + whole-slab LayerNorm
    (`main_lost.py:570-600`).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vipers.core.registry import build_model
from vipers.data.detection import DiscoveryDataset, load_image_normalized
from vipers.data.preprocess import bucket_hw
from vipers.discovery.corloc import CorLocAccumulator
from vipers.discovery.lost import dino_seg, lost
from vipers.models.dino_vit import split_qkv_dino
from vipers.models.interpolate import interpolate_pos_embedding
from vipers.models.vit import split_qkv_torchvision
from vipers.pruning.masks import apply_masks


class LostFeatureExtractor:
    """Feature extraction with a bucketed compile cache."""

    def __init__(self, spec, variables, masks=None, arch: str = "vit",
                 which_features: str = "k", bucket: int = 4,
                 need_attn: bool = False):
        self.spec = spec
        self.arch = arch
        self.which = which_features
        self.bucket = bucket
        params = variables["params"]
        if masks:
            params = apply_masks(params, masks)
        self.variables = dict(variables, params=params)
        self._pos_cache = {}

        @jax.jit
        def transformer_forward(variables, img, pos, token_mask):
            _, aux = spec.module.apply(
                variables, img, train=False, override_pos_embedding=pos,
                token_mask=token_mask, need_attn=need_attn,
            )
            return aux

        @jax.jit
        def cnn_forward(variables, img):
            feats, _aux = spec.module.apply(variables, img, train=False)
            n, h, w, d = feats.shape
            f = feats.reshape(n, h * w, d)
            # `main_lost.py:581-584`: LayerNorm over the whole (tokens, dim)
            # slab with fresh (identity) affine params.
            mu = jnp.mean(f, axis=(1, 2), keepdims=True)
            var = jnp.var(f, axis=(1, 2), keepdims=True)
            return (f - mu) / jnp.sqrt(var + 1e-5), (h, w)

        self._vit_forward = transformer_forward
        self._dino_forward = transformer_forward
        self._cnn_forward = cnn_forward

    def _pos_and_mask(self, gh: int, gw: int, GH: int, GW: int):
        """Pos-embeddings interpolated to the *valid* (gh, gw) grid —
        exactly what the reference interpolates to
        (`main_lost.py:83` -> `vision_transformer.py:781-858`) — scattered
        into the bucket grid, plus the CLS+valid token mask."""
        key = (gh, gw, GH, GW)
        if key not in self._pos_cache:
            pname = "pos_embedding" if self.arch == "vit" else "pos_embed"
            pos = self.variables["params"][pname]
            align = self.arch == "vit"  # torchvision align_corners=True; DINO False
            interp = interpolate_pos_embedding(pos, (gh, gw), align_corners=align)
            d = interp.shape[-1]
            full = np.zeros((1, GH * GW + 1, d), np.float32)
            full[:, 0] = np.asarray(interp[:, 0])
            grid = np.asarray(interp[0, 1:]).reshape(gh, gw, d)
            scat = np.zeros((GH, GW, d), np.float32)
            scat[:gh, :gw] = grid
            full[:, 1:] = scat.reshape(1, GH * GW, d)
            rows = np.arange(GH * GW) // GW
            cols = np.arange(GH * GW) % GW
            mask = np.concatenate(
                [[True], (rows < gh) & (cols < gw)]
            )[None, :]
            self._pos_cache[key] = (jnp.asarray(full), jnp.asarray(mask))
        return self._pos_cache[key]

    def extract(self, img_hwc: np.ndarray, patch_size: int):
        """img_hwc: normalized float (H, W, 3), *already* padded to the
        patch multiple (tier-1). Returns (feats (1,T,D) on bucket grid,
        dims (GH,GW), valid_dims (gh,gw), scales, attn or None)."""
        h, w = img_hwc.shape[:2]
        if self.arch in ("vit", "dino"):
            gh, gw = h // patch_size, w // patch_size
            bh, bw = bucket_hw(h, w, patch_size, self.bucket)
            img = np.zeros((bh, bw, 3), np.float32)
            img[:h, :w] = img_hwc
            GH, GW = bh // patch_size, bw // patch_size
            pos, mask = self._pos_and_mask(gh, gw, GH, GW)
            fwd = self._vit_forward if self.arch == "vit" else self._dino_forward
            aux = fwd(self.variables, jnp.asarray(img)[None], pos, mask)
            nh = self.spec.extra["num_heads"]
            rows = np.arange(GH * GW) // GW
            cols = np.arange(GH * GW) % GW
            valid_flat = np.where((rows < gh) & (cols < gw))[0]
            if self.arch == "vit":
                # The reference's reshape of the stacked dump mixes *across*
                # tokens (copy offsets depend on total T), so it must be
                # computed on the tier-1 token set exactly — gather valid
                # tokens first (`main_lost.py:478-490` semantics), then
                # scatter features back onto the bucket grid for lost_core.
                x = np.asarray(aux["qkv_input"])[0]  # (1+GH*GW, D)
                x_ref = np.concatenate([x[:1], x[1 + valid_flat]], axis=0)[None]
                dump = np.concatenate([x_ref[0]] * 3, axis=0).reshape(
                    3, x_ref.shape[1], x_ref.shape[2]
                )
                q, k, v = split_qkv_torchvision(jnp.asarray(dump), nh)
            else:
                q, k, v = split_qkv_dino(aux["qkv"], nh)
            feats_tok = np.asarray({"k": k, "q": q, "v": v}[self.which])[0, 1:, :]
            if self.arch == "vit":
                full = np.zeros((GH * GW, feats_tok.shape[-1]), np.float32)
                full[valid_flat] = feats_tok
                feats = full[None]
            else:
                feats = feats_tok[None]
            return feats, (GH, GW), (gh, gw), [patch_size, patch_size], aux["attn"]
        # CNN path: exact shapes (conv receptive fields cross any extra
        # padding, so bucket-masking would not be exact).
        feats, (fh, fw) = self._cnn_forward(self.variables, jnp.asarray(img_hwc)[None])
        scales = [h / fh, w / fw]
        return feats, (fh, fw), (fh, fw), scales, None


def run_lost(args) -> int:
    t_start = time.time()
    dataset = DiscoveryDataset(
        args.dataset, args.set, args.data_path, no_hard=args.no_hard,
        coco_annotations=getattr(args, "coco_annotations", None),
        coco20k_list=getattr(args, "coco20k_list", None),
    )
    arch = args.arch
    model_kw = {}
    if arch == "dino":
        model_kw["patch_size"] = args.patch_size
    spec = build_model(args.model, **model_kw)

    rng = jax.random.PRNGKey(0)
    h0 = w0 = 224
    variables = spec.module.init(rng, jnp.zeros((1, h0, w0, 3)), train=False)
    masks = None
    if args.checkpoint:
        variables, masks = load_lost_checkpoint(args.checkpoint, spec, variables)

    extractor = LostFeatureExtractor(
        spec, variables, masks, arch=arch, which_features=args.which_features,
        # dino_seg thresholds raw CLS-attention mass over all tokens; run it
        # at exact shapes so bucket-pad tokens don't enter the mass.
        bucket=1 if args.dinoseg else 4,
        # only dino_seg consumes the per-head attention probs
        need_attn=bool(args.dinoseg),
    )
    acc = CorLocAccumulator()
    n_imgs = 0
    for path, im_name in dataset:
        img = load_image_normalized(path)
        init_image_size = (3, img.shape[0], img.shape[1])
        gt, _cls = dataset.extract_gt(im_name)
        if gt is not None and len(gt) == 0 and args.no_hard:
            continue
        # tier-1 padding (participates) — `main_lost.py:399-407`
        p = args.patch_size
        ph = int(np.ceil(img.shape[0] / p) * p)
        pw = int(np.ceil(img.shape[1] / p) * p)
        padded = np.zeros((ph, pw, 3), np.float32)
        padded[: img.shape[0], : img.shape[1]] = img

        feats, dims, valid_dims, scales, attn = extractor.extract(padded, p)
        if args.dinoseg:
            if attn is None:
                raise ValueError("--dinoseg needs a transformer arch")
            pred = np.asarray(
                dino_seg(attn, dims, p, head=args.dinoseg_head), dtype=np.float64
            )
        else:
            pred, _A, _scores, _seed = lost(
                feats, dims, scales, init_image_size,
                k_patches=args.k_patches, valid_dims=valid_dims,
            )
        n_imgs += 1
        acc.add(im_name, pred, gt)
        if args.visualize:
            from vipers.viz.draw import save_lost_visualization

            save_lost_visualization(
                args.visualize, path, pred, gt, _A if not args.dinoseg else None,
                _scores if not args.dinoseg else None,
                _seed if not args.dinoseg else None,
                dims, scales, args.output_dir, im_name,
            )

    os.makedirs(args.output_dir, exist_ok=True)
    acc.save(args.output_dir, args.iteration)
    dt = time.time() - t_start
    print(f"LOST: {n_imgs} images in {dt:.1f}s ({n_imgs / max(dt, 1e-9):.2f} img/s)")
    return 0


def load_lost_checkpoint(path: str, spec, variables):
    """Load either an orbax checkpoint dir (ours) or a torch .pth
    (imported); returns (variables, masks)."""
    if path.endswith(".pth") or path.endswith(".pt"):
        from vipers.core.checkpoint import import_torch_checkpoint, to_jax

        params, batch_stats, masks = import_torch_checkpoint(path, spec.name)
        variables = {"params": to_jax(params)}
        if batch_stats is not None:
            variables["batch_stats"] = to_jax(batch_stats)
        return variables, {k: jnp.asarray(v) for k, v in (masks or {}).items()}
    from vipers.core.checkpoint import restore_checkpoint

    tree = restore_checkpoint(path)
    variables = {"params": tree["params"]}
    if tree.get("batch_stats") is not None:
        variables["batch_stats"] = tree["batch_stats"]
    masks = {
        tuple(k.split("/")): jnp.asarray(v, bool)
        for k, v in (tree.get("masks") or {}).items()
    }
    return variables, masks
