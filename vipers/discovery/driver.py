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
from collections import deque
from contextlib import nullcontext as _nullcontext
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vipers.core.registry import build_model
from vipers.data.detection import DiscoveryDataset, load_image_normalized
from vipers.data.preprocess import bucket_hw
from vipers.discovery.corloc import CorLocAccumulator
from vipers.discovery.lost import box_feat_to_image, dino_seg, lost, lost_core
from vipers.models.dino_vit import split_qkv_dino
from vipers.models.vit import scrambled_qkv_gather, split_qkv_torchvision
from vipers.pruning.masks import apply_masks


def masked_slab_layernorm(f, mf, cnt):
    """The reference's whole-(tokens, dim)-slab LayerNorm with identity
    affine (`/root/reference/main_lost.py:581-584`), over VALID cells only:
    ``f`` (..., T, D), ``mf`` the {0,1} validity mask broadcastable to it,
    ``cnt`` the valid-element count (already broadcast-shaped).  Pad cells
    come out zeroed for ``lost_core``'s valid_dims masking.  Single source
    of truth for the per-image bucketed path and the batched pipeline —
    the former validates the latter numerically."""
    mu = jnp.sum(f * mf, axis=(1, 2), keepdims=True) / cnt
    var = jnp.sum(jnp.square((f - mu) * mf), axis=(1, 2), keepdims=True) / cnt
    return ((f - mu) / jnp.sqrt(var + 1e-5)) * mf


def _device_normalize(images, pixel_hw):
    """uint8 (B,H,W,3) -> normalized float32, ON DEVICE (the uint8 fast
    feed): x/255 -> (x-mean)/std in f32 — the exact op order of
    `data.detection.load_image_normalized`, so results are bit-equal to
    the host-normalized float path — then re-zeroes everything beyond each
    image's exact pixel extent (host zero-pads BEFORE normalize, so pad
    pixels must be 0.0, not normalize(0))."""
    from vipers.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

    x = images.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN, jnp.float32)) / jnp.asarray(
        IMAGENET_STD, jnp.float32)
    if pixel_hw is not None:
        r = jnp.arange(images.shape[1])[None, :, None]
        c = jnp.arange(images.shape[2])[None, None, :]
        valid = (r < pixel_hw[:, 0, None, None]) & (
            c < pixel_hw[:, 1, None, None])
        x = jnp.where(valid[..., None], x, 0.0)
    return x


def _seq_pad(img_shape, patch: int, need_attn: bool):
    """128-multiple token padding for transformer forwards where the flash
    kernel engages (t >= flash_min_t(), no attention-probs output) —
    shapes are static at trace time, so this is a compile-time decision."""
    from vipers.ops.flash_attention import flash_min_t

    t = (img_shape[1] // patch) * (img_shape[2] // patch) + 1
    return 128 if (t >= flash_min_t() and not need_attn) else None


class LostFeatureExtractor:
    """Feature extraction with a bucketed compile cache."""

    def __init__(self, spec, variables, masks=None, arch: str = "vit",
                 which_features: str = "k", bucket: int = 4,
                 need_attn: bool = False, compute_dtype=None,
                 observers=None, sequence_mesh=None,
                 sequence_axis: str = "seq", cnn_bucket: int = 4,
                 swin_all_windows: bool = False):
        self.spec = spec
        self.arch = arch
        self.which = which_features
        self.bucket = bucket
        # CNN feature-grid bucketing (round-4 ask): pad the INPUT so the
        # conv feature grid lands on a `cnn_bucket` multiple — one compile
        # per bucket instead of one per unique image shape (a VOC07 sweep
        # has hundreds; at ~20 s/compile on a tunneled chip the exact-shape
        # regime is compile-bound).  Unlike the ViT path this is NOT exact:
        # conv receptive fields cross the zero pad, so features near the
        # bottom/right boundary deviate (measured on CorLoc in
        # docs/PERF.md; `--exact-shapes` / cnn_bucket=1 restores the
        # reference's native-resolution parity regime).
        self.cnn_bucket = cnn_bucket
        self._fdim_cache: dict = {}
        self._cnn_stride = None
        # beyond-reference swin mode: LOST over the FULL last-stage token
        # grid (aux["qkv_grid"]) instead of the first window only
        self.swin_all_windows = swin_all_windows
        params = variables["params"]
        if masks:
            # ONE jitted program for the whole mask bake: eager per-leaf
            # multiplies would cost a network round trip per parameter on
            # a tunneled TPU (~0.4 s x ~150 leaves)
            params = jax.jit(apply_masks)(params, masks)
        # "int8" serving mode: per-channel int8 kernels executed as REAL
        # integer matmuls/convs; activation qparams come from the loaded
        # checkpoint's PTQ/QAT observers when present (``observers``:
        # {site: {"min", "max"}}, calibrated ranges, no per-batch
        # reductions) and from dynamic per-tensor min/max otherwise; the
        # rest of the net (layernorm, attention softmax, GELU) runs bf16.
        self.int8 = compute_dtype == "int8"
        self.observers = observers if self.int8 else None
        self._q = self._scales = None
        if self.int8:
            from vipers.train.quantize import quantize_params_int8

            self._q, self._scales = jax.jit(
                lambda p: quantize_params_int8(p, exclude=spec.quant_exclude)
            )(params)
            compute_dtype = jnp.bfloat16
        if compute_dtype is not None:
            # bf16 inference: cast params once (single jitted program);
            # LOST's affinity still accumulates in f32
            # (preferred_element_type in lost_core).
            params = jax.jit(lambda p: jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                p,
            ))(params)
        self.compute_dtype = compute_dtype or jnp.float32
        self.variables = dict(variables, params=params)
        self._pos_cache = {}

        @jax.jit
        def pos_interp(pos, mat_h, mat_w):
            # (1, S_h*S_w+1, D) stored pos -> (1, GH*GW+1, D) f32:
            # bicubic resize to (gh, gw) + scatter into the bucket grid
            # as two dense matmuls with host-built weight matrices
            # (resize_weight_matrix_np) — see _pos_and_mask
            pos = pos.astype(jnp.float32)
            cls = pos[:, :1]
            sh, sw = mat_h.shape[1], mat_w.shape[1]
            grid = pos[0, 1:].reshape(sh, sw, -1)
            g = jnp.einsum("hs,swd->hwd", mat_h, grid, precision="highest")
            g = jnp.einsum("wt,htd->hwd", mat_w, g, precision="highest")
            g = g.reshape(1, -1, g.shape[-1])
            return jnp.concatenate([cls, g], axis=1)

        self._pos_interp = pos_interp
        self._module_apply = self._make_module_apply()
        self.sequence_mesh = sequence_mesh
        if sequence_mesh is not None:
            # Sequence parallelism (vipers/parallel/sp.py): shard the TOKEN
            # axis over the mesh for batch-1 native-resolution images where
            # data parallelism has nothing to split. The context is active
            # while THIS extractor's jitted programs trace, baking the
            # sharding constraints into its jaxprs only.
            from vipers.parallel.sp import sequence_parallel

            base_apply = self._module_apply

            def sp_apply(variables, img, **kw):
                with sequence_parallel(sequence_mesh, sequence_axis):
                    return base_apply(variables, img, **kw)

            self._module_apply = sp_apply

        module_apply = self._module_apply
        patch = spec.patch_size

        @jax.jit
        def transformer_forward(variables, img, pos, token_mask):
            _, aux = module_apply(
                variables, img, train=False, override_pos_embedding=pos,
                token_mask=token_mask, need_attn=need_attn,
                seq_pad_multiple=_seq_pad(img.shape, patch, need_attn),
            )
            return aux

        @jax.jit
        def swin_forward(variables, img):
            _, aux = module_apply(variables, img, train=False)
            return aux

        self._swin_forward = swin_forward

        def _raw_cnn_feats(variables, img):
            out, aux = module_apply(variables, img, train=False)
            # headless (`*_bottom`) models return the feature map as the
            # primary output; full classifiers expose it via aux — so a
            # TRAINED resnet/vgg checkpoint runs LOST directly, matching
            # the reference's Bottom-wrapper-around-checkpoint flow
            # (`/root/reference/networks.py:96-105`, `main_lost.py:570-600`)
            return aux["features"] if (
                isinstance(aux, dict) and "features" in aux and out.ndim != 4
            ) else out

        self._raw_cnn_feats = _raw_cnn_feats

        @jax.jit
        def cnn_forward(variables, img):
            feats = _raw_cnn_feats(variables, img)
            n, h, w, d = feats.shape
            f = feats.reshape(n, h * w, d)
            # `main_lost.py:581-584`: LayerNorm over the whole (tokens, dim)
            # slab with fresh (identity) affine params.
            mu = jnp.mean(f, axis=(1, 2), keepdims=True)
            var = jnp.var(f, axis=(1, 2), keepdims=True)
            return (f - mu) / jnp.sqrt(var + 1e-5), (h, w)

        @jax.jit
        def cnn_forward_bucketed(variables, img, valid_fhw):
            """CNN features on a bucket-padded input.  ``valid_fhw`` (2,)
            i32 — the exact-shape feature dims — is a traced ARRAY, so one
            compile serves every image that lands in the bucket.  The
            reference's whole-slab LayerNorm (`main_lost.py:581-584`) is
            computed over VALID cells only (pad cells are conv-of-zeros
            garbage, not part of the reference's slab) and pad cells are
            zeroed for ``lost_core``'s valid_dims masking."""
            feats = _raw_cnn_feats(variables, img)
            n, fh, fw, d = feats.shape
            m = (
                (jnp.arange(fh)[:, None] < valid_fhw[0])
                & (jnp.arange(fw)[None, :] < valid_fhw[1])
            ).reshape(1, fh * fw, 1)
            f = feats.reshape(n, fh * fw, d)
            cnt = (valid_fhw[0] * valid_fhw[1] * d).astype(f.dtype)
            return masked_slab_layernorm(f, m.astype(f.dtype), cnt), (fh, fw)

        self._cnn_forward_bucketed = cnn_forward_bucketed

        self._vit_forward = transformer_forward
        self._dino_forward = transformer_forward
        self._cnn_forward = cnn_forward

    def _make_module_apply(self):
        """module.apply, or its dynamic-int8 execution variant."""
        spec = self.spec
        if not self.int8:
            return spec.module.apply
        from vipers.train.quantize import (int8_dynamic_apply,
                                           static_qparams_from_observers)

        q, scales = self._q, self._scales
        static_qparams = static_qparams_from_observers(self.observers)

        def apply_int8(variables, img, **kwargs):
            # exclude bucket-/seq-pad token rows from each site's dynamic
            # min/max: garbage pad activations would otherwise widen the
            # quant range for the valid tokens
            tm = kwargs.get("token_mask")
            masks = None
            if tm is not None:
                masks = {tm.shape[1]: tm}
                spm = kwargs.get("seq_pad_multiple")
                if spm:
                    t = tm.shape[1]
                    tp = -(-t // spm) * spm
                    if tp != t:
                        masks[tp] = jnp.pad(tm, ((0, 0), (0, tp - t)))
            return int8_dynamic_apply(
                spec.module, variables, img, q, scales,
                exclude=spec.quant_exclude, qparams_token_masks=masks,
                static_qparams=static_qparams,
                **kwargs,
            )

        return apply_int8

    def _pos_and_mask(self, gh: int, gw: int, GH: int, GW: int):
        """Pos-embeddings interpolated to the *valid* (gh, gw) grid —
        exactly what the reference interpolates to
        (`main_lost.py:83` -> `vision_transformer.py:781-858`) — scattered
        into the bucket grid, plus the CLS+valid token mask."""
        key = (gh, gw, GH, GW)
        if key not in self._pos_cache:
            from vipers.models.interpolate import resize_weight_matrix_np

            pname = "pos_embedding" if self.arch == "vit" else "pos_embed"
            pos = self.variables["params"][pname]
            p = self.spec.patch_size
            side_h = self.spec.input_size[0] // p
            side_w = self.spec.input_size[1] // p
            align = self.arch == "vit"  # torchvision align=True; DINO False
            # Interpolation as two host-built weight matrices applied ON
            # DEVICE (one jitted matmul-matmul per bucket signature):
            #   * the stored pos table never leaves the device — on the
            #     tunneled backend a device->host read of this one 300 KB
            #     parameter measured ~100 s AND degraded every subsequent
            #     transfer ~50x (the round-5 e2e bench's 16 img/s),
            #   * the (gh, gw) grid is data (zero rows beyond gh/gw land
            #     the scatter-into-bucket for free), so new grids cost no
            #     new compile — only new BUCKET shapes do,
            #   * gh == side yields the exact identity matrix (Keys
            #     kernel at integer offsets), i.e. the reference's
            #     no-resize native path.
            mat_h = np.zeros((GH, side_h), np.float32)
            mat_h[:gh] = resize_weight_matrix_np(side_h, gh, align)
            mat_w = np.zeros((GW, side_w), np.float32)
            mat_w[:gw] = resize_weight_matrix_np(side_w, gw, align)
            full = self._pos_interp(
                pos, jnp.asarray(mat_h), jnp.asarray(mat_w))
            rows = np.arange(GH * GW) // GW
            cols = np.arange(GH * GW) % GW
            mask = np.concatenate(
                [[True], (rows < gh) & (cols < gw)]
            )[None, :]
            self._pos_cache[key] = (full, mask)
        return self._pos_cache[key]

    def _cnn_fdim(self, px: int) -> int:
        """Feature cells along one input axis of ``px`` pixels, via
        ``jax.eval_shape`` (trace only — no compile).  torchvision
        resnet/vgg are h/w-separable, so a 1-D cache keyed on the pixel
        count covers both axes; a VOC sweep probes ~dozens of values."""
        import jax

        if px not in self._fdim_cache:
            shp = jax.eval_shape(
                self._raw_cnn_feats, self.variables,
                jax.ShapeDtypeStruct((1, px, 64, 3), self.compute_dtype),
            )
            self._fdim_cache[px] = int(shp.shape[1])
        return self._fdim_cache[px]

    def _cnn_input_for_fdim(self, px: int, target: int) -> int:
        """Smallest-ish input extent >= px whose feature extent == target
        (monotone in px; steps of the net's output stride)."""
        if self._cnn_stride is None:
            self._cnn_stride = max(
                round(256 / max(self._cnn_fdim(512) - self._cnn_fdim(256), 1)),
                1,
            )
        s = self._cnn_stride
        out = px + (target - self._cnn_fdim(px)) * s
        for _ in range(4):  # land anywhere inside the target step first
            f = self._cnn_fdim(out)
            if f == target:
                break
            out += (target - f) * s
        else:
            raise ValueError(
                f"no input extent near {px}px maps to {target} feature cells")
        # binary-search the SMALLEST extent on the step (the canonical-input
        # rule needs the exact step boundary, ~log2(stride) probes)
        lo = out - s
        while self._cnn_fdim(lo) >= target:
            lo -= s
        hi = out
        while lo + 1 < hi:
            mid = (lo + hi) // 2
            if self._cnn_fdim(mid) >= target:
                hi = mid
            else:
                lo = mid
        return hi

    def _cnn_canon_input(self, target: int) -> int:
        """Canonical input extent for a bucket axis: the LARGEST input that
        maps to ``target`` feature cells (top of the feature-dim step).
        Every image whose feature extent rounds up to ``target`` fits under
        it, so one compile signature serves the whole bucket.  For
        ceil(x/stride) nets (resnet) this is exactly target*stride — images
        already on the grid get ZERO extra pad."""
        key = ("canon", target)
        if key not in self._fdim_cache:
            if self._cnn_stride is None:
                self._cnn_fdim(256)  # prime
                self._cnn_input_for_fdim(256, self._cnn_fdim(256))
            px = self._cnn_input_for_fdim(
                max(target * self._cnn_stride, 33), target + 1) - 1
            assert self._cnn_fdim(px) == target, (px, target)
            self._fdim_cache[key] = px
        return self._fdim_cache[key]

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
            aux = fwd(self.variables,
                      jnp.asarray(img)[None].astype(self.compute_dtype),
                      pos.astype(self.compute_dtype), mask)
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
        if self.arch == "swin":
            # `main_lost.py:501-566`: hook the last block's window-attention
            # qkv, w_featmap = sqrt(attn.shape[-2]) (the WINDOW side), true
            # qkv split, no CLS, scales = image/patch_size.  The reference
            # path only functions when the last stage fits one window
            # (224^2 -> 7x7 <= 8); like it, we consume the first window.
            aux = self._swin_forward(
                self.variables,
                jnp.asarray(img_hwc)[None].astype(self.compute_dtype),
            )
            nh = aux["attn"].shape[1]
            if self.swin_all_windows:
                # beyond-reference-correct mode: the whole last-stage
                # token grid in image order (pad/shift/window undone by
                # the model), true qkv split, true image/feature scales
                grid = aux["qkv_grid"]
                _, fh, fw, _3c = grid.shape
                q, k, v = split_qkv_dino(
                    grid.reshape(1, fh * fw, _3c), nh)
                feats = np.asarray({"k": k, "q": q, "v": v}[self.which])
                return feats, (fh, fw), (fh, fw), [h / fh, w / fw], aux["attn"]
            t_win = aux["attn"].shape[-2]
            ws = int(np.sqrt(t_win))
            qkv_first = aux["qkv"][:, :t_win, :]  # first window's tokens
            q, k, v = split_qkv_dino(qkv_first, nh)
            feats = np.asarray({"k": k, "q": q, "v": v}[self.which])
            scales = [h / patch_size, w / patch_size]
            return feats, (ws, ws), (ws, ws), scales, aux["attn"]
        # CNN path. Default: feature-grid bucketing (one compile per bucket
        # — round-4 ask); cnn_bucket=1 (`--exact-shapes`) restores the
        # reference's native-resolution regime (one compile per unique
        # image shape), which is exact because conv receptive fields cross
        # any extra padding.
        cb = self.cnn_bucket
        if cb > 1:
            fh, fw = self._cnn_fdim(h), self._cnn_fdim(w)
            FH, FW = -(-fh // cb) * cb, -(-fw // cb) * cb
            H, W = self._cnn_canon_input(FH), self._cnn_canon_input(FW)
            img_b = np.zeros((H, W, 3), np.float32)
            img_b[:h, :w] = img_hwc
            feats, (FH2, FW2) = self._cnn_forward_bucketed(
                self.variables,
                jnp.asarray(img_b)[None].astype(self.compute_dtype),
                jnp.asarray([fh, fw], jnp.int32),
            )
            assert (FH2, FW2) == (FH, FW), (FH2, FW2, FH, FW)
            # scales from the EXACT feature dims: box coords map back
            # through the true image/feature ratio, like the exact path
            return feats, (FH, FW), (fh, fw), [h / fh, w / fw], None
        feats, (fh, fw) = self._cnn_forward(
            self.variables,
            jnp.asarray(img_hwc)[None].astype(self.compute_dtype),
        )
        scales = [h / fh, w / fw]
        return feats, (fh, fw), (fh, fw), scales, None

    def make_batched_pipeline(self, k_patches: int = 100):
        """ONE jitted program per bucket shape: transformer forward +
        on-device qkv scramble + vmapped LOST core.

        This is the shipped product path (and what ``bench.py`` measures):
        nothing O(T^2) ever leaves the chip — only the 4-int boxes, seeds
        and background flags return to host (round-1 verdict: the per-image
        path pulled ~2.4 MB/image of affinity+scores back even with
        --visualize off).

        Returns fn(variables, images (B,bh,bw,3), pos (B,GT+1,D),
        token_mask (B,GT+1) bool, valid_hw (B,2) i32)
        -> (box_feat (B,4), seed (B,), seed_in_background (B,)).
        """
        spec, arch, which = self.spec, self.arch, self.which
        nh = spec.extra["num_heads"]
        patch = spec.patch_size
        cdt = self.compute_dtype
        module_apply = self._module_apply

        @jax.jit
        def run(variables, images, pos, token_mask, valid_hw, pixel_hw=None):
            # token_mask=None is the exact-fit fast path: every image fills
            # its bucket (the canonical VOC 512x384 batch does), so the
            # attention mask, the per-image compaction argsort and the
            # scatter all drop out of the compiled program.
            if images.dtype == jnp.uint8:
                # uint8 fast feed: normalize on device (bit-equal to the
                # host float path; XLA fuses it into the input pipeline)
                images = _device_normalize(images, pixel_hw)
            images = images.astype(cdt)
            pos = pos.astype(cdt)
            _, aux = module_apply(
                variables, images, train=False, override_pos_embedding=pos,
                token_mask=token_mask, need_attn=False,
                seq_pad_multiple=_seq_pad(images.shape, patch, False),
            )
            bh, bw = images.shape[1], images.shape[2]
            GH, GW = bh // patch, bw // patch

            if arch == "vit":
                if token_mask is None:
                    t1 = jnp.asarray(1 + GH * GW)

                    def feats_of(x):
                        return scrambled_qkv_gather(x, t1, which)[1:]

                    feats = jax.vmap(feats_of)(aux["qkv_input"])
                else:
                    def feats_of(x, tmask, vhw):
                        # Compact the tier-1 tokens (CLS + valid, raster
                        # order) to the front, apply the reference scramble
                        # with the traced valid count, then scatter back
                        # onto the bucket grid (`main_lost.py:478-490`
                        # semantics, on device).
                        t1 = 1 + vhw[0] * vhw[1]
                        perm = jnp.argsort(~tmask, stable=True)
                        fc = scrambled_qkv_gather(x[perm], t1, which)
                        valid = tmask[1:]
                        idx = jnp.cumsum(valid)  # grid pos -> compact row
                        return jnp.where(valid[:, None], fc[idx], 0.0)

                    feats = jax.vmap(feats_of)(
                        aux["qkv_input"], token_mask, valid_hw
                    )
            else:  # dino: true qkv split; tokens already on the bucket grid
                q, k, v = split_qkv_dino(aux["qkv"], nh)
                feats = {"k": k, "q": q, "v": v}[which][:, 1:, :]

            out = jax.vmap(
                lambda f, vhw: lost_core(
                    f, vhw, grid_hw=(GH, GW), k_patches=k_patches, lean=True
                )
            )(feats, valid_hw)
            return out["box_feat"], out["seed"], out["seed_in_background"]

        return run

    def make_batched_cnn_pipeline(self, k_patches: int = 100):
        """Batched CNN LOST, ONE jitted program per canonical bucket input
        (round 4 — possible only because `--cnn-bucket` gives every image
        in a bucket the same padded shape): batched conv features, the
        per-image masked slab LayerNorm, and the vmapped LOST core.  Like
        the transformer pipeline, only 4-int boxes/seeds/flags leave the
        chip.  The reference's CNN flow is a per-image batch-1 loop
        (`main_lost.py:570-600`).

        Returns fn(variables, images (B,H,W,3), valid_fhw (B,2) i32)
        -> (box_feat (B,4), seed (B,), seed_in_background (B,))."""
        raw = self._raw_cnn_feats
        cdt = self.compute_dtype

        @jax.jit
        def run(variables, images, valid_fhw, pixel_hw=None):
            if images.dtype == jnp.uint8:
                images = _device_normalize(images, pixel_hw)
            feats = raw(variables, images.astype(cdt))  # (B, FH, FW, D)
            b, fh, fw, d = feats.shape
            f = feats.reshape(b, fh * fw, d)
            m = (
                (jnp.arange(fh)[None, :, None] < valid_fhw[:, 0, None, None])
                & (jnp.arange(fw)[None, None, :] < valid_fhw[:, 1, None, None])
            ).reshape(b, fh * fw, 1)
            cnt = (valid_fhw[:, 0] * valid_fhw[:, 1] * d).astype(
                f.dtype)[:, None, None]
            f = masked_slab_layernorm(f, m.astype(f.dtype), cnt)
            out = jax.vmap(
                lambda ff, v: lost_core(
                    ff, v, grid_hw=(fh, fw), k_patches=k_patches, lean=True
                )
            )(f, valid_fhw)
            return out["box_feat"], out["seed"], out["seed_in_background"]

        return run

    def cnn_bucket_key(self, h: int, w: int):
        """Canonical padded input (H, W) for an image — the batched-CNN
        buffer key: every image with this key shares one compile."""
        cb = self.cnn_bucket
        fh, fw = self._cnn_fdim(h), self._cnn_fdim(w)
        return (self._cnn_canon_input(-(-fh // cb) * cb),
                self._cnn_canon_input(-(-fw // cb) * cb))

    def prepare_cnn_batch(self, imgs, canon_hw, exact_hw=None):
        """Stack same-bucket images into (images (B,H,W,3) zero-padded to
        the canonical extent, valid_fhw (B,2) exact feature dims).  uint8
        images keep their dtype (device-side normalization — see
        ``prepare_batch``) and append a ``pixel_hw`` element."""
        u8 = imgs[0].dtype == np.uint8
        H, W = canon_hw
        batch = np.zeros((len(imgs), H, W, 3), np.uint8 if u8 else np.float32)
        fhw = []
        for i, im in enumerate(imgs):
            batch[i, : im.shape[0], : im.shape[1]] = im
            fhw.append((self._cnn_fdim(im.shape[0]),
                        self._cnn_fdim(im.shape[1])))
        out = jnp.asarray(batch), jnp.asarray(fhw, jnp.int32)
        if not u8:
            return out
        if exact_hw is None:
            raise ValueError("uint8 batches need exact_hw (pixel dims)")
        pixel_exact = all(t == (H, W) for t in exact_hw)
        return out + (
            None if pixel_exact else jnp.asarray(exact_hw, jnp.int32),
        )

    def cnn_scales(self, h: int, w: int):
        """Per-image feature->pixel scales for box_feat_to_image (the
        transformer pipeline's constant [patch, patch] equivalent)."""
        return [h / self._cnn_fdim(h), w / self._cnn_fdim(w)]

    def shard_cnn_for_mesh(self, mesh, batch_inputs):
        """Data-parallel placement for the batched CNN pipeline inputs
        (images, valid_fhw[, pixel_hw])."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        images = batch_inputs[0]
        if images.shape[0] % mesh.devices.size:
            raise ValueError(
                f"batch {images.shape[0]} not divisible by "
                f"{mesh.devices.size} devices"
            )
        self.variables = jax.device_put(
            self.variables, NamedSharding(mesh, P()))
        data = NamedSharding(mesh, P("data"))
        return tuple(
            None if x is None else jax.device_put(x, data)
            for x in batch_inputs
        )

    def shard_for_mesh(self, mesh, batch_inputs):
        """Data-parallel LOST: place the batch on a ("data",) mesh (batch
        arrays sharded over the data axis, params/pos replicated) so the
        jitted pipeline runs SPMD over all chips — XLA partitions the
        vmapped program with zero collectives (per-image independence).
        Replaces the reference's single-GPU loop with mesh scaling.
        ``batch_inputs`` is (images, pos, token_mask, valid_hw[, pixel_hw])
        — every non-None element is batch-leading and shards on "data"."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        images = batch_inputs[0]
        if images.shape[0] % mesh.devices.size:
            raise ValueError(
                f"batch {images.shape[0]} not divisible by "
                f"{mesh.devices.size} devices"
            )
        self.variables = jax.device_put(self.variables, repl)
        return tuple(
            None if x is None else jax.device_put(x, data)
            for x in batch_inputs
        )

    def prepare_batch(self, imgs, patch: int, exact_hw=None):
        """Stack tier-1-padded images sharing one bucket shape into the
        batched-pipeline inputs (images, pos, token_mask, valid_hw).
        token_mask comes back None when every image exactly fills the
        bucket (the pipeline's fast path).

        uint8 fast feed (round 5): when ``imgs`` are uint8 (decoded, NOT
        normalized — `data.native.decode_pad`), the batch stays uint8
        (4x less host memory traffic + host->device transfer) and the
        pipeline normalizes ON DEVICE.  ``exact_hw`` must then carry each
        image's exact pixel dims so the device can re-zero the tier-1 +
        bucket pad (host-normalized zero-pad is 0.0, but normalize(0)
        != 0).  Returns a 5th element ``pixel_hw`` ((B, 2) i32, or None
        when every image pixel-exactly fills the bucket)."""
        u8 = imgs[0].dtype == np.uint8
        bh, bw = bucket_hw(imgs[0].shape[0], imgs[0].shape[1], patch, self.bucket)
        GH, GW = bh // patch, bw // patch
        batch = np.zeros((len(imgs), bh, bw, 3),
                         np.uint8 if u8 else np.float32)
        # Per-image pos embeddings are (1, T, D) f32 — at VOC scale ~1.2 MB
        # each, and most images in a bucket share the SAME valid grid.
        # Concatenating B host copies per batch (the round-4 form) shipped
        # ~150 MB of redundant host->device traffic as B separate eager
        # transfers — measured 5-7 s/batch through a tunneled chip, the
        # entire e2e budget.  Instead: ONE device-resident row per (gh,
        # gw) grid (computed on device, cached — _pos_and_mask) and the
        # (B, T, D) batch gathered/broadcast on device.
        order: dict = {}
        rows, mask_rows, idx, vhw = [], [], [], []
        for i, im in enumerate(imgs):
            h, w = im.shape[:2]
            batch[i, :h, :w] = im
            gh, gw = h // patch, w // patch
            key = (gh, gw, GH, GW)
            if key not in order:
                pos, mask = self._pos_and_mask(gh, gw, GH, GW)
                order[key] = len(rows)
                rows.append(pos)          # (1, T, D) device f32
                mask_rows.append(mask)    # (1, T) host bool
            idx.append(order[key])
            vhw.append((gh, gw))
        pos_batch = (
            jnp.take(jnp.concatenate(rows, axis=0),
                     jnp.asarray(idx, jnp.int32), axis=0)
            if len(rows) > 1 else
            jnp.broadcast_to(rows[0], (len(imgs),) + tuple(rows[0].shape[1:]))
        )
        exact_fit = all(t == (GH, GW) for t in vhw)
        out = (
            jnp.asarray(batch),
            pos_batch,
            None if exact_fit
            else jnp.asarray(np.concatenate(
                [mask_rows[u] for u in idx], axis=0)),
            jnp.asarray(vhw, jnp.int32),
        )
        if not u8:
            return out
        if exact_hw is None:
            raise ValueError("uint8 batches need exact_hw (pixel dims)")
        pixel_exact = all(t == (bh, bw) for t in exact_hw)
        return out + (
            None if pixel_exact else jnp.asarray(exact_hw, jnp.int32),
        )


def _prefetch_decoded(dataset, patch: int, no_hard: bool, workers: int = 8,
                      need_gt: bool = True, as_uint8: bool = False):
    """Decode + tier-1-pad images on a bounded thread pool, preserving
    dataset order. The reference decodes synchronously inside its batch-1
    loop (`main_lost.py:383-407`); here host decode overlaps device
    compute so the jitted pipeline, not libjpeg, sets the pace.
    Yields (path, im_name, padded_image, init_image_size, gt).

    ``as_uint8``: the batched-pipeline fast feed — one native C decode
    straight into the patch-padded uint8 slab (`data.native.decode_pad`),
    NO host float math (normalization runs on device) and 4x less host
    memory traffic.  The GIL is released inside the C call, so the thread
    pool scales across cores."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    def load(item):
        path, im_name = item
        if as_uint8:
            from vipers.data import native

            padded, (h, w) = native.decode_pad(path, pad_multiple=patch)
            init_image_size = (3, h, w)
            gt = dataset.extract_gt(im_name)[0] if need_gt else None
            return path, im_name, padded, init_image_size, gt
        img = load_image_normalized(path)
        init_image_size = (3, img.shape[0], img.shape[1])
        # --no-evaluation runs must not touch annotations at all — the
        # reference guards extract_gt the same way (`main_lost.py:425-427`)
        # so LOST works on un-annotated data.
        gt = dataset.extract_gt(im_name)[0] if need_gt else None
        ph = int(np.ceil(img.shape[0] / patch) * patch)
        pw = int(np.ceil(img.shape[1] / patch) * patch)
        padded = np.zeros((ph, pw, 3), np.float32)
        padded[: img.shape[0], : img.shape[1]] = img
        return path, im_name, padded, init_image_size, gt

    depth = max(2 * workers, 8)
    with ThreadPoolExecutor(workers) as exe:
        pending: deque = deque()
        it = iter(dataset)
        done = False
        while pending or not done:
            while not done and len(pending) < depth:
                try:
                    pending.append(exe.submit(load, next(it)))
                except StopIteration:
                    done = True
            if not pending:
                break
            path, im_name, padded, init_size, gt = pending.popleft().result()
            if gt is not None and len(gt) == 0 and no_hard:
                continue
            yield path, im_name, padded, init_size, gt


class _SingleImageDataset:
    """`--image-path` mode (`main_lost.py:297-311`): LOST on one image at
    native resolution, no GT, no evaluation."""

    def __init__(self, path: str):
        self.path = path
        self.name = os.path.basename(path)

    def __iter__(self):
        yield self.path, self.name

    def extract_gt(self, _im_name):
        return None, None


def _templated_checkpoint(models_dir: str, model: str, arch: str,
                          iteration: int) -> str:
    """The reference's checkpoint filename contracts
    (`main_lost.py:344-356`): CNNs sweep `model_epoch_89_pruning_iteration
    _{NN}.pth`, ViTs `{model}_epoch_299_pruning_iteration_{NN}.pth`, under
    `{models_dir}/{model}/`. The reference branches on `'vit' in arch`,
    which covers the DINO archs (vit_small/vit_base) too — match that via
    the model name as well."""
    from vipers.core.checkpoint import reference_sweep_stem

    vit = "vit" in arch or "vit" in model
    fname = reference_sweep_stem(
        model, vit, epoch=299 if vit else 89, iteration=iteration
    )
    base = os.path.join(models_dir, model, fname)
    for cand in (base + ".pth", base):  # .pth import or orbax dir
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"no checkpoint for iteration {iteration} under {models_dir}/{model} "
        f"(tried {base}[.pth])"
    )


class _ProcessShardDataset:
    """Strided per-process view of a discovery dataset for multi-process
    `vipers lost`: process r owns items r, r+P, r+2P, ... — deterministic
    with zero coordination (every image is independent work; the
    reference's DDP drivers shard the same way via DistributedSampler,
    `/root/reference/evaluate_models.py:159-160`).  Everything but
    iteration (``extract_gt`` etc.) delegates to the wrapped dataset."""

    def __init__(self, dataset, rank: int, nproc: int):
        self._ds, self._rank, self._nproc = dataset, rank, nproc

    def __iter__(self):
        for i, item in enumerate(iter(self._ds)):
            if i % self._nproc == self._rank:
                yield item

    def __getattr__(self, name):
        return getattr(self._ds, name)


def run_lost(args) -> int:
    t_start = time.time()
    image_path = getattr(args, "image_path", None)
    no_evaluation = bool(getattr(args, "no_evaluation", False))
    save_predictions = bool(getattr(args, "save_predictions", True))
    nproc, rank = jax.process_count(), jax.process_index()
    if image_path:
        # single-image mode forces both off (`main_lost.py:297-300`)
        no_evaluation, save_predictions = True, False
        dataset = _SingleImageDataset(image_path)
    else:
        dataset = DiscoveryDataset(
            args.dataset, args.set, args.data_path, no_hard=args.no_hard,
            coco_annotations=getattr(args, "coco_annotations", None),
            coco20k_list=getattr(args, "coco20k_list", None),
        )
        if nproc > 1:
            # multi-process sweep: each process runs its stride of the
            # dataset on its own addressable devices; host results are
            # all-gathered and merged before the rank-0 artifact write
            dataset = _ProcessShardDataset(dataset, rank, nproc)
            print(f"LOST multi-process: rank {rank}/{nproc} "
                  "(strided dataset shard)")
    arch = args.arch
    model_kw = {}
    if arch == "dino":
        model_kw["patch_size"] = args.patch_size
    if "resnet" in args.model and getattr(args, "resnet_dilate", 1) != 1:
        model_kw["dilate"] = args.resnet_dilate  # `main_lost.py:231-238`

    pruning_iteration = getattr(args, "pruning_iteration", None)
    if (getattr(args, "models_dir", "") and pruning_iteration is not None
            and not args.checkpoint):
        # an explicit --checkpoint wins over the filename template
        args.checkpoint = _templated_checkpoint(
            args.models_dir, args.model, arch, pruning_iteration
        )
        print(f"checkpoint: {args.checkpoint}")

    from vipers.pruning.structured import arch_sidecar

    arch_overrides = arch_sidecar(getattr(args, "checkpoint", ""))
    if arch_overrides:
        # structurally slimmed checkpoint (`vipers slim`): rebuild the
        # module at the slim widths so parameter shapes match
        model_kw["arch_overrides"] = arch_overrides
        print(f"slim architecture: {arch_overrides}")
    spec = build_model(args.model, **model_kw)
    iteration = (
        pruning_iteration if pruning_iteration is not None else args.iteration
    )

    rng = jax.random.PRNGKey(0)
    h0 = w0 = 224
    from vipers.core.registry import init_variables

    variables = init_variables(spec.module, rng, jnp.zeros((1, h0, w0, 3)), train=False)
    masks = None
    observers = None
    if args.checkpoint:
        variables, masks, observers = load_lost_checkpoint(
            args.checkpoint, spec, variables)
        from vipers.core.checkpoint import (infer_num_classes,
                                            infer_vit_image_size)

        # rebuild at the checkpoint's own head width / pos-table size:
        # flax validates param shapes at apply, so a non-1000-class or
        # non-224px checkpoint needs the module to match (the reference's
        # first interpolate_vit load, `main_lost.py:363-364`)
        n_cls = infer_num_classes(variables["params"])
        if spec.family == "vit":
            size = infer_vit_image_size(
                variables["params"], spec.patch_size)
            if size is not None and size != spec.input_size:
                model_kw["image_size"] = size
        if n_cls is not None or "image_size" in model_kw:
            if n_cls is not None:
                model_kw["num_classes"] = n_cls
            spec = build_model(args.model, **model_kw)

    dtype = {"f32": None, "bf16": jnp.bfloat16, "int8": "int8"}[
        getattr(args, "dtype", None) or "f32"
    ]
    seq_mesh = None
    if getattr(args, "sequence_parallel", False):
        if getattr(args, "data_parallel", False):
            raise SystemExit(
                "--sequence-parallel and --data-parallel are mutually "
                "exclusive (token-axis vs batch-axis sharding)"
            )
        if arch not in ("vit", "dino"):
            raise SystemExit(
                "--sequence-parallel shards the transformer token axis; "
                f"arch {arch!r} has no token dimension to shard"
            )
        from vipers.parallel.sp import make_seq_mesh

        seq_mesh = make_seq_mesh()
        if seq_mesh.devices.size < 2:
            # a 1-device token mesh parallelizes nothing but would still
            # gate off every Pallas fast path — pure perf regression
            import warnings

            warnings.warn(
                "--sequence-parallel ignored: only 1 device visible "
                "(token-axis sharding needs >= 2); running single-device "
                "with the fast kernels enabled"
            )
            seq_mesh = None
        else:
            print(f"LOST sequence-parallel over {seq_mesh.devices.size} "
                  "devices (token axis)")
    extractor = LostFeatureExtractor(
        spec, variables, masks, arch=arch, which_features=args.which_features,
        observers=observers,
        # dino_seg is bucket-safe: the masked softmax gives bucket-pad keys
        # EXACT zero attention probability, so the 60%-mass threshold,
        # component analysis, and box are unchanged (tested) — no
        # per-image-shape recompile. Only --dinoseg-reference-bugs runs at
        # exact shapes, since its bit-for-bit component-id contract is
        # grid-layout-sensitive.
        bucket=1 if getattr(args, "dinoseg_reference_bugs", False) else 4,
        # only dino_seg consumes the per-head attention probs
        need_attn=bool(args.dinoseg),
        compute_dtype=dtype,
        sequence_mesh=seq_mesh,
        # CNN LOST: feature-grid bucketing by default (one compile per
        # bucket); `--exact-shapes` restores the reference's exact
        # native-resolution regime (boundary-exact, compile per shape)
        cnn_bucket=1 if getattr(args, "exact_shapes", False)
        else int(getattr(args, "cnn_bucket", 0) or 4),
        swin_all_windows=bool(getattr(args, "swin_all_windows", False)),
    )
    acc = CorLocAccumulator()
    n_imgs = 0
    p = args.patch_size

    # Batched product path: transformers, no per-image artifacts requested.
    # Images stream into per-bucket buffers; each full buffer runs as one
    # jitted forward+LOST program (one compile per bucket shape).
    use_batched = (
        arch in ("vit", "dino") and not args.visualize and not args.dinoseg
    )
    # CNN batching rides the bucketed compile economics: every image in a
    # bucket shares the canonical padded shape, so a whole batch is one
    # program (the reference's CNN flow is a per-image batch-1 loop).
    # --exact-shapes keeps the per-image parity path.
    use_batched_cnn = (
        arch not in ("vit", "dino", "swin")
        and extractor.cnn_bucket > 1
        and not args.visualize and not args.dinoseg
    )
    batch_size = int(getattr(args, "batch_size", 0) or 8)
    buffers: dict = {}
    pipeline = (
        extractor.make_batched_pipeline(k_patches=args.k_patches)
        if use_batched else
        extractor.make_batched_cnn_pipeline(k_patches=args.k_patches)
        if use_batched_cnn else None
    )
    # uint8 fast feed (default for the batched paths): native C decode into
    # patch-padded uint8 slabs, normalization ON DEVICE (bit-equal — same
    # f32 op order).  `--host-normalize` restores the float host feed.
    feed_uint8 = (
        (use_batched or use_batched_cnn)
        and not getattr(args, "host_normalize", False)
    )
    mesh = None
    if (use_batched or use_batched_cnn) and getattr(args, "data_parallel", False):
        from vipers.parallel.mesh import make_mesh

        # multi-process: the dataset is already process-sharded, so each
        # process data-parallelizes its OWN stride over its addressable
        # devices — a local mesh, not a global one (no cross-process
        # batch assembly needed; per-image independence)
        mesh = make_mesh(
            jax.local_devices() if nproc > 1 else None, model_parallel=1)
        n_dev = mesh.devices.size
        batch_size = max(batch_size // n_dev, 1) * n_dev
        print(f"LOST data-parallel over {n_dev} devices, batch {batch_size}")

    # `--strict` reproduces the reference's uncaught raise
    # (`object_discovery.py:110-112`); default collects failures so one bad
    # image can't discard a whole accumulated sweep.
    strict = bool(getattr(args, "strict", False))
    failed: list = []
    # Deep pipelining (round 5): dispatch is async, so flush() only
    # enqueues the device program; the blocking device_get happens for a
    # whole GROUP of queued batches in ONE call once the queue reaches
    # DRAIN_DEPTH.  One fetch per group instead of per batch matters
    # doubly: host decode + batch assembly of the next batches overlap
    # device compute (round-3 double buffering), and on a tunneled chip
    # — where any readback of device results costs seconds regardless of
    # size (docs/PERF.md round 5) — the fetch penalty amortizes over
    # DRAIN_DEPTH * batch images.
    drain_depth = int(os.environ.get("VIPERS_LOST_DRAIN_DEPTH", "8"))
    in_flight = deque()

    def drain_group():
        group = []
        while in_flight:
            group.append(in_flight.popleft())
        fetched = jax.device_get([outs for outs, _r, _n in group])
        for (outs, recs, n_real), (box_feat, _seeds, seed_bg) in zip(
                group, fetched):
            for i in range(n_real):
                im_name, _img, init_size, gt_i = recs[i]
                if bool(seed_bg[i]):
                    if strict:
                        raise ValueError(
                            "The seed is in the background component "
                            f"({im_name})."
                        )
                    failed.append(im_name)
                    continue
                scales = (
                    extractor.cnn_scales(*_img.shape[:2]) if use_batched_cnn
                    else [p, p]
                )
                pred = box_feat_to_image(box_feat[i], scales, init_size)
                acc.add(im_name, pred, gt_i)

    def flush(bucket_key):
        recs = buffers.pop(bucket_key)
        imgs = [r[1] for r in recs]
        n_real = len(imgs)
        # pad the tail batch by repeating the last image so every bucket
        # compiles exactly one batch shape
        imgs = imgs + [imgs[-1]] * (batch_size - n_real)
        exact_hw = None
        if feed_uint8:
            # exact pixel dims per image (init_image_size is (3, h, w)) —
            # the device normalize re-zeroes beyond them
            exact_hw = [tuple(r[2][1:]) for r in recs]
            exact_hw += [exact_hw[-1]] * (batch_size - n_real)
        if use_batched_cnn:
            batch_inputs = extractor.prepare_cnn_batch(
                imgs, bucket_key, exact_hw=exact_hw)
            if mesh is not None:
                batch_inputs = extractor.shard_cnn_for_mesh(mesh, batch_inputs)
        else:
            batch_inputs = extractor.prepare_batch(imgs, p, exact_hw=exact_hw)
            if mesh is not None:
                batch_inputs = extractor.shard_for_mesh(mesh, batch_inputs)
        in_flight.append((
            pipeline(extractor.variables, *batch_inputs), recs, n_real,
        ))
        if len(in_flight) >= drain_depth:
            drain_group()

    # tier-1 padding (participates) — `main_lost.py:399-407` — happens in
    # the prefetch workers; host decode overlaps device compute.
    # --workers 0 means synchronous single-threaded decode (1 worker), not
    # "use the default"; the default (8) applies only when the flag is absent
    workers = getattr(args, "workers", None)
    workers = 8 if workers is None else max(int(workers), 1)
    for path, im_name, padded, init_image_size, gt in _prefetch_decoded(
        dataset, p, args.no_hard,
        workers=workers,
        need_gt=not no_evaluation,
        as_uint8=feed_uint8,
    ):
        n_imgs += 1

        if use_batched or use_batched_cnn:
            key = (
                extractor.cnn_bucket_key(padded.shape[0], padded.shape[1])
                if use_batched_cnn else
                bucket_hw(padded.shape[0], padded.shape[1], p,
                          extractor.bucket)
            )
            buffers.setdefault(key, []).append(
                (im_name, padded, init_image_size, gt)
            )
            if len(buffers[key]) == batch_size:
                flush(key)
            continue

        feats, dims, valid_dims, scales, attn = extractor.extract(padded, p)
        if args.dinoseg:
            if attn is None:
                raise ValueError("--dinoseg needs a transformer arch")
            pred = np.asarray(
                dino_seg(attn, dims, p, head=args.dinoseg_head,
                         reference_bugs=getattr(
                             args, "dinoseg_reference_bugs", False)),
                dtype=np.float64,
            )
        else:
            try:
                pred, _A, _scores, _seed = lost(
                    feats, dims, scales, init_image_size,
                    k_patches=args.k_patches, valid_dims=valid_dims,
                )
            except ValueError as e:
                # seed in background — same collect-or-crash contract as
                # the batched flush above (other ValueErrors still raise)
                if strict or "background" not in str(e):
                    raise
                failed.append(im_name)
                continue
        acc.add(im_name, pred, gt)
        if args.visualize:
            from vipers.viz.draw import save_lost_visualization

            save_lost_visualization(
                args.visualize, path, pred, gt, _A if not args.dinoseg else None,
                _scores if not args.dinoseg else None,
                _seed if not args.dinoseg else None,
                dims, scales, args.output_dir, im_name,
            )

    for key in sorted(buffers):
        flush(key)
    drain_group()

    if nproc > 1:
        # merge every process's host-side results (collective — all
        # ranks participate) so rank 0 writes the same preds.pkl /
        # results txt a single-process run would
        from vipers.parallel.mesh import allgather_host_objects

        payloads = allgather_host_objects({
            "hits": acc.hits, "count": acc.count, "preds": acc.preds,
            "failed": failed, "n_imgs": n_imgs,
        })
        acc, failed, n_imgs = CorLocAccumulator(), [], 0
        for pl in payloads:
            acc.hits += pl["hits"]
            acc.count += pl["count"]
            acc.preds.update(pl["preds"])
            failed += pl["failed"]
            n_imgs += pl["n_imgs"]

    if failed and rank == 0:
        print(
            f"WARNING: seed in background component for {len(failed)} "
            f"image(s), skipped: {', '.join(failed[:10])}"
            + (" ..." if len(failed) > 10 else "")
            + " (rerun with --strict for reference-parity crashing)"
        )

    if rank == 0:
        os.makedirs(args.output_dir, exist_ok=True)
        acc.save(args.output_dir, iteration, save_preds=save_predictions,
                 save_results=not no_evaluation)
        dt = time.time() - t_start
        print(f"LOST: {n_imgs} images in {dt:.1f}s "
              f"({n_imgs / max(dt, 1e-9):.2f} img/s)")
    return 0


def load_lost_checkpoint(path: str, spec, variables):
    """Load either an orbax checkpoint dir (ours) or a torch .pth
    (imported); returns (variables, masks, observers) — observers is the
    PTQ/QAT activation-range dict ({site: {"min", "max"}}) when the
    checkpoint carries one (written by `vipers quantize`), else None; the
    int8 serving path uses it for calibrated static qparams."""
    if path.endswith(".pth") or path.endswith(".pt"):
        from vipers.core.checkpoint import import_torch_checkpoint, to_jax

        params, batch_stats, masks = import_torch_checkpoint(path, spec.name)
        variables = {"params": to_jax(params)}
        if batch_stats is not None:
            variables["batch_stats"] = to_jax(batch_stats)
        return (variables,
                {k: jnp.asarray(v) for k, v in (masks or {}).items()}, None)
    from vipers.core.checkpoint import restore_checkpoint

    tree = restore_checkpoint(path)
    variables = {"params": tree["params"]}
    if tree.get("batch_stats") is not None:
        variables["batch_stats"] = tree["batch_stats"]
    masks = {
        tuple(k.split("/")): jnp.asarray(v, bool)
        for k, v in (tree.get("masks") or {}).items()
    }
    return variables, masks, tree.get("observers")
