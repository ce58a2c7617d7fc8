"""Image preprocessing: host decode + device-fused normalize/crop pipeline.

Replaces the reference's preset stacks
(`/root/reference/presets.py:17-119`, `/root/reference/_presets.py:39-85`):
  * eval: Resize(shorter=resize_size) -> CenterCrop(crop_size) -> scale to
    [0,1] -> normalize(ImageNet mean/std),
  * train: RandomResizedCrop(crop) + HFlip (host PIL, matching the PIL
    backend default) -> device normalize (+ RandomErasing on device).

The deterministic per-image decode/resize runs on host (PIL/libjpeg); the
per-batch elementwise math — scale, normalize, erase, mixup — is one jitted
device function so it fuses with the model's first conv (BASELINE
north-star: "decode-resize-normalize fuses into a device-side pipeline").
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ----------------------------- host side ---------------------------------

def load_image_rgb(path: str) -> Image.Image:
    img = Image.open(path)
    return img.convert("RGB")


PIL_INTERP = {
    "nearest": Image.NEAREST,
    "bilinear": Image.BILINEAR,
    "bicubic": Image.BICUBIC,
    "lanczos": Image.LANCZOS,
    "hamming": Image.HAMMING,
    "box": Image.BOX,
}  # the reference's --interpolation choices (InterpolationMode names)


def resize_shorter(img: Image.Image, size: int,
                   interpolation: str = "bilinear") -> Image.Image:
    # torchvision semantics: the long side TRUNCATES (`int(size * long /
    # short)`, torchvision F_pil.resize / _compute_resized_output_size) —
    # rounding instead shifts the center crop by a pixel on ~half of all
    # aspect ratios, so every evaluated pixel would differ from a reference
    # checkpoint's preprocessing.
    w, h = img.size
    if w <= h:
        nw, nh = size, int(size * h / w)
    else:
        nw, nh = int(size * w / h), size
    return img.resize((nw, nh), PIL_INTERP[interpolation])


def center_crop(arr: np.ndarray, crop: int) -> np.ndarray:
    # torchvision F.center_crop: int(round((h - crop) / 2.0)) — Python
    # round-half-even, which lands one pixel off a plain floor whenever
    # (h - crop) mod 4 in {2, 3}
    h, w = arr.shape[:2]
    top = int(round((h - crop) / 2.0))
    left = int(round((w - crop) / 2.0))
    return arr[top : top + crop, left : left + crop]


def eval_decode(path: str, resize_size: int = 256, crop_size: int = 224,
                interpolation: str = "bilinear") -> np.ndarray:
    """Host part of the eval preset: decode->resize->centercrop, uint8 HWC."""
    img = resize_shorter(load_image_rgb(path), resize_size, interpolation)
    arr = np.asarray(img, dtype=np.uint8)
    return center_crop(arr, crop_size)


def random_resized_crop(
    img: Image.Image,
    crop_size: int,
    rng: np.random.Generator,
    scale=(0.08, 1.0),
    ratio=(3 / 4, 4 / 3),
    interpolation: str = "bilinear",
) -> np.ndarray:
    """torchvision RandomResizedCrop semantics (10 tries then center-ish
    fallback), PIL resize in the requested interpolation mode."""
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
        aspect = np.exp(rng.uniform(*log_ratio))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = int(rng.integers(0, w - cw + 1))
            top = int(rng.integers(0, h - ch + 1))
            box = (left, top, left + cw, top + ch)
            out = img.resize((crop_size, crop_size),
                             PIL_INTERP[interpolation], box=box)
            return np.asarray(out, dtype=np.uint8)
    # fallback: center crop at clamped aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        ch, cw = h, int(round(h * ratio[1]))
    else:
        cw, ch = w, h
    left, top = (w - cw) // 2, (h - ch) // 2
    out = img.resize((crop_size, crop_size), PIL_INTERP[interpolation],
                     box=(left, top, left + cw, top + ch))
    return np.asarray(out, dtype=np.uint8)


def train_decode(
    path: str, rng: np.random.Generator, crop_size: int = 224,
    hflip_prob: float = 0.5, auto_augment: str = "",
    ra_magnitude: int = 9, augmix_severity: int = 3,
    interpolation: str = "bilinear",
) -> np.ndarray:
    img = load_image_rgb(path)
    arr = random_resized_crop(img, crop_size, rng, interpolation=interpolation)
    if hflip_prob > 0 and rng.random() < hflip_prob:
        arr = arr[:, ::-1]
    if auto_augment:
        from vipers.data.autoaugment import apply_policy

        arr = apply_policy(auto_augment, np.ascontiguousarray(arr), rng,
                           ra_magnitude=ra_magnitude,
                           augmix_severity=augmix_severity)
    return np.ascontiguousarray(arr)


# ---------------------------- device side --------------------------------

def make_device_normalize(
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    dtype=jnp.float32,
    random_erase_prob: float = 0.0,
):
    """Jitted uint8(N,H,W,C) -> normalized float(N,H,W,C) (+RandomErasing)."""
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)

    @jax.jit
    def fn(batch_u8, rng: Optional[jax.Array] = None):
        # exact torch op order — ConvertImageDtype (x/255) then Normalize
        # ((x-mean)/std) — for bit parity with reference preprocessing;
        # folding into (x - 255*mean)/(255*std) drifts ~1 ulp
        x = (batch_u8.astype(jnp.float32) / 255.0 - mean_a) / std_a
        if random_erase_prob > 0.0 and rng is not None:
            x = _random_erase(x, rng, random_erase_prob)
        return x.astype(dtype)

    return fn


def _random_erase(x, rng, prob, scale=(0.02, 0.33), ratio=(0.3, 3.3)):
    """RandomErasing(value=0-ish noise-free): zero a random rectangle per
    image with probability ``prob`` (presets.py:69-70)."""
    n, h, w, _ = x.shape
    k_apply, k_area, k_ar, k_top, k_left = jax.random.split(rng, 5)
    apply = jax.random.uniform(k_apply, (n,)) < prob
    area = jax.random.uniform(k_area, (n,), minval=scale[0], maxval=scale[1]) * h * w
    log_r = jax.random.uniform(
        k_ar, (n,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    ar = jnp.exp(log_r)
    eh = jnp.clip(jnp.sqrt(area / ar).astype(jnp.int32), 1, h)
    ew = jnp.clip(jnp.sqrt(area * ar).astype(jnp.int32), 1, w)
    top = (jax.random.uniform(k_top, (n,)) * (h - eh + 1)).astype(jnp.int32)
    left = (jax.random.uniform(k_left, (n,)) * (w - ew + 1)).astype(jnp.int32)
    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    inside = (
        (rows >= top[:, None, None]) & (rows < (top + eh)[:, None, None])
        & (cols >= left[:, None, None]) & (cols < (left + ew)[:, None, None])
    )
    mask = inside & apply[:, None, None]
    return jnp.where(mask[..., None], 0.0, x)


@functools.partial(jax.jit, static_argnames=("resize", "crop"))
def eval_preprocess(batch_u8, resize: int = 256, crop: int = 224,
                    mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Fully device-side eval preset for fixed-size inputs: bilinear
    (antialiased) resize of the shorter side, center crop, normalize.

    Used for benchmarking and for pipelines whose decode already produced a
    canonical size; arbitrary-size images go through ``eval_decode`` on host.
    """
    n, h, w, c = batch_u8.shape
    # long side truncates, matching resize_shorter / torchvision
    if h <= w:
        nh, nw = resize, int(resize * w / h)
    else:
        nh, nw = int(resize * h / w), resize
    x = jax.image.resize(batch_u8.astype(jnp.float32), (n, nh, nw, c), "bilinear", antialias=True)
    top = int(round((nh - crop) / 2.0))  # torchvision center_crop rounding
    left = int(round((nw - crop) / 2.0))
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (n, crop, crop, c))
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    return (x / 255.0 - mean_a) / std_a


def lost_pad_to_patch_multiple(img_hwc: np.ndarray, patch_size: int):
    """Zero-pad H and W up to the next patch multiple
    (`/root/reference/main_lost.py:399-407` — pad pixels deliberately
    participate downstream, reproduced for CorLoc parity)."""
    h, w = img_hwc.shape[:2]
    ph = int(np.ceil(h / patch_size) * patch_size)
    pw = int(np.ceil(w / patch_size) * patch_size)
    out = np.zeros((ph, pw) + img_hwc.shape[2:], dtype=img_hwc.dtype)
    out[:h, :w] = img_hwc
    return out


def bucket_hw(h: int, w: int, patch_size: int, bucket: int = 4):
    """Round padded sizes up to ``bucket`` patches so LOST batches hit a
    small set of compiled shapes instead of one per image (SURVEY §5
    'bucketed shapes' — replaces the reference's per-image model rebuild)."""
    gh = -(-h // patch_size)
    gw = -(-w // patch_size)
    gh = -(-gh // bucket) * bucket
    gw = -(-gw // bucket) * bucket
    return gh * patch_size, gw * patch_size
