"""Positional-embedding interpolation (rectangular-aware), jitted.

Replaces the reference's checkpoint-surgery ``interpolate_embeddings``
(`/root/reference/vision_transformer.py:781-858`), which rebuilt a whole
torch model per image in the LOST loop (`/root/reference/main_lost.py:412-415`).
Here interpolation is a pure function on the pos-embedding array, so running
a ViT at a new resolution is a cheap param swap under jit.

Parity notes:
  * the torchvision path uses ``F.interpolate(mode="bicubic",
    align_corners=True)`` — implemented exactly below (Keys cubic kernel
    a=-0.75, coordinate map ``x_in = x_out * (in-1)/(out-1)``, edge clamp),
  * the DINO path (`dino.vision_transformer.interpolate_pos_encoding`) uses
    bicubic with align_corners=False (half-pixel centers) — also provided.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x, a: float = -0.75):
    """Keys cubic convolution kernel, matching torch's bicubic (A=-0.75)."""
    x = jnp.abs(x)
    x2 = x * x
    x3 = x2 * x
    f1 = (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0  # |x| <= 1
    f2 = a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a  # 1 < |x| < 2
    return jnp.where(x <= 1.0, f1, jnp.where(x < 2.0, f2, 0.0))


def _resize_axis(x, out_size: int, axis: int, align_corners: bool):
    """Cubic resample of one axis via a dense (out, in) weight matrix.

    Grids here are tiny (pos-embedding grids, <= ~100 per side), so a dense
    matmul is both exact and MXU-friendly — no gathers.
    """
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    out_idx = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners and out_size > 1:
        src = out_idx * (in_size - 1) / (out_size - 1)
    elif align_corners:
        src = jnp.zeros_like(out_idx)
    else:
        scale = in_size / out_size
        src = (out_idx + 0.5) * scale - 0.5
    base = jnp.floor(src)
    in_idx = jnp.arange(-1, 3, dtype=jnp.float32)[None, :] + base[:, None]  # (out, 4)
    w = _cubic_kernel(src[:, None] - in_idx)  # (out, 4)
    # Border: torch clamps source indices (replicate padding).
    in_clamped = jnp.clip(in_idx, 0, in_size - 1).astype(jnp.int32)
    mat = jnp.zeros((out_size, in_size), jnp.float32)
    for t in range(4):
        mat = mat.at[jnp.arange(out_size), in_clamped[:, t]].add(w[:, t])
    x = jnp.moveaxis(x, axis, -1)
    # precision="highest": keep full f32 accumulation (TPU default would use
    # bf16 MXU passes; parity with torch needs exact f32 here).
    y = jnp.einsum("...i,oi->...o", x.astype(jnp.float32), mat, precision="highest")
    return jnp.moveaxis(y, -1, axis)


def bicubic_resize_2d(grid, out_hw, align_corners: bool):
    """Resize ``grid`` of shape (..., H, W) to (..., out_h, out_w)."""
    out_h, out_w = out_hw
    grid = _resize_axis(grid, out_h, axis=-2, align_corners=align_corners)
    grid = _resize_axis(grid, out_w, axis=-1, align_corners=align_corners)
    return grid


def resize_weight_matrix_np(in_size: int, out_size: int,
                            align_corners: bool):
    """The dense (out, in) f32 bicubic resample matrix of
    :func:`_resize_axis`, built in pure numpy — a function of SIZES only.

    This is the host-side half of the LOST driver's device-side
    pos-embedding interpolation (`discovery/driver.py` ``_pos_and_mask``):
    the matrix (a few KB) is uploaded as DATA into one jitted
    matmul-matmul program per bucket shape, so a new (gh, gw) grid costs
    no new compile and — critically on a tunneled TPU, where device->host
    reads of parameters measured ~100 s for 300 KB and degraded the link
    afterwards — the stored pos embedding never leaves the device.
    ``out == in`` yields the exact identity (the Keys kernel is 1 at
    offset 0 and 0 at integer offsets), reproducing the no-resize native
    path."""
    out_idx = np.arange(out_size, dtype=np.float32)
    if align_corners and out_size > 1:
        src = out_idx * (in_size - 1) / (out_size - 1)
    elif align_corners:
        src = np.zeros_like(out_idx)
    else:
        scale = in_size / out_size
        src = (out_idx + 0.5) * scale - 0.5
    base = np.floor(src)
    in_idx = np.arange(-1, 3, dtype=np.float32)[None, :] + base[:, None]
    x_abs = np.abs((src[:, None] - in_idx).astype(np.float32))
    a = np.float32(-0.75)
    x2 = x_abs * x_abs
    x3 = x2 * x_abs
    f1 = (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0
    f2 = a * x3 - 5.0 * a * x2 + 8.0 * a * x_abs - 4.0 * a
    w = np.where(x_abs <= 1.0, f1,
                 np.where(x_abs < 2.0, f2, 0.0)).astype(np.float32)
    in_clamped = np.clip(in_idx, 0, in_size - 1).astype(np.int32)
    mat = np.zeros((out_size, in_size), np.float32)
    np.add.at(mat, (np.arange(out_size)[:, None], in_clamped), w)
    return mat


def _resize_axis_np(x, out_size: int, axis: int, align_corners: bool):
    """Pure-numpy twin of :func:`_resize_axis` — same kernel, coordinate
    map, clamp, and dense-matrix contraction, with no jax backend
    (`tests/test_interpolate.py` pins the np/jnp twins against each other
    and torch)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    mat = resize_weight_matrix_np(in_size, out_size, align_corners)
    x = np.moveaxis(x, axis, -1)
    y = np.einsum("...i,oi->...o", x.astype(np.float32), mat)
    return np.moveaxis(y, -1, axis)


def interpolate_pos_embedding_np(
    pos_embedding,
    new_grid_hw,
    has_class_token: bool = True,
    align_corners: bool = True,
):
    """Pure-numpy twin of :func:`interpolate_pos_embedding` (host-side
    callers only — see :func:`_resize_axis_np`)."""
    pos_embedding = np.asarray(pos_embedding)
    _, seq_len, dim = pos_embedding.shape
    n_cls = 1 if has_class_token else 0
    tok = pos_embedding[:, :n_cls, :]
    img = pos_embedding[:, n_cls:, :]
    side = int(round((seq_len - n_cls) ** 0.5))
    if side * side != seq_len - n_cls:
        raise ValueError(
            f"stored pos-embedding grid is not square: {seq_len - n_cls}")
    gh, gw = new_grid_hw
    if (gh, gw) == (side, side):
        return pos_embedding
    grid = img.reshape(1, side, side, dim).transpose(0, 3, 1, 2)
    grid = _resize_axis_np(grid, gh, axis=-2, align_corners=align_corners)
    grid = _resize_axis_np(grid, gw, axis=-1, align_corners=align_corners)
    grid = grid.transpose(0, 2, 3, 1).reshape(1, gh * gw, dim)
    grid = grid.astype(pos_embedding.dtype)
    if has_class_token:
        return np.concatenate([tok, grid], axis=1)
    return grid


def interpolate_pos_embedding(
    pos_embedding,
    new_grid_hw,
    has_class_token: bool = True,
    align_corners: bool = True,
):
    """Resize a (1, T, D) ViT pos-embedding to a new (gh, gw) token grid.

    The stored grid is assumed square (torchvision checkpoints are
    224/patch per side — `/root/reference/vision_transformer.py:823-828`);
    the *target* may be rectangular (`:808,830-831`).
    """
    _, seq_len, dim = pos_embedding.shape
    n_cls = 1 if has_class_token else 0
    tok = pos_embedding[:, :n_cls, :]
    img = pos_embedding[:, n_cls:, :]
    side = int(round((seq_len - n_cls) ** 0.5))
    if side * side != seq_len - n_cls:
        raise ValueError(f"stored pos-embedding grid is not square: {seq_len - n_cls}")
    gh, gw = new_grid_hw
    if (gh, gw) == (side, side):
        return pos_embedding
    grid = img.reshape(1, side, side, dim).transpose(0, 3, 1, 2)  # (1, D, H, W)
    grid = bicubic_resize_2d(grid, (gh, gw), align_corners=align_corners)
    grid = grid.transpose(0, 2, 3, 1).reshape(1, gh * gw, dim)
    grid = grid.astype(pos_embedding.dtype)
    if has_class_token:
        return jnp.concatenate([tok, grid], axis=1)
    return grid
