"""Shared token-axis padding helpers for the transformer models.

One-shot sequence padding for flash-kernel alignment (see
``models/vit.py`` ``seq_pad_multiple``): pad the (N, T, D) token stream
once to a multiple, mark pad rows invalid in the token mask, and undo
with a single slice after the encoder.
"""

from __future__ import annotations

import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_tokens(x, token_mask, seq_len: int, multiple: int):
    """Pad (N, T, D) ``x`` to a ``multiple`` of tokens with zero rows and
    extend/synthesize the (N, T) validity mask marking pads invalid.
    Returns (x, token_mask) unchanged when already aligned."""
    if not multiple or seq_len % multiple == 0:
        return x, token_mask
    t_pad = round_up(seq_len, multiple)
    n = x.shape[0]
    x = jnp.pad(x, ((0, 0), (0, t_pad - seq_len), (0, 0)))
    base = (
        token_mask if token_mask is not None
        else jnp.ones((n, seq_len), bool)
    )
    return x, jnp.pad(base, ((0, 0), (0, t_pad - seq_len)))


def unpad_tokens(x, qkv_like, attn, seq_len: int):
    """Undo ``pad_tokens`` with one slice each on the token stream, the
    qkv/ln1 aux tensor, and (if present) the (N, H, T, T) attention."""
    if x.shape[1] == seq_len:
        return x, qkv_like, attn
    x = x[:, :seq_len]
    qkv_like = qkv_like[:, :seq_len]
    if attn is not None:
        attn = attn[:, :, :seq_len, :seq_len]
    return x, qkv_like, attn
