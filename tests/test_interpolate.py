"""Bicubic pos-embed interpolation parity vs torch (SURVEY.md §4.1).

The reference resizes ViT pos-embeddings with F.interpolate(bicubic,
align_corners=True) incl. rectangular targets
(vision_transformer.py:808,830-858); DINO uses align_corners=False.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vipers.models.interpolate import bicubic_resize_2d, interpolate_pos_embedding


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("out_hw", [(14, 14), (20, 30), (7, 9), (40, 61)])
@pytest.mark.slow
def test_bicubic_matches_torch(align, out_hw):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 5, 14, 14)).astype(np.float32)
    t = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bicubic", align_corners=align
    ).numpy()
    j = np.asarray(bicubic_resize_2d(jnp.asarray(x), out_hw, align_corners=align))
    np.testing.assert_allclose(j, t, atol=2e-5, rtol=1e-4)


def test_interpolate_pos_embedding_rectangular():
    rng = np.random.default_rng(1)
    dim = 16
    pos = rng.normal(size=(1, 14 * 14 + 1, dim)).astype(np.float32)
    out = interpolate_pos_embedding(jnp.asarray(pos), (20, 30))
    assert out.shape == (1, 601, dim)
    # class token untouched (vision_transformer.py:816-819)
    np.testing.assert_array_equal(np.asarray(out)[0, 0], pos[0, 0])

    # exact parity with the reference's torch surgery
    grid = torch.from_numpy(pos[:, 1:].transpose(0, 2, 1).reshape(1, dim, 14, 14))
    t = F.interpolate(grid, size=(20, 30), mode="bicubic", align_corners=True)
    t = t.reshape(1, dim, 600).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(out)[:, 1:], t, atol=2e-5, rtol=1e-4)


def test_identity_when_same_size():
    pos = jnp.asarray(np.random.default_rng(2).normal(size=(1, 197, 8)).astype(np.float32))
    out = interpolate_pos_embedding(pos, (14, 14))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pos))
