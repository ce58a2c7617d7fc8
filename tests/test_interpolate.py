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


def test_numpy_twin_matches_jitted():
    """interpolate_pos_embedding_np (host-side, no jax backend — the LOST
    driver's weight-matrix source) matches the jnp implementation to float
    round-off on square and rectangular targets, both align modes."""
    from vipers.models.interpolate import interpolate_pos_embedding_np

    rng = np.random.default_rng(3)
    pos = rng.normal(size=(1, 14 * 14 + 1, 24)).astype(np.float32)
    for align in (True, False):
        for hw in ((20, 30), (7, 7), (14, 14)):
            a = interpolate_pos_embedding_np(pos, hw, align_corners=align)
            b = np.asarray(interpolate_pos_embedding(
                jnp.asarray(pos), hw, align_corners=align))
            np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5)


def test_weight_matrix_identity_and_torch_parity():
    """resize_weight_matrix_np: out == in yields the exact identity (the
    no-resize native path of the driver's device-side interpolation), and
    applying the matrices reproduces torch bicubic."""
    import torch
    import torch.nn.functional as F

    from vipers.models.interpolate import resize_weight_matrix_np

    np.testing.assert_array_equal(
        resize_weight_matrix_np(14, 14, True), np.eye(14, dtype=np.float32))
    np.testing.assert_array_equal(
        resize_weight_matrix_np(9, 9, False), np.eye(9, dtype=np.float32))

    rng = np.random.default_rng(4)
    x = rng.normal(size=(14, 14)).astype(np.float32)
    for align, (oh, ow) in ((True, (23, 31)), (False, (10, 17))):
        mh = resize_weight_matrix_np(14, oh, align)
        mw = resize_weight_matrix_np(14, ow, align)
        got = mh @ x @ mw.T
        want = F.interpolate(
            torch.from_numpy(x)[None, None], size=(oh, ow),
            mode="bicubic", align_corners=align,
        )[0, 0].numpy()
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_driver_pos_and_mask_matches_host_reference():
    """The LOST driver's device-side pos computation (weight matrices ->
    jitted matmul-matmul -> scatter-into-bucket via zero rows) must equal
    the straightforward host recipe: interpolate_pos_embedding_np to the
    valid grid, scattered into the bucket grid; and the CLS+valid mask
    must mark exactly the valid raster cells."""
    import jax

    from vipers.core.registry import build_model, init_variables
    from vipers.discovery.driver import LostFeatureExtractor
    from vipers.models.interpolate import interpolate_pos_embedding_np

    spec = build_model("vit_s_16", num_classes=10, image_size=(64, 64))
    variables = init_variables(
        spec.module, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        train=False)
    ex = LostFeatureExtractor(spec, variables, arch="vit",
                              which_features="k")
    pos_np = np.asarray(variables["params"]["pos_embedding"], np.float32)
    for gh, gw, GH, GW in ((3, 5, 4, 8), (4, 4, 4, 4), (6, 2, 8, 4)):
        full_dev, mask = ex._pos_and_mask(gh, gw, GH, GW)
        interp = interpolate_pos_embedding_np(pos_np, (gh, gw))
        d = interp.shape[-1]
        want = np.zeros((1, GH * GW + 1, d), np.float32)
        want[:, 0] = interp[:, 0]
        scat = np.zeros((GH, GW, d), np.float32)
        scat[:gh, :gw] = interp[0, 1:].reshape(gh, gw, d)
        want[:, 1:] = scat.reshape(1, GH * GW, d)
        np.testing.assert_allclose(
            np.asarray(full_dev), want, atol=2e-6, rtol=1e-5,
            err_msg=f"grid ({gh},{gw}) in bucket ({GH},{GW})")
        rows = np.arange(GH * GW) // GW
        cols = np.arange(GH * GW) % GW
        want_mask = np.concatenate(
            [[True], (rows < gh) & (cols < gw)])[None, :]
        np.testing.assert_array_equal(np.asarray(mask), want_mask)
