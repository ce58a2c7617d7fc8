"""torch checkpoint importer + model parity tests (SURVEY §4.2):
activation closeness vs torch modules on fixed inputs, prune-mask import,
DDP-prefix strip, checkpoint averaging/export."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from vipers.core.checkpoint import (
    average_checkpoints,
    import_torch_checkpoint,
    normalize_torch_state_dict,
    store_model_weights,
    to_jax,
)


def test_vit_encoder_block_parity_vs_torch_mha():
    """Our EncoderBlock (fused qkv Dense + softmax attention) must match
    torch nn.MultiheadAttention + LayerNorm + MLP given imported weights —
    the core numerical contract behind ViT checkpoint import."""
    torch.manual_seed(0)
    d, h, t, mlp = 16, 4, 5, 32

    ln1 = tnn.LayerNorm(d, eps=1e-6)
    mha = tnn.MultiheadAttention(d, h, batch_first=True)
    ln2 = tnn.LayerNorm(d, eps=1e-6)
    fc1, fc2 = tnn.Linear(d, mlp), tnn.Linear(mlp, d)
    x = torch.randn(1, t, d)

    with torch.no_grad():
        y = ln1(x)
        a, w = mha(y, y, y, need_weights=True, average_attn_weights=False)
        x1 = x + a
        z = ln2(x1)
        z = fc2(torch.nn.functional.gelu(fc1(z)))
        t_out = (x1 + z).numpy()
        t_attn = w.numpy()

    from vipers.models.vit import EncoderBlock

    block = EncoderBlock(num_heads=h, mlp_dim=mlp)
    params = {
        "ln_1": {"scale": ln1.weight.detach().numpy(), "bias": ln1.bias.detach().numpy()},
        "attention": {
            "qkv": {"kernel": mha.in_proj_weight.detach().numpy().T,
                    "bias": mha.in_proj_bias.detach().numpy()},
            "out": {"kernel": mha.out_proj.weight.detach().numpy().T,
                    "bias": mha.out_proj.bias.detach().numpy()},
        },
        "ln_2": {"scale": ln2.weight.detach().numpy(), "bias": ln2.bias.detach().numpy()},
        "mlp": {
            "fc1": {"kernel": fc1.weight.detach().numpy().T, "bias": fc1.bias.detach().numpy()},
            "fc2": {"kernel": fc2.weight.detach().numpy().T, "bias": fc2.bias.detach().numpy()},
        },
    }
    j_out, _ln1, j_attn = block.apply(
        {"params": to_jax(params)}, jnp.asarray(x.numpy()), train=False
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_attn), t_attn, atol=2e-5, rtol=1e-4)


def test_resnet_basic_block_import_parity():
    """BasicBlock forward parity via the resnet importer key mapping."""
    torch.manual_seed(1)

    conv1 = tnn.Conv2d(8, 8, 3, padding=1, bias=False)
    bn1 = tnn.BatchNorm2d(8)
    conv2 = tnn.Conv2d(8, 8, 3, padding=1, bias=False)
    bn2 = tnn.BatchNorm2d(8)
    bn1.eval(), bn2.eval()
    with torch.no_grad():
        bn1.running_mean.normal_(), bn1.running_var.uniform_(0.5, 2)
        bn2.running_mean.normal_(), bn2.running_var.uniform_(0.5, 2)
    x = torch.randn(2, 8, 6, 6)
    with torch.no_grad():
        t_out = torch.relu(bn2(conv2(torch.relu(bn1(conv1(x))))) + x).numpy()

    sd = {
        "layer1.0.conv1.weight": conv1.weight,
        "layer1.0.bn1.weight": bn1.weight, "layer1.0.bn1.bias": bn1.bias,
        "layer1.0.bn1.running_mean": bn1.running_mean,
        "layer1.0.bn1.running_var": bn1.running_var,
        "layer1.0.conv2.weight": conv2.weight,
        "layer1.0.bn2.weight": bn2.weight, "layer1.0.bn2.bias": bn2.bias,
        "layer1.0.bn2.running_mean": bn2.running_mean,
        "layer1.0.bn2.running_var": bn2.running_var,
        # stem keys so the importer finds them
        "conv1.weight": torch.zeros(8, 3, 7, 7),
        "bn1.weight": torch.ones(8), "bn1.bias": torch.zeros(8),
        "bn1.running_mean": torch.zeros(8), "bn1.running_var": torch.ones(8),
    }
    from vipers.core.checkpoint import import_resnet
    from vipers.models.resnet import BasicBlock

    params, bstats, _ = import_resnet(
        {k: v.detach().numpy() for k, v in sd.items()}, stage_sizes=(1,)
    )
    block = BasicBlock(filters=8)
    variables = {
        "params": to_jax(params["layer1_0"]),
        "batch_stats": to_jax(bstats["layer1_0"]),
    }
    # our blocks use bound norm; apply via a module wrapper
    import flax.linen as nn
    from functools import partial

    class W(nn.Module):
        @nn.compact
        def __call__(self, x):
            return BasicBlock(
                filters=8,
                norm=partial(nn.BatchNorm, use_running_average=True,
                             momentum=0.9, epsilon=1e-5),
                name="layer1_0",
            )(x)

    j_out = W().apply(
        {"params": {"layer1_0": variables["params"]},
         "batch_stats": {"layer1_0": variables["batch_stats"]}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out, atol=2e-5, rtol=1e-4
    )


def test_prune_reparam_import_and_ddp_prefix():
    torch.manual_seed(2)
    w = torch.randn(4, 3)
    mask = (torch.rand(4, 3) > 0.5).float()
    sd = {
        "module.fc.weight_orig": w,
        "module.fc.weight_mask": mask,
        "module.fc.bias": torch.zeros(4),
    }
    out = normalize_torch_state_dict(sd)
    assert "fc.weight" in out and "fc.bias" in out  # module. stripped
    np.testing.assert_allclose(out["fc.weight"], (w * mask).numpy())
    np.testing.assert_array_equal(out["fc.weight.__mask__"], mask.numpy().astype(bool))


def test_vit_importer_end_to_end():
    """Full ViT state dict (torchvision key conventions) imports into a
    runnable model with identical logits between two import runs."""
    torch.manual_seed(3)
    d, h, layers, mlp, patch, classes = 16, 4, 2, 32, 4, 5
    grid = 2  # 8x8 image
    sd = {
        "conv_proj.weight": torch.randn(d, 3, patch, patch),
        "conv_proj.bias": torch.randn(d),
        "class_token": torch.randn(1, 1, d),
        "encoder.pos_embedding": torch.randn(1, grid * grid + 1, d),
        "encoder.ln.weight": torch.ones(d), "encoder.ln.bias": torch.zeros(d),
        "heads.head.weight": torch.randn(classes, d),
        "heads.head.bias": torch.zeros(classes),
    }
    for i in range(layers):
        t = f"encoder.layers.encoder_layer_{i}"
        sd.update({
            f"{t}.ln_1.weight": torch.ones(d), f"{t}.ln_1.bias": torch.zeros(d),
            f"{t}.self_attention.in_proj_weight": torch.randn(3 * d, d),
            f"{t}.self_attention.in_proj_bias": torch.zeros(3 * d),
            f"{t}.self_attention.out_proj.weight": torch.randn(d, d),
            f"{t}.self_attention.out_proj.bias": torch.zeros(d),
            f"{t}.ln_2.weight": torch.ones(d), f"{t}.ln_2.bias": torch.zeros(d),
            f"{t}.mlp.0.weight": torch.randn(mlp, d), f"{t}.mlp.0.bias": torch.zeros(mlp),
            f"{t}.mlp.3.weight": torch.randn(d, mlp), f"{t}.mlp.3.bias": torch.zeros(d),
        })
    params, _bs, masks = import_torch_checkpoint(sd, "vit_b_16", num_layers=layers)
    from vipers.models.vit import ViTConfig, VisionTransformer

    module = VisionTransformer(
        cfg=ViTConfig(patch, layers, h, d, mlp, classes), image_size=(8, 8)
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 3)), jnp.float32)
    logits, aux = module.apply({"params": to_jax(params)}, x, train=False)
    assert logits.shape == (1, classes)
    assert np.isfinite(np.asarray(logits)).all()
    assert masks == {}


def test_average_and_export_checkpoints(tmp_path):
    from vipers.core.checkpoint import restore_checkpoint, save_checkpoint

    t1 = {"params": {"w": np.ones((3,), np.float32)}, "epoch": np.int32(1)}
    t2 = {"params": {"w": np.full((3,), 3.0, np.float32)}, "epoch": np.int32(2)}
    p1, p2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    save_checkpoint(p1, t1), save_checkpoint(p2, t2)
    avg = average_checkpoints([p1, p2])
    np.testing.assert_allclose(np.asarray(avg["params"]["w"]), 2.0)

    out = store_model_weights(avg, str(tmp_path))
    assert "weights-" in out
    slim = restore_checkpoint(out)
    assert "params" in slim and "epoch" not in slim


def test_async_checkpoint_roundtrip(tmp_path):
    from vipers.core.checkpoint import (restore_checkpoint, save_checkpoint,
                                        wait_for_checkpoints)

    tree = {"params": {"w": np.arange(5, dtype=np.float32)}}
    p = str(tmp_path / "async_ckpt")
    save_checkpoint(p, tree, use_async=True)
    wait_for_checkpoints()
    out = restore_checkpoint(p)
    np.testing.assert_array_equal(out["params"]["w"], tree["params"]["w"])
