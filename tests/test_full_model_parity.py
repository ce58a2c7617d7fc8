"""Full-model activation parity vs hand-built torch references
(SURVEY §4.2: per-layer/end-to-end closeness on fixed inputs, atol ~1e-4).

torchvision isn't installed, so the torch models here are built by hand with
the exact torchvision architectures (verified against its source semantics)
and exported with torchvision's state-dict key conventions, exercising the
real importer path end to end.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from vipers.core.checkpoint import import_torch_checkpoint, to_jax


# ------------------------------- ViT ---------------------------------------

class _TorchViT(tnn.Module):
    """torchvision VisionTransformer semantics (pre-norm, MHA, MLP) with
    torchvision state-dict keys."""

    def __init__(self, patch=4, layers=2, heads=2, d=16, mlp=32, classes=5,
                 grid=3):
        super().__init__()
        self.patch, self.d = patch, d
        self.conv_proj = tnn.Conv2d(3, d, patch, patch)
        self.class_token = tnn.Parameter(torch.randn(1, 1, d))

        class Enc(tnn.Module):
            pass

        self.encoder = Enc()
        self.encoder.pos_embedding = tnn.Parameter(
            torch.randn(1, grid * grid + 1, d))
        blocks = []
        for _ in range(layers):
            b = tnn.Module()
            b.ln_1 = tnn.LayerNorm(d, eps=1e-6)
            b.self_attention = tnn.MultiheadAttention(d, heads, batch_first=True)
            b.ln_2 = tnn.LayerNorm(d, eps=1e-6)
            b.mlp = tnn.Sequential(
                tnn.Linear(d, mlp), tnn.GELU(), tnn.Dropout(0.0),
                tnn.Linear(mlp, d), tnn.Dropout(0.0))
            blocks.append(b)
        self.encoder.layers = tnn.ModuleList(blocks)
        self.encoder.ln = tnn.LayerNorm(d, eps=1e-6)
        self.heads = tnn.Module()
        self.heads.head = tnn.Linear(d, classes)

    def forward(self, x):
        n = x.shape[0]
        x = self.conv_proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.class_token.expand(n, -1, -1), x], 1)
        x = x + self.encoder.pos_embedding
        for b in self.encoder.layers:
            y = b.ln_1(x)
            a, _ = b.self_attention(y, y, y, need_weights=True,
                                    average_attn_weights=False)
            x = x + a
            x = x + b.mlp(b.ln_2(x))
        x = self.encoder.ln(x)
        return self.heads.head(x[:, 0])

    def tv_state_dict(self):
        sd = {
            "conv_proj.weight": self.conv_proj.weight,
            "conv_proj.bias": self.conv_proj.bias,
            "class_token": self.class_token,
            "encoder.pos_embedding": self.encoder.pos_embedding,
            "encoder.ln.weight": self.encoder.ln.weight,
            "encoder.ln.bias": self.encoder.ln.bias,
            "heads.head.weight": self.heads.head.weight,
            "heads.head.bias": self.heads.head.bias,
        }
        for i, b in enumerate(self.encoder.layers):
            t = f"encoder.layers.encoder_layer_{i}"
            sd.update({
                f"{t}.ln_1.weight": b.ln_1.weight, f"{t}.ln_1.bias": b.ln_1.bias,
                f"{t}.self_attention.in_proj_weight": b.self_attention.in_proj_weight,
                f"{t}.self_attention.in_proj_bias": b.self_attention.in_proj_bias,
                f"{t}.self_attention.out_proj.weight": b.self_attention.out_proj.weight,
                f"{t}.self_attention.out_proj.bias": b.self_attention.out_proj.bias,
                f"{t}.ln_2.weight": b.ln_2.weight, f"{t}.ln_2.bias": b.ln_2.bias,
                f"{t}.mlp.0.weight": b.mlp[0].weight, f"{t}.mlp.0.bias": b.mlp[0].bias,
                f"{t}.mlp.3.weight": b.mlp[3].weight, f"{t}.mlp.3.bias": b.mlp[3].bias,
            })
        return {k: v.detach() for k, v in sd.items()}


def test_vit_full_model_parity():
    torch.manual_seed(0)
    tv = _TorchViT().eval()
    x = torch.randn(2, 3, 12, 12)
    with torch.no_grad():
        want = tv(x).numpy()

    params, _bs, _masks = import_torch_checkpoint(tv.tv_state_dict(), "vit_b_16",
                                                  num_layers=2)
    from vipers.models.vit import ViTConfig, VisionTransformer

    module = VisionTransformer(
        cfg=ViTConfig(patch_size=4, num_layers=2, num_heads=2, hidden_dim=16,
                      mlp_dim=32, num_classes=5),
        image_size=(12, 12),
    )
    got, _aux = module.apply({"params": to_jax(params)},
                             jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                             train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-3)


# ----------------------------- ResNet-50 -----------------------------------

class _TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, dilation=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, padding=dilation,
                                dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return torch.relu(out + idt)


class _TorchResNet50(tnn.Module):
    """torchvision resnet50 _make_layer semantics incl.
    replace_stride_with_dilation."""

    def __init__(self, rswd=(False, False, True), classes=7):
        super().__init__()
        self.inplanes, self.dilation = 64, 1
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 3)
        self.layer2 = self._make_layer(128, 4, stride=2, dilate=rswd[0])
        self.layer3 = self._make_layer(256, 6, stride=2, dilate=rswd[1])
        self.layer4 = self._make_layer(512, 3, stride=2, dilate=rswd[2])
        self.fc = tnn.Linear(2048, classes)

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))
        layers = [_TorchBottleneck(self.inplanes, planes, stride, downsample,
                                   previous_dilation)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(_TorchBottleneck(self.inplanes, planes,
                                           dilation=self.dilation))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def _tv_resnet_sd(model):
    sd = {}
    for name, p in model.state_dict().items():
        if "num_batches_tracked" in name:
            continue
        # torchvision key shape: layerX.Y.convZ / bnZ / downsample.{0,1}
        sd[name] = p
    return sd


@pytest.mark.parametrize("rswd", [(False, False, False), (False, False, True)])
@pytest.mark.slow
def test_resnet50_full_model_parity(rswd):
    """End-to-end resnet50 parity incl. the dilated (LOST dilate=2) variant —
    guards the Bottleneck first-block previous_dilation semantics."""
    torch.manual_seed(0)
    tv = _TorchResNet50(rswd=rswd).eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want = tv(x).numpy()

    params, bstats, _ = import_torch_checkpoint(_tv_resnet_sd(tv), "resnet50")
    from vipers.core.registry import build_model

    dilate = 2 if rswd[2] else 1
    spec = build_model("resnet50", num_classes=7, dilate=dilate)
    got, _aux = spec.module.apply(
        {"params": to_jax(params), "batch_stats": to_jax(bstats)},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-3)
