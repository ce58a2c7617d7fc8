"""VGG-16 in flax (NHWC): classifier and the reference's headless variant.

The reference uses torchvision vgg16 as a frozen LOST backbone with the
classifier *and the final maxpool* removed
(`/root/reference/networks.py:108-119` ``vgg16Bottom``), so the feature map
keeps stride 16.  ``headless=True`` reproduces that cut.

Layer widths live in :class:`VGGConfig` so structured slimming
(pruning/structured.py ``slim_vgg``) can rebuild the module at physically
smaller channel counts via ``build_model(..., arch_overrides=...)``; the
defaults are torchvision cfg "D" and parameter names are unchanged
(``conv_0..conv_12``, ``fc1..fc3``), so checkpoints, masks, and the torch
importer are untouched.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from vipers.models.activations import relu

from vipers.core.registry import ModelSpec, register_model

# torchvision cfg "D": 13 conv widths; maxpools sit after these conv indices.
_CFG_D_WIDTHS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
_POOL_AFTER = (1, 3, 6, 9, 12)


@dataclasses.dataclass(frozen=True)
class VGGConfig:
    conv_widths: Tuple[int, ...] = _CFG_D_WIDTHS
    fc_dims: Tuple[int, int] = (4096, 4096)


class VGG16(nn.Module):
    num_classes: int = 1000
    headless: bool = False  # drop classifier AND the final maxpool
    dropout_rate: float = 0.5
    cfg: VGGConfig = VGGConfig()

    @nn.compact
    def __call__(self, x, train: bool = False, tap_delta=None,
                 need_attn: bool = True):  # no-op for CNNs
        for i, width in enumerate(self.cfg.conv_widths):
            x = nn.Conv(width, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"conv_{i}")(x)
            x = relu(x)
            if i in _POOL_AFTER:
                if self.headless and i == len(self.cfg.conv_widths) - 1:
                    break  # vgg16Bottom removes the last MaxPool2d
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if tap_delta is not None:
            x = x + tap_delta  # explainability tap (see resnet.py)
        if self.headless:
            return x, {"features": x}
        features = x
        # torchvision applies AdaptiveAvgPool2d(7) then the classifier; at
        # 224x224 the map is already 7x7 so pooling is identity — we use
        # mean-pool-free flatten at the canonical size.
        n = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(n, -1)  # match torch CHW flatten order
        x = nn.Dense(self.cfg.fc_dims[0], name="fc1")(x)
        x = relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.cfg.fc_dims[1], name="fc2")(x)
        x = relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, name="fc3")(x)
        return logits, {"features": features}


@register_model("vgg16")
def vgg16(num_classes=1000, headless=False, input_size=(224, 224)):
    module = VGG16(num_classes=num_classes, headless=headless)
    return ModelSpec(
        name="vgg16",
        module=module,
        input_size=tuple(input_size),
        num_classes=0 if headless else num_classes,
        prune_exclude=(),
        family="vgg",
        extra={"headless": headless},
    )


@register_model("vgg16_bottom")
def vgg16_bottom(input_size=(224, 224)):
    """Headless VGG16, final maxpool removed (`networks.py:108-119`)."""
    spec = vgg16(headless=True, input_size=input_size)
    return ModelSpec(
        name="vgg16_bottom",
        module=spec.module,
        input_size=spec.input_size,
        num_classes=0,
        prune_exclude=(),
        family="vgg",
        extra={"headless": True},
    )
