"""VGG-16 in flax (NHWC): classifier and the reference's headless variant.

The reference uses torchvision vgg16 as a frozen LOST backbone with the
classifier *and the final maxpool* removed
(`/root/reference/networks.py:108-119` ``vgg16Bottom``), so the feature map
keeps stride 16.  ``headless=True`` reproduces that cut.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vipers.models.activations import relu

from vipers.core.registry import ModelSpec, register_model

# torchvision cfg "D": conv widths with 'M' maxpools.
_CFG_D = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]


class VGG16(nn.Module):
    num_classes: int = 1000
    headless: bool = False  # drop classifier AND the final maxpool
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, tap_delta=None,
                 need_attn: bool = True):  # no-op for CNNs
        conv_i = 0
        n_pools = sum(1 for v in _CFG_D if v == "M")
        pool_i = 0
        for v in _CFG_D:
            if v == "M":
                pool_i += 1
                if self.headless and pool_i == n_pools:
                    break  # vgg16Bottom removes the last MaxPool2d
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)], name=f"conv_{conv_i}")(x)
                x = relu(x)
                conv_i += 1
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
        x = nn.Dense(4096, name="fc1")(x)
        x = relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(4096, name="fc2")(x)
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
