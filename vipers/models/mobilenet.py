"""MobileNetV2 / MobileNetV3-Large in flax (NHWC), for the quantization path.

The reference's quantization entry point targets torchvision's *quantizable*
model registry — ``quantized_mobilenet*``/``quantized_resnet*`` prefixes
(`/root/reference/train_quantization.py:49-53`).  Here any registered model
quantizes (fake-quant QAT / PTQ int8 are model-agnostic transforms in
``train.quantize``); these builders provide the mobilenet family itself, and
``quantized_<name>`` registry aliases resolve to the same specs.
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp

from vipers.core.registry import ModelSpec, build_model, register_model


def _make_divisible(v, divisor=8, min_value=None):
    """torchvision channel-rounding rule."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNAct(nn.Module):
    filters: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: Optional[str] = "relu6"  # relu6 | hardswish | None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.filters, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups, use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, name="bn")(x)
        if self.act == "relu6":
            x = jnp.minimum(jnp.maximum(x, 0.0), 6.0)
        elif self.act == "hardswish":
            x = x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
        return x


class InvertedResidual(nn.Module):
    in_ch: int
    out_ch: int
    stride: int
    expand_ratio: int
    use_se: bool = False
    act: str = "relu6"

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = _make_divisible(self.in_ch * self.expand_ratio)
        use_res = self.stride == 1 and self.in_ch == self.out_ch
        y = x
        if self.expand_ratio != 1:
            y = ConvBNAct(hidden, kernel=1, act=self.act, name="expand")(y, train)
        y = ConvBNAct(hidden, kernel=3, stride=self.stride, groups=hidden,
                      act=self.act, name="depthwise")(y, train)
        if self.use_se:
            se = jnp.mean(y, axis=(1, 2), keepdims=True)
            squeeze = _make_divisible(hidden // 4)
            se = nn.Conv(squeeze, (1, 1), name="se_reduce")(se)
            se = nn.relu(se)
            se = nn.Conv(hidden, (1, 1), name="se_expand")(se)
            se = jnp.clip(se + 3.0, 0.0, 6.0) / 6.0  # hardsigmoid
            y = y * se
        y = ConvBNAct(self.out_ch, kernel=1, act=None, name="project")(y, train)
        return x + y if use_res else y


# torchvision mobilenet_v2 inverted-residual config: (t, c, n, s)
_V2_CFG = [
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False, tap_delta=None,
                 need_attn: bool = True):  # need_attn: no-op for CNNs
        ch = _make_divisible(32 * self.width_mult)
        x = ConvBNAct(ch, stride=2, name="stem")(x, train)
        in_ch = ch
        for bi, (t, c, n, s) in enumerate(_V2_CFG):
            out_ch = _make_divisible(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(
                    in_ch, out_ch, s if i == 0 else 1, t,
                    name=f"block{bi}_{i}",
                )(x, train)
                in_ch = out_ch
        last = _make_divisible(1280 * max(1.0, self.width_mult))
        x = ConvBNAct(last, kernel=1, name="head_conv")(x, train)
        if tap_delta is not None:
            x = x + tap_delta
        features = x
        x = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, name="classifier")(x)
        return logits, {"features": features}


@register_model("mobilenet_v2")
def mobilenet_v2(num_classes=1000, width_mult=1.0, input_size=(224, 224)):
    return ModelSpec(
        name="mobilenet_v2",
        module=MobileNetV2(num_classes=num_classes, width_mult=width_mult),
        input_size=tuple(input_size),
        num_classes=num_classes,
        prune_exclude=(),
        family="mobilenet",
        extra={"width_mult": width_mult},
    )


def register_quantized_aliases():
    """``quantized_<name>`` aliases (train_quantization.py:49-53): the same
    architecture; quantization is applied by the quantize driver."""
    for base in ("mobilenet_v2", "resnet18", "resnet50"):
        def make(b):
            def builder(**kw):
                spec = build_model(b, **kw)
                spec.extra = dict(spec.extra, quantized=True)
                return spec

            return builder

        register_model(f"quantized_{base}")(make(base))


register_quantized_aliases()
