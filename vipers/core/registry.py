"""Model registry.

TPU-native analog of the reference's vendored torchvision registry
(`/root/reference/_api.py:193-277`: `register_model`, `get_model`,
`list_models`, `BUILTIN_MODELS`).  Instead of returning stateful
``nn.Module`` objects, builders return a :class:`ModelSpec` bundling the
flax module, functional init/apply helpers, and pruning metadata (which
parameter paths are prunable — mirroring the reference's
``isinstance(m, (nn.Conv2d, nn.Linear))`` selection in
`/root/reference/train.py:264-268`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence

_BUILTIN_MODELS: Dict[str, Callable[..., "ModelSpec"]] = {}


@dataclasses.dataclass
class ModelSpec:
    """A constructed model plus the metadata the framework needs.

    Attributes:
      name: registry name (e.g. ``"resnet18"``).
      module: the flax ``nn.Module`` instance.
      input_size: default (H, W) eval resolution.
      num_classes: classifier width (0 => headless/feature model).
      prune_exclude: substrings; a parameter path containing any of them is
        never pruned even if it is a conv/dense kernel. The reference never
        prunes the ViT attention in-projection because
        ``nn.MultiheadAttention`` is not an ``nn.Linear`` *module* — only its
        ``out_proj`` is (`/root/reference/train.py:264-268` +
        torch ``MultiheadAttention`` structure). We reproduce that with
        ``("qkv",)`` on ViTs.
      quantize_exclude: like ``prune_exclude`` but for weight quantization /
        activation observation; ``None`` means "same as prune_exclude"
        (read through the ``quant_exclude`` property).
      patch_size: ViT patch size, if applicable.
      family: coarse family tag: "resnet" | "vit" | "dino_vit" | "vgg" | "swin".
      extra: free-form metadata (dilation, weights url, ...).
    """

    name: str
    module: Any
    input_size: tuple = (224, 224)
    num_classes: int = 1000
    prune_exclude: Sequence[str] = ()
    quantize_exclude: Optional[Sequence[str]] = None
    patch_size: Optional[int] = None
    family: str = ""
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def quant_exclude(self) -> Sequence[str]:
        """Param-path substrings excluded from weight quantization and
        activation observation. Defaults to ``prune_exclude``; models whose
        attention projections are applied via custom einsums (the
        head-major layout, `models/vit.py`) extend it so those kernels keep
        full float precision — the int8 interceptor only executes
        ``nn.Dense``/``nn.Conv`` sites, and torch ao likewise leaves
        ``MultiheadAttention``'s projections unquantized
        (`/root/reference/train_quantization.py:56-59` converts only
        mapped module types)."""
        if self.quantize_exclude is not None:
            return self.quantize_exclude
        return self.prune_exclude

    def init(self, rng, sample_input=None, train: bool = False):
        """Initialize variables; returns the full variables dict."""
        import jax.numpy as jnp

        if sample_input is None:
            h, w = self.input_size
            sample_input = jnp.zeros((1, h, w, 3), jnp.float32)
        return init_variables(self.module, rng, sample_input, train=train)


def init_variables(module, rng, sample_input, **init_kwargs):
    """``module.init`` under ONE jitted program.

    Eager flax init dispatches hundreds of tiny ops; on a remote/tunneled
    TPU each eager dispatch is a network round trip (~0.4 s measured), so
    an un-jitted ViT init costs minutes. One jitted init is a single
    (persistently cacheable) compile."""
    import functools

    import jax

    return jax.jit(
        functools.partial(module.init, **init_kwargs)
    )(rng, sample_input)


def register_model(name: Optional[str] = None):
    """Decorator registering a builder: ``fn(**kwargs) -> ModelSpec``."""

    def wrapper(fn):
        key = name if name is not None else fn.__name__
        if key in _BUILTIN_MODELS:
            raise ValueError(f"model {key!r} already registered")
        _BUILTIN_MODELS[key] = fn
        return fn

    return wrapper


def list_models(module_filter: Optional[str] = None):
    _ensure_builtins_imported()
    names = sorted(_BUILTIN_MODELS)
    if module_filter:
        names = [n for n in names if module_filter in n]
    return names


def get_model_builder(name: str) -> Callable[..., ModelSpec]:
    _ensure_builtins_imported()
    name = name.lower()
    try:
        return _BUILTIN_MODELS[name]
    except KeyError:
        raise ValueError(
            f"Unknown model {name!r}. Available: {sorted(_BUILTIN_MODELS)}"
        ) from None


def build_model(name: str, **kwargs) -> ModelSpec:
    """Construct a registered model.

    ``arch_overrides`` (optional dict) rebuilds the module with replaced
    config fields (e.g. ``{"num_heads": 4, "head_dim": 64, "mlp_dim":
    768}`` or ``{"inner_widths": {...}}``) — how structurally slimmed
    checkpoints (pruning/structured.py, written with a ``.slim.json``
    sidecar) get a module whose parameter shapes match. Supported by
    every model carrying a config dataclass as ``module.cfg``: the
    ViT/DINO/Swin families plus ResNet (``ResNetConfig``) and VGG
    (``VGGConfig``)."""
    arch = kwargs.pop("arch_overrides", None)
    spec = get_model_builder(name)(**kwargs)
    if arch:
        cfg = getattr(spec.module, "cfg", None)
        if cfg is None:
            raise ValueError(
                f"model {name!r} does not support arch_overrides "
                "(no module.cfg dataclass)"
            )
        # sidecars round-trip through JSON, which turns the tuple-valued
        # fields (e.g. VGG conv_widths) into lists
        arch = {k: tuple(v) if isinstance(v, list) else v
                for k, v in arch.items()}
        new_cfg = dataclasses.replace(cfg, **arch)
        extra = spec.extra
        if extra and "num_heads" in arch and "num_heads" in extra:
            # keep the LOST driver's qkv-scramble metadata in sync with
            # the slim head count (spec.extra mirrors cfg at build time)
            extra = {**extra, "num_heads": arch["num_heads"]}
        spec = dataclasses.replace(
            spec, module=spec.module.clone(cfg=new_cfg), extra=extra,
        )
    return spec


_IMPORTED = False


def _ensure_builtins_imported():
    """Import model modules lazily so registry import stays cheap."""
    global _IMPORTED
    if _IMPORTED:
        return
    _IMPORTED = True
    from vipers.models import resnet, vgg, vit, dino_vit, mobilenet  # noqa: F401

    try:
        from vipers.models import swin  # noqa: F401
    except ImportError:  # pragma: no cover - swin is best-effort
        pass
