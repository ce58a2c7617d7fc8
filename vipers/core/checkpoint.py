"""Checkpointing: orbax save/restore + PyTorch ``.pth`` importer.

Replaces the reference's ``torch.save`` checkpoint dict
(`/root/reference/train.py:505-521`: {model, optimizer, lr_scheduler, epoch,
args, sparsity [, model_ema, scaler]}) and, crucially, eliminates the
pruned-checkpoint "identity/load/remove dance"
(`/root/reference/main_lost.py:137-162`,
`/root/reference/evaluate_models.py:391-403`): masks are ordinary arrays in
the checkpoint pytree.

The importer consumes real PyTorch checkpoints (``torch.load`` on CPU):
  * strips DDP ``module.`` prefixes (`/root/reference/main_lost.py:134-135`),
  * resolves prune reparametrization: ``w = weight_orig * weight_mask`` and
    surfaces the mask (`torch.nn.utils.prune` convention),
  * maps torchvision/DINO key conventions onto our flax trees with the
    OIHW->HWIO / (out,in)->(in,out) transposes.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from flax import traverse_util

import orbax.checkpoint as ocp


# The reference's sweep checkpoint filename contracts
# (`main_lost.py:344-356`, `evaluate_models.py:230`): CNNs use a literal
# "model" stem, ViTs the model name; both live under `{dir}/{model}/`.
# Single-sourced here for discovery/driver._templated_checkpoint (resolve
# one iteration at the reference's fixed epochs) and
# train/evaluate_models.sweep_checkpoints (glob a whole sweep).
def reference_sweep_stem(model: str, vit: bool, epoch="*", iteration="*"):
    it = f"{iteration:02d}" if isinstance(iteration, int) else iteration
    stem = model if vit else "model"
    return f"{stem}_epoch_{epoch}_pruning_iteration_{it}"


# classification-head kernel paths per family; the LAST dim is the class
# count (resnet `fc`, vit/swin/dino `head`, vgg `fc3`, mobilenet
# `classifier`)
_HEAD_KEYS = ("fc", "head", "fc3", "classifier")


def infer_num_classes(params) -> Optional[int]:
    """Class count read off the checkpoint's own head kernel, or None for
    headless trees.  The reference hard-wires 1000 classes everywhere
    (`/root/reference/main_lost.py:363`, `explain.py:214-245`) because it
    only ever trains on ImageNet; vipers checkpoints carry arbitrary
    heads, and the LOST/explain drivers must rebuild the module at the
    checkpoint's width or flax rejects the param shapes at apply."""
    for key in _HEAD_KEYS:
        node = params.get(key) if isinstance(params, dict) else None
        if isinstance(node, dict) and "kernel" in node:
            return int(node["kernel"].shape[-1])
    return None


def infer_vit_image_size(params, patch_size: int):
    """(H, W) the checkpoint's own pos-embedding table was trained at, or
    None when there is no table / it is not a square grid.  Lets the
    LOST/explain loaders rebuild the module at the checkpoint's size (the
    reference's first `interpolate_vit(base, (224,224), first=True)` load,
    `/root/reference/main_lost.py:363-364`) instead of assuming 224 —
    flax validates the pos-embedding param shape at apply."""
    pos = params.get("pos_embedding") if isinstance(params, dict) else None
    if pos is None or getattr(pos, "ndim", 0) != 3:
        return None
    n = int(pos.shape[1]) - 1  # minus class token
    g = int(round(n ** 0.5))
    if g * g != n:
        return None
    return (g * patch_size, g * patch_size)


# ------------------------------ orbax -------------------------------------

_ASYNC: Optional["ocp.AsyncCheckpointer"] = None


def save_checkpoint(path: str, tree, force: bool = True, use_async: bool = False):
    """Save a pytree checkpoint; ``use_async=True`` writes in a background
    thread (orbax AsyncCheckpointer) so training never blocks on IO — the
    elastic-recovery story SURVEY §5 asks for (the reference blocks on
    torch.save every epoch, `/root/reference/train.py:518-521`)."""
    global _ASYNC
    path = os.path.abspath(path)
    if use_async:
        if _ASYNC is None:
            _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        _ASYNC.save(path, tree, force=force)
        return
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=force)


def wait_for_checkpoints():
    """Block until pending async saves are durably written."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def restore_checkpoint(path: str, target=None, shardings=None):
    """Restore a pytree checkpoint.

    Default: leaves come back as HOST numpy arrays — no device/sharding
    commitment at restore time (placement happens at the first jitted use,
    which carries the step's own shardings), and orbax's per-leaf
    "Sharding info not provided" warning never fires. For multi-host
    topologies where the full tree must not materialize on one host, pass
    ``shardings`` (a pytree of ``jax.sharding.Sharding`` matching the
    checkpoint structure) to restore each leaf directly to its devices.
    """
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if shardings is not None:
        restore_args = jax.tree.map(
            lambda s: ocp.ArrayRestoreArgs(sharding=s), shardings
        )
        return ckptr.restore(path, item=target, restore_args=restore_args)
    structure = target if target is not None else ckptr.metadata(path).item_metadata
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), structure
    )
    if target is None:
        return ckptr.restore(path, restore_args=restore_args)
    return ckptr.restore(path, item=target, restore_args=restore_args)


def restore_like(template, restored):
    """Re-impose the container types of ``template`` (optax NamedTuples,
    tuples) onto an orbax raw-restored tree (which returns plain
    dicts/lists): orbax serializes NamedTuples as field-name dicts and
    tuples as lists, so a resumed ``opt_state`` would otherwise crash the
    first ``tx.update`` after resume."""
    if template is None:
        return None
    if hasattr(template, "_fields"):  # NamedTuple (optax states)
        vals = {}
        for i, f in enumerate(template._fields):
            sub = restored[f] if isinstance(restored, dict) else restored[i]
            vals[f] = restore_like(getattr(template, f), sub)
        return type(template)(**vals)
    if isinstance(template, (tuple, list)):
        if isinstance(restored, dict):  # {"0": ..., "1": ...}
            restored = [restored[str(i)] for i in range(len(template))]
        return type(template)(
            restore_like(t, r) for t, r in zip(template, restored)
        )
    if isinstance(template, dict):
        return {k: restore_like(v, restored[k]) for k, v in template.items()}
    return restored  # leaf


def average_checkpoints(paths):
    """Elementwise average of the params of several checkpoints
    (fairseq-style, `/root/reference/utils.py:272-320`)."""
    import jax

    trees = [restore_checkpoint(p) for p in paths]
    params = [t["params"] for t in trees]
    n = len(params)
    avg = jax.tree.map(lambda *xs: sum(x.astype(np.float64) for x in xs) / n, *params)
    out = dict(trees[0])
    out["params"] = jax.tree.map(
        lambda a, ref: a.astype(np.asarray(ref).dtype), avg, params[0]
    )
    return out


def store_model_weights(tree, out_dir: str, prefix: str = "weights"):
    """Release-weight export with a content-hash-stamped filename
    (`/root/reference/utils.py:323-391`): strips training state (optimizer,
    EMA), keeps {params, batch_stats, masks}, names the artifact
    ``{prefix}-{sha256[:8]}``."""
    import hashlib

    import jax

    slim = {k: tree[k] for k in ("params", "batch_stats", "masks") if k in tree}
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(slim):
        h.update(np.asarray(leaf).tobytes())
    name = f"{prefix}-{h.hexdigest()[:8]}"
    path = os.path.join(out_dir, name)
    save_checkpoint(path, slim)
    return path


# --------------------------- torch importer --------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a checkpoint, unwrap {model: ...} dicts, strip ``module.``,
    resolve prune reparametrization. Returns {key: float numpy array} plus
    ``key.__mask__`` entries for pruned weights."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return normalize_torch_state_dict(obj)


def normalize_torch_state_dict(sd) -> Dict[str, np.ndarray]:
    def _np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    out: Dict[str, np.ndarray] = {}
    raw = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        raw[k] = v
    for k, v in raw.items():
        if k.endswith("_orig"):
            base = k[: -len("_orig")]
            mask = raw.get(base + "_mask")
            w = _np(v)
            if mask is not None:
                mask = _np(mask)
                w = w * mask
                out[base + ".__mask__"] = mask.astype(bool)
            out[base] = w
        elif k.endswith("_mask"):
            continue
        else:
            out[k] = _np(v)
    return out


def _conv_w(a):  # OIHW -> HWIO
    return np.transpose(a, (2, 3, 1, 0))


def _lin_w(a):  # (out, in) -> (in, out)
    return np.transpose(a)


def import_resnet(sd: Dict[str, np.ndarray], stage_sizes) -> Tuple[dict, dict, dict]:
    """torchvision resnet{18,34,50} keys -> our ResNet params/batch_stats.

    Returns (params, batch_stats, masks) as flat {path_tuple: array} dicts.
    """
    p, bs, masks = {}, {}, {}

    def put_conv(tkey, path):
        p[path + ("kernel",)] = _conv_w(sd[tkey + ".weight"])
        m = sd.get(tkey + ".weight.__mask__")
        if m is not None:
            masks[path + ("kernel",)] = _conv_w(m)

    def put_bn(tkey, path):
        p[path + ("scale",)] = sd[tkey + ".weight"]
        p[path + ("bias",)] = sd[tkey + ".bias"]
        bs[path + ("mean",)] = sd[tkey + ".running_mean"]
        bs[path + ("var",)] = sd[tkey + ".running_var"]

    put_conv("conv1", ("conv1",))
    put_bn("bn1", ("bn1",))
    n_convs_probe = any(k.startswith("layer1.0.conv3") for k in sd)
    n_convs = 3 if n_convs_probe else 2
    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            t = f"layer{stage}.{b}"
            o = (f"layer{stage}_{b}",)
            for ci in range(1, n_convs + 1):
                put_conv(f"{t}.conv{ci}", o + (f"conv{ci}",))
                put_bn(f"{t}.bn{ci}", o + (f"bn{ci}",))
            if f"{t}.downsample.0.weight" in sd:
                put_conv(f"{t}.downsample.0", o + ("downsample_conv",))
                put_bn(f"{t}.downsample.1", o + ("downsample_bn",))
    if "fc.weight" in sd:
        p[("fc", "kernel")] = _lin_w(sd["fc.weight"])
        p[("fc", "bias")] = sd["fc.bias"]
        if "fc.weight.__mask__" in sd:
            masks[("fc", "kernel")] = _lin_w(sd["fc.weight.__mask__"])
    return (
        traverse_util.unflatten_dict(p),
        traverse_util.unflatten_dict(bs),
        masks,
    )


def import_vit_torchvision(sd: Dict[str, np.ndarray], num_layers: int):
    """torchvision ViT keys (`/root/reference/vision_transformer.py`
    structure) -> our VisionTransformer params. Returns (params, masks)."""
    p, masks = {}, {}
    p[("conv_proj", "kernel")] = _conv_w(sd["conv_proj.weight"])
    p[("conv_proj", "bias")] = sd["conv_proj.bias"]
    if "conv_proj.weight.__mask__" in sd:
        masks[("conv_proj", "kernel")] = _conv_w(sd["conv_proj.weight.__mask__"])
    p[("class_token",)] = sd["class_token"]
    p[("pos_embedding",)] = sd["encoder.pos_embedding"]

    for i in range(num_layers):
        t = f"encoder.layers.encoder_layer_{i}"
        o = (f"encoder_layer_{i}",)
        p[o + ("ln_1", "scale")] = sd[f"{t}.ln_1.weight"]
        p[o + ("ln_1", "bias")] = sd[f"{t}.ln_1.bias"]
        p[o + ("attention", "qkv", "kernel")] = _lin_w(sd[f"{t}.self_attention.in_proj_weight"])
        p[o + ("attention", "qkv", "bias")] = sd[f"{t}.self_attention.in_proj_bias"]
        p[o + ("attention", "out", "kernel")] = _lin_w(sd[f"{t}.self_attention.out_proj.weight"])
        p[o + ("attention", "out", "bias")] = sd[f"{t}.self_attention.out_proj.bias"]
        if f"{t}.self_attention.out_proj.weight.__mask__" in sd:
            masks[o + ("attention", "out", "kernel")] = _lin_w(
                sd[f"{t}.self_attention.out_proj.weight.__mask__"])
        p[o + ("ln_2", "scale")] = sd[f"{t}.ln_2.weight"]
        p[o + ("ln_2", "bias")] = sd[f"{t}.ln_2.bias"]
        # torchvision MLPBlock: indices 0 and 3 (Linear, GELU, Drop, Linear, Drop)
        for tk, ok in ((f"{t}.mlp.0", "fc1"), (f"{t}.mlp.3", "fc2")):
            p[o + ("mlp", ok, "kernel")] = _lin_w(sd[f"{tk}.weight"])
            p[o + ("mlp", ok, "bias")] = sd[f"{tk}.bias"]
            if f"{tk}.weight.__mask__" in sd:
                masks[o + ("mlp", ok, "kernel")] = _lin_w(sd[f"{tk}.weight.__mask__"])
    p[("ln", "scale")] = sd["encoder.ln.weight"]
    p[("ln", "bias")] = sd["encoder.ln.bias"]
    if "heads.head.weight" in sd:
        p[("head", "kernel")] = _lin_w(sd["heads.head.weight"])
        p[("head", "bias")] = sd["heads.head.bias"]
        if "heads.head.weight.__mask__" in sd:
            masks[("head", "kernel")] = _lin_w(sd["heads.head.weight.__mask__"])
    if "heads.pre_logits.weight" in sd:
        p[("pre_logits", "kernel")] = _lin_w(sd["heads.pre_logits.weight"])
        p[("pre_logits", "bias")] = sd["heads.pre_logits.bias"]
    return traverse_util.unflatten_dict(p), masks


def export_vit_torchvision(params, masks=None) -> Dict[str, np.ndarray]:
    """Inverse of ``import_vit_torchvision``: our VisionTransformer params
    -> a torchvision-keyed state dict (`/root/reference/
    vision_transformer.py` structure, the checkpoint layout the reference's
    `main_lost.py:130-137` loads). Arrays stay numpy (``torch.tensor`` them
    at the load site); HWIO->OIHW / (in,out)->(out,in) transposes reverse
    the importer's. ``masks`` (our {path_tuple: bool array}) are baked by
    multiplication — the reference makes pruning permanent the same way
    (`prune.remove`, `main_lost.py:63-68`)."""
    import jax

    p = traverse_util.flatten_dict(
        jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    )
    if masks:
        for path, m in masks.items():
            if path in p:
                p[path] = p[path] * np.asarray(m, np.float32)
    sd: Dict[str, np.ndarray] = {}
    sd["conv_proj.weight"] = np.transpose(p[("conv_proj", "kernel")], (3, 2, 0, 1))
    sd["conv_proj.bias"] = p[("conv_proj", "bias")]
    sd["class_token"] = p[("class_token",)]
    sd["encoder.pos_embedding"] = p[("pos_embedding",)]
    n_layers = len({k[0] for k in p if k[0].startswith("encoder_layer_")})
    for i in range(n_layers):
        o = (f"encoder_layer_{i}",)
        t = f"encoder.layers.encoder_layer_{i}"
        sd[f"{t}.ln_1.weight"] = p[o + ("ln_1", "scale")]
        sd[f"{t}.ln_1.bias"] = p[o + ("ln_1", "bias")]
        sd[f"{t}.self_attention.in_proj_weight"] = _lin_w(
            p[o + ("attention", "qkv", "kernel")])
        sd[f"{t}.self_attention.in_proj_bias"] = p[o + ("attention", "qkv", "bias")]
        sd[f"{t}.self_attention.out_proj.weight"] = _lin_w(
            p[o + ("attention", "out", "kernel")])
        sd[f"{t}.self_attention.out_proj.bias"] = p[o + ("attention", "out", "bias")]
        sd[f"{t}.ln_2.weight"] = p[o + ("ln_2", "scale")]
        sd[f"{t}.ln_2.bias"] = p[o + ("ln_2", "bias")]
        for ok, tk in (("fc1", f"{t}.mlp.0"), ("fc2", f"{t}.mlp.3")):
            sd[f"{tk}.weight"] = _lin_w(p[o + ("mlp", ok, "kernel")])
            sd[f"{tk}.bias"] = p[o + ("mlp", ok, "bias")]
    sd["encoder.ln.weight"] = p[("ln", "scale")]
    sd["encoder.ln.bias"] = p[("ln", "bias")]
    if ("pre_logits", "kernel") in p:
        sd["heads.pre_logits.weight"] = _lin_w(p[("pre_logits", "kernel")])
        sd["heads.pre_logits.bias"] = p[("pre_logits", "bias")]
    if ("head", "kernel") in p:
        sd["heads.head.weight"] = _lin_w(p[("head", "kernel")])
        sd["heads.head.bias"] = p[("head", "bias")]
    return sd


def import_dino_vit(sd: Dict[str, np.ndarray], depth: int):
    """facebookresearch/dino checkpoint keys -> our DinoVisionTransformer."""
    p = {}
    p[("patch_embed", "kernel")] = _conv_w(sd["patch_embed.proj.weight"])
    p[("patch_embed", "bias")] = sd["patch_embed.proj.bias"]
    p[("cls_token",)] = sd["cls_token"]
    p[("pos_embed",)] = sd["pos_embed"]
    for i in range(depth):
        t = f"blocks.{i}"
        o = (f"block_{i}",)
        p[o + ("norm1", "scale")] = sd[f"{t}.norm1.weight"]
        p[o + ("norm1", "bias")] = sd[f"{t}.norm1.bias"]
        p[o + ("attn", "qkv", "kernel")] = _lin_w(sd[f"{t}.attn.qkv.weight"])
        if f"{t}.attn.qkv.bias" in sd:
            p[o + ("attn", "qkv", "bias")] = sd[f"{t}.attn.qkv.bias"]
        p[o + ("attn", "proj", "kernel")] = _lin_w(sd[f"{t}.attn.proj.weight"])
        p[o + ("attn", "proj", "bias")] = sd[f"{t}.attn.proj.bias"]
        p[o + ("norm2", "scale")] = sd[f"{t}.norm2.weight"]
        p[o + ("norm2", "bias")] = sd[f"{t}.norm2.bias"]
        p[o + ("fc1", "kernel")] = _lin_w(sd[f"{t}.mlp.fc1.weight"])
        p[o + ("fc1", "bias")] = sd[f"{t}.mlp.fc1.bias"]
        p[o + ("fc2", "kernel")] = _lin_w(sd[f"{t}.mlp.fc2.weight"])
        p[o + ("fc2", "bias")] = sd[f"{t}.mlp.fc2.bias"]
    p[("norm", "scale")] = sd["norm.weight"]
    p[("norm", "bias")] = sd["norm.bias"]
    return traverse_util.unflatten_dict(p), {}


def import_vgg16(sd: Dict[str, np.ndarray], headless: bool = False):
    """torchvision vgg16: features.{0,2,5,7,10,12,14,17,19,21,24,26,28}."""
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    p, masks = {}, {}
    for our_i, ti in enumerate(conv_idx):
        p[(f"conv_{our_i}", "kernel")] = _conv_w(sd[f"features.{ti}.weight"])
        p[(f"conv_{our_i}", "bias")] = sd[f"features.{ti}.bias"]
        if f"features.{ti}.weight.__mask__" in sd:
            masks[(f"conv_{our_i}", "kernel")] = _conv_w(sd[f"features.{ti}.weight.__mask__"])
    if not headless and "classifier.0.weight" in sd:
        for tk, ok in (("classifier.0", "fc1"), ("classifier.3", "fc2"), ("classifier.6", "fc3")):
            p[(ok, "kernel")] = _lin_w(sd[f"{tk}.weight"])
            p[(ok, "bias")] = sd[f"{tk}.bias"]
    return traverse_util.unflatten_dict(p), masks


def import_swin_v2_t(sd: Dict[str, np.ndarray]):
    """torchvision ``swin_v2_t`` state dict -> our SwinTransformerV2 params.

    torchvision layout (`/root/reference/main_lost.py:104-106` loads these
    checkpoints): features.0 = [Conv2d, Permute, LayerNorm] patch embed;
    features.{1,3,5,7} = stages of SwinTransformerBlockV2 with
    norm1/norm2 (res-post-norm), attn.{qkv,proj,logit_scale,cpb_mlp.0,
    cpb_mlp.2}, mlp.{0,3}; features.{2,4,6} = PatchMergingV2
    (reduction, norm); then norm/head. relative_coords_table and
    relative_position_index buffers are recomputed, not imported.
    Returns (params, masks).
    """
    p, masks = {}, {}

    def put_lin(tkey, path, bias=True):
        p[path + ("kernel",)] = _lin_w(sd[tkey + ".weight"])
        m = sd.get(tkey + ".weight.__mask__")
        if m is not None:
            masks[path + ("kernel",)] = _lin_w(m)
        if bias and tkey + ".bias" in sd:
            p[path + ("bias",)] = sd[tkey + ".bias"]

    def put_ln(tkey, path):
        p[path + ("scale",)] = sd[tkey + ".weight"]
        p[path + ("bias",)] = sd[tkey + ".bias"]

    p[("patch_embed", "kernel")] = _conv_w(sd["features.0.0.weight"])
    p[("patch_embed", "bias")] = sd["features.0.0.bias"]
    if "features.0.0.weight.__mask__" in sd:
        masks[("patch_embed", "kernel")] = _conv_w(sd["features.0.0.weight.__mask__"])
    put_ln("features.0.2", ("patch_norm",))

    depths = (2, 2, 6, 2)
    for si, depth in enumerate(depths):
        f = 1 + 2 * si  # torchvision stage index: 1, 3, 5, 7
        for bi in range(depth):
            t = f"features.{f}.{bi}"
            o = (f"stage{si}_block{bi}",)
            put_ln(f"{t}.norm1", o + ("norm1",))
            put_ln(f"{t}.norm2", o + ("norm2",))
            put_lin(f"{t}.attn.qkv", o + ("attn", "qkv"))
            put_lin(f"{t}.attn.proj", o + ("attn", "proj"))
            p[o + ("attn", "logit_scale")] = sd[f"{t}.attn.logit_scale"]
            put_lin(f"{t}.attn.cpb_mlp.0", o + ("attn", "cpb_fc1"))
            put_lin(f"{t}.attn.cpb_mlp.2", o + ("attn", "cpb_fc2"), bias=False)
            put_lin(f"{t}.mlp.0", o + ("fc1",))
            put_lin(f"{t}.mlp.3", o + ("fc2",))
        if si < len(depths) - 1:
            m = f"features.{2 + 2 * si}"
            put_lin(f"{m}.reduction", (f"merge{si}", "reduction"), bias=False)
            put_ln(f"{m}.norm", (f"merge{si}", "norm"))

    put_ln("norm", ("norm",))
    if "head.weight" in sd:
        put_lin("head", ("head",))
    return traverse_util.unflatten_dict(p), masks


def import_torch_checkpoint(path_or_sd, model_name: str, **kw):
    """Dispatch by model family. Returns (params, batch_stats, masks) with
    masks as a flat {path: bool array} dict matching ``pruning.masks``."""
    sd = (
        load_torch_state_dict(path_or_sd)
        if isinstance(path_or_sd, (str, os.PathLike))
        else normalize_torch_state_dict(path_or_sd)
    )
    name = model_name.lower()
    if name.startswith("resnet"):
        sizes = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
                 "resnet50": (3, 4, 6, 3)}[name.replace("_bottom", "")]
        params, bstats, masks = import_resnet(sd, sizes)
        return params, bstats, masks
    if name.startswith("vit"):
        layers = kw.get("num_layers", {"s": 12, "b": 12, "l": 24, "h": 32}[name.split("_")[1]])
        params, masks = import_vit_torchvision(sd, layers)
        return params, None, masks
    if name.startswith("dino"):
        params, masks = import_dino_vit(sd, kw.get("depth", 12))
        return params, None, masks
    if name.startswith("vgg"):
        params, masks = import_vgg16(sd, headless=kw.get("headless", False))
        return params, None, masks
    if name.startswith("swin"):
        params, masks = import_swin_v2_t(sd)
        return params, None, masks
    raise ValueError(f"no importer for model {model_name!r}")


def to_jax(tree):
    import jax.numpy as jnp

    return jax.tree.map(lambda a: jnp.asarray(a), tree)
