"""Class-agnostic box clustering into pseudo-labels.

Counterpart of `/root/reference/cluster_for_OD.py:120-201`: crop each
predicted box, resize to 256 BICUBIC, embed with a frozen DINO ViT CLS
feature, L2-normalize, then whiten + row-L2-normalize + k-means into
``nb_clusters`` pseudo-labels for class-aware detection training
(`:186-191`). Features are cached as a
pickle like the reference (`:169-183`).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vipers.core.registry import build_model
from vipers.data.detection import DiscoveryDataset
from vipers.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
from vipers.discovery.kmeans import kmeans2, whiten


def _make_embed_fn(spec, variables):
    """Jitted (B, 256, 256, 3) normalized crops -> L2-normalized CLS
    features (built once; re-jitting per batch would recompile)."""

    @jax.jit
    def fwd(x):
        feats, _aux = spec.module.apply(variables, x, train=False)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    return fwd


def cluster_input(feats):
    """What the reference feeds kmeans2: whitened, row-L2-normalized
    features (`cluster_for_OD.py:189-191`:
    ``vq.whiten(x) / np.linalg.norm(vq.whiten(x), axis=1)[:, None]``)."""
    white = whiten(feats)
    return white / jnp.linalg.norm(white, axis=1, keepdims=True)


def cluster_boxes(
    preds: Dict[str, list],
    dataset: DiscoveryDataset,
    nb_clusters: int = 20,
    model_name: str = "dino_vit_small",
    checkpoint: str = "",
    cache_path: str = "",
    seed: int = 0,
    patch_size: int = 16,
) -> Dict[str, int]:
    """{image_name: pseudo_label} for every predicted box.

    ``checkpoint``: pretrained DINO weights (orbax dir or torch .pth). The
    reference embeds with *pretrained frozen* DINO features
    (`cluster_for_OD.py:144-160`); random weights give meaningless
    pseudo-labels, so their absence is warned loudly.
    """
    spec = build_model(model_name, patch_size=patch_size)
    from vipers.core.registry import init_variables

    variables = init_variables(
        spec.module, jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
        train=False,
    )
    if checkpoint:
        from vipers.discovery.driver import load_lost_checkpoint

        variables, _masks, _obs = load_lost_checkpoint(checkpoint, spec, variables)
    else:
        print("[vipers.cluster] WARNING: no --checkpoint given; embedding "
              "with RANDOM weights — pseudo-labels will be meaningless")

    names = sorted(preds)
    if cache_path and os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            feats = pickle.load(f)
    else:
        crops = []
        mean = np.asarray(IMAGENET_MEAN, np.float32)
        std = np.asarray(IMAGENET_STD, np.float32)
        img_dir = os.path.dirname(dataset.items[0][0])
        for name in names:
            x1, y1, x2, y2 = (int(round(v)) for v in preds[name])
            img = Image.open(os.path.join(img_dir, name)).convert("RGB")
            crop = img.crop((x1, y1, max(x2, x1 + 1), max(y2, y1 + 1)))
            # the reference resizes the crop short-side-256 BICUBIC and
            # forwards the variable-size result (`cluster_for_OD.py:146-148`);
            # for one jitted static-shape program we resize to 256x256 BICUBIC
            # (square crops are unchanged; aspect distortion is documented)
            crop = crop.resize((256, 256), Image.BICUBIC)
            arr = np.asarray(crop, np.float32) / 255.0
            crops.append((arr - mean) / std)
        embed = _make_embed_fn(spec, variables)
        feats = np.concatenate(
            [
                np.asarray(embed(jnp.asarray(np.stack(crops[i : i + 16]))))
                for i in range(0, len(crops), 16)
            ]
        )
        if cache_path:
            with open(cache_path, "wb") as f:
                pickle.dump(feats, f)

    white = cluster_input(jnp.asarray(feats))
    k = min(nb_clusters, len(names))
    _cent, labels = kmeans2(jax.random.PRNGKey(seed), white, k=k)
    return {name: int(l) for name, l in zip(names, np.asarray(labels))}


def run_cluster_cli(args) -> int:
    with open(args.preds, "rb") as f:
        preds = pickle.load(f)
    ds = DiscoveryDataset(
        args.dataset, args.set, args.data_path,
        no_hard=getattr(args, "no_hard", False),
        coco_annotations=getattr(args, "coco_annotations", None),
        coco20k_list=getattr(args, "coco20k_list", None),
    )
    labels = cluster_boxes(preds, ds, nb_clusters=args.nb_clusters,
                           model_name=getattr(args, "arch", "dino_vit_small"),
                           checkpoint=getattr(args, "checkpoint", ""),
                           cache_path=getattr(args, "feature_cache", ""),
                           seed=getattr(args, "random_seed", 0),
                           patch_size=getattr(args, "patch_size", 16))
    out = os.path.splitext(args.preds)[0] + f"_clusters_{args.nb_clusters}.pkl"
    with open(out, "wb") as f:
        pickle.dump(labels, f)
    print(f"clustered {len(labels)} boxes into {args.nb_clusters} pseudo-labels -> {out}")
    return 0
