"""Model-vs-human benchmark runner.

Evaluates a (pruned) classifier on the 17 distortion benchmarks and writes
the reference's CSV contract ``{model}_pruning_step_{N}.csv`` — one
``benchmark,accuracy`` row per benchmark in the canonical order consumed by
`/root/reference/mvh_performance_plot.py:71-87` and plotted by
``vipers.viz.plots.plot_mvh``.

Parametric distortions are applied to the provided eval images
(``data.distortions``); stimulus-dataset benchmarks (cue-conflict, edge,
silhouette, sketch, stylized) are evaluated from ``stimuli_root/<name>/``
ImageFolders when present and reported as NaN otherwise.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vipers.data.distortions import PARAMETRIC_DISTORTIONS, STIMULUS_DATASETS
from vipers.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

MVH_ORDER = [
    "colour", "contrast", "cue-conflict", "edge", "eidolonI", "eidolonII",
    "eidolonIII", "false-colour", "high-pass", "low-pass", "phase-scrambling",
    "power-equalisation", "rotation", "silhouette", "sketch", "stylized",
    "uniform-noise",
]


def eval_mvh(
    eval_step,
    state,
    batches: Iterable,  # yields (uint8 images (B,H,W,C), labels)
    seed: int = 0,
    stimuli_root: Optional[str] = None,
    stimuli_eval_fn=None,
) -> Dict[str, float]:
    """Accuracy per benchmark. ``batches`` must be re-iterable."""
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    results: Dict[str, float] = {}
    for name in MVH_ORDER:
        if name in STIMULUS_DATASETS:
            if stimuli_root and stimuli_eval_fn and os.path.isdir(
                os.path.join(stimuli_root, name)
            ):
                results[name] = stimuli_eval_fn(os.path.join(stimuli_root, name))
            else:
                results[name] = float("nan")
            continue
        fn = PARAMETRIC_DISTORTIONS[name]
        rng = np.random.default_rng(seed)
        top1 = n = 0
        for images, labels in batches:
            imgs = images.astype(np.float32) / 255.0
            distorted = np.stack([fn(im, rng) for im in imgs])
            x = (distorted - mean) / std
            out = jax.device_get(
                eval_step(state, (jnp.asarray(x), jnp.asarray(labels)))
            )
            top1 += int(out["top1"])
            n += int(out["n"])
        results[name] = 100.0 * top1 / max(n, 1)
    return results


def write_mvh_csv(results: Dict[str, float], model: str, step: int, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{model}_pruning_step_{step}.csv")
    with open(path, "w") as f:
        for name in MVH_ORDER:
            f.write(f"{name},{results.get(name, float('nan'))}\n")
    return path
