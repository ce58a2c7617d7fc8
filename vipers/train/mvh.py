"""Model-vs-human benchmark runner.

Evaluates a (pruned) classifier on the 17 distortion benchmarks and writes
the reference's CSV contract ``{model}_pruning_step_{N}.csv`` in the exact
row structure `/root/reference/mvh_performance_plot.py:71-87` indexes into
(header row 0; edge at row 1 ... sketch at row 16; row 17 reserved;
stylized at row 18; the plot reads the LAST column of each row).

Parametric distortions are swept over the toolbox's parameter levels
(``data.distortions.DISTORTION_LEVELS``): each row carries one accuracy
column per level followed by the across-level mean, so ``row[-1]`` — what
the reference plot consumes — is the benchmark mean.  Stimulus-dataset
benchmarks (cue-conflict, edge, silhouette, sketch, stylized) are evaluated
from ``stimuli_root/<name>/`` ImageFolders when present and reported as NaN
otherwise.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from vipers.data.distortions import (
    DISTORTION_LEVELS,
    PARAMETRIC_DISTORTIONS,
    STIMULUS_DATASETS,
)
from vipers.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

MVH_ORDER = [
    "colour", "contrast", "cue-conflict", "edge", "eidolonI", "eidolonII",
    "eidolonIII", "false-colour", "high-pass", "low-pass", "phase-scrambling",
    "power-equalisation", "rotation", "silhouette", "sketch", "stylized",
    "uniform-noise",
]

# Row order of the reference-consumed CSV (mvh_performance_plot.py:71-87):
# linereader[1]=edge ... [16]=sketch, [17] skipped, [18]=stylized.
REFERENCE_CSV_ROWS = [
    "edge", "silhouette", "cue-conflict", "colour", "contrast", "high-pass",
    "low-pass", "phase-scrambling", "power-equalisation", "false-colour",
    "rotation", "eidolonI", "eidolonII", "eidolonIII", "uniform-noise",
    "sketch", None, "stylized",
]


def eval_mvh(
    eval_step,
    state,
    batches: Iterable,  # yields (uint8 images (B,H,W,C), labels)
    seed: int = 0,
    stimuli_root: Optional[str] = None,
    stimuli_eval_fn=None,
    levels: Optional[Dict[str, list]] = None,
) -> Dict[str, Union[float, List[float]]]:
    """Per-benchmark accuracy. Parametric benchmarks return a list with one
    accuracy per parameter level; stimulus benchmarks a single float (or
    NaN when the stimuli are unavailable). ``batches`` must be re-iterable."""
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    levels = DISTORTION_LEVELS if levels is None else levels
    results: Dict[str, Union[float, List[float]]] = {}

    # (benchmark, level) pairs whose distortion fn is the identity — one
    # clean pass serves all of them instead of 6+ redundant evaluations
    identity = {
        ("colour", 0), ("false-colour", 0), ("power-equalisation", 0),
        ("low-pass", 0), ("rotation", 0), ("uniform-noise", 0.0),
    }
    clean_acc: Dict[str, float] = {}

    def run_pass(fn, level):
        rng = np.random.default_rng(seed)
        top1 = n = 0
        for images, labels in batches:
            imgs = images.astype(np.float32) / 255.0
            if level is None:
                distorted = np.stack([fn(im, rng) for im in imgs])
            else:
                distorted = np.stack([fn(im, rng, level=level) for im in imgs])
            x = (distorted - mean) / std
            out = jax.device_get(
                eval_step(state, (jnp.asarray(x), jnp.asarray(labels)))
            )
            top1 += int(out["top1"])
            n += int(out["n"])
        return 100.0 * top1 / max(n, 1)

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
        accs = []
        for level in levels.get(name, [None]):
            if (name, level) in identity:
                if "clean" not in clean_acc:
                    clean_acc["clean"] = run_pass(lambda im, r, level=0: im, 0)
                accs.append(clean_acc["clean"])
            else:
                accs.append(run_pass(fn, level))
        results[name] = accs
    return results


def write_mvh_csv(results: Dict[str, Union[float, List[float]]],
                  model: str, step: int, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{model}_pruning_step_{step}.csv")
    with open(path, "w") as f:
        f.write("benchmark,accuracy_per_level...,mean\n")  # row 0: header
        for name in REFERENCE_CSV_ROWS:
            if name is None:  # row 17: reserved (reference plot skips it)
                f.write("reserved,nan\n")
                continue
            val = results.get(name, float("nan"))
            if isinstance(val, (list, tuple)):
                cols = list(val) + [float(np.mean(val)) if val else float("nan")]
            else:
                cols = [val]
            f.write(name + "," + ",".join(str(v) for v in cols) + "\n")
    return path
