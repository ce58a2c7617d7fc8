"""Checkpoint sweep evaluation.

Counterpart of `/root/reference/evaluate_models.py:178-364`: glob the
pruning-iteration checkpoints, load each (masks are first-class — no
prune-identity dance), compute sparsity, evaluate top-1/5, append
``split/acc1 ... custom_x_axis {sparsity}`` lines to
``{model}_dilation_{d}.txt`` (`evaluate_models.py:79-82`) and a
performance.txt for the plotting layer.
"""

from __future__ import annotations

import glob as globlib
import os
import re

import jax
import jax.numpy as jnp

from vipers.core.config import TrainConfig
from vipers.core.metrics import MetricsWriter
from vipers.pruning import compute_sparsity_global
from vipers.train.loop import evaluate


def run_sweep(cfg: TrainConfig, dilation: int = 1):
    from vipers.train.driver import _val_loader, build_session
    from vipers.discovery.driver import load_lost_checkpoint

    s = build_session(cfg)
    pattern = os.path.join(
        cfg.output_dir, f"{cfg.model}_epoch_*_pruning_iteration_*"
    )
    ckpts = sorted(
        globlib.glob(pattern),
        key=lambda p: int(re.search(r"pruning_iteration_(\d+)", p).group(1)),
    )
    if not ckpts:
        # fall back to any checkpoints of this model
        ckpts = sorted(globlib.glob(os.path.join(cfg.output_dir, f"{cfg.model}_epoch_*")))
    out_txt = os.path.join(cfg.output_dir, f"{cfg.model}_dilation_{dilation}.txt")
    rows = []
    with open(out_txt, "a") as f:
        for ckpt in ckpts:
            variables, masks = load_lost_checkpoint(ckpt, s.spec, None)
            state = s.state.replace(
                params=variables["params"],
                batch_stats=variables.get("batch_stats", s.state.batch_stats),
                masks=masks or s.state.masks,
            )
            sparsity = compute_sparsity_global(state.params, state.masks)
            acc1, acc5, loss = evaluate(
                s.eval_step, state, _val_loader(s), normalize_fn=s.normalize
            )
            for name, val in (("acc1", acc1), ("acc5", acc5), ("loss", loss)):
                f.write(f"test/{name} {val} custom_x_axis {sparsity}\n")
            rows.append((acc1, sparsity))
            print(f"{ckpt}: sparsity {sparsity:.2f}% acc1 {acc1:.3f}")
    if rows:
        MetricsWriter.export_performance_txt(
            os.path.join(cfg.output_dir, "performance.txt"), rows
        )
    return rows
