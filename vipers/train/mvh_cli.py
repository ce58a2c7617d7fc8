"""CLI wiring for the model-vs-human benchmark (see train.mvh)."""

from __future__ import annotations

import itertools


def run_mvh_cli(args) -> int:
    from vipers.core.config import config_from_args
    from vipers.train.driver import _val_loader, build_session
    from vipers.train.mvh import eval_mvh, write_mvh_csv

    cfg = config_from_args(args)
    s = build_session(cfg)
    state = s.state
    if args.checkpoint:
        from vipers.discovery.driver import load_lost_checkpoint

        variables, masks, _obs = load_lost_checkpoint(args.checkpoint, s.spec, None)
        state = state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", state.batch_stats),
            masks=masks or state.masks,
        )

    def batches():
        it = iter(_val_loader(s))
        if args.max_batches:
            it = itertools.islice(it, args.max_batches)
        return it

    class _Reiterable:
        def __iter__(self):
            return batches()

    stimuli_root = getattr(args, "stimuli_root", None)
    stimuli_eval_fn = None
    if stimuli_root:
        import jax

        from vipers.pruning.masks import apply_masks
        from vipers.train.mvh import make_stimuli_eval_fn

        @jax.jit
        def logits_fn(x):
            variables = {"params": apply_masks(state.params, state.masks)}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            logits, _aux = s.spec.module.apply(
                variables, x, train=False, need_attn=False
            )
            return logits

        stimuli_eval_fn = make_stimuli_eval_fn(
            logits_fn, batch_size=cfg.batch_size,
            resize=cfg.val_resize_size, crop=cfg.val_crop_size,
            stimuli_root=stimuli_root,
        )

    results = eval_mvh(s.eval_step, state, _Reiterable(),
                       stimuli_root=stimuli_root,
                       stimuli_eval_fn=stimuli_eval_fn)
    path = write_mvh_csv(results, cfg.model, args.pruning_step, cfg.output_dir)
    print(f"wrote {path}")
    return 0
