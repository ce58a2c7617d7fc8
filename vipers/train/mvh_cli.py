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

        variables, masks = load_lost_checkpoint(args.checkpoint, s.spec, None)
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

    results = eval_mvh(s.eval_step, state, _Reiterable())
    path = write_mvh_csv(results, cfg.model, args.pruning_step, cfg.output_dir)
    print(f"wrote {path}")
    return 0
