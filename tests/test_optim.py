"""Optimizer/WD-grouping parity against torch.optim run in-loop.

The reference builds its optimizers in `create_optimizer`
(`/root/reference/train.py:372-392`) and its decay groups in
`set_weight_decay` (`/root/reference/utils.py:405-464`).  torch is
installed here, so instead of asserting against a reimplementation these
tests run the actual torch.optim.{SGD,RMSprop,AdamW} update on identical
parameters/gradients and require the optax chains from
``vipers.train.optim`` to track them step for step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from vipers.train.optim import (
    OptimConfig,
    make_optimizer,
    weight_decay_rates,
)


def _torch_params(arrs):
    ps = []
    for a in arrs:
        t = torch.nn.Parameter(torch.tensor(np.asarray(a), dtype=torch.float64))
        ps.append(t)
    return ps


def _run_pair(ocfg, torch_opt_fn, steps=5, seed=0):
    """Run `steps` updates through optax and torch on the same params and
    per-step gradients; return the max |Δ| over all leaves at the end."""
    rng = np.random.default_rng(seed)
    arrs = [rng.normal(size=s) for s in [(4, 3), (3,), (5,)]]
    grads_per_step = [
        [rng.normal(size=a.shape) for a in arrs] for _ in range(steps)
    ]

    # jax side (f64 so the comparison isolates semantics, not precision)
    params = {f"p{i}": jnp.asarray(a, jnp.float64) for i, a in enumerate(arrs)}
    tx = make_optimizer(ocfg, params, schedule=lambda step: ocfg.lr)
    state = tx.init(params)
    for g in grads_per_step:
        gt = {f"p{i}": jnp.asarray(a, jnp.float64) for i, a in enumerate(g)}
        updates, state = tx.update(gt, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    # torch side
    tps = _torch_params(arrs)
    opt = torch_opt_fn(tps)
    for g in grads_per_step:
        for p, ga in zip(tps, g):
            p.grad = torch.tensor(ga, dtype=torch.float64)
        opt.step()

    return max(
        float(np.abs(np.asarray(params[f"p{i}"]) - tps[i].detach().numpy()).max())
        for i in range(len(arrs))
    )


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_sgd_momentum_wd_matches_torch():
    cfg = OptimConfig(opt="sgd", lr=0.05, momentum=0.9, weight_decay=1e-3)
    err = _run_pair(
        cfg,
        lambda ps: torch.optim.SGD(ps, lr=0.05, momentum=0.9, weight_decay=1e-3),
    )
    assert err < 1e-12, err


def test_sgd_nesterov_matches_torch():
    cfg = OptimConfig(opt="sgd_nesterov", lr=0.05, momentum=0.9,
                      weight_decay=1e-3)
    err = _run_pair(
        cfg,
        lambda ps: torch.optim.SGD(
            ps, lr=0.05, momentum=0.9, weight_decay=1e-3, nesterov=True
        ),
    )
    assert err < 1e-12, err


def test_rmsprop_matches_torch_reference_hyperparams():
    # the reference's exact construction (train.py:387-389): momentum,
    # eps=0.0316 OUTSIDE the sqrt, alpha=0.9
    cfg = OptimConfig(opt="rmsprop", lr=0.01, momentum=0.9, weight_decay=1e-4)
    err = _run_pair(
        cfg,
        lambda ps: torch.optim.RMSprop(
            ps, lr=0.01, momentum=0.9, weight_decay=1e-4, eps=0.0316, alpha=0.9
        ),
    )
    assert err < 1e-12, err


def test_adamw_matches_torch():
    cfg = OptimConfig(opt="adamw", lr=1e-3, weight_decay=0.01)
    err = _run_pair(
        cfg,
        lambda ps: torch.optim.AdamW(
            ps, lr=1e-3, weight_decay=0.01, betas=(0.9, 0.999), eps=1e-8
        ),
    )
    assert err < 1e-12, err


def test_weight_decay_grouping_semantics():
    """set_weight_decay semantics (`utils.py:405-464` + wiring
    `train.py:446-458`): norm scale/bias, biases, and transformer
    embeddings (class_token / pos_embedding / relative_position_bias)
    each get their own rate; everything else gets the default."""
    params = {
        "conv_proj": {"kernel": jnp.zeros((3, 3)), "bias": jnp.zeros((3,))},
        "ln_1": {"scale": jnp.zeros((4,)), "bias": jnp.zeros((4,))},
        "class_token": jnp.zeros((1, 1, 4)),
        "pos_embedding": jnp.zeros((1, 5, 4)),
        "head": {"kernel": jnp.zeros((4, 2)), "bias": jnp.zeros((2,))},
    }
    cfg = OptimConfig(
        weight_decay=1e-4,
        norm_weight_decay=0.0,
        bias_weight_decay=1e-5,
        transformer_embedding_decay=1e-6,
    )
    rates = weight_decay_rates(params, cfg)
    assert rates["conv_proj"]["kernel"] == 1e-4          # default
    assert rates["ln_1"]["scale"] == 0.0                 # norm group
    assert rates["head"]["bias"] == 1e-5                 # bias group
    assert rates["ln_1"]["bias"] == 1e-5                 # bias wins over norm
    assert rates["class_token"] == 1e-6                  # embedding group
    assert rates["pos_embedding"] == 1e-6
    # without the custom knobs everything falls back to the default
    flat_default = weight_decay_rates(params, OptimConfig(weight_decay=1e-4))
    assert flat_default["ln_1"]["scale"] == 1e-4
    assert flat_default["class_token"] == 1e-4


def test_exponential_lr_with_linear_warmup_matches_torch():
    """SequentialLR(LinearLR -> ExponentialLR) per-epoch semantics
    (`train.py:395-431`)."""
    from vipers.train.optim import make_lr_schedule

    cfg = OptimConfig(
        opt="sgd", lr=0.2, lr_scheduler="exponentiallr", lr_gamma=0.9,
        lr_warmup_epochs=3, lr_warmup_method="linear", lr_warmup_decay=0.25,
        epochs=10,
    )
    sched = make_lr_schedule(cfg, steps_per_epoch=1)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.2)
    warm = torch.optim.lr_scheduler.LinearLR(
        opt, start_factor=0.25, total_iters=3
    )
    main = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.9)
    seq = torch.optim.lr_scheduler.SequentialLR(
        opt, [warm, main], milestones=[3]
    )
    for epoch in range(10):
        ours = float(sched(jnp.asarray(epoch)))
        theirs = opt.param_groups[0]["lr"]
        assert abs(ours - theirs) < 1e-12, (epoch, ours, theirs)
        seq.step()
