"""Pipeline parallelism (vipers/parallel/pp.py): GPipe over a ("pipe",)
mesh axis — forward and training-step parity vs the single-program flax
module on the fake 8-device CPU mesh (SURVEY §4 item 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vipers.models.vit import ViTConfig, VisionTransformer
from vipers.parallel.pp import make_pp_train_step, pp_vit_apply


def _tiny(num_layers=4, num_classes=5, representation_size=None):
    cfg = ViTConfig(patch_size=4, num_layers=num_layers, num_heads=2,
                    hidden_dim=32, mlp_dim=64, num_classes=num_classes,
                    representation_size=representation_size)
    module = VisionTransformer(cfg=cfg, image_size=(16, 16))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 16, 16, 3)), jnp.float32
    )
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    return cfg, module, variables, x


def _pipe_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("pipe",))


@pytest.mark.parametrize("stages,microbatch", [(4, 2), (4, 4), (2, 1)])
def test_pp_forward_matches_module(stages, microbatch):
    cfg, module, variables, x = _tiny()
    ref, _aux = module.apply(variables, x, train=False)
    mesh = _pipe_mesh(stages)
    got = jax.jit(
        lambda p, xx: pp_vit_apply(p, xx, cfg=cfg, mesh=mesh,
                                   microbatch=microbatch)
    )(variables["params"], x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_pp_forward_one_layer_per_stage_and_pre_logits():
    # 8 stages x 1 layer, plus the representation_size head branch
    cfg, module, variables, x = _tiny(num_layers=8, representation_size=16)
    ref, _aux = module.apply(variables, x, train=False)
    got = pp_vit_apply(variables["params"], x, cfg=cfg, mesh=_pipe_mesh(8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_pp_rejects_indivisible_layout():
    cfg, _module, variables, x = _tiny(num_layers=4)
    with pytest.raises(ValueError, match="pipeline stages"):
        pp_vit_apply(variables["params"], x, cfg=cfg, mesh=_pipe_mesh(3))
    with pytest.raises(ValueError, match="microbatch"):
        pp_vit_apply(variables["params"], x, cfg=cfg, mesh=_pipe_mesh(4),
                     microbatch=3)


@pytest.mark.slow
def test_pp_train_step_matches_dense():
    """Two pipelined SGD steps on a 50%-pruned tiny ViT land on the same
    params/metrics as train.steps.make_train_step — the reverse pipeline
    (autodiff of scan+ppermute) computes the exact dense gradients and the
    mask contract (zero grads AND updates at pruned slots) is preserved."""
    import optax

    from vipers.pruning import init_masks, magnitude_prune
    from vipers.train.steps import TrainState, make_train_step

    cfg, module, variables, x = _tiny()
    params = variables["params"]
    masks = magnitude_prune(params, init_masks(params, exclude=("qkv",)), 0.5)
    labels = jnp.asarray(
        np.random.default_rng(1).integers(0, 5, size=(4,)), jnp.int32
    )
    tx = optax.sgd(0.05, momentum=0.9)

    def fresh_state():
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats=None,
            masks=masks, opt_state=tx.init(params),
        )

    dense = make_train_step(module.apply, tx, num_classes=5, donate=False)
    # donate=False: the test re-reads the shared init params/masks after
    # stepping (the product default donates the TrainState like the dense
    # step)
    pp = make_pp_train_step(cfg, tx, num_classes=5, mesh=_pipe_mesh(4),
                            microbatch=2, donate=False)

    sd, sp = fresh_state(), fresh_state()
    rng = jax.random.PRNGKey(2)
    for _ in range(2):
        sd, md = dense(sd, (x, labels), rng)
        sp, mp = pp(sp, (x, labels), rng)

    np.testing.assert_allclose(float(mp["loss"]), float(md["loss"]),
                               atol=1e-5, rtol=1e-5)
    assert float(mp["acc1"]) == float(md["acc1"])
    flat_d = jax.tree.leaves(sd.params)
    flat_p = jax.tree.leaves(sp.params)
    for a, b in zip(flat_p, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)
    # pruned slots never moved (masks zero grads AND updates; raw params
    # keep their init values, exactly like the dense step)
    for path, m in sp.masks.items():
        node, init = sp.params, params
        for k in path:
            node, init = node[k], init[k]
        keep = np.asarray(m)
        np.testing.assert_array_equal(np.asarray(node)[~keep],
                                      np.asarray(init)[~keep])


def test_pp_block_math_bitexact_bf16():
    """The pure-function embed->blocks->head chain is BIT-identical to
    module.apply in bf16 when run eagerly — the pp math is exact; any
    end-to-end pp-vs-module delta comes only from XLA fusing the scan
    body differently (f32 intermediates inside fusions) than the unrolled
    module program."""
    from vipers.parallel.pp import (
        _embed, _head, split_vit_params, vit_block_forward,
    )

    cfg, module, variables, x = _tiny()
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), variables["params"])
    x16 = x.astype(jnp.bfloat16)
    ref, _aux = module.apply({"params": p16}, x16, train=False)
    outer, stacked = split_vit_params(p16, cfg.num_layers)
    h = _embed(outer, x16, cfg)
    for i in range(cfg.num_layers):
        bp = jax.tree.map(lambda a: a[i], stacked)
        h = vit_block_forward(bp, h, cfg.num_heads)
    got = _head(outer, h, cfg)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_pp_forward_bf16_close_to_module():
    """Pipelined bf16 forward stays within a few bf16 ulp of the module
    (the delta is scan-fusion rounding, not math — see the bit-exact
    eager test above). Guards the f32 LayerNorm-statistics contract:
    with bf16 stats the delta was ~2x larger and grew per block."""
    cfg, module, variables, x = _tiny()
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), variables["params"])
    x16 = x.astype(jnp.bfloat16)
    ref, _aux = module.apply({"params": p16}, x16, train=False)
    got = pp_vit_apply(p16, x16, cfg=cfg, mesh=_pipe_mesh(4))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=0.05)


def test_pp_default_microbatch_handles_any_batch():
    """With --pp-microbatch unset the driver must accept ANY batch size:
    the default picks the largest divisor of n <= n // S."""
    cfg, module, variables, _x = _tiny()
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(5, 16, 16, 3)), jnp.float32
    )
    ref, _aux = module.apply(variables, x, train=False)
    got = pp_vit_apply(variables["params"], x, cfg=cfg, mesh=_pipe_mesh(2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_pp_eval_step_matches_dense():
    from vipers.parallel.pp import make_pp_eval_step
    from vipers.pruning import init_masks, magnitude_prune
    from vipers.train.steps import TrainState, make_eval_step

    cfg, module, variables, x = _tiny()
    params = variables["params"]
    masks = magnitude_prune(params, init_masks(params, exclude=("qkv",)), 0.5)
    labels = jnp.asarray([0, 1, 2, 3], jnp.int32)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=None, masks=masks, opt_state=None)
    dense = make_eval_step(module.apply, num_classes=5)
    pp = make_pp_eval_step(cfg, num_classes=5, mesh=_pipe_mesh(4))
    md = dense(state, (x, labels))
    mp = pp(state, (x, labels))
    for k in ("loss_sum", "top1", "top5", "n"):
        np.testing.assert_allclose(np.asarray(mp[k]), np.asarray(md[k]),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_pp_dp_combined_and_remat_match_dense():
    """DP x PP over a (2, 4) mesh: each data column pipelines its batch
    slice; stage-param cotangents psum back over "data" (the shard_map
    transpose of the replicated in_spec). Two SGD steps land on the dense
    params; remat=True produces the identical program result."""
    import optax

    from vipers.pruning import init_masks, magnitude_prune
    from vipers.train.steps import TrainState, make_train_step

    cfg, module, variables, _x = _tiny()
    params = variables["params"]
    masks = magnitude_prune(params, init_masks(params, exclude=("qkv",)), 0.5)
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(8, 16, 16, 3)), jnp.float32
    )
    labels = jnp.asarray(
        np.random.default_rng(6).integers(0, 5, size=(8,)), jnp.int32
    )
    tx = optax.sgd(0.05, momentum=0.9)
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "pipe"))

    def fresh_state():
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats=None,
            masks=masks, opt_state=tx.init(params),
        )

    dense = make_train_step(module.apply, tx, num_classes=5, donate=False)
    rng = jax.random.PRNGKey(2)
    sd = fresh_state()
    for _ in range(2):
        sd, _md = dense(sd, (x, labels), rng)

    for remat in (False, True):
        pp = make_pp_train_step(
            cfg, tx, num_classes=5, mesh=mesh, microbatch=4,
            data_axis="data", remat=remat, donate=False,
        )
        sp = fresh_state()
        for _ in range(2):
            sp, _mp = pp(sp, (x, labels), rng)
        for a, b in zip(jax.tree.leaves(sp.params), jax.tree.leaves(sd.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)


@pytest.mark.slow
def test_pp_train_step_bf16_amp_runs():
    """--pipeline-parallel --amp: the pipelined step computes on a bf16
    params copy while f32 masters take the update (train.steps recipe);
    loss finite, params stay f32, pruned slots immobile."""
    import optax

    from vipers.pruning import init_masks, magnitude_prune
    from vipers.train.steps import TrainState

    cfg, _module, variables, x = _tiny()
    params = variables["params"]
    masks = magnitude_prune(params, init_masks(params, exclude=("qkv",)), 0.5)
    labels = jnp.asarray([0, 1, 2, 3], jnp.int32)
    tx = optax.sgd(0.05, momentum=0.9)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=None, masks=masks,
                       opt_state=tx.init(params))
    pp = make_pp_train_step(cfg, tx, num_classes=5, mesh=_pipe_mesh(4),
                            microbatch=2, compute_dtype=jnp.bfloat16,
                            donate=False)
    state2, metrics = pp(state, (x, labels), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree.leaves(state2.params):
        assert leaf.dtype == jnp.float32  # masters stay f32
    changed = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
        for a, b in zip(jax.tree.leaves(state2.params), jax.tree.leaves(params))
    )
    assert changed > 0  # the bf16 forward produced real f32 updates
