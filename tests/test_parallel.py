"""Distributed tests on the fake 8-device CPU mesh (SURVEY §4.4):
DP-sharded step == single-device step on the concatenated batch, TP-sharded
ViT == replicated ViT, metric reduction, multichip dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vipers.parallel.mesh import make_mesh, shard_batch, vit_param_sharding


def test_mesh_shapes():
    mesh = make_mesh(model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        make_mesh(model_parallel=3)


@pytest.mark.slow
def test_dp_grads_equal_single_device():
    """Gradient of the jitted loss over a data-sharded batch equals the
    single-device gradient on the same (global) batch — the DDP all-reduce
    invariant (`/root/reference/train.py:606` semantics)."""
    from vipers.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(patch_size=4, num_layers=2, num_heads=2, hidden_dim=32,
                    mlp_dim=64, num_classes=5)
    module = VisionTransformer(cfg=cfg, image_size=(8, 8))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).integers(0, 5, 16), jnp.int32)
    variables = module.init(jax.random.PRNGKey(0), x[:1], train=False)

    def loss(params, xx, yy):
        logits, _ = module.apply({"params": params}, xx, train=False)
        logp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(logp, yy[:, None], 1).mean()

    g_single = jax.grad(loss)(variables["params"], x, y)

    mesh = make_mesh(model_parallel=1)
    xs = jax.device_put(x, shard_batch(mesh))
    ys = jax.device_put(y, shard_batch(mesh))
    ps = jax.device_put(variables["params"],
                        jax.tree.map(lambda _: NamedSharding(mesh, P()),
                                     variables["params"]))
    with mesh:
        g_dp = jax.jit(jax.grad(loss))(ps, xs, ys)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_tp_forward_equals_replicated():
    """ViT forward with tensor-parallel kernel shardings equals the
    replicated forward (XLA inserts the collectives; values unchanged)."""
    from vipers.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(patch_size=4, num_layers=2, num_heads=2, hidden_dim=32,
                    mlp_dim=64, num_classes=5)
    module = VisionTransformer(cfg=cfg, image_size=(8, 8))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 8, 8, 3)), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x[:1], train=False)
    ref_logits, _ = module.apply(variables, x, train=False)

    mesh = make_mesh(model_parallel=2)
    specs = vit_param_sharding(mesh, variables["params"])
    params = jax.device_put(variables["params"], specs)
    xs = jax.device_put(x, shard_batch(mesh))
    with mesh:
        logits, _ = jax.jit(
            lambda p, xx: module.apply({"params": p}, xx, train=False)
        )(params, xs)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-5, rtol=1e-4)


def test_metric_psum_semantics():
    """Summed eval counters over a sharded batch == sequential sums
    (`/root/reference/utils.py:394-402`)."""
    mesh = make_mesh(model_parallel=1)
    vals = jnp.arange(16, dtype=jnp.float32)
    sharded = jax.device_put(vals, shard_batch(mesh))
    with mesh:
        total = jax.jit(jnp.sum)(sharded)
    assert float(total) == float(vals.sum())


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
