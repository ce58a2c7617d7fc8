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


def test_sp_forward_equals_replicated():
    """Sequence-parallel ViT forward (token axis sharded over an 8-device
    mesh, vipers/parallel/sp.py) equals the unsharded forward — GSPMD
    inserts the attention collectives, values unchanged."""
    from vipers.models.vit import ViTConfig, VisionTransformer
    from vipers.parallel.sp import make_seq_mesh, sequence_parallel

    cfg = ViTConfig(patch_size=4, num_layers=2, num_heads=2, hidden_dim=32,
                    mlp_dim=64, num_classes=5)
    module = VisionTransformer(cfg=cfg, image_size=(32, 32))
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 32, 32, 3)), jnp.float32
    )
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    ref_logits, ref_aux = module.apply(variables, x, train=False)

    mesh = make_seq_mesh(axis="seq")

    def fwd(v, xx):
        with sequence_parallel(mesh, "seq"):
            return module.apply(v, xx, train=False)

    sp_logits, sp_aux = jax.jit(fwd)(variables, x)
    np.testing.assert_allclose(np.asarray(sp_logits), np.asarray(ref_logits),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sp_aux["attn"]), np.asarray(ref_aux["attn"]),
        atol=2e-5, rtol=1e-4,
    )


@pytest.mark.slow
def test_sp_lost_extractor_equals_plain():
    """The LOST extractor with sequence_mesh set produces the same
    features/boxes as the plain extractor — single-image extract() AND the
    batched jitted pipeline, on ragged shapes exercising the token mask."""
    from vipers.core.registry import build_model
    from vipers.discovery.driver import LostFeatureExtractor
    from vipers.parallel.sp import make_seq_mesh

    spec = build_model("vit_s_16", num_classes=10, image_size=(32, 32))
    rng = np.random.default_rng(11)
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    kw = dict(arch="vit", which_features="k")
    plain = LostFeatureExtractor(spec, variables, **kw)
    sp = LostFeatureExtractor(
        spec, variables, sequence_mesh=make_seq_mesh(axis="seq"), **kw
    )

    img = np.asarray(rng.normal(size=(48, 32, 3)), np.float32)  # ragged
    f_plain, dims_p, vdims_p, _s, _a = plain.extract(img, 16)
    f_sp, dims_s, vdims_s, _s2, _a2 = sp.extract(img, 16)
    assert dims_p == dims_s and vdims_p == vdims_s
    np.testing.assert_allclose(f_sp, f_plain, atol=2e-5, rtol=1e-4)

    imgs = [np.asarray(rng.normal(size=(32, 32, 3)), np.float32)
            for _ in range(3)]
    pipe_p = plain.make_batched_pipeline(k_patches=3)
    pipe_s = sp.make_batched_pipeline(k_patches=3)
    batch_p = plain.prepare_batch(imgs, 16)
    batch_s = sp.prepare_batch(imgs, 16)
    out_p = jax.device_get(pipe_p(plain.variables, *batch_p))
    out_s = jax.device_get(pipe_s(sp.variables, *batch_s))
    np.testing.assert_allclose(out_s[0], out_p[0], atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(out_s[1], out_p[1])
    np.testing.assert_array_equal(out_s[2], out_p[2])

    # DINO arch leg: same extractor contract through DinoVisionTransformer
    dspec = build_model("dino_vit_tiny")
    dvars = dspec.module.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), train=False
    )
    dkw = dict(arch="dino", which_features="k")
    dplain = LostFeatureExtractor(dspec, dvars, **dkw)
    dsp = LostFeatureExtractor(
        dspec, dvars, sequence_mesh=make_seq_mesh(axis="seq"), **dkw
    )
    dimg = np.asarray(rng.normal(size=(48, 32, 3)), np.float32)
    df_p, ddims_p, dv_p, _, _ = dplain.extract(dimg, 16)
    df_s, ddims_s, dv_s, _, _ = dsp.extract(dimg, 16)
    assert ddims_p == ddims_s and dv_p == dv_s
    np.testing.assert_allclose(df_s, df_p, atol=2e-5, rtol=1e-4)


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


@pytest.mark.slow
def test_sp_composes_with_int8_serving():
    """lost --sequence-parallel --dtype int8: the SP sharding constraints
    and the dynamic-int8 execution interceptors are orthogonal — SP+int8
    produces the same boxes as plain int8 (and runs on the 8-device
    mesh)."""
    from vipers.core.registry import build_model
    from vipers.discovery.driver import LostFeatureExtractor
    from vipers.parallel.sp import make_seq_mesh

    spec = build_model("vit_s_16", num_classes=10, image_size=(32, 32))
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    kw = dict(arch="vit", which_features="k", compute_dtype="int8")
    plain = LostFeatureExtractor(spec, variables, **kw)
    sp = LostFeatureExtractor(
        spec, variables, sequence_mesh=make_seq_mesh(axis="seq"), **kw
    )
    imgs = [np.asarray(np.random.default_rng(i).normal(size=(32, 32, 3)),
                       np.float32) for i in range(2)]
    pipe_p = plain.make_batched_pipeline(k_patches=3)
    pipe_s = sp.make_batched_pipeline(k_patches=3)
    out_p = jax.device_get(pipe_p(plain.variables, *plain.prepare_batch(imgs, 16)))
    out_s = jax.device_get(pipe_s(sp.variables, *sp.prepare_batch(imgs, 16)))
    np.testing.assert_allclose(out_s[0], out_p[0], atol=1e-4, rtol=1e-4)


def test_allgather_host_objects_single_process():
    """Single-process identity: returns [obj] without touching the
    distributed backend (the multi-process path — coordination-service
    KV gather + barrier — is exercised for real by
    test_multiprocess_drivers.py::test_two_process_lost_matches_single_process)."""
    from vipers.parallel.mesh import allgather_host_objects

    obj = {"hits": 3, "preds": {"im000": [1.0, 2.0, 3.0, 4.0]}}
    out = allgather_host_objects(obj)
    assert out == [obj] and out[0] is obj
