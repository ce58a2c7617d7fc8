"""Round-3 fixes:
  * sweep_checkpoints covers the reference's checkpoint layouts
    (`/root/reference/evaluate_models.py:230`, `main_lost.py:344-356`),
  * the VOC evaluate branch guards num_classes == 20,
  * --start-epoch precedence matches torchvision train.py (resume wins),
  * make_int8_eval_step reuses one compiled program across epochs,
  * dynamic_qparams excludes pad token rows,
  * restore_checkpoint is sharding-warning-free and numpy-valued.
"""

import os
import types
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipers.core.config import TrainConfig
from vipers.train.optim import OptimConfig


def _touch(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    open(path, "w").close()


def test_sweep_checkpoints_reference_layouts(tmp_path):
    """The reference CNN layout ({model}/model_epoch_89_pruning_iteration_
    {NN}.pth), the ViT layout ({model}/{model}_epoch_299_...), and our flat
    orbax layout must all be discovered and iteration-ordered."""
    from vipers.train.evaluate_models import sweep_checkpoints

    ref_cnn = tmp_path / "ref_cnn"
    for it in (2, 0, 10):
        _touch(str(ref_cnn / "resnet50" /
                   f"model_epoch_89_pruning_iteration_{it:02d}.pth"))
    got = sweep_checkpoints(str(ref_cnn), "resnet50")
    assert [os.path.basename(p) for p in got] == [
        "model_epoch_89_pruning_iteration_00.pth",
        "model_epoch_89_pruning_iteration_02.pth",
        "model_epoch_89_pruning_iteration_10.pth",
    ]

    ref_vit = tmp_path / "ref_vit"
    for it in (1, 0):
        _touch(str(ref_vit / "vit_b_16" /
                   f"vit_b_16_epoch_299_pruning_iteration_{it:02d}.pth"))
    got = sweep_checkpoints(str(ref_vit), "vit_b_16")
    assert [os.path.basename(p) for p in got] == [
        "vit_b_16_epoch_299_pruning_iteration_00.pth",
        "vit_b_16_epoch_299_pruning_iteration_01.pth",
    ]

    # native flat layout: orbax checkpoint DIRECTORIES
    flat = tmp_path / "flat"
    for it in (3, 1):
        d = flat / f"resnet18_epoch_0_pruning_iteration_{it:02d}"
        d.mkdir(parents=True)
        (d / "manifest.ocdbt").write_text("")  # orbax-internal file noise
    got = sweep_checkpoints(str(flat), "resnet18")
    assert [os.path.basename(p) for p in got] == [
        "resnet18_epoch_0_pruning_iteration_01",
        "resnet18_epoch_0_pruning_iteration_03",
    ]

    # fallback: epoch checkpoints without an iteration suffix
    fb = tmp_path / "fb"
    _touch(str(fb / "resnet18_epoch_5" / "x"))
    got = sweep_checkpoints(str(fb), "resnet18")
    assert got and got[0].endswith("resnet18_epoch_5")

    assert sweep_checkpoints(str(tmp_path / "empty"), "resnet18") == []


def test_voc_sweep_guards_num_classes(tmp_path):
    """--eval-dataset voc with a non-20-class head is meaningless; the
    sweep must refuse instead of producing silent ~0% rows."""
    from vipers.train.evaluate_models import run_sweep

    cfg = TrainConfig(
        model="resnet18", data_path=str(tmp_path), num_classes=1000,
        optim=OptimConfig(opt="sgd", lr=0.1, weight_decay=0.0, epochs=1,
                          lr_scheduler="steplr"),
        output_dir=str(tmp_path / "out"), eval_dataset="voc",
    )
    with pytest.raises(ValueError, match="num_classes == 20"):
        run_sweep(cfg)


def test_start_epoch_resume_precedence(tmp_path, monkeypatch):
    """Reference precedence (torchvision train.py): a --resume checkpoint's
    epoch overwrites --start-epoch; --start-epoch alone still seeds it."""
    from vipers.train import driver

    monkeypatch.setattr(driver, "build_session",
                        lambda cfg: types.SimpleNamespace())
    monkeypatch.setattr(driver, "resume_session", lambda s, p: 7)
    captured = {}
    monkeypatch.setattr(
        driver, "run_snip",
        lambda s, initial_epoch=0: captured.update(e=initial_epoch),
    )

    def cfg(**over):
        base = dict(
            model="resnet18", data_path=str(tmp_path), num_classes=2,
            optim=OptimConfig(opt="sgd", lr=0.1, weight_decay=0.0, epochs=1,
                              lr_scheduler="steplr"),
            output_dir=str(tmp_path / "out"), pruning_method="snip",
        )
        base.update(over)
        return TrainConfig(**base)

    driver.run(cfg(resume="ckpt", start_epoch=3))
    assert captured["e"] == 7  # resume wins over the manual flag
    driver.run(cfg(start_epoch=3))
    assert captured["e"] == 3  # manual flag applies when not resuming


def _tiny_dense_setup():
    import flax.linen as nn

    from vipers.train.quantize import (
        init_observers, observer_sites, quantize_params_int8,
    )

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, need_attn=False):
            return nn.Dense(4, name="head")(nn.relu(nn.Dense(8)(x)))

    m = M()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 6))
    variables = m.init(rng, x)
    q, scales = quantize_params_int8(variables["params"], exclude=())
    sites = observer_sites(m, variables, x, exclude=())
    observers = init_observers(sites)
    # one calibration-ish update so qparams are sane
    from vipers.train.quantize import quantized_apply

    _, observers = quantized_apply(m, variables, x, observers,
                                   update_observers=True,
                                   apply_act_fake_quant=False)
    return m, variables, x, q, scales, observers


def test_int8_eval_step_single_trace_across_epochs():
    """make_int8_eval_step must reuse ONE compiled program when called
    again with fresh q/scales/observers (the per-epoch convert->eval loop,
    `train_quantization.py:129-135`)."""
    from vipers.train.quantize import (
        _INT8_EVAL_STEP_CACHE, make_int8_eval_step,
    )

    from vipers.train.steps import TrainState

    m, variables, x, q, scales, observers = _tiny_dense_setup()
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=None, masks={}, opt_state=None,
    )
    batch = (x, jnp.zeros((2,), jnp.int32))

    _INT8_EVAL_STEP_CACHE.clear()
    step1 = make_int8_eval_step(m, q, scales, observers, 4)
    out1 = step1(state, batch)
    # epoch 2: fresh quantized weights (values changed, same structure)
    q2 = jax.tree.map(lambda a: a, q)
    step2 = make_int8_eval_step(m, q2, scales, observers, 4)
    out2 = step2(state, batch)
    assert len(_INT8_EVAL_STEP_CACHE) == 1
    _mod, jitted = next(iter(_INT8_EVAL_STEP_CACHE.values()))
    assert jitted._cache_size() == 1, "int8 eval step re-traced across epochs"
    np.testing.assert_allclose(np.asarray(out1["loss_sum"]),
                               np.asarray(out2["loss_sum"]), rtol=1e-6)


def test_dynamic_qparams_masks_pad_rows():
    """Pad token rows with garbage values must not widen the dynamic range."""
    from vipers.train.quantize import dynamic_qparams

    x_valid = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 4)),
                          jnp.float32)
    garbage = jnp.full((2, 2, 4), 1e4, jnp.float32)
    x = jnp.concatenate([x_valid, garbage], axis=1)
    mask = jnp.asarray([[True] * 3 + [False] * 2] * 2)

    s_masked, zp_masked = dynamic_qparams(x, mask)
    s_ref, zp_ref = dynamic_qparams(x_valid)
    np.testing.assert_allclose(np.asarray(s_masked), np.asarray(s_ref))
    np.testing.assert_allclose(np.asarray(zp_masked), np.asarray(zp_ref))
    s_unmasked, _ = dynamic_qparams(x)
    assert float(s_unmasked) > 10 * float(s_masked)


def test_restore_checkpoint_numpy_and_warning_free(tmp_path):
    """Default restore returns host numpy leaves with NO orbax sharding
    warning (multi-host resume stays well-defined via the shardings= arg)."""
    from vipers.core.checkpoint import restore_checkpoint, save_checkpoint

    tree = {
        "params": {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))},
        "epoch": np.int32(4),
    }
    path = str(tmp_path / "ck")
    save_checkpoint(path, tree)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = restore_checkpoint(path)
    assert not [x for x in w if "hard" in str(x.message).lower()
                or "Sharding" in str(x.message)], [str(x.message) for x in w]
    assert isinstance(out["params"]["w"], np.ndarray)
    assert int(out["epoch"]) == 4
    np.testing.assert_array_equal(out["params"]["w"], np.ones((3, 3)))


def test_amp_train_step_runs_bf16_compute():
    """--amp must run the forward on a bf16 PARAMS copy (real mixed
    precision), keep f32 master params, and track the f32 step closely."""
    import flax.linen as nn
    import optax

    from vipers.train.steps import TrainState, make_train_step

    seen_dtypes = []

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, need_attn=False, rngs=None):
            seen_dtypes.append(x.dtype)
            h = nn.Dense(16)(x)
            seen_dtypes.append(h.dtype)
            return nn.Dense(4, name="head")(nn.relu(h)), {}

    m = M()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 12))
    variables = m.init(rng, x)
    tx = optax.sgd(0.1)
    masks = {}

    outs = {}
    for tag, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        seen_dtypes.clear()
        step = make_train_step(m.apply, tx, num_classes=4, compute_dtype=dt)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=jax.tree.map(jnp.copy, variables["params"]),
            batch_stats=None, masks=masks,
            opt_state=tx.init(variables["params"]),
        )
        s2, metrics = step(state, (x, jnp.zeros((8,), jnp.int32)), rng)
        if tag == "bf16":
            # the FORWARD ran in bf16 (dense output dtype), not promoted f32
            assert jnp.bfloat16 in seen_dtypes, seen_dtypes
        # master params stay f32 either way
        assert all(
            a.dtype == jnp.float32 for a in jax.tree.leaves(s2.params)
        )
        outs[tag] = (jax.device_get(s2.params), float(metrics["loss"]))
    f32_p, f32_loss = outs["f32"]
    bf16_p, bf16_loss = outs["bf16"]
    assert bf16_loss == pytest.approx(f32_loss, rel=0.05)
    flat_a = np.concatenate([np.ravel(v) for v in jax.tree.leaves(f32_p)])
    flat_b = np.concatenate([np.ravel(v) for v in jax.tree.leaves(bf16_p)])
    np.testing.assert_allclose(flat_a, flat_b, atol=0.05)


def test_int8_dynamic_apply_static_qparams():
    """Calibrated observer qparams (checkpoint "observers") must override
    the dynamic per-tensor min/max at matching sites — torch
    static-quantization semantics for the int8 serving path."""
    import flax.linen as nn

    from vipers.train.quantize import (
        int8_dynamic_apply, quantize_params_int8,
    )

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, need_attn=False):
            return nn.Dense(8, name="d")(x)

    m = M()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 6)) * 2.0
    variables = m.init(rng, x)
    q, scales = quantize_params_int8(variables["params"], exclude=())

    dyn = int8_dynamic_apply(m, variables, x, q, scales)
    # static qparams for the same range -> close to dynamic
    mn, mx = float(x.min()), float(x.max())
    scale = max((max(mx, 0.0) - min(mn, 0.0)) / 255.0, 1e-9)
    zp = float(np.clip(round(0 - min(mn, 0.0) / scale), 0, 255))
    good = int8_dynamic_apply(
        m, variables, x, q, scales,
        static_qparams={"d": (jnp.asarray(scale), jnp.asarray(zp))},
    )
    np.testing.assert_allclose(np.asarray(good), np.asarray(dyn), atol=0.1)
    # a deliberately wrong (10x too narrow) static range must CHANGE the
    # result — proving the static path is actually taken
    bad = int8_dynamic_apply(
        m, variables, x, q, scales,
        static_qparams={"d": (jnp.asarray(scale / 10), jnp.asarray(zp))},
    )
    assert float(np.abs(np.asarray(bad) - np.asarray(dyn)).max()) > 0.05


def test_load_lost_checkpoint_returns_observers(tmp_path):
    """Checkpoints written by `vipers quantize` carry observers; the LOST
    loader must surface them for calibrated int8 serving."""
    from vipers.core.checkpoint import save_checkpoint
    from vipers.discovery.driver import load_lost_checkpoint

    path = str(tmp_path / "ck")
    save_checkpoint(path, {
        "params": {"w": jnp.ones((2, 2))},
        "observers": {"enc/d:in": {"min": np.float32(-1.5),
                                   "max": np.float32(3.0)}},
    })
    variables, masks, obs = load_lost_checkpoint(path, None, None)
    assert obs is not None and "enc/d:in" in obs
    assert float(obs["enc/d:in"]["max"]) == 3.0
    assert masks == {}


def test_lost_workers_zero_is_synchronous(monkeypatch, tmp_path):
    """--workers 0 must mean 1 decode worker, not silently 8."""
    import argparse

    from vipers.discovery import driver as ddriver

    seen = {}
    orig = ddriver._prefetch_decoded

    def spy(dataset, p, no_hard, workers=8, need_gt=True, as_uint8=False):
        seen["workers"] = workers
        return iter(())

    monkeypatch.setattr(ddriver, "_prefetch_decoded", spy)
    args = argparse.Namespace(
        model="vit_s_16", arch="vit", dataset="VOC07", set="trainval",
        data_path=str(tmp_path), checkpoint="", patch_size=16,
        which_features="k", k_patches=10, dinoseg=False, dinoseg_head=4,
        no_hard=False, output_dir=str(tmp_path / "o"), iteration=0,
        visualize=None, workers=0, no_evaluation=True,
        image_path=os.path.join(str(tmp_path), "nope.jpg"),
    )
    # image_path mode skips the dataset scan; the spy intercepts before decode
    ddriver.run_lost(args)
    assert seen["workers"] == 1


# ----------------------------------------------- round-3 review-pass fixes

@pytest.mark.slow  # 60-85s: keeps the smoke loop fast (VERDICT r3 weak #6)
def test_ptq_calibration_probes_masked_params(tmp_path, monkeypatch):
    """PTQ calibration must observe the PRUNED network: probe_vars passed to
    ptq_calibrate carry mask-applied params (raw params keep stale nonzero
    values at pruned slots and would mis-calibrate activation ranges)."""
    import argparse

    from PIL import Image

    from vipers.core.checkpoint import save_checkpoint
    from vipers.train import quantize as qz
    from vipers.train.driver import build_session

    root = tmp_path / "ds"
    rng = np.random.default_rng(0)
    for split, n in (("train", 2), ("val", 2)):
        for cls in ("a", "b"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                Image.fromarray(rng.integers(
                    0, 255, size=(40, 40, 3), dtype=np.uint8)).save(
                        d / f"{i}.jpg")

    cfg = TrainConfig(
        model="resnet18", data_path=str(root), num_classes=2,
        train_crop_size=32, val_resize_size=40, val_crop_size=32,
        batch_size=2, workers=1, pruning_method="snip", target_sparsity=0.5,
        optim=OptimConfig(opt="sgd", lr=0.01, epochs=1),
        seed=0, output_dir=str(tmp_path / "out"), print_freq=0,
    )
    s = build_session(cfg)
    from vipers.pruning import magnitude_prune

    masks = magnitude_prune(s.state.params, s.state.masks, amount=0.5)
    # raw init params are nonzero at pruned slots (masks are forward-only),
    # which is exactly the staleness the probe must not see
    tree = {
        "params": s.state.params,
        "masks": {"/".join(k): np.asarray(v) for k, v in masks.items()},
        "epoch": np.int32(0),
    }
    if s.state.batch_stats is not None:
        tree["batch_stats"] = s.state.batch_stats
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, tree)

    captured = {}

    class _Stop(Exception):
        pass

    def fake_calibrate(module, probe_vars, observers, batches, n, exclude):
        captured["probe"] = probe_vars
        raise _Stop

    monkeypatch.setattr(qz, "ptq_calibrate", fake_calibrate)
    import dataclasses

    ns = {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)
          if f.name != "optim"}
    ns.update({f.name: getattr(cfg.optim, f.name)
               for f in dataclasses.fields(cfg.optim)})
    ns.update(mode="ptq", calibration_batches=1, resume=ckpt)
    args = argparse.Namespace(**ns)
    with pytest.raises(_Stop):
        qz.run_quantize(args)

    probe = captured["probe"]["params"]
    from vipers.pruning.masks import _flat

    flat_params = _flat(probe)
    hit = 0
    for path, m in masks.items():
        m = np.asarray(m)
        if not m.all():
            vals = np.asarray(flat_params[path])[~m]
            assert np.all(vals == 0.0), f"unmasked probe at {path}"
            hit += 1
    assert hit > 0  # the assertion above actually ran


def test_resume_reapplies_session_shardings(tmp_path, monkeypatch):
    """resume_session must re-apply the session's TP/DP placements after
    swapping in host-restored arrays (state_sharder)."""
    from vipers.train import driver

    calls = {"n": 0}

    class FakeState:
        def __init__(self):
            self.params = {"w": jnp.ones((2,))}
            self.masks = {}
            self.opt_state = None
            self.batch_stats = None
            self.step = jnp.zeros((), jnp.int32)
            self.ema_params = None
            self.ema_batch_stats = None

        def replace(self, **kw):
            new = FakeState()
            new.__dict__.update(self.__dict__)
            new.__dict__.update(kw)
            return new

    def sharder(st):
        calls["n"] += 1
        return st

    s = types.SimpleNamespace(state=FakeState(), state_sharder=sharder)
    from vipers.core.checkpoint import save_checkpoint

    ckpt = str(tmp_path / "c")
    save_checkpoint(ckpt, {"params": {"w": np.zeros((2,), np.float32)},
                           "epoch": np.int32(3)})
    epoch = driver.resume_session(s, ckpt)
    assert epoch == 4 and calls["n"] == 1


def test_vit_train_guards_mismatched_eval_crop(tmp_path):
    """ViT/swin pos-embeddings are sized at construction; a val crop that
    differs from the train crop must fail fast, not after a full epoch."""
    from vipers.train.driver import build_session

    cfg = TrainConfig(
        model="vit_s_16", data_path=str(tmp_path), num_classes=2,
        train_crop_size=176, val_crop_size=224,
        optim=OptimConfig(opt="sgd", lr=0.01, epochs=1),
        output_dir=str(tmp_path / "o"),
    )
    with pytest.raises(SystemExit, match="val-crop-size"):
        build_session(cfg)


def test_eval_sweep_session_sized_by_val_crop(tmp_path):
    """The evaluate sweep only ever sees val-crop batches, so fixed-size
    families must be constructed (and initialized) at val_crop_size."""
    from PIL import Image

    from vipers.train.evaluate_models import _eval_only_session

    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, size=(40, 40, 3),
                                     dtype=np.uint8)).save(d / "0.jpg")
    cfg = TrainConfig(
        model="vit_s_16", data_path=str(tmp_path), num_classes=2,
        train_crop_size=224, val_resize_size=40, val_crop_size=32,
        optim=OptimConfig(opt="sgd", lr=0.01, epochs=1),
        output_dir=str(tmp_path / "o"),
    )
    s = _eval_only_session(cfg, with_val=True)
    from vipers.pruning.masks import _flat

    # 32px / patch 16 -> 2x2 grid + CLS = 5 tokens
    seq = next(v.shape[1] for k, v in _flat(s.state.params).items()
               if k[-1] == "pos_embedding")
    assert seq == 5


def test_packed_flash_interpret_reaches_kernel(monkeypatch):
    """flash_attention_packed(interpret=True) must run the Pallas kernel in
    interpret mode off-TPU (not silently return the einsum reference)."""
    import importlib

    fa = importlib.import_module("vipers.ops.flash_attention")

    b, h, t, hd = 2, 8, 64, 16
    d = h * hd
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(b, t, 3 * d)), jnp.float32)
    valid = jnp.ones((b, t), bool)

    called = {"kernel": 0}
    orig = fa._packed_flash

    def spy(*a, **kw):
        called["kernel"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "_packed_flash", spy)
    out = fa.flash_attention_packed(qkv, valid, num_heads=h, interpret=True)
    assert called["kernel"] == 1

    ref = fa.flash_attention_packed(qkv, valid, num_heads=h, interpret=False)
    assert called["kernel"] == 1  # off-TPU non-interpret stays on the einsum
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
