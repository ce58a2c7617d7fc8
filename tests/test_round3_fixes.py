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

    def spy(dataset, p, no_hard, workers=8, need_gt=True):
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
