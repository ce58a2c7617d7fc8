"""Minimum end-to-end slice (SURVEY §4.3 / §7 stage 2, BASELINE config #1):
tiny ImageFolder -> SNIP -> 1 epoch masked training -> eval -> checkpoint ->
resume-equivalence. Also the iterative-magnitude driver loop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vipers.core.config import TrainConfig
from vipers.core.checkpoint import restore_checkpoint
from vipers.train.optim import OptimConfig
from vipers.pruning import compute_sparsity_global
from vipers.pruning.masks import apply_masks, _flat


@pytest.fixture(scope="module")
def tiny_imagenet(tmp_path_factory):
    """2 classes x 8 train + 4 val images, 40x40 random RGB."""
    root = tmp_path_factory.mktemp("tinyds")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        for cls in ("class_a", "class_b"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8)
                # make classes trivially separable: bias one channel
                if cls == "class_b":
                    arr[..., 0] = np.minimum(
                        arr[..., 0].astype(np.int16) + 80, 255
                    ).astype(np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return str(root)


def _cfg(tiny_imagenet, tmp_path, **over):
    optim = OptimConfig(opt="sgd", lr=0.01, weight_decay=1e-4, epochs=1,
                        lr_scheduler="steplr")
    base = dict(
        model="resnet18", data_path=tiny_imagenet, num_classes=2,
        train_crop_size=32, val_resize_size=40, val_crop_size=32,
        batch_size=4, workers=2, pruning_method="snip", target_sparsity=0.5,
        optim=optim, seed=0, output_dir=str(tmp_path / "out"), print_freq=0,
    )
    base.update(over)
    return TrainConfig(**base)


@pytest.mark.slow
def test_snip_train_eval_checkpoint(tiny_imagenet, tmp_path):
    from vipers.train.driver import build_session, run_snip

    cfg = _cfg(tiny_imagenet, tmp_path)
    os.makedirs(cfg.output_dir, exist_ok=True)
    s = build_session(cfg)
    sparsity, acc1 = run_snip(s)
    # >= target: exact-zero saliency ties at the threshold are pruned too
    # (reference `score > threshold` semantics, train.py:299-316)
    assert 49.0 <= sparsity <= 90.0
    assert 0.0 <= acc1 <= 100.0

    # masked weights are exactly zero after training
    eff = apply_masks(s.state.params, s.state.masks)
    for path, mask in s.state.masks.items():
        w = _flat(eff)[path]
        assert np.all(np.asarray(w)[~np.asarray(mask)] == 0.0)
    # and the raw params too (updates were masked)
    assert compute_sparsity_global(s.state.params, s.state.masks) == pytest.approx(
        sparsity, abs=1.0)

    # checkpoint round-trip
    ckpt_dir = os.path.join(cfg.output_dir, "resnet18_checkpoint_snip_0.5")
    assert os.path.isdir(ckpt_dir)
    tree = restore_checkpoint(ckpt_dir)
    assert tree["epoch"] == 0
    flat_saved = {tuple(k.split("/")): v for k, v in tree["masks"].items()}
    for path, mask in s.state.masks.items():
        np.testing.assert_array_equal(np.asarray(flat_saved[path], dtype=bool),
                                      np.asarray(mask))


@pytest.mark.slow
def test_magnitude_iterative_driver(tiny_imagenet, tmp_path):
    from vipers.train.driver import build_session, run_magnitude

    cfg = _cfg(
        tiny_imagenet, tmp_path, pruning_method="magnitude",
        pruning_rate=0.5, pruning_threshold=70.0,
    )
    os.makedirs(cfg.output_dir, exist_ok=True)
    s = build_session(cfg)
    sparsity, rows = run_magnitude(s)
    # 0 -> 50% -> 75%: two iterations to cross 70%
    assert sparsity == pytest.approx(75.0, abs=1.0)
    assert len(rows) == 2
    assert os.path.exists(os.path.join(cfg.output_dir, "performance.txt"))
    from vipers.core.metrics import MetricsWriter

    parsed = MetricsWriter.read_performance_txt(
        os.path.join(cfg.output_dir, "performance.txt"))
    assert len(parsed) == 2


def test_eval_only(tiny_imagenet, tmp_path):
    from vipers.train.driver import build_session, _val_loader
    from vipers.train.loop import evaluate

    cfg = _cfg(tiny_imagenet, tmp_path)
    s = build_session(cfg)
    acc1, acc5, loss = evaluate(s.eval_step, s.state, _val_loader(s),
                                normalize_fn=s.normalize)
    assert acc5 == 100.0  # 2 classes -> top-5 always correct
    assert loss > 0


@pytest.mark.slow
def test_resume_from_checkpoint(tiny_imagenet, tmp_path):
    """--resume restores model/opt/epoch/masks and continues training
    (reference crash-recovery story, train.py:505-521 + :801)."""
    import glob

    from vipers.train.driver import build_session, resume_session, run_snip

    cfg = _cfg(tiny_imagenet, tmp_path)
    os.makedirs(cfg.output_dir, exist_ok=True)
    s = build_session(cfg)
    run_snip(s)
    ckpt = os.path.join(cfg.output_dir, "resnet18_checkpoint_snip_0.5")

    s2 = build_session(_cfg(tiny_imagenet, tmp_path))
    start = resume_session(s2, ckpt)
    assert start == 1  # trained 1 epoch -> resume at epoch 1
    for path, mask in s.state.masks.items():
        np.testing.assert_array_equal(
            np.asarray(s2.state.masks[path]), np.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s2.state.params)[0]),
        np.asarray(jax.tree.leaves(s.state.params)[0]))
