"""Wiring tests for round-2 driver/config gaps:
  * --ra-sampler actually feeds the train loader (train.py:228-236),
  * --cache-dataset reaches ImageFolder,
  * --resnet-dilate builds a dilated model in the evaluation sweep,
  * ema_batch_stats round-trips through checkpoint/resume,
  * LRR resume continues from the restored epoch,
  * maybe_initialize_distributed gating (utils.py:245-269 parity).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vipers.core.config import TrainConfig
from vipers.train.optim import OptimConfig


@pytest.fixture(scope="module")
def tiny_imagenet(tmp_path_factory):
    root = tmp_path_factory.mktemp("tinyds2")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        for cls in ("class_a", "class_b"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8)
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
def test_ra_sampler_wired_into_train_loader(tiny_imagenet, tmp_path, monkeypatch):
    """--ra-sampler must route _train_loader through ra_sampler_indices and
    the loader must consume exactly that index stream."""
    from vipers.data import sampler as sampler_mod
    from vipers.train.driver import _train_loader, build_session

    cfg = _cfg(tiny_imagenet, tmp_path, ra_sampler=True, ra_reps=2)
    s = build_session(cfg)

    calls = {}
    real = sampler_mod.ra_sampler_indices

    def spy(n, num_replicas, rank, epoch, seed=0, shuffle=True, repetitions=3):
        calls["args"] = (n, num_replicas, rank, epoch, repetitions)
        # tiny datasets truncate to 0 under the DeiT /256 rule; return a
        # fixed stream so loader consumption is observable
        return [0, 1, 2, 3, 0, 1, 2, 3]

    monkeypatch.setattr(sampler_mod, "ra_sampler_indices", spy)
    loader = _train_loader(s, epoch=3)
    batches = list(loader)
    assert calls["args"] == (len(s.train_ds), jax.process_count(),
                             jax.process_index(), 3, 2)
    assert sum(b[0].shape[0] for b in batches) == 8  # consumed the RA stream
    # and the real implementation still honors the DeiT repetition invariant
    idx = real(512, 2, 0, 0, repetitions=2) + real(512, 2, 1, 0, repetitions=2)
    counts = np.bincount(idx, minlength=512)
    assert counts.max() <= 2


@pytest.mark.slow
def test_cache_dataset_wired(tiny_imagenet, tmp_path):
    from vipers.train.driver import build_session

    cache = str(tmp_path / "cache")
    os.makedirs(cache, exist_ok=True)
    cfg = _cfg(tiny_imagenet, tmp_path, cache_dataset=cache)
    build_session(cfg)
    pkls = [f for f in os.listdir(cache) if f.startswith("imagefolder_")]
    assert len(pkls) == 2  # train + val listings cached


@pytest.mark.slow  # 60-85s: keeps the smoke loop fast (VERDICT r3 weak #6)
def test_resnet_dilate_builds_dilated_model(tiny_imagenet, tmp_path):
    from vipers.train.driver import build_session

    cfg = _cfg(tiny_imagenet, tmp_path, resnet_dilate=2)
    s = build_session(cfg)
    assert s.spec.extra["dilate"] == 2
    # dilated stage-4: spatial resolution stays 2x larger than undilated
    x = jnp.zeros((1, 32, 32, 3))
    feats_mod = s.spec.module.clone(headless=True)
    v = feats_mod.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = feats_mod.apply(v, x, train=False)
    cfg1 = _cfg(tiny_imagenet, tmp_path, resnet_dilate=1)
    s1 = build_session(cfg1)
    m1 = s1.spec.module.clone(headless=True)
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    out1, _ = m1.apply(v1, x, train=False)
    assert out.shape[1] == 2 * out1.shape[1]


@pytest.mark.slow
def test_vit_builds_at_train_crop_and_snip_runs(tiny_imagenet, tmp_path):
    """ViT train sessions must (a) size the pos-embedding at
    --train-crop-size (the torch reference hard-codes 224,
    `vision_transformer.py:282-283`) and (b) survive _snip_loss_fn's
    no-batch-stats branch (flax returns an (out, vars) tuple for ANY
    collection-valued `mutable`, including [])."""
    from vipers.train.driver import _snip_loss_fn, build_session

    cfg = _cfg(tiny_imagenet, tmp_path, model="vit_s_16")
    s = build_session(cfg)
    assert s.state.batch_stats is None
    assert s.spec.module.image_size == (32, 32)
    seq = (32 // 16) ** 2 + 1
    assert s.state.params["pos_embedding"].shape[1] == seq

    loss_fn = _snip_loss_fn(s)
    batch = (jnp.zeros((2, 32, 32, 3)), jnp.array([0, 1]))
    loss = loss_fn(s.state.params, batch)
    assert jnp.isfinite(loss) and loss.ndim == 0


@pytest.mark.slow
def test_ema_batch_stats_checkpoint_roundtrip(tiny_imagenet, tmp_path):
    """EMA-BN stats must survive checkpoint/resume (round-1 advisor
    finding: they silently reset, corrupting EMA eval of BN models)."""
    from vipers.train.driver import build_session, resume_session, run_snip

    cfg = _cfg(tiny_imagenet, tmp_path, model_ema=True, model_ema_steps=1,
               model_ema_decay=0.9)
    os.makedirs(cfg.output_dir, exist_ok=True)
    s = build_session(cfg)
    run_snip(s)
    assert s.state.ema_batch_stats is not None

    ckpt = os.path.join(cfg.output_dir, "resnet18_checkpoint_snip_0.5")
    s2 = build_session(_cfg(tiny_imagenet, tmp_path, model_ema=True,
                            model_ema_steps=1, model_ema_decay=0.9))
    resume_session(s2, ckpt)
    want = jax.tree.leaves(s.state.ema_batch_stats)
    got = jax.tree.leaves(s2.state.ema_batch_stats)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)


@pytest.mark.slow
def test_lrr_resume_continues_from_restored_epoch(tiny_imagenet, tmp_path, monkeypatch):
    """A mid-iteration LRR resume must not re-run completed epochs
    (reference train.py:469 range(initial_epoch, epochs))."""
    from vipers.train import driver as drv

    cfg = _cfg(tiny_imagenet, tmp_path, pruning_method="magnitude",
               pruning_rate=0.5, pruning_threshold=30.0)
    s = drv.build_session(cfg)
    seen = {}

    def fake_tmc(train_step, eval_step, state, tl, vl, epochs, rng,
                 initial_epoch=0, **kw):
        seen["initial_epoch"] = initial_epoch
        # pretend we finished: sparsity jump ends the while loop
        return state, 50.0

    monkeypatch.setattr(drv, "train_model_to_completion", fake_tmc)
    monkeypatch.setattr(drv, "compute_sparsity_global",
                        lambda p, m: seen.setdefault("n", 0) or 99.9
                        if "initial_epoch" in seen else 0.0)
    drv.run_magnitude(s, resuming=True, initial_epoch=5)
    assert seen["initial_epoch"] == 5


def test_distributed_init_gating(monkeypatch):
    from vipers.parallel.mesh import maybe_initialize_distributed

    for var in ("MASTER_ADDR", "RANK", "WORLD_SIZE", "SLURM_PROCID",
                "JAX_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed(verbose=False) is False

    # world size 1 -> still single-process (utils.py:254-257)
    monkeypatch.setenv("MASTER_ADDR", "127.0.0.1")
    monkeypatch.setenv("RANK", "0")
    monkeypatch.setenv("WORLD_SIZE", "1")
    assert maybe_initialize_distributed(verbose=False) is False


@pytest.mark.slow
def test_resumed_session_can_train(tiny_imagenet, tmp_path):
    """A resumed opt_state must be usable by tx.update — orbax restores
    optax NamedTuples as plain dicts; restore_like re-imposes the
    container types (regression: first post-resume step crashed with
    AttributeError: 'dict' object has no attribute 'trace')."""
    from vipers.train.driver import (
        _train_loader, build_session, resume_session, run_snip,
    )

    cfg = _cfg(tiny_imagenet, tmp_path)
    os.makedirs(cfg.output_dir, exist_ok=True)
    s = build_session(cfg)
    run_snip(s)
    ckpt = os.path.join(cfg.output_dir, "resnet18_checkpoint_snip_0.5")

    s2 = build_session(_cfg(tiny_imagenet, tmp_path))
    resume_session(s2, ckpt)
    images, labels = next(iter(_train_loader(s2, 0)))
    batch = (s2.normalize(images), jnp.asarray(labels))
    state, metrics = s2.train_step(s2.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_distributed_init_two_process_rendezvous(tmp_path):
    """Real multi-process bring-up: two subprocesses rendezvous via
    torchrun-style env and see a 2-process global runtime (regression:
    the env guard used jax.process_count(), initializing the backend
    before jax.distributed.initialize could run)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    prog = (
        "from vipers.parallel.mesh import maybe_initialize_distributed\n"
        "assert maybe_initialize_distributed(verbose=False) is True\n"
        "import jax\n"
        "assert jax.process_count() == 2, jax.process_count()\n"
        "assert jax.device_count() == 2, jax.device_count()\n"
        "print('rank', jax.process_index(), 'ok')\n"
    )
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "JAX_PLATFORMS": "cpu",
            # JAX_PLATFORMS alone does not stop the sitecustomize from
            # pinning the axon (tunneled TPU) platform; clearing the pool
            # var skips axon registration so a dead tunnel can't hang the
            # rendezvous (this test is about CPU-process bring-up).
            "PALLAS_AXON_POOL_IPS": "",
            "MASTER_ADDR": "127.0.0.1",
            "MASTER_PORT": str(port),
            "RANK": str(rank),
            "WORLD_SIZE": "2",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", prog],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    for rank, p in enumerate(procs):
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert f"rank {rank} ok" in out


@pytest.mark.slow
def test_eval_sweep_voc_branch(tmp_path):
    """--eval-dataset voc evaluates checkpoints on a VOC detection root
    (no ImageFolder required) and writes the dilation-txt contract."""
    from PIL import Image

    from vipers.core.checkpoint import save_checkpoint
    from vipers.core.registry import build_model
    from vipers.train.evaluate_models import run_sweep

    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(2):
        h, w = 64, 80
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        name = f"im{i:03d}"
        names.append(name)
        Image.fromarray(arr).save(root / "JPEGImages" / f"{name}.jpg")
        (root / "Annotations" / f"{name}.xml").write_text(
            f"""<annotation><filename>{name}.jpg</filename>
<size><width>{w}</width><height>{h}</height><depth>3</depth></size>
<object><name>dog</name><truncated>0</truncated><difficult>0</difficult>
<bndbox><xmin>5</xmin><ymin>5</ymin><xmax>40</xmax><ymax>40</ymax></bndbox>
</object></annotation>""")
    (root / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(names))

    # checkpoints in the REFERENCE's sweep layout: the {model} subdirectory
    # with the literal `model_epoch_89` stem (`evaluate_models.py:230`),
    # two iterations out of order on disk
    out_dir = tmp_path / "out"
    models_dir = out_dir / "resnet18"
    models_dir.mkdir(parents=True)
    spec = build_model("resnet18", num_classes=20)
    variables = spec.module.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 3)), train=False)
    for it in (1, 0):
        save_checkpoint(
            str(models_dir / f"model_epoch_89_pruning_iteration_{it:02d}"),
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
        )

    cfg = _cfg(str(root), tmp_path, model="resnet18", num_classes=20,
               eval_dataset="voc", resnet_dilate=1,
               output_dir=str(out_dir), val_resize_size=48, val_crop_size=32)
    rows = run_sweep(cfg)
    assert len(rows) == 2  # every reference-layout iteration found
    acc1, sparsity = rows[0]
    assert 0.0 <= acc1 <= 100.0
    txt = out_dir / "resnet18_dilation_1.txt"
    assert txt.exists()
    body = txt.read_text()
    assert body.count("voc/acc1") == 2


def test_new_train_flags_reach_config():
    """--wd alias, --ra-magnitude/--augmix-severity, --start-epoch must
    land in TrainConfig (reference train.py:753-754,804 parity)."""
    from vipers.cli.main import main as _unused  # noqa: F401  (parser import)
    import argparse

    from vipers.core.config import add_train_args, config_from_args

    p = add_train_args(argparse.ArgumentParser())
    args = p.parse_args([
        "--wd", "0.05", "--ra-magnitude", "7", "--augmix-severity", "5",
        "--start-epoch", "12", "--auto-augment", "ra",
    ])
    cfg = config_from_args(args)
    assert cfg.optim.weight_decay == 0.05
    assert cfg.ra_magnitude == 7
    assert cfg.augmix_severity == 5
    assert cfg.start_epoch == 12


def test_apply_policy_magnitude_knobs(rng):
    """ra_magnitude / augmix_severity change the augmentation output."""
    import numpy as np

    from vipers.data.autoaugment import apply_policy

    arr = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    a = apply_policy("ra", arr, np.random.default_rng(0), ra_magnitude=1)
    b = apply_policy("ra", arr, np.random.default_rng(0), ra_magnitude=30)
    assert a.shape == arr.shape and b.shape == arr.shape
    assert not np.array_equal(a, b)


def test_interpolation_flag_changes_decode(tmp_path, rng):
    """--interpolation selects the PIL resize mode in both presets
    (reference train.py:807); modes must produce different pixels."""
    import numpy as np
    from PIL import Image

    from vipers.data.preprocess import eval_decode, train_decode

    p = tmp_path / "x.jpg"
    Image.fromarray(
        (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    ).save(p)
    a = eval_decode(str(p), 64, 48, interpolation="bilinear")
    b = eval_decode(str(p), 64, 48, interpolation="nearest")
    assert a.shape == b.shape == (48, 48, 3)
    assert not np.array_equal(a, b)
    t = train_decode(str(p), np.random.default_rng(0), crop_size=32,
                     hflip_prob=0.0, interpolation="bicubic")
    t2 = train_decode(str(p), np.random.default_rng(0), crop_size=32,
                      hflip_prob=0.0, interpolation="nearest")
    assert t.shape == t2.shape == (32, 32, 3)
    assert not np.array_equal(t, t2)


@pytest.mark.slow
def test_pipeline_parallel_wired_into_train_step(tiny_imagenet, tmp_path):
    """--pipeline-parallel swaps the session's train step for the GPipe
    pipelined one (vipers/parallel/pp.py) and one step matches the dense
    step; invalid layouts are rejected loudly."""
    from vipers.train.driver import build_session

    cfg_pp = _cfg(tiny_imagenet, tmp_path, model="vit_s_16",
                  pipeline_parallel=4)
    s_pp = build_session(cfg_pp)
    s_d = build_session(_cfg(tiny_imagenet, tmp_path, model="vit_s_16"))
    # same seed -> identical initial params
    batch = (
        jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 32, 3)),
                    jnp.float32),
        jnp.asarray([0, 1, 0, 1], jnp.int32),
    )
    rng = jax.random.PRNGKey(0)
    st_pp, m_pp = s_pp.train_step(s_pp.state, batch, rng)
    st_d, m_d = s_d.train_step(s_d.state, batch, rng)
    assert np.isfinite(float(m_pp["loss"]))
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_d["loss"]),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(st_pp.params), jax.tree.leaves(st_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)

    with pytest.raises(SystemExit, match="not supported"):
        build_session(_cfg(tiny_imagenet, tmp_path, model="resnet18",
                           pipeline_parallel=4))
    with pytest.raises(SystemExit, match="model-ema"):
        build_session(_cfg(tiny_imagenet, tmp_path, model="vit_s_16",
                           pipeline_parallel=4, model_ema=True))
    with pytest.raises(SystemExit, match="pipeline stages"):
        build_session(_cfg(tiny_imagenet, tmp_path, model="vit_s_16",
                           pipeline_parallel=5))


@pytest.mark.slow
def test_data_and_model_parallel_train_wiring(tiny_imagenet, tmp_path):
    """--data-parallel/--model-parallel make `vipers train` an in-process
    multi-device program: batches shard over the (data, model) mesh, one
    step matches the single-device session, and TP actually shards ViT
    kernels across the model axis."""
    import jax.numpy as jnp
    from vipers.train.driver import build_session

    batch = (
        jnp.asarray(np.random.default_rng(0).normal(size=(8, 32, 32, 3)),
                    jnp.float32),
        jnp.asarray([0, 1] * 4, jnp.int32),
    )
    rng = jax.random.PRNGKey(0)

    s_ref = build_session(_cfg(tiny_imagenet, tmp_path, model="vit_s_16"))
    st_r, m_r = s_ref.train_step(s_ref.state, batch, rng)

    s_dp = build_session(_cfg(tiny_imagenet, tmp_path, model="vit_s_16",
                              data_parallel=True))
    st_d, m_d = s_dp.train_step(s_dp.state, batch, rng)
    np.testing.assert_allclose(float(m_d["loss"]), float(m_r["loss"]),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(st_d.params), jax.tree.leaves(st_r.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)

    s_tp = build_session(_cfg(tiny_imagenet, tmp_path, model="vit_s_16",
                              data_parallel=True, model_parallel=2))
    qkv = s_tp.state.params["encoder_layer_0"]["attention"]["qkv"]["kernel"]
    assert len(qkv.sharding.device_set) == 8  # lives on the whole mesh
    st_t, m_t = s_tp.train_step(s_tp.state, batch, rng)
    np.testing.assert_allclose(float(m_t["loss"]), float(m_r["loss"]),
                               rtol=1e-4, atol=1e-4)

    with pytest.raises(SystemExit, match="tensor-parallel"):
        build_session(_cfg(tiny_imagenet, tmp_path, model="resnet18",
                           model_parallel=2))
    with pytest.raises(SystemExit, match="pp-data"):
        build_session(_cfg(tiny_imagenet, tmp_path, model="vit_s_16",
                           data_parallel=True, pipeline_parallel=4))


@pytest.mark.slow
def test_eval_sweep_data_parallel(tiny_imagenet, tmp_path):
    """evaluate --data-parallel: the sweep's eval step shards batches over
    all local devices and reproduces the single-device accuracy rows."""
    from vipers.core.checkpoint import save_checkpoint
    from vipers.core.registry import build_model
    from vipers.train.evaluate_models import run_sweep

    spec = build_model("resnet18", num_classes=2)
    variables = spec.module.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 3)), train=False)
    outs = []
    for tag, dp in (("dp", True), ("ref", False)):
        out_dir = tmp_path / tag
        out_dir.mkdir()
        save_checkpoint(
            str(out_dir / "resnet18_epoch_0_pruning_iteration_00"),
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
        )
        cfg = _cfg(tiny_imagenet, tmp_path, num_classes=2,
                   batch_size=8,  # val split is 8 imgs: one full sharded batch
                   output_dir=str(out_dir), data_parallel=dp,
                   val_resize_size=40, val_crop_size=32)
        outs.append(run_sweep(cfg))
    (dp_rows, ref_rows) = outs
    assert len(dp_rows) == len(ref_rows) == 1
    np.testing.assert_allclose(dp_rows[0][0], ref_rows[0][0], atol=1e-4)
