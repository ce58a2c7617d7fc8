"""LOST stack tests (SURVEY §4.1/§4.3):
  * connected components exact vs scipy (4-connectivity),
  * lost() vs a numpy oracle implementing the reference algorithm
    (object_discovery.py:23-134) independently,
  * bucket-masked LOST == exact-shape LOST,
  * end-to-end LOST->CorLoc on a synthetic VOC with a tiny ViT.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage

from vipers.discovery.components import (
    component_bbox,
    flood_fill_from_seed,
    label_components,
    largest_component_mask,
)
from vipers.discovery.lost import lost, lost_core, patch_scoring


# ---------------------------------------------------------------- components

@pytest.mark.parametrize("seed", range(5))
def test_label_components_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    mask = rng.random((17, 23)) > 0.6
    ours = np.asarray(label_components(jnp.asarray(mask)))
    ref, n_ref = scipy.ndimage.label(mask)  # default: 4-connectivity
    # same partition: component ids may differ, membership must not
    assert (ours > 0).sum() == (ref > 0).sum()
    ids = {}
    for r, c in zip(*np.nonzero(mask)):
        key = ref[r, c]
        if key in ids:
            assert ids[key] == ours[r, c]
        else:
            ids[key] = ours[r, c]
    assert len(set(ids.values())) == n_ref


@pytest.mark.parametrize("seed", range(5))
def test_flood_fill_matches_scipy_component(seed):
    rng = np.random.default_rng(100 + seed)
    mask = rng.random((12, 15)) > 0.5
    fg = np.argwhere(mask)
    seed_rc = fg[rng.integers(len(fg))]
    ours = np.asarray(flood_fill_from_seed(jnp.asarray(mask), jnp.asarray(seed_rc)))
    ref, _ = scipy.ndimage.label(mask)
    want = ref == ref[seed_rc[0], seed_rc[1]]
    np.testing.assert_array_equal(ours, want)


def test_flood_fill_background_seed():
    mask = np.zeros((4, 4), bool)
    mask[0, 0] = True
    out = np.asarray(flood_fill_from_seed(jnp.asarray(mask), jnp.asarray([2, 2])))
    assert not out.any()


def test_largest_component():
    mask = np.zeros((6, 6), bool)
    mask[0, 0:2] = True  # size 2
    mask[3:6, 3:6] = True  # size 9
    out = np.asarray(largest_component_mask(jnp.asarray(mask)))
    assert out.sum() == 9 and out[4, 4] and not out[0, 0]


def test_component_bbox():
    mask = np.zeros((5, 7), bool)
    mask[1:3, 2:6] = True
    ymin, ymax, xmin, xmax = (int(v) for v in component_bbox(jnp.asarray(mask)))
    assert (ymin, ymax, xmin, xmax) == (1, 3, 2, 6)


# ------------------------------------------------------------------- oracle

def _lost_oracle(feats, dims, scales, init_image_size, k_patches):
    """Reference algorithm (object_discovery.py:23-134) in plain numpy."""
    f = feats[0].astype(np.float64)
    A = f @ f.T
    Ac = A.copy()
    np.fill_diagonal(Ac, 0)
    Ac[Ac < 0] = 0
    cent = -np.sum(Ac > 0, axis=1).astype(np.float64)
    order = np.argsort(-cent, kind="stable")
    seed = order[0]
    potentials = order[:k_patches]
    similars = potentials[A[seed, potentials] > 0.0]
    M = A[similars, :].sum(axis=0)
    w_f, h_f = dims
    labeled, _ = scipy.ndimage.label(M.reshape(w_f, h_f) > 0)
    cc = labeled[np.unravel_index(seed, (w_f, h_f))]
    assert cc != 0
    ys, xs = np.where(labeled == cc)
    ymin, ymax = ys.min(), ys.max() + 1
    xmin, xmax = xs.min(), xs.max() + 1
    pred = [scales[1] * xmin, scales[0] * ymin, scales[1] * xmax, scales[0] * ymax]
    pred[2] = min(pred[2], init_image_size[2])
    pred[3] = min(pred[3], init_image_size[1])
    return np.asarray(pred), seed


@pytest.mark.parametrize("seed", range(4))
def test_lost_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    gh, gw, d = 9, 12, 24
    # blobby features so components are nontrivial
    base = rng.normal(size=(gh, gw, d))
    blob = np.zeros((gh, gw, 1))
    blob[2:6, 3:8] = 2.0
    feats = (base + blob).reshape(1, gh * gw, d).astype(np.float32)
    scales = [16, 16]
    init = (3, gh * 16 - 5, gw * 16 - 3)
    want, want_seed = _lost_oracle(feats.astype(np.float32), (gh, gw), scales, init, 100)
    got, A, scores, got_seed = lost(feats, (gh, gw), scales, init, k_patches=100)
    assert got_seed == want_seed
    np.testing.assert_allclose(got, want, atol=0)
    assert A.shape == (gh * gw, gh * gw)


def test_lost_bucketed_equals_exact():
    rng = np.random.default_rng(7)
    gh, gw, d = 10, 13, 16
    feats = rng.normal(size=(gh * gw, d)).astype(np.float32)
    scales = [16, 16]
    init = (3, gh * 16, gw * 16)
    exact, _, _, seed_e = lost(feats[None], (gh, gw), scales, init)

    GH, GW = 12, 16  # bucket grid
    full = np.zeros((GH * GW, d), np.float32)
    rows = np.arange(GH * GW) // GW
    cols = np.arange(GH * GW) % GW
    valid = (rows < gh) & (cols < gw)
    # scatter the same features into the bucket layout
    full[valid] = feats
    got, _, _, seed_b = lost(
        full[None], (GH, GW), scales, init, valid_dims=(gh, gw)
    )
    # seeds refer to different flat layouts; compare via (row, col)
    assert (seed_e // gw, seed_e % gw) == (seed_b // GW, seed_b % GW)
    np.testing.assert_allclose(got, exact, atol=0)


def test_patch_scoring_invalid_sorts_last():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(9, 9)).astype(np.float32))
    valid = jnp.asarray([True] * 6 + [False] * 3)
    order, scores = patch_scoring(A, valid)
    assert set(np.asarray(order[-3:]).tolist()) == {6, 7, 8}
    assert np.all(np.isneginf(np.asarray(scores)[6:]))


# ----------------------------------------------------------- synthetic VOC

@pytest.fixture(scope="module")
def synthetic_voc(tmp_path_factory):
    """3-image VOC07-style dataset with a bright square object per image."""
    from PIL import Image

    root = tmp_path_factory.mktemp("voc")
    (root / "JPEGImages").mkdir()
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(3):
        h, w = 96 + 16 * i, 128
        arr = rng.integers(0, 60, size=(h, w, 3), dtype=np.uint8)
        y0, x0 = 16 + 8 * i, 32
        arr[y0 : y0 + 40, x0 : x0 + 48] = 220
        name = f"im{i:03d}"
        names.append(name)
        Image.fromarray(arr).save(root / "JPEGImages" / f"{name}.jpg")
        xml = f"""<annotation><filename>{name}.jpg</filename>
<size><width>{w}</width><height>{h}</height><depth>3</depth></size>
<object><name>thing</name><truncated>0</truncated><difficult>0</difficult>
<bndbox><xmin>{x0 + 1}</xmin><ymin>{y0 + 1}</ymin><xmax>{x0 + 48}</xmax><ymax>{y0 + 40}</ymax></bndbox>
</object></annotation>"""
        (root / "Annotations" / f"{name}.xml").write_text(xml)
    (root / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(names))
    return str(root)


def test_voc_dataset_and_gt(synthetic_voc):
    from vipers.data.detection import DiscoveryDataset

    ds = DiscoveryDataset("VOC07", "trainval", synthetic_voc, no_hard=True)
    assert len(ds) == 3
    gt, cls = ds.extract_gt("im000.jpg")
    # 1-based inclusive -> 0-based xmin/ymin (datasets.py:281-309)
    np.testing.assert_array_equal(gt[0], [32, 16, 80, 56])
    assert cls == ["thing"]


@pytest.mark.slow
def test_lost_end_to_end_corloc(synthetic_voc, tmp_path):
    """BASELINE config #3 in miniature: LOST on VOC with an untrained tiny
    ViT produces boxes + a results txt; CorLoc re-evaluation agrees."""
    import argparse

    from vipers.discovery.driver import run_lost
    from vipers.discovery.corloc import evaluate_predictions
    from vipers.data.detection import DiscoveryDataset

    args = argparse.Namespace(
        model="vit_s_16", arch="vit", dataset="VOC07", set="trainval",
        data_path=synthetic_voc, checkpoint="", patch_size=16,
        which_features="k", k_patches=100, dinoseg=False, dinoseg_head=4,
        no_hard=False, output_dir=str(tmp_path / "lost_out"), iteration=0,
        visualize=None,
    )
    assert run_lost(args) == 0
    out = str(tmp_path / "lost_out")
    assert os.path.exists(os.path.join(out, "preds.pkl"))
    txt = os.path.join(out, "results_iteration_00.txt")
    assert os.path.exists(txt)
    corloc_txt = float(open(txt).read().split(",")[1])
    ds = DiscoveryDataset("VOC07", "trainval", synthetic_voc)
    corloc_re = evaluate_predictions(os.path.join(out, "preds.pkl"), ds)
    assert corloc_txt == pytest.approx(corloc_re, abs=0.1)


@pytest.mark.slow
def test_lost_single_image_and_flag_modes(synthetic_voc, tmp_path):
    """--image-path runs LOST on one image (forces no preds/eval,
    `main_lost.py:297-311`); --no-evaluation keeps preds.pkl but writes no
    results txt; --models-dir + --pruning-iteration resolves the
    reference's templated checkpoint filename."""
    import argparse

    from vipers.discovery.driver import _templated_checkpoint, run_lost

    img = os.path.join(synthetic_voc, "JPEGImages", "im000.jpg")
    base = dict(
        model="vit_s_16", arch="vit", dataset="VOC07", set="trainval",
        data_path=synthetic_voc, checkpoint="", patch_size=16,
        which_features="k", k_patches=30, dinoseg=False, dinoseg_head=4,
        no_hard=False, iteration=0, visualize=None, workers=2,
    )
    out1 = str(tmp_path / "one")
    assert run_lost(argparse.Namespace(
        **base, output_dir=out1, image_path=img)) == 0
    assert not os.path.exists(os.path.join(out1, "preds.pkl"))
    assert not os.path.exists(os.path.join(out1, "results_iteration_00.txt"))

    # --no-evaluation must not touch annotations (`main_lost.py:425-427`):
    # run on a dataset that HAS no Annotations dir at all
    import shutil

    bare = tmp_path / "bare_voc"
    shutil.copytree(synthetic_voc, bare)
    shutil.rmtree(bare / "Annotations")
    out2 = str(tmp_path / "noeval")
    assert run_lost(argparse.Namespace(
        **{**base, "data_path": str(bare)}, output_dir=out2,
        no_evaluation=True)) == 0
    assert os.path.exists(os.path.join(out2, "preds.pkl"))
    assert not os.path.exists(os.path.join(out2, "results_iteration_00.txt"))

    # checkpoint filename templates (`main_lost.py:344-356`)
    mdir = tmp_path / "models"
    (mdir / "resnet50").mkdir(parents=True)
    (mdir / "resnet50" / "model_epoch_89_pruning_iteration_03.pth").touch()
    (mdir / "vit_b_16").mkdir()
    (mdir / "vit_b_16" / "vit_b_16_epoch_299_pruning_iteration_07.pth").touch()
    assert _templated_checkpoint(str(mdir), "resnet50", "resnet", 3).endswith(
        "resnet50/model_epoch_89_pruning_iteration_03.pth"
    )
    assert _templated_checkpoint(str(mdir), "vit_b_16", "vit", 7).endswith(
        "vit_b_16/vit_b_16_epoch_299_pruning_iteration_07.pth"
    )
    # DINO archs are ViTs too (reference: `'vit' in args.arch`)
    (mdir / "dino_vit_small").mkdir()
    (mdir / "dino_vit_small" /
     "dino_vit_small_epoch_299_pruning_iteration_01.pth").touch()
    assert _templated_checkpoint(
        str(mdir), "dino_vit_small", "dino", 1
    ).endswith("dino_vit_small_epoch_299_pruning_iteration_01.pth")
    with pytest.raises(FileNotFoundError):
        _templated_checkpoint(str(mdir), "resnet50", "resnet", 9)


def test_prefetch_decoded_order_and_padding(synthetic_voc):
    """The threaded decoder must preserve dataset order, apply exact tier-1
    padding, and carry GT through."""
    from vipers.data.detection import DiscoveryDataset, load_image_normalized
    from vipers.discovery.driver import _prefetch_decoded

    ds = DiscoveryDataset("VOC07", "trainval", synthetic_voc, no_hard=False)
    seq = list(_prefetch_decoded(ds, 16, no_hard=False, workers=3))
    assert [r[1] for r in seq] == [im for _p, im in ds]
    for (path, _im), (p2, _name, padded, init_size, gt) in zip(ds, seq):
        assert p2 == path
        img = load_image_normalized(path)
        assert init_size == (3, img.shape[0], img.shape[1])
        assert padded.shape[0] % 16 == 0 and padded.shape[1] % 16 == 0
        np.testing.assert_array_equal(padded[: img.shape[0], : img.shape[1]],
                                      img)
        assert np.all(padded[img.shape[0]:, :] == 0)
        assert gt is not None and len(gt) == 1


@pytest.mark.slow
def test_lost_cnn_path(synthetic_voc, tmp_path):
    """resnet/vgg feature path: headless features + whole-slab LayerNorm
    (`main_lost.py:570-600`)."""
    import argparse

    from vipers.discovery.driver import run_lost

    args = argparse.Namespace(
        model="resnet50_bottom", arch="resnet", dataset="VOC07", set="trainval",
        data_path=synthetic_voc, checkpoint="", patch_size=16,
        which_features="k", k_patches=100, dinoseg=False, dinoseg_head=4,
        no_hard=False, output_dir=str(tmp_path / "lost_cnn"), iteration=1,
        visualize=None,
    )
    assert run_lost(args) == 0
    assert os.path.exists(os.path.join(str(tmp_path / "lost_cnn"), "preds.pkl"))


@pytest.mark.slow
def test_lost_dino_path(synthetic_voc, tmp_path):
    import argparse

    from vipers.discovery.driver import run_lost

    args = argparse.Namespace(
        model="dino_vit_tiny", arch="dino", dataset="VOC07", set="trainval",
        data_path=synthetic_voc, checkpoint="", patch_size=16,
        which_features="k", k_patches=100, dinoseg=False, dinoseg_head=2,
        no_hard=False, output_dir=str(tmp_path / "lost_dino"), iteration=2,
        visualize="pred",
    )
    assert run_lost(args) == 0
    out = str(tmp_path / "lost_dino")
    assert os.path.exists(os.path.join(out, "results_iteration_02.txt"))
    import glob as g

    assert g.glob(os.path.join(out, "*_pred.png"))  # visualization written


@pytest.mark.slow
def test_dinoseg_path_vit(synthetic_voc, tmp_path):
    """--dinoseg with a torchvision-style ViT: attention must materialize
    (regression for the need_attn wiring)."""
    import argparse

    from vipers.discovery.driver import run_lost

    args = argparse.Namespace(
        model="vit_s_16", arch="vit", dataset="VOC07", set="trainval",
        data_path=synthetic_voc, checkpoint="", patch_size=16,
        which_features="k", k_patches=100, dinoseg=True, dinoseg_head=2,
        no_hard=False, output_dir=str(tmp_path / "dinoseg_out"), iteration=0,
        visualize=None,
    )
    assert run_lost(args) == 0
    assert os.path.exists(os.path.join(str(tmp_path / "dinoseg_out"), "preds.pkl"))


@pytest.mark.slow
def test_batched_lost_poisoned_image_robustness(synthetic_voc, tmp_path,
                                                monkeypatch, capsys):
    """One seed-in-background image must not discard the accumulated sweep:
    default mode skips + reports it; --strict reproduces the reference's
    uncaught raise (`object_discovery.py:110-112`)."""
    import argparse

    from vipers.discovery import driver as ddriver

    orig = ddriver.LostFeatureExtractor.make_batched_pipeline

    def poisoned(self, k_patches=100):
        pipe = orig(self, k_patches=k_patches)

        def wrapped(variables, images, pos, tmask, vhw):
            box_feat, seeds, seed_bg = pipe(variables, images, pos, tmask, vhw)
            bad = jnp.arange(seed_bg.shape[0]) == 0
            return box_feat, seeds, jnp.logical_or(seed_bg, bad)

        return wrapped

    monkeypatch.setattr(ddriver.LostFeatureExtractor,
                        "make_batched_pipeline", poisoned)

    def args(out, strict):
        return argparse.Namespace(
            model="vit_s_16", arch="vit", dataset="VOC07", set="trainval",
            data_path=synthetic_voc, checkpoint="", patch_size=16,
            which_features="k", k_patches=30, dinoseg=False, dinoseg_head=4,
            no_hard=False, output_dir=out, iteration=0, visualize=None,
            workers=1, strict=strict,
        )

    out = str(tmp_path / "robust")
    assert ddriver.run_lost(args(out, strict=False)) == 0
    assert "seed in background component for 1 image(s)" in capsys.readouterr().out
    # the 2 healthy images still produced predictions + results
    import pickle

    preds = pickle.load(open(os.path.join(out, "preds.pkl"), "rb"))
    assert len(preds) == 2
    assert os.path.exists(os.path.join(out, "results_iteration_00.txt"))

    with pytest.raises(ValueError, match="background component"):
        ddriver.run_lost(args(str(tmp_path / "strict"), strict=True))

    # per-image path (--visualize disables batching): same contract
    calls = {"n": 0}
    real_lost = ddriver.lost

    def poisoned_lost(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ValueError("The seed is in the background component.")
        return real_lost(*a, **kw)

    monkeypatch.setattr(ddriver, "lost", poisoned_lost)
    out2 = str(tmp_path / "robust_perimg")
    a2 = args(out2, strict=False)
    a2.visualize = "pred"
    assert ddriver.run_lost(a2) == 0
    assert "seed in background component for 1 image(s)" in capsys.readouterr().out
    preds2 = pickle.load(open(os.path.join(out2, "preds.pkl"), "rb"))
    assert len(preds2) == 2

    calls["n"] = 0
    a3 = args(str(tmp_path / "strict_perimg"), strict=True)
    a3.visualize = "pred"
    with pytest.raises(ValueError, match="background component"):
        ddriver.run_lost(a3)


@pytest.mark.slow
def test_dinoseg_bucketed_equals_exact_shape():
    """--dinoseg at bucket=4 must yield the same box as exact shapes: the
    masked softmax gives bucket-pad keys exact-zero attention, so the
    60%-mass threshold and component analysis are unaffected (kills the
    per-image-shape recompile regime for dinoseg runs)."""
    from vipers.core.registry import ModelSpec
    from vipers.discovery.driver import LostFeatureExtractor
    from vipers.discovery.lost import dino_seg
    from vipers.models.vit import ViTConfig, VisionTransformer

    import jax

    cfg = ViTConfig(16, 2, 4, 64, 128, 10)
    module = VisionTransformer(cfg=cfg, image_size=(96, 96))
    variables = module.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 96, 96, 3)), train=False)
    spec = ModelSpec(
        name="tiny", module=module, input_size=(96, 96), num_classes=10,
        prune_exclude=("qkv",), patch_size=16, family="vit",
        extra={"num_heads": 4, "hidden_dim": 64, "num_layers": 2},
    )
    rng = np.random.default_rng(0)
    # 80x112 -> grid 5x7: NOT a bucket multiple, so bucket=4 pads to 8x8
    img = rng.normal(size=(80, 112, 3)).astype(np.float32)
    img[16:56, 32:80] += 2.5

    boxes = {}
    for bucket in (1, 4):
        ex = LostFeatureExtractor(spec, variables, arch="vit",
                                  which_features="k", bucket=bucket,
                                  need_attn=True)
        _f, dims, valid_dims, _s, attn = ex.extract(img, 16)
        if bucket == 1:
            assert dims == (5, 7)
        else:
            assert dims == (8, 8) and valid_dims == (5, 7)
        boxes[bucket] = dino_seg(attn, dims, 16, head=2)
    assert boxes[1] == boxes[4]


# ------------------------------------------------- batched product pipeline

@pytest.mark.slow
def test_scrambled_qkv_gather_matches_host_split():
    """The on-device row-gather closed form must reproduce
    split_qkv_torchvision(stacked_qkv_dump(x)) for every modality."""
    from vipers.models.vit import (
        scrambled_qkv_gather,
        split_qkv_torchvision,
        stacked_qkv_dump,
    )

    rng = np.random.default_rng(7)
    nh = 4
    for t1 in (13, 49, 769):
        x = jnp.asarray(rng.normal(size=(1, t1, 32)).astype(np.float32))
        dump = stacked_qkv_dump(x)  # (3, T1, D)
        q, k, v = split_qkv_torchvision(
            dump.reshape(3, t1, 32), num_heads=nh
        )
        for which, ref in (("q", q), ("k", k), ("v", v)):
            got = scrambled_qkv_gather(x[0], jnp.asarray(t1), which)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref[0]))
        # rows beyond t1 (bucket padding) are don't-care: check the gather
        # stays in bounds when the static length exceeds t1
        xpad = jnp.concatenate([x[0], jnp.zeros((5, 32))], axis=0)
        got = scrambled_qkv_gather(xpad, jnp.asarray(t1), "k")
        np.testing.assert_array_equal(np.asarray(got[:t1]), np.asarray(k[0]))


@pytest.mark.slow
def test_batched_pipeline_matches_per_image(synthetic_voc):
    """The fused batched product path (one jitted forward+scramble+LOST)
    must produce the same boxes as the per-image extract()+lost() path,
    including tail-batch padding and mixed buckets."""
    import jax

    from vipers.core.registry import build_model
    from vipers.data.detection import DiscoveryDataset, load_image_normalized
    from vipers.discovery.driver import LostFeatureExtractor
    from vipers.discovery.lost import box_feat_to_image

    spec = build_model("vit_s_16", num_classes=10, image_size=(224, 224))
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False
    )
    ex = LostFeatureExtractor(spec, variables, arch="vit", which_features="k")
    ds = DiscoveryDataset("VOC07", "trainval", synthetic_voc, no_hard=False)
    p = 16

    per_image, padded_imgs, init_sizes = [], [], []
    for path, im_name in ds:
        img = load_image_normalized(path)
        ph = int(np.ceil(img.shape[0] / p) * p)
        pw = int(np.ceil(img.shape[1] / p) * p)
        padded = np.zeros((ph, pw, 3), np.float32)
        padded[: img.shape[0], : img.shape[1]] = img
        feats, dims, valid_dims, scales, _ = ex.extract(padded, p)
        pred, _, _, _ = lost(feats, dims, scales, (3, *img.shape[:2]),
                             valid_dims=valid_dims)
        per_image.append(pred)
        padded_imgs.append(padded)
        init_sizes.append((3, *img.shape[:2]))

    pipe = ex.make_batched_pipeline(k_patches=100)
    from collections import defaultdict

    groups = defaultdict(list)
    for i, im in enumerate(padded_imgs):
        from vipers.data.preprocess import bucket_hw

        groups[bucket_hw(im.shape[0], im.shape[1], p, ex.bucket)].append(i)
    got = [None] * len(padded_imgs)
    for idxs in groups.values():
        imgs = [padded_imgs[i] for i in idxs]
        # force a tail batch: pad group to 4 by repeating the last image
        n_real = len(imgs)
        imgs = imgs + [imgs[-1]] * (4 - n_real)
        images, pos, tmask, vhw = ex.prepare_batch(imgs, p)
        box_feat, _seed, seed_bg = jax.device_get(
            pipe(ex.variables, images, pos, tmask, vhw)
        )
        assert not seed_bg[:n_real].any()
        for j, i in enumerate(idxs):
            got[i] = box_feat_to_image(box_feat[j], [p, p], init_sizes[i])

    for want, have in zip(per_image, got):
        np.testing.assert_allclose(have, want, atol=0)


def test_uint8_fast_feed_bit_equals_host_normalize(synthetic_voc):
    """Round-5 e2e feed: uint8 decode + ON-DEVICE normalization must be
    bit-equal to the host-normalized float path — (a) the native C
    `decode_pad` slab matches PIL-decode + pad, (b) `_device_normalize`
    reproduces `load_image_normalized`'s f32 math exactly incl. re-zeroed
    pads, (c) the batched pipeline emits identical boxes from either
    feed."""
    import jax

    from vipers.core.registry import build_model
    from vipers.data import native
    from vipers.data.detection import DiscoveryDataset, load_image_normalized
    from vipers.discovery.driver import LostFeatureExtractor, _device_normalize

    spec = build_model("vit_s_16", num_classes=10, image_size=(224, 224))
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False
    )
    ex = LostFeatureExtractor(spec, variables, arch="vit", which_features="k")
    ds = DiscoveryDataset("VOC07", "trainval", synthetic_voc, no_hard=False)
    p = 16

    f32_imgs, u8_imgs, exact = [], [], []
    for path, _im_name in ds:
        img = load_image_normalized(path)
        ph = int(np.ceil(img.shape[0] / p) * p)
        pw = int(np.ceil(img.shape[1] / p) * p)
        padded = np.zeros((ph, pw, 3), np.float32)
        padded[: img.shape[0], : img.shape[1]] = img
        f32_imgs.append(padded)
        u8, (h, w) = native.decode_pad(path, pad_multiple=p)
        assert (h, w) == img.shape[:2] and u8.shape == padded.shape
        u8_imgs.append(u8)
        exact.append((h, w))

    # group by bucket like the driver does
    from collections import defaultdict

    from vipers.data.preprocess import bucket_hw

    groups = defaultdict(list)
    for i, im in enumerate(f32_imgs):
        groups[bucket_hw(im.shape[0], im.shape[1], p, ex.bucket)].append(i)

    pipe = ex.make_batched_pipeline(k_patches=100)
    for idxs in groups.values():
        fl = [f32_imgs[i] for i in idxs]
        u8 = [u8_imgs[i] for i in idxs]
        ehw = [exact[i] for i in idxs]
        f_in = ex.prepare_batch(fl, p)
        u_in = ex.prepare_batch(u8, p, exact_hw=ehw)
        assert len(u_in) == 5 and u_in[0].dtype == jnp.uint8
        # (b) the device-normalized uint8 batch == host-normalized floats,
        # bit for bit (same f32 op order), incl. 0.0 pads
        np.testing.assert_array_equal(
            np.asarray(_device_normalize(u_in[0], u_in[4])),
            np.asarray(f_in[0]))
        # (c) identical boxes from either feed
        bf_f, seed_f, bg_f = jax.device_get(pipe(ex.variables, *f_in))
        bf_u, seed_u, bg_u = jax.device_get(pipe(ex.variables, *u_in))
        np.testing.assert_array_equal(bf_f, bf_u)
        np.testing.assert_array_equal(seed_f, seed_u)
        np.testing.assert_array_equal(bg_f, bg_u)


@pytest.mark.slow
def test_batched_pipeline_int8_matches_f32_boxes():
    """--dtype int8 (dynamic-quantized integer dense/conv, rest bf16-free
    on CPU) must produce boxes agreeing with the f32 pipeline — LOST's
    thresholding is insensitive to quantization noise at box granularity."""
    import jax

    from vipers.core.registry import build_model
    from vipers.discovery.driver import LostFeatureExtractor
    from vipers.pruning import init_masks, magnitude_prune

    spec = build_model("vit_s_16", num_classes=10, image_size=(96, 96))
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)), train=False
    )
    masks = magnitude_prune(
        variables["params"],
        init_masks(variables["params"], exclude=spec.prune_exclude),
        amount=0.5,
    )
    rng = np.random.default_rng(3)
    imgs = []
    for _ in range(2):
        im = rng.normal(size=(96, 96, 3)).astype(np.float32) * 0.1
        im[20:60, 30:80] += 2.0  # bright structured blob
        imgs.append(im)

    boxes = {}
    for dt in (None, "int8"):
        ex = LostFeatureExtractor(spec, variables, masks, arch="vit",
                                  which_features="k", compute_dtype=dt)
        pipe = ex.make_batched_pipeline(k_patches=30)
        images, pos, tmask, vhw = ex.prepare_batch(imgs, 16)
        bf, _seed, bg = jax.device_get(
            pipe(ex.variables, images, pos, tmask, vhw)
        )
        assert not bg.any()
        boxes[dt] = np.asarray(bf, np.float64)

    for a, b in zip(boxes[None], boxes["int8"]):
        ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]) + 1)
        iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]) + 1)
        inter = ix * iy
        area = lambda z: (z[2] - z[0] + 1) * (z[3] - z[1] + 1)
        iou = inter / (area(a) + area(b) - inter)
        assert iou >= 0.5, (a, b, iou)


@pytest.mark.slow
def test_cnn_extract_int8_close_to_f32():
    """--dtype int8 on the CNN feature path (real int8 convs through the
    headless resnet) must produce LayerNormed features close to f32."""
    import jax

    from vipers.core.registry import build_model
    from vipers.discovery.driver import LostFeatureExtractor

    spec = build_model("resnet50_bottom", input_size=(64, 64))
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    img = np.random.default_rng(0).normal(size=(64, 64, 3)).astype(np.float32)
    feats = {}
    for dt in (None, "int8"):
        ex = LostFeatureExtractor(spec, variables, arch="resnet",
                                  which_features="k", compute_dtype=dt)
        f, dims, vdims, scales, _ = ex.extract(img, 16)
        feats[dt] = np.asarray(f, np.float32)
    # LayerNormed features are O(1); int8 + bf16 noise stays small
    err = np.abs(feats[None] - feats["int8"]).max()
    assert err < 0.35, err
    corr = np.corrcoef(feats[None].ravel(), feats["int8"].ravel())[0, 1]
    assert corr > 0.99, corr


@pytest.mark.slow
def test_lost_swin_path(synthetic_voc, tmp_path):
    """swin feature path (`main_lost.py:501-566`): last block's window qkv,
    w_featmap = window side, true qkv split, scales = image/patch."""
    import argparse

    from vipers.discovery.driver import run_lost

    import torch

    from tests.torch_swin_oracle import random_torchvision_swin_sd

    # real checkpoint path: zero-init biases make window pad tokens
    # degenerate seeds, so (like the reference) swin LOST runs on imported
    # trained-style weights
    ckpt = str(tmp_path / "swin.pth")
    torch.save({"model": random_torchvision_swin_sd(seed=0, num_classes=1000)},
               ckpt)
    args = argparse.Namespace(
        model="swin_v2_t", arch="swin", dataset="VOC07", set="trainval",
        data_path=synthetic_voc, checkpoint=ckpt, patch_size=16,
        which_features="k", k_patches=100, dinoseg=False, dinoseg_head=2,
        no_hard=False, output_dir=str(tmp_path / "lost_swin"), iteration=3,
        visualize=None,
    )
    assert run_lost(args) == 0
    out = str(tmp_path / "lost_swin")
    assert os.path.exists(os.path.join(out, "results_iteration_03.txt"))
    import pickle

    preds = pickle.load(open(os.path.join(out, "preds.pkl"), "rb"))
    assert len(preds) == 3
    for box in preds.values():
        assert len(box) == 4 and box[2] >= box[0] and box[3] >= box[1]


@pytest.mark.slow
def test_lost_data_parallel_equals_single_device(synthetic_voc, tmp_path):
    """--data-parallel: the batch sharded over an 8-device (data,) mesh
    must produce the same predictions as the unsharded run (conftest gives
    8 fake CPU devices)."""
    import argparse
    import pickle

    from vipers.discovery.driver import run_lost

    def go(dp, out):
        args = argparse.Namespace(
            model="vit_s_16", arch="vit", dataset="VOC07", set="trainval",
            data_path=synthetic_voc, checkpoint="", patch_size=16,
            which_features="k", k_patches=100, dinoseg=False, dinoseg_head=2,
            no_hard=False, output_dir=str(tmp_path / out), iteration=0,
            visualize=None, batch_size=8, data_parallel=dp,
        )
        assert run_lost(args) == 0
        return pickle.load(open(tmp_path / out / "preds.pkl", "rb"))

    single = go(False, "lost_single")
    sharded = go(True, "lost_dp")
    assert single.keys() == sharded.keys()
    for k in single:
        np.testing.assert_allclose(sharded[k], single[k], atol=0)


@pytest.mark.parametrize("case", range(6))
def test_dino_seg_reference_bugs_mode(case):
    """reference_bugs=True must reproduce the reference's component
    selection bit-for-bit (object_discovery.py:160-183), including its
    off-by-ones: the size scan drops the last component id and a
    single-component map selects the background."""
    from vipers.discovery.lost import dino_seg

    rng = np.random.default_rng(case)
    gh = gw = 8
    nh = 2
    # synthesize CLS attention whose thresholded map has case-varied blobs
    attnmap = rng.random((nh, gh * gw)).astype(np.float32) * 0.01
    # distinct hot values: exact ties would make the result depend on sort
    # tie-breaking (torch vs numpy vs jnp), which real attention never has
    counter = [0]

    def hot(sl):
        n = sl.stop - sl.start
        attnmap[0, sl] = 1.0 + (counter[0] + np.arange(n)) * 0.01
        counter[0] += n

    if case % 3 == 0:
        hot(slice(9, 12))               # single blob
    elif case % 3 == 1:
        hot(slice(9, 12))               # two blobs, different sizes
        hot(slice(40, 45))
    else:
        hot(slice(9, 11))               # three blobs
        hot(slice(30, 32))
        hot(slice(60, 63))
    attn = np.zeros((1, nh, gh * gw + 1, gh * gw + 1), np.float32)
    attn[0, :, 0, 1:] = attnmap

    def oracle(attn):
        """reference snippet in numpy+scipy."""
        attentions = attn[0, :, 0, 1:].reshape(nh, -1)
        val = np.sort(attentions, axis=1)
        idx = np.argsort(attentions, axis=1)
        val = val / val.sum(axis=1, keepdims=True)
        cumval = np.cumsum(val, axis=1)
        th = cumval > (1 - 0.6)
        th_attn = np.zeros_like(th)
        for h in range(nh):
            th_attn[h] = th[h][np.argsort(idx[h])]
        m = th_attn.reshape(nh, gh, gw).astype(float)
        labeled, _ = scipy.ndimage.label(m[0])
        sizes = [np.sum(labeled == c) for c in range(np.max(labeled))]
        biggest = np.argmax(sizes[1:]) + 1 if len(sizes) > 1 else 0
        mask = np.where(labeled == biggest)
        ymin, ymax = mask[0].min(), mask[0].max() + 1
        xmin, xmax = mask[1].min(), mask[1].max() + 1
        return [xmin * 16, ymin * 16, xmax * 16, ymax * 16]

    want = oracle(attn)
    got = dino_seg(attn, (gh, gw), 16, head=0, reference_bugs=True)
    assert got == want


@pytest.mark.slow
def test_cluster_cli_end_to_end(synthetic_voc, tmp_path):
    """`vipers cluster` (cluster_for_OD.py:120-201 counterpart): crops the
    predicted boxes, embeds with a frozen DINO ViT, k-means into
    pseudo-labels; writes `{preds}_clusters_{k}.pkl` and honors the
    feature cache."""
    import argparse
    import pickle

    from vipers.discovery.cluster import run_cluster_cli

    preds = {
        "im000.jpg": [32.0, 16.0, 80.0, 56.0],
        "im001.jpg": [32.0, 24.0, 80.0, 64.0],
        "im002.jpg": [32.0, 32.0, 80.0, 72.0],
    }
    preds_path = str(tmp_path / "preds.pkl")
    with open(preds_path, "wb") as f:
        pickle.dump(preds, f)
    cache = str(tmp_path / "feats.pkl")
    args = argparse.Namespace(
        preds=preds_path, dataset="VOC07", set="trainval",
        data_path=synthetic_voc, nb_clusters=2, arch="dino_vit_tiny",
        checkpoint="", feature_cache=cache, random_seed=0, patch_size=16,
    )
    assert run_cluster_cli(args) == 0
    out = str(tmp_path / "preds_clusters_2.pkl")
    assert os.path.exists(out) and os.path.exists(cache)
    labels = pickle.load(open(out, "rb"))
    assert set(labels) == set(preds)
    assert all(0 <= v < 2 for v in labels.values())

    # cached features short-circuit the embed pass and give the same labels
    assert run_cluster_cli(args) == 0
    labels2 = pickle.load(open(out, "rb"))
    assert labels2 == labels


# ---------------------------------------------------------------------------
# CNN feature-grid bucketing (round 4): one compile per bucket instead of
# one per unique image shape; `--exact-shapes` restores native-resolution
# parity. `/root/reference/main_lost.py:570-600` runs CNNs at exact shapes.
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_cnn_bucketed_noop_when_grid_aligned():
    """resnet feature dims are ceil(px/32), so the canonical bucket input
    for an aligned image is the image itself: zero extra pad, all-true
    mask — features match the cnn_bucket=1 exact path to float noise, and
    the canonical-input rule maps every bucket member to ONE signature."""
    import jax

    from vipers.core.registry import build_model
    from vipers.discovery.driver import LostFeatureExtractor

    spec = build_model("resnet50_bottom", input_size=(64, 64))
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    img = np.random.default_rng(1).normal(size=(128, 128, 3)).astype(np.float32)
    outs = {}
    for cb in (1, 4):
        ex = LostFeatureExtractor(spec, variables, arch="resnet",
                                  which_features="k", cnn_bucket=cb)
        f, dims, vdims, scales, _ = ex.extract(img, 16)
        outs[cb] = (np.asarray(f, np.float32), dims, vdims, scales)
        if cb == 4:
            # canonical input extent for a 4-cell bucket is 4*32 = 128
            assert ex._cnn_canon_input(4) == 128
            # every extent in (96, 128] shares the bucket's one signature
            assert ex._cnn_canon_input(4) >= 97
    assert outs[1][1] == (4, 4) and outs[4][1] == (4, 4)
    assert outs[1][2] == outs[4][2] and outs[1][3] == outs[4][3]
    np.testing.assert_allclose(outs[4][0], outs[1][0], atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_cnn_bucketed_features_match_exact_in_interior():
    """Bucketed run: pad cells are exactly zero, valid dims/scales preserve
    the exact-shape geometry, and features AWAY from the pad boundary match
    the native-resolution run closely (the boundary cells deviate because
    conv receptive fields cross the zero pad — the documented trade)."""
    import jax

    from vipers.core.registry import build_model
    from vipers.discovery.driver import LostFeatureExtractor

    spec = build_model("vgg16_bottom", input_size=(64, 64))
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    # 160x128 -> vgg stride 16 -> (10, 8) grid -> bucket 4 -> (12, 8)
    img = np.random.default_rng(2).normal(size=(160, 128, 3)).astype(np.float32)

    ex_exact = LostFeatureExtractor(spec, variables, arch="vgg16",
                                    which_features="k", cnn_bucket=1)
    f_e, dims_e, vdims_e, scales_e, _ = ex_exact.extract(img, 16)
    ex_b = LostFeatureExtractor(spec, variables, arch="vgg16",
                                which_features="k", cnn_bucket=4)
    f_b, dims_b, vdims_b, scales_b, _ = ex_b.extract(img, 16)

    assert dims_e == vdims_e == (10, 8)
    assert dims_b == (12, 8) and vdims_b == (10, 8)
    assert scales_b == scales_e  # boxes map back through the TRUE ratio

    d = f_e.shape[-1]
    grid_e = np.asarray(f_e, np.float32).reshape(10, 8, d)
    grid_b = np.asarray(f_b, np.float32).reshape(12, 8, d)
    # pad rows exactly zero (lost_core's valid_dims masking contract)
    assert np.all(grid_b[10:] == 0)
    # interior rows (>= 2 cells from the pad edge) track the exact run
    # The deviation has two parts: conv windows crossing the zero pad
    # (local to the bottom/right boundary — the canonical bucket input
    # pads BOTH axes to the top of the feature step) and the
    # slab-LayerNorm mu/var shifting with those cells (global, small).
    # Random weights + noise images are the worst case; trained nets on
    # natural images deviate less.  Interior = >= 2 cells from both pads.
    itr_e, itr_b = grid_e[:8, :6], grid_b[:8, :6]
    denom = np.abs(itr_e).max()
    err = np.abs(itr_b - itr_e).max() / denom
    assert err < 0.3, err
    corr = np.corrcoef(itr_b.ravel(), itr_e.ravel())[0, 1]
    assert corr > 0.995, corr


@pytest.mark.slow
def test_lost_cnn_bucketed_corloc_ab(synthetic_voc, tmp_path):
    """run_lost default (bucketed) vs --exact-shapes on the synthetic VOC:
    both regimes produce the contract artifacts; CorLoc agrees on the
    fixture's unambiguous bright-square objects."""
    import argparse

    from vipers.discovery.driver import run_lost

    corloc = {}
    for tag, exact in (("bucket", False), ("exact", True)):
        out = str(tmp_path / f"lost_cnn_{tag}")
        args = argparse.Namespace(
            model="resnet50_bottom", arch="resnet", dataset="VOC07",
            set="trainval", data_path=synthetic_voc, checkpoint="",
            patch_size=16, which_features="k", k_patches=100, dinoseg=False,
            dinoseg_head=4, no_hard=False, output_dir=out, iteration=7,
            visualize=None, exact_shapes=exact,
        )
        assert run_lost(args) == 0
        txt = os.path.join(out, "results_iteration_07.txt")
        assert os.path.exists(txt)
        line = open(txt).read()  # "corloc,{x:.1f},,"
        corloc[tag] = float(line.strip().split(",")[1])
        import pickle

        with open(os.path.join(out, "preds.pkl"), "rb") as f:
            assert len(pickle.load(f)) == 3  # a box for every image
    assert corloc["bucket"] == corloc["exact"], corloc


@pytest.mark.slow
def test_swin_all_windows_extract_ab():
    """--swin-all-windows consumes the TRUE last-stage grid (image token
    order, real image/feature scales).  A/B against the reference's
    first-window regime on a MULTI-WINDOW image (256x384 -> stage-3 grid
    8x12 over window 8): the first-window regime sees only the top-left
    8x8 window's tokens — incl. this image's window-pad rows — while the
    all-windows mode covers the full grid and boxes the object."""
    from tests.torch_swin_oracle import random_torchvision_swin_sd
    from vipers.core.checkpoint import import_torch_checkpoint, to_jax
    from vipers.core.registry import build_model
    from vipers.discovery.driver import LostFeatureExtractor
    from vipers.discovery.lost import lost

    # trained-style weights: zero-init biases make window-pad tokens
    # degenerate inverse-degree seeds (the same reason test_lost_swin_path
    # imports weights — faithful to the reference's hook flow)
    sd = random_torchvision_swin_sd(seed=0, num_classes=10)
    params, _bs, masks = import_torch_checkpoint(
        {k: v.numpy() for k, v in sd.items()}, "swin_v2_t"
    )
    spec = build_model("swin_v2_t", num_classes=10)
    variables = {"params": to_jax(params)}
    rng = np.random.default_rng(0)
    img = rng.normal(size=(256, 384, 3)).astype(np.float32) * 0.1
    img[64:192, 96:288] += 3.0  # bright block well inside the grid

    ex_all = LostFeatureExtractor(spec, variables, arch="swin",
                                  which_features="k", swin_all_windows=True)
    feats, dims, vdims, scales, _ = ex_all.extract(img, 4)
    assert dims == vdims == (8, 12)
    assert scales == [32.0, 32.0]
    assert feats.shape[1] == 96
    pred, _A, _scores, _seed = lost(
        feats, dims, scales, (3, 256, 384), k_patches=96, valid_dims=vdims)
    x0, y0, x1, y1 = np.asarray(pred, np.float64)
    assert 0 <= x0 < x1 <= 384 and 0 <= y0 < y1 <= 256

    # reference regime: first window only — 8x8 token grid regardless of
    # the true 8x12 feature grid (its multi-window handling is commented
    # out, object_discovery.py:40-50)
    ex_ref = LostFeatureExtractor(spec, variables, arch="swin",
                                  which_features="k")
    feats_r, dims_r, vdims_r, scales_r, _ = ex_ref.extract(img, 4)
    assert dims_r == (8, 8)
    assert feats_r.shape[1] == 64


@pytest.mark.slow
def test_cnn_batched_pipeline_matches_per_image():
    """The batched CNN pipeline (one program per canonical bucket) must
    produce the SAME boxes as the per-image bucketed extract+lost path —
    same features, same masked slab LayerNorm, same lost_core, just
    batched."""
    import jax

    from vipers.core.registry import build_model
    from vipers.discovery.driver import LostFeatureExtractor
    from vipers.discovery.lost import box_feat_to_image, lost

    spec = build_model("vgg16_bottom", input_size=(64, 64))
    variables = spec.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    ex = LostFeatureExtractor(spec, variables, arch="vgg16",
                              which_features="k", cnn_bucket=4)
    rng = np.random.default_rng(3)
    imgs = []
    for hw in ((96, 128), (112, 128), (128, 112)):
        im = rng.normal(size=(*hw, 3)).astype(np.float32) * 0.2
        im[hw[0] // 4: 3 * hw[0] // 4, hw[1] // 4: 3 * hw[1] // 4] += 2.0
        imgs.append(im)
    # all three share one bucket: vgg stride 16 -> fh in {6,7,8} -> FH 8
    keys = {ex.cnn_bucket_key(*im.shape[:2]) for im in imgs}
    assert len(keys) == 1, keys
    canon = keys.pop()

    pipe = ex.make_batched_cnn_pipeline(k_patches=100)
    images, valid_fhw = ex.prepare_cnn_batch(imgs, canon)
    box_feat, seeds, seed_bg = jax.device_get(
        pipe(ex.variables, images, valid_fhw))
    assert not seed_bg.any()

    for i, im in enumerate(imgs):
        h, w = im.shape[:2]
        feats, dims, vdims, scales, _ = ex.extract(im, 16)
        pred, _A, _s, seed = lost(
            feats, dims, scales, (3, h, w), k_patches=100, valid_dims=vdims)
        batched_pred = box_feat_to_image(
            box_feat[i], ex.cnn_scales(h, w), (3, h, w))
        assert int(seeds[i]) == int(seed), (i, seeds[i], seed)
        np.testing.assert_allclose(batched_pred, np.asarray(pred), atol=0)
