"""Explainability tests (SURVEY §4.1): RMA/RRA + poolings vs hand values,
IG completeness axiom, guided-relu vjp semantics, GradCAM properties,
attention heatmap shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipers.explain.metrics import evaluate_single, pool_heatmap
from vipers.explain.attribution import make_integrated_gradients, make_smoothgrad
from vipers.explain.gradcam import gradcam, guided_gradcam, vit_attention_heatmap
from vipers.models.activations import guided_backprop, guided_relu


# ------------------------------------------------------------- poolings

def test_poolings_match_numpy(rng):
    hm = rng.normal(size=(3, 5, 7))
    assert np.allclose(pool_heatmap(hm, "sum,abs"), np.abs(hm.sum(0)))
    sp = hm.sum(0)
    assert np.allclose(pool_heatmap(hm, "sum,pos"), np.where(sp > 0, sp, 0))
    assert np.allclose(pool_heatmap(hm, "max-norm"), np.abs(hm).max(0))
    assert np.allclose(pool_heatmap(hm, "l1-norm"), np.abs(hm).sum(0))
    l2 = np.sqrt((hm ** 2).sum(0))
    assert np.allclose(pool_heatmap(hm, "l2-norm"), l2)
    assert np.allclose(pool_heatmap(hm, "l2-norm,sq"), l2 ** 2)


def test_rma_rra_hand_case():
    # 1-channel 2x2: relevance [[1,0],[3,0]]; GT marks the left column.
    hm = np.asarray([[[1.0, 0.0], [3.0, 0.0]]])
    gt = np.asarray([[1.0, 0.0], [1.0, 0.0]])
    scores, _ = evaluate_single(hm, gt, "sum,abs")
    assert scores["mass"] == pytest.approx(1.0, abs=1e-9)  # all mass inside
    assert scores["rank"] == pytest.approx(1.0, abs=1e-9)  # top-2 = GT cells

    # half the mass inside
    hm2 = np.asarray([[[1.0, 1.0], [1.0, 1.0]]])
    scores2, _ = evaluate_single(hm2, gt, "sum,abs")
    assert scores2["mass"] == pytest.approx(0.5, abs=1e-9)


def test_rma_2d_heatmap_pads_gt():
    hm = np.arange(24, dtype=np.float64).reshape(4, 6)
    gt = np.ones((2, 3))  # smaller GT -> zero-padded to heatmap size
    scores, gt_out = evaluate_single(hm, gt, None)
    assert gt_out.shape == (4, 6)
    pooled = (hm - hm.min()) / (hm.max() - hm.min())
    want = (pooled[:2, :3].sum()) / pooled.sum()
    assert scores["mass"] == pytest.approx(want, rel=1e-6)


# ------------------------------------------------------------------ IG

def test_ig_completeness_axiom():
    """sum(IG) == f(x) - f(0) for the gauss-legendre rule on a smooth f."""
    w = jnp.asarray(np.random.default_rng(0).normal(size=(6, 3)).astype(np.float32))

    def score(x, t):
        h = jnp.tanh(x @ w)
        return h[jnp.arange(x.shape[0]), t]

    ig = make_integrated_gradients(score, n_steps=50)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 6)).astype(np.float32))
    t = jnp.asarray([0, 2])
    attr = ig(x, t)
    total = np.asarray(attr.sum(axis=1))
    want = np.asarray(score(x, t) - score(jnp.zeros_like(x), t))
    np.testing.assert_allclose(total, want, rtol=1e-3, atol=1e-4)


def test_smoothgrad_averages():
    def score(x, t):
        return (x ** 2).sum(axis=-1)

    ig = make_integrated_gradients(score, n_steps=8)
    sg = make_smoothgrad(ig, nt_samples=2, nt_stdev=0.0)  # zero noise == IG
    x = jnp.ones((1, 4))
    np.testing.assert_allclose(
        np.asarray(sg(jax.random.PRNGKey(0), x, jnp.asarray([0]))),
        np.asarray(ig(x, jnp.asarray([0]))), rtol=1e-6)


# ------------------------------------------------------------ guided relu

def test_guided_relu_vjp():
    x = jnp.asarray([-1.0, 0.5, 2.0, -0.1])
    g_in = jnp.asarray([1.0, -1.0, 2.0, 3.0])
    _, vjp = jax.vjp(guided_relu, x)
    (g,) = vjp(g_in)
    # pass only where input>0 AND grad>0
    np.testing.assert_array_equal(np.asarray(g), [0.0, 0.0, 2.0, 0.0])


@pytest.mark.slow
def test_guided_backprop_context_changes_model_grads():
    from vipers.core.registry import build_model

    spec = build_model("resnet18", num_classes=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)

    def score(xx):
        logits, _ = spec.module.apply(variables, xx, train=False)
        return logits[0, 1]

    plain = np.asarray(jax.grad(score)(x))
    with guided_backprop():
        guided = np.asarray(jax.grad(score)(x))
    assert guided.shape == plain.shape
    assert not np.allclose(guided, plain)
    # guided grads arriving at the input passed only positive relu grads
    # downstream; they are not all-zero for a random net
    assert np.abs(guided).sum() > 0


# ---------------------------------------------------------------- gradcam

def _tiny_resnet():
    from vipers.core.registry import build_model

    spec = build_model("resnet18", num_classes=4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    return spec, variables, x


def test_gradcam_cnn_properties():
    spec, variables, x = _tiny_resnet()
    _logits, aux = spec.module.apply(variables, x, train=False)
    cam, target = gradcam(
        spec.module.apply, variables, x, tap_shape=aux["features"].shape
    )
    assert cam.shape == (32, 32)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
    assert 0 <= target < 4


@pytest.mark.slow
def test_guided_gradcam_cnn():
    spec, variables, x = _tiny_resnet()
    _logits, aux = spec.module.apply(variables, x, train=False)
    ggc, target = guided_gradcam(
        spec.module.apply, variables, x, tap_shape=aux["features"].shape
    )
    assert ggc.shape == (1, 32, 32, 3)


@pytest.mark.slow
def test_gradcam_vit_token_grid():
    from vipers.core.registry import build_model

    spec = build_model("vit_s_16", num_classes=4, image_size=(32, 48))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 32, 48, 3)), jnp.float32)
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    t = (32 // 16) * (48 // 16) + 1
    cam, _ = gradcam(
        spec.module.apply, variables, x, tap_shape=(1, t, 384),
        token_grid=(2, 3), aux_key="qkv_input",
    )
    assert cam.shape == (32, 48)


def test_vit_attention_heatmap_shape():
    attn = jnp.asarray(np.random.default_rng(3).random((1, 6, 7, 7)), jnp.float32)
    hm = vit_attention_heatmap(attn, (2, 3), (70, 90), patch_size=16)
    assert hm.shape == (70, 90)


@pytest.mark.slow
def test_explain_eval_contract(tmp_path):
    """explain-eval CLI writes the {method}_{model}_pruning_iteration txt
    contract on a synthetic VOC with segmentation masks."""
    import argparse
    from PIL import Image

    from vipers.explain.driver import run_explain_eval

    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "JPEGImages" / f"x{i}.jpg")
        mask = np.zeros((64, 96), np.uint8)
        mask[10:40, 20:60] = 255
        Image.fromarray(mask).save(root / "SegmentationClass" / f"x{i}.png")

    args = argparse.Namespace(
        model="vit_s_16", checkpoint="", voc_root=str(root), num_images=2,
        pooling="sum,abs", iteration=1, output_dir=str(tmp_path / "out"),
    )
    assert run_explain_eval(args) == 0
    for method in ("gradCAM", "attention", "ig"):
        p = tmp_path / "out" / f"{method}_vit_s_16_pruning_iteration_01.txt"
        assert p.exists(), p
        lines = p.read_text().splitlines()
        assert lines[0].startswith("Average Mass: ")
        assert lines[1].startswith("Average Rank: ")
        assert lines[2] == "On a total of 2 images."
        mass = float(lines[0].split(":")[1])
        assert 0.0 <= mass <= 1.0


# ------------------------------------------------------------------- LRP

def test_lrp_conservation_single_layer():
    """epsilon-LRP conservation: sum of input relevance equals the output
    relevance for a bias-free linear layer (eps -> 0)."""
    from vipers.explain.lrp import _lrp_wrap

    k = jnp.asarray(np.random.default_rng(0).normal(size=(6, 4)).astype(np.float32))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 6)).astype(np.float32))
    y, vjp = jax.vjp(lambda xx: _lrp_wrap(lambda z: z @ k, xx, 1e-9), x)
    r_out = np.zeros((1, 4), np.float32)
    r_out[0, 2] = float(y[0, 2])
    (r_in,) = vjp(jnp.asarray(r_out))
    assert float(jnp.sum(r_in)) == pytest.approx(float(y[0, 2]), rel=1e-5)


def test_lrp_end_to_end_resnet():
    from vipers.core.registry import build_model
    from vipers.explain.lrp import lrp_attribution

    spec = build_model("resnet18", num_classes=4)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = spec.module.init(jax.random.PRNGKey(0), x, train=False)
    rel, t = lrp_attribution(spec.module.apply, variables, x)
    assert rel.shape == (32, 32, 3)
    assert np.isfinite(rel).all() and np.abs(rel).sum() > 0
    assert 0 <= t < 4


@pytest.mark.slow
def test_run_explain_untrained_seed_baseline(tmp_path):
    """--untrained --seed N: random-init model, seed-stamped output dir
    (explain.py:108-116,167-189 parity)."""
    import argparse
    import os

    from PIL import Image

    from vipers.explain.driver import run_explain

    # tiny 2-class val ImageFolder
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp_path / "data" / "val" / cls
        d.mkdir(parents=True)
        Image.fromarray(
            rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        ).save(d / "x.jpg")

    args = argparse.Namespace(
        model="resnet18", checkpoint="", data_path=str(tmp_path / "data"),
        methods=["gradcam"], num_classes_sample=2,
        output_dir=str(tmp_path / "out"), untrained=True, seed=7,
    )
    assert run_explain(args) == 0
    seed_dir = tmp_path / "out" / "untrained_model_seed_7" / "gradcam"
    assert seed_dir.is_dir()
    assert any(seed_dir.rglob("*_nparray.npy"))


def test_figure_title_and_performance_bits(tmp_path):
    """Figure titles carry acc/sparsity parsed from performance.txt row
    iteration+1 (`explain.py:268-288`, acc1\\tsparsity), N/A for untrained."""
    import argparse

    from vipers.explain.driver import _figure_title, _performance_title_bits

    mdir = tmp_path / "models" / "resnet18"
    mdir.mkdir(parents=True)
    (mdir / "performance.txt").write_text(
        "acc1\tsparsity\n70.1\t0.0\n65.2\t20.0\n60.3\t36.0\n")
    args = argparse.Namespace(model="resnet18",
                              models_path=str(tmp_path / "models"),
                              pruning_iteration=None)

    it, sp, acc = _performance_title_bits(args, "/out/pruning_iteration_02")
    assert (it, sp, acc) == (2, "36.0", "60.3")
    title = _figure_title(args, "gradcam", "tabby", "tiger", it, sp, acc,
                          "/out/pruning_iteration_02")
    assert "Target Class: tabby" in title
    assert "Predicted Class: tiger" in title
    assert "pruning iteration 2" in title
    assert "Sparsity: 36.0 - Acc1: 60.3" in title

    it, sp, acc = _performance_title_bits(args, "/out/untrained_model_seed_7")
    assert (it, sp, acc) == (None, "N/A", "N/A")
    title = _figure_title(args, "ig", "a", "b", it, sp, acc,
                          "/out/untrained_model_seed_7")
    assert "Untrained" in title and "Seed: 7" in title

    # missing performance.txt -> N/A, no crash
    args2 = argparse.Namespace(model="nope", models_path=str(tmp_path),
                               pruning_iteration=4)
    assert _performance_title_bits(args2, "/out")[1:] == ("N/A", "N/A")


@pytest.mark.slow
def test_explain_figure_artifacts(tmp_path):
    """The reference's figure contract (`explain.py:308-397`): 2D methods
    save blended_heatmap_* (image overlay) AND heatmap_* plus the npy; CHW
    methods save the stripped-axes heatmap_* plus npy."""
    import argparse

    from PIL import Image

    from vipers.explain.driver import run_explain

    rng = np.random.default_rng(0)
    d = tmp_path / "data" / "val" / "a"
    d.mkdir(parents=True)
    Image.fromarray(
        rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    ).save(d / "x.jpg")

    args = argparse.Namespace(
        model="resnet18", checkpoint="", data_path=str(tmp_path / "data"),
        methods=["gradcam", "ig"], num_classes_sample=1,
        output_dir=str(tmp_path / "out"), untrained=False,
    )
    assert run_explain(args) == 0
    gdir = tmp_path / "out" / "gradcam" / "a"
    assert (gdir / "blended_heatmap_x.jpg").exists()
    assert (gdir / "heatmap_x.jpg").exists()
    assert (gdir / "x.jpg_nparray.npy").exists()
    idir = tmp_path / "out" / "ig" / "a"
    assert (idir / "heatmap_x.jpg").exists()
    assert (idir / "x.jpg_nparray.npy").exists()


@pytest.mark.slow
def test_guided_gradcam_vit():
    """GGC on a ViT (the reference's own ViT branch is broken code):
    token-grid GradCAM upsampled x input gradients, input-shaped output."""
    from vipers.core.registry import build_model
    from vipers.explain.driver import compute_heatmaps

    spec = build_model("vit_s_16", num_classes=5, image_size=(32, 32))
    variables = spec.module.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 3)), train=False)
    img = np.random.default_rng(0).normal(size=(32, 32, 3)).astype(np.float32)
    maps = compute_heatmaps(spec, variables, img, ["guided_gradcam", "gradcam"])
    ggc = maps["guided_gradcam"]
    assert ggc.shape == (3, 32, 32)
    assert np.all(np.isfinite(ggc))
    # GGC = gbp * cam: zero wherever the CAM is zero
    cam = maps["gradcam"]
    assert cam.shape == (32, 32)
    mask = cam == 0
    if mask.any():
        assert np.allclose(ggc[:, mask], 0.0)


@pytest.mark.slow
def test_run_explain_sweep_mode(tmp_path):
    """--pruning-iteration -1 + --models-path: explain every templated
    sweep checkpoint into per-iteration subdirs (explain.py:117-150)."""
    import argparse

    from PIL import Image

    from vipers.core.checkpoint import save_checkpoint
    from vipers.core.registry import build_model
    from vipers.explain.driver import run_explain

    rng = np.random.default_rng(0)
    for cls in ("a",):
        d = tmp_path / "data" / "val" / cls
        d.mkdir(parents=True)
        Image.fromarray(
            rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        ).save(d / "x.jpg")

    spec = build_model("resnet18")
    variables = spec.module.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 224, 224, 3)), train=False)
    mdir = tmp_path / "models" / "resnet18"
    mdir.mkdir(parents=True)
    for i in range(2):
        save_checkpoint(
            str(mdir / f"model_epoch_89_pruning_iteration_{i:02d}"),
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats")},
        )

    args = argparse.Namespace(
        model="resnet18", checkpoint="", data_path=str(tmp_path / "data"),
        methods=["gradcam"], num_classes_sample=1,
        output_dir=str(tmp_path / "out"), untrained=False,
        models_path=str(tmp_path / "models"), pruning_iteration=-1,
    )
    assert run_explain(args) == 0
    for i in range(2):
        d = tmp_path / "out" / f"pruning_iteration_{i:02d}" / "gradcam"
        assert d.is_dir() and any(d.rglob("*_nparray.npy"))


@pytest.mark.slow
def test_compute_heatmaps_dino():
    """explain/explain-eval on a DINO ViT: the tap (last block's norm1 +
    aux['qkv_input']) now exists on DinoVisionTransformer, so the
    gradcam/ig/attention method set run_explain_eval requests for family
    'dino_vit' works end-to-end."""
    from vipers.core.registry import build_model
    from vipers.explain.driver import compute_heatmaps

    spec = build_model("dino_vit_tiny")
    variables = spec.module.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 3)), train=False)
    img = np.random.default_rng(0).normal(size=(32, 32, 3)).astype(np.float32)
    maps = compute_heatmaps(spec, variables, img,
                            ["gradcam", "guided_gradcam", "ig", "attention"],
                            nt_samples=1, ig_steps=4)
    assert maps["gradcam"].shape == (32, 32)
    assert maps["attention"].shape == (32, 32)
    assert maps["guided_gradcam"].shape == (3, 32, 32)
    assert maps["ig"].shape == (3, 32, 32)
    for v in maps.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_heatmap_report_finds_attention_blended_files(tmp_path):
    """The attention method saves blended_heatmap_*/attention_heatmap_*
    (no bare heatmap_*); plot --kind heatmaps must still find its images."""
    import os

    from PIL import Image
    import numpy as np

    from vipers.viz.heatmap_report import collect_iteration_images

    for it in ("00", "01"):
        d = tmp_path / f"pruning_iteration_{it}" / "attention" / "cat"
        d.mkdir(parents=True)
        img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
        img.save(d / "blended_heatmap_x.png")
        img.save(d / "attention_heatmap_x.png")
    found = collect_iteration_images(str(tmp_path), "attention", "cat")
    assert len(found) == 2
    assert all(os.path.basename(p) == "blended_heatmap_x.png" for p in found)
