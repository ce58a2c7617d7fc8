"""MvH distortion suite tests: distortion properties + runner CSV contract."""

import numpy as np
import pytest

from vipers.data.distortions import PARAMETRIC_DISTORTIONS
from vipers.train.mvh import MVH_ORDER, eval_mvh, write_mvh_csv


def test_all_parametric_distortions_valid(rng):
    img = rng.random((32, 48, 3)).astype(np.float32)
    for name, fn in PARAMETRIC_DISTORTIONS.items():
        out = fn(img.copy(), np.random.default_rng(0))
        assert out.dtype == np.float32, name
        assert out.shape[-1] == 3, name
        assert np.all(np.isfinite(out)), name
        assert out.min() >= -1e-5 and out.max() <= 1 + 1e-5, name


def test_distortion_semantics(rng):
    img = rng.random((16, 16, 3)).astype(np.float32)
    gray = PARAMETRIC_DISTORTIONS["colour"](img, np.random.default_rng(0))
    assert np.allclose(gray[..., 0], gray[..., 1])  # grayscale
    rot = PARAMETRIC_DISTORTIONS["rotation"](img, None, level=180)
    np.testing.assert_allclose(rot, img[::-1, ::-1], atol=0)
    lo = PARAMETRIC_DISTORTIONS["contrast"](img, None, level=0.1)
    assert lo.std() < img.std()


@pytest.mark.slow
def test_eidolon_partially_coherent_disarray(rng):
    """Toolbox-structure invariants: the DOG decomposition is exact; at
    coherence=1 every band shares ONE field, so the disarray equals a
    single whole-image warp (warping is linear in the image); coherence=0
    scrambles scales independently (must differ from any coherent warp);
    reach=0 is the identity."""
    from vipers.data.distortions import (
        _dog_scale_space, _eidolon, _warp_bilinear, eidolonI, eidolonIII,
    )

    img = rng.random((48, 48, 3)).astype(np.float32)

    bands, residual = _dog_scale_space(img[..., 0])
    assert len(bands) >= 3
    np.testing.assert_allclose(sum(bands) + residual, img[..., 0],
                               atol=1e-5)

    # reach=0: identity
    out0 = _eidolon(img, np.random.default_rng(0), reach=0.0, coherence=0.5)
    np.testing.assert_allclose(out0, np.clip(img, 0, 1), atol=1e-4)

    # coherence=1 == whole-image warp with the shared field
    r = np.random.default_rng(3)
    out1 = _eidolon(img, r, reach=4.0, coherence=1.0)
    from vipers.data.distortions import _displacement_field

    r2 = np.random.default_rng(3)
    h, w = img.shape[:2]
    sx = _displacement_field(r2, h, w, 10.0)
    sy = _displacement_field(r2, h, w, 10.0)
    direct = np.stack(
        [_warp_bilinear(img[..., c], 4.0 * sx, 4.0 * sy) for c in range(3)],
        axis=-1,
    )
    np.testing.assert_allclose(out1, np.clip(direct, 0, 1), atol=1e-4)

    # Geirhos naming: eidolonI is the coherent regime, eidolonIII the
    # incoherent one — same seed, very different outputs
    a = eidolonI(img, np.random.default_rng(5), level=6.0)
    b = eidolonIII(img, np.random.default_rng(5), level=6.0)
    assert np.abs(a - b).mean() > 1e-3
    assert a.shape == img.shape and np.isfinite(a).all()


def test_displacement_field_statistics():
    """Eidolon-factory math fixtures (round-4 VERDICT item 5): the
    displacement planes are grain-blurred white noise with UNIT EXPECTED
    variance via the factory's analytic correction — blurring unit white
    noise with a unit-integral Gaussian of width s leaves variance
    integral(G^2) = 1/(4*pi*s^2), i.e. a 2*sqrt(pi)*s rescale."""
    from vipers.data.distortions import _displacement_field, _gauss_kernel_1d

    # 1) the exact discrete correction converges to the factory's
    #    continuum constant 2*sqrt(pi)*grain (deterministic, pure math)
    for grain in (5.0, 10.0):
        k = _gauss_kernel_1d(grain, 4096)
        # per-axis: Var after 1D blur is sum(k^2); the exact rescale
        # 1/sum(k^2) approaches the factory's 2*sqrt(pi)*grain
        discrete = 1.0 / float((k ** 2).sum())
        continuum = 2.0 * np.sqrt(np.pi) * grain
        assert abs(discrete / continuum - 1.0) < 5e-3, (grain, discrete)

    # 2) unit EXPECTED variance, Monte Carlo: mean sample variance over
    #    seeds ~ 1 (d.o.f. per 128px field at grain 5 is ~50; 30 seeds
    #    puts the standard error ~4%, so +-15% is a 3+ sigma gate)
    grain, h, w, n = 5.0, 128, 128, 30
    fields = np.stack([
        _displacement_field(np.random.default_rng(s), h, w, grain)
        for s in range(n)
    ])
    mean_var = float((fields ** 2).mean())
    assert abs(mean_var - 1.0) < 0.15, mean_var

    # 3) stationary to the border (padded-plane blur = the factory's
    #    fat-plane embedding): edge-strip variance matches the center
    edge = np.concatenate([
        fields[:, :8, :].ravel(), fields[:, -8:, :].ravel(),
        fields[:, :, :8].ravel(), fields[:, :, -8:].ravel(),
    ])
    center = fields[:, 32:-32, 32:-32].ravel()
    assert abs(float((edge ** 2).mean()) - float((center ** 2).mean())) < 0.2

    # 4) the coherence blend c*shared + sqrt(1-c^2)*own is variance-
    #    preserving, so per-axis RMS displacement is exactly `reach` at
    #    every coherence (the factory's one-reach magnitude ladder)
    for c in (0.0, 0.3, 1.0):
        mix = np.sqrt(1.0 - c * c)
        blended = c * fields[:10] + mix * fields[10:20]
        assert abs(float((blended ** 2).mean()) - 1.0) < 0.2, c
    reach = 7.0
    rms = float(np.sqrt(((reach * fields[0]) ** 2).mean()))
    assert abs(rms / reach - 1.0) < 0.35  # single-field sampling noise


def test_mvh_runner_and_csv(tmp_path):
    """17-benchmark runner with a trivial 'model': eval_step counts the
    label-0 predictions of a fixed classifier on distorted batches."""
    import jax.numpy as jnp

    def eval_step(state, batch):
        images, labels = batch
        # classify by mean brightness of the normalized image
        pred = (jnp.mean(images, axis=(1, 2, 3)) > 0).astype(jnp.int32)
        return {
            "loss_sum": jnp.asarray(0.0),
            "top1": jnp.sum(pred == labels),
            "top5": jnp.asarray(labels.shape[0]),
            "n": jnp.asarray(labels.shape[0]),
        }

    rng = np.random.default_rng(0)
    images = (rng.random((8, 16, 16, 3)) * 255).astype(np.uint8)
    labels = (images.mean(axis=(1, 2, 3)) > 127).astype(np.int32)
    batches = [(images, labels)]

    from vipers.data.distortions import DISTORTION_LEVELS

    results = eval_mvh(eval_step, None, batches)
    param_names = [n for n in MVH_ORDER if isinstance(results[n], list)]
    assert len(param_names) == 12  # 12 parametric (level sweeps), 5 stimulus NaN
    for n in param_names:
        # one accuracy per toolbox parameter level
        assert len(results[n]) == len(DISTORTION_LEVELS[n])
        assert all(0.0 <= a <= 100.0 for a in results[n])
    # level sweeps are non-trivial: heavy contrast reduction must not beat
    # the undistorted condition for this brightness classifier
    assert results["contrast"][0] >= results["contrast"][-1]

    path = write_mvh_csv(results, "resnet18", 3, str(tmp_path))
    assert path.endswith("resnet18_pruning_step_3.csv")
    lines = open(path).read().strip().splitlines()
    # toolbox row structure: header + rows 1..19 ([17]=sketch top-5, which
    # mvh_performance_plot skips; [19]=stylized top-5)
    assert len(lines) == 20
    assert lines[1].startswith("resnet18,edge,accuracy (top-1),")
    assert lines[16].startswith("resnet18,sketch,accuracy (top-1),")
    assert lines[17].startswith("resnet18,sketch,accuracy (top-5),")
    assert lines[18].startswith("resnet18,stylized,accuracy (top-1),")
    assert lines[19].startswith("resnet18,stylized,accuracy (top-5),")
    # last column of a parametric row is the across-level mean; CSV values
    # are 0-1 fractions (toolbox convention) while eval_mvh returns percent
    cols = lines[5].split(",")  # contrast
    assert cols[1] == "contrast"
    assert float(cols[-1]) == pytest.approx(
        float(np.mean(results["contrast"])) / 100.0
    )
    assert all(0.0 <= float(v) <= 1.0 for v in cols[3:])

    # the plot layer can read it back
    from vipers.viz.plots import plot_mvh

    out = plot_mvh(str(tmp_path), "resnet18", str(tmp_path / "mvh.png"))
    import os

    assert os.path.exists(out)


def test_heatmap_grid_and_gif(tmp_path):
    from PIL import Image
    import numpy as np

    from vipers.viz.heatmap_report import heatmap_gif, heatmap_grid

    paths = []
    rng = np.random.default_rng(0)
    for i in range(7):
        p = str(tmp_path / f"hm_{i}.png")
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    grid = heatmap_grid(paths, str(tmp_path / "grid.png"), per_row=3)
    gif = heatmap_gif(paths, str(tmp_path / "anim.gif"))
    import os

    assert os.path.getsize(grid) > 0 and os.path.getsize(gif) > 0


def test_drawing_utils_parity_tail():
    """draw_segmentation_masks / draw_keypoints / flow_to_image
    (torchvision_utils.py:257-611 equivalents)."""
    from vipers.viz.draw import (
        draw_keypoints, draw_segmentation_masks, flow_to_image,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(16, 20, 3), dtype=np.uint8)
    m1 = np.zeros((16, 20), bool); m1[2:8, 3:9] = True
    m2 = np.zeros((16, 20), bool); m2[5:12, 6:14] = True
    out = draw_segmentation_masks(img, np.stack([m1, m2]), alpha=1.0,
                                  colors=[(255, 0, 0), (0, 255, 0)])
    assert out.dtype == np.uint8 and out.shape == img.shape
    np.testing.assert_array_equal(out[3, 4], [255, 0, 0])     # mask 1 only
    np.testing.assert_array_equal(out[6, 7], [0, 0, 0])       # overlap -> black
    np.testing.assert_array_equal(out[0, 0], img[0, 0])       # untouched

    kp = np.asarray([[[4.0, 4.0], [15.0, 10.0]]])
    out2 = draw_keypoints(img, kp, connectivity=[(0, 1)], colors=(0, 0, 255))
    assert (out2[..., 2] == 255).any()  # blue pixels drawn

    flow = np.zeros((2, 8, 8), np.float32)
    flow[0, :, :4] = 1.0   # rightward
    flow[1, :, 4:] = -1.0  # upward
    rgb = flow_to_image(flow)
    assert rgb.shape == (3, 8, 8) and rgb.dtype == np.uint8
    assert not np.array_equal(rgb[:, 0, 0], rgb[:, 0, 7])  # direction-coded
    batched = flow_to_image(np.stack([flow, flow]))
    assert batched.shape == (2, 3, 8, 8)
    np.testing.assert_array_equal(batched[0], rgb)


def test_stimuli_eval_fn_16_category_decision(tmp_path, rng):
    """Stimulus-set evaluation: ImageFolder of 16-category classes, logits
    aggregated 1000->16 (exact category_map.json override), accuracy
    against the folder label."""
    import json

    from PIL import Image

    from vipers.train.mvh import (
        SIXTEEN_CATEGORIES, imagenet_to_16_matrix, make_stimuli_eval_fn,
    )

    root = tmp_path / "stimuli"
    d = root / "cue-conflict"
    for cls in ("cat", "dog"):
        (d / cls).mkdir(parents=True)
        for i in range(3):
            arr = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / cls / f"{i}.jpg")
    # exact mapping: imagenet class 7 -> cat, class 11 -> dog
    (root / "category_map.json").write_text(
        json.dumps({"cat": [7], "dog": [11]})
    )
    m = imagenet_to_16_matrix(str(root))
    assert m[7, SIXTEEN_CATEGORIES.index("cat")] == 1.0
    assert m[11, SIXTEEN_CATEGORIES.index("dog")] == 1.0
    assert m.sum() == 2.0

    calls = []

    def logits_fn(x):
        calls.append(np.asarray(x).shape)
        # always vote imagenet class 7 => category "cat"
        out = np.zeros((x.shape[0], 1000), np.float32)
        out[:, 7] = 10.0
        return out

    ev = make_stimuli_eval_fn(logits_fn, batch_size=4, resize=40, crop=32,
                              stimuli_root=str(root))
    acc = ev(str(d))
    assert acc == pytest.approx(50.0)  # 3/6 (all predicted cat)
    # top-5 of the 16-category decision: dog ranks 2nd (only cat scores
    # higher), so every image lands in the top 5
    assert acc.top5 == pytest.approx(100.0)
    assert calls and calls[0][1:] == (32, 32, 3)

    # without a stimuli-root override, the PACKAGED WordNet-derived map
    # (data/meta/category_map.json) is the default: the canonical
    # 16-class-ImageNet lists, not the name-seed heuristic
    m2 = imagenet_to_16_matrix(None)
    dog_col = m2[:, SIXTEEN_CATEGORIES.index("dog")]
    assert dog_col.sum() == 118  # every dog breed, Chihuahua..Mexican hairless
    assert dog_col[151] == 1.0 and dog_col[268] == 1.0
    assert m2[:, SIXTEEN_CATEGORIES.index("airplane")].sum() == 2  # airliner+warplane
    assert m2[404, SIXTEEN_CATEGORIES.index("airplane")] == 1.0
    assert m2[895, SIXTEEN_CATEGORIES.index("airplane")] == 1.0
    # the categories are disjoint (each class maps to at most one)
    assert m2.sum(axis=1).max() == 1.0
    assert m2.sum() == 236


def test_plot_mvh_compare_cli(tmp_path):
    """plot --kind mvh-compare reproduces the reference's comparison-script
    family (mvh_triple_comparison / rn50_vs_rn18): one curve per
    (model, benchmark) pair over pruning steps, missing steps warned and
    skipped."""
    import os

    from vipers.cli.main import main

    d = tmp_path / "csvs"
    for model, steps in (("resnet18", 3), ("resnet50", 2)):
        for s in range(steps):
            results = {name: [0.1 * s + 0.05] for name in MVH_ORDER}
            write_mvh_csv(results, model, s, str(d))
    out = str(tmp_path / "cmp.png")
    rc = main([
        "plot", "--kind", "mvh-compare", "--results-dir", str(d),
        "--models", "resnet18", "resnet50",
        "--benchmarks", "rotation", "silhouette",
        "--max-prune", "4", "--out", out,
    ])
    assert rc == 0 and os.path.exists(out)

    # no CSVs at all -> raise (caller sees a hard failure, not an empty plot)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        main([
            "plot", "--kind", "mvh-compare",
            "--results-dir", str(tmp_path / "empty"),
            "--models", "nope", "--out", str(tmp_path / "x.png"),
        ])
    # typo'd benchmark name -> hard error, not a silent blank plot
    with _pytest.raises(ValueError, match="unknown benchmark"):
        main([
            "plot", "--kind", "mvh-compare", "--results-dir", str(d),
            "--models", "resnet18", "--benchmarks", "false_colour",
            "--out", str(tmp_path / "y.png"),
        ])


def test_plot_heatmaps_cli(tmp_path, rng):
    """plot --kind heatmaps: per-class grid (+GIF) from the explain-driver
    layout; .gif --out never collides with the grid; zero matches exits
    nonzero."""
    from PIL import Image

    from vipers.cli.main import main

    root = tmp_path / "expl"
    for it in range(3):
        d = root / f"pruning_iteration_{it:02d}" / "gradcam" / "cat"
        d.mkdir(parents=True)
        Image.fromarray(
            (rng.random((24, 24, 3)) * 255).astype(np.uint8)
        ).save(d / "heatmap_x.jpg")

    out = tmp_path / "r.gif"
    assert main(["plot", "--kind", "heatmaps", "--results-dir", str(root),
                 "--out", str(out), "--gif"]) == 0
    assert (tmp_path / "r_gradcam_cat.png").exists()  # grid stays raster
    assert (tmp_path / "r_gradcam_cat.gif").exists()

    with pytest.raises(SystemExit):
        main(["plot", "--kind", "heatmaps", "--results-dir", str(root),
              "--cls", "nope", "--out", str(tmp_path / "z.png")])
