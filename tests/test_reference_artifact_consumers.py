"""Artifact-contract parity: the REFERENCE's own downstream consumers run
in-loop over artifacts vipers writes.

`lost_performance_plot.py` and `mvh_performance_plot.py` are the
reference's plotting stage — they parse `performance.txt`,
`results_iteration_NN.txt`, and `{model}_pruning_step_{N}.csv`. Feeding
them files produced by vipers' writers proves the artifact formats
byte-compatible where it matters: the reference's own parsers."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reference_loader import load_reference_module, redirect_scratch_io  # noqa: E402

pytestmark = pytest.mark.slow


def test_reference_lost_plot_consumes_vipers_artifacts(tmp_path, capsys):
    """`lost_performance_plot.main` parses vipers' performance.txt and
    CorLoc results_iteration_NN.txt and renders its plot."""
    import argparse

    import matplotlib

    matplotlib.use("Agg")

    lpp = load_reference_module("lost_performance_plot")
    from vipers.core.metrics import MetricsWriter
    from vipers.discovery.corloc import CorLocAccumulator

    root = tmp_path / "val_results"
    model = "vit_b_32"
    # performance.txt via the vipers writer (acc1 \t sparsity rows)
    rows = [(70.5, 0.0), (68.1, 35.0), (65.0, 58.0)]
    MetricsWriter.export_performance_txt(str(tmp_path / "performance.txt"),
                                         rows)
    # CorLoc results per iteration via the vipers accumulator
    out_lost = root / f"LOST-{model}"
    out_lost.mkdir(parents=True)
    for it in range(3):
        acc = CorLocAccumulator()
        gt = np.asarray([[0.0, 0.0, 10.0, 10.0]])
        acc.add("a.jpg", np.asarray([0.0, 0.0, 10.0, 10.0]), gt)  # hit
        if it:
            acc.add("b.jpg", np.asarray([50, 50, 60, 60.0]), gt)  # miss
        acc.save(str(out_lost), it, save_preds=False, save_results=True)

    args = argparse.Namespace(
        model=model, model_max_prune=2, csv=False,
        root_results_path=str(root),
        performance_path=str(tmp_path / "performance.txt"),
        models_path="", dilate=1,
    )
    with redirect_scratch_io(str(tmp_path / "scratch")) as mapper:
        lpp.main(args)
    capsys.readouterr()
    out_jpg = mapper(f"/scratch/lost/{model}_val_plot.jpg")
    assert os.path.exists(out_jpg) and os.path.getsize(out_jpg) > 0


def test_reference_mass_rank_plot_consumes_vipers_txts(tmp_path, capsys):
    """`mass_rank_plots.main` parses the per-method
    `{method}_{model}_pruning_iteration_NN.txt` files vipers'
    explain-eval writer emits (first line mass, second line rank, values
    after ':') plus the whitespace performance.txt — through the
    reference's own readline/split loop (`mass_rank_plots.py:80-87`)."""
    import argparse

    import matplotlib

    matplotlib.use("Agg")

    mrp = load_reference_module("mass_rank_plots")
    from vipers.core.metrics import MetricsWriter
    from vipers.explain.driver import write_method_txt

    model = "vit_b_32"  # reference methods for vit: attention + ig
    with redirect_scratch_io(str(tmp_path / "scratch")) as mapper:
        perf = mapper(f"/scratch/tesi_magistrale/{model}/performance.txt")
        MetricsWriter.export_performance_txt(
            perf, [(70.5, 0.0), (68.1, 35.0), (65.0, 58.0)]
        )
        out_dir = os.path.dirname(mapper("/scratch/tesi_magistrale/output/x"))
        os.makedirs(out_dir, exist_ok=True)
        for it in range(3):
            for method in ("attention", "ig"):
                write_method_txt(out_dir, method, model, it,
                                 mass=0.6 - 0.05 * it, rank=0.5 - 0.04 * it,
                                 n=101)
        args = argparse.Namespace(model_name=model, model_max_prune=2)
        mrp.main(args)
        capsys.readouterr()
        # make_plot shadows its method arg with its loop variable, so every
        # call saves under the LAST looped method name ('ig') — assert that
        # pdf exists and is non-empty.
        pdf = mapper(f"/scratch/tesi_magistrale/output/{model}_ig_plot.pdf")
        assert os.path.exists(pdf) and os.path.getsize(pdf) > 0


def test_reference_mvh_plot_consumes_vipers_csvs(tmp_path, capsys):
    """`mvh_performance_plot.main` indexes the exact CSV row structure
    `write_mvh_csv` emits (rows 1..18, last column) and the whitespace
    performance.txt — end-to-end through the reference's own csv.reader
    loop."""
    import argparse

    import matplotlib

    matplotlib.use("Agg")

    mpp = load_reference_module("mvh_performance_plot")
    from vipers.core.metrics import MetricsWriter
    from vipers.train.mvh import MVH_ORDER, write_mvh_csv

    model = "resnet18"
    with redirect_scratch_io(str(tmp_path / "scratch")) as mapper:
        base = mapper("/scratch/tesi_magistrale/x")  # force dir creation
        base_dir = os.path.dirname(base)
        os.makedirs(os.path.join(base_dir, model), exist_ok=True)
        MetricsWriter.export_performance_txt(
            os.path.join(base_dir, model, "performance.txt"),
            [(70.0, 0.0), (68.0, 30.0), (66.0, 50.0)],
        )
        for step in range(3):
            results = {
                name: [0.5 + 0.01 * step + 0.001 * i]
                for i, name in enumerate(MVH_ORDER)
            }
            write_mvh_csv(results, model, step, base_dir)
        args = argparse.Namespace(model_name=model, max_prune=3)
        mpp.main(args)
        capsys.readouterr()
        save_dir = mapper(
            "/scratch/tesi_magistrale/model_vs_human_performances/x"
        )
        found = []
        for dirpath, _dirs, files in os.walk(os.path.dirname(save_dir)):
            found.extend(os.path.join(dirpath, f) for f in files)
        assert found, "reference mvh plot wrote no artifact"


def test_reference_mvh_plot2_consumes_vipers_csvs(tmp_path, capsys):
    """`mvh_performance_plot_2.main` matches CSV rows by the toolbox
    `row[1] + ' ' + row[2]` benchmark/metric names — including the
    sketch/stylized `accuracy (top-5)` rows — across all four models'
    paper sweeps (27/26/8/14 steps). A name mismatch on ANY of its 19
    test names leaves `values` empty and `statistics.mean` raises, so
    completion proves every benchmark row matched
    (`mvh_performance_plot_2.py:19-65`)."""
    import argparse

    import matplotlib

    matplotlib.use("Agg")

    mpp2 = load_reference_module("mvh_performance_plot_2")
    from vipers.train.mvh import MVH_ORDER, StimulusAccuracy, write_mvh_csv
    from vipers.viz.plots import MVH_MAX_PRUNE

    with redirect_scratch_io(str(tmp_path / "scratch")) as mapper:
        base_dir = os.path.dirname(mapper("/scratch/x"))
        for model, steps in MVH_MAX_PRUNE.items():
            for step in range(steps):
                results = {}
                for i, name in enumerate(MVH_ORDER):
                    v = 40.0 + step + i
                    results[name] = (
                        StimulusAccuracy(v, v + 10.0)
                        if name in ("sketch", "stylized") else [v]
                    )
                write_mvh_csv(results, model, step, base_dir)
        mpp2.main(argparse.Namespace(model_name="resnet50", max_prune=26))
        capsys.readouterr()
        pngs = [f for f in os.listdir(base_dir) if f.endswith(".png")]
        assert len(pngs) == 19  # one figure per benchmark/metric name


def test_reference_triple_and_rn50_plots_consume_vipers_csvs(
    tmp_path, capsys, monkeypatch
):
    """`mvh_triple_comparison` (fixed row indices 2/4/10 = silhouette/
    colour/false-colour) and `mvh_performance_rn50_vs_rn18` (row 11 =
    rotation) read vipers CSVs and plot exactly the intended benchmark
    series — verified by capturing the values each script hands to
    `plt.plot` (`mvh_triple_comparison.py:29-38`,
    `mvh_performance_rn50_vs_rn18.py:29-45`)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    mtc = load_reference_module("mvh_triple_comparison")
    mrr = load_reference_module("mvh_performance_rn50_vs_rn18")
    from vipers.train.mvh import MVH_ORDER, write_mvh_csv

    offsets = {"resnet18": 50.0, "resnet50": 30.0}
    with redirect_scratch_io(str(tmp_path / "scratch")) as mapper:
        base_dir = os.path.dirname(mapper("/scratch/tesi_magistrale/x"))
        for model, off in offsets.items():
            for step in range(26):
                results = {
                    name: [off + step + i]
                    for i, name in enumerate(MVH_ORDER)
                }
                write_mvh_csv(results, model, step, base_dir)

        captured = []
        real_plot = plt.plot

        def spy_plot(*args, **kwargs):
            captured.append((list(args[0]), kwargs.get("label")))
            return real_plot(*args, **kwargs)

        monkeypatch.setattr(plt, "plot", spy_plot)
        mtc.main()
        triple = {label: vals for vals, label in captured}
        captured.clear()
        mrr.main()
        rn = {label: vals for vals, label in captured}
        capsys.readouterr()

    def expect(bench, off):
        i = MVH_ORDER.index(bench)
        return [(off + step + i) / 100.0 for step in range(26)]

    assert triple["silhouette"] == pytest.approx(expect("silhouette", 50.0))
    assert triple["colour"] == pytest.approx(expect("colour", 50.0))
    assert triple["false_colour"] == pytest.approx(
        expect("false-colour", 50.0)
    )
    assert rn["ResNet18 on rotation"] == pytest.approx(
        expect("rotation", 50.0)
    )
    assert rn["ResNet50 on rotation"] == pytest.approx(
        expect("rotation", 30.0)
    )
    p1 = mapper(
        "/scratch/tesi_magistrale/model_vs_human_performances/"
        "resnet18/resnet18_multiple_tasks.pdf"
    )
    p2 = mapper(
        "/scratch/tesi_magistrale/model_vs_human_performances/"
        "comparison/resnet18_vs_resnet50_rotation.pdf"
    )
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0
