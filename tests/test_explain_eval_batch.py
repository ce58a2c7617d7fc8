"""Directory-batch explanation evaluation (`explain-eval-batch`):
vipers' ``evaluate_heatmap_dirs`` vs the REFERENCE's own ``evaluate``
(`/root/reference/explainations_evaluation_metrics.py:307-373`) run
in-loop on the same fixture directories — byte-identical txt tables and
equal JSON artifacts."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reference_loader import load_reference_module, numpy1_percentile_compat  # noqa: E402


@pytest.fixture()
def heatmap_fixture(tmp_path):
    hdir = tmp_path / "heatmaps"
    gdir = tmp_path / "gt"
    hdir.mkdir()
    gdir.mkdir()
    rng = np.random.default_rng(11)
    idx_list = [0, 1, 2, 3, 4]
    for i in idx_list:
        # CHW relevance maps (poolings collapse the channel axis) with an
        # embedded bright blob; GT masks partially overlapping it
        hm = rng.normal(size=(3, 24, 24)).astype(np.float32)
        hm[:, 6:14, 4 + i: 12 + i] += 3.0
        gt = np.zeros((24, 24), np.float64)
        gt[5:15, 6:16] = 255.0
        np.save(hdir / f"{i}.npy", hm)
        np.save(gdir / f"{i}.npy", gt)
    return str(hdir), str(gdir), idx_list


@pytest.mark.parametrize("metric", ["rank", "mass"])
def test_evaluate_heatmap_dirs_matches_reference(heatmap_fixture, tmp_path,
                                                 metric, capsys):
    ref = load_reference_module("explainations_evaluation_metrics")
    from vipers.explain.driver import evaluate_heatmap_dirs

    hdir, gdir, idx_list = heatmap_fixture
    ref_out = tmp_path / "ref_out"
    vip_out = tmp_path / "vip_out"
    ref_out.mkdir()
    vip_out.mkdir()

    # The reference's `evaluate` crashes as written: `evaluate_single`
    # returns a (scores_dict, ground_truth) tuple
    # (`explainations_evaluation_metrics.py:305`) but `evaluate` indexes it
    # with the metric string (`:328`) -> TypeError. Wrap the tuple
    # unwrapping (evident intent) while keeping every scoring/statistics/
    # formatting line the reference's own.
    real_single = ref.evaluate_single
    ref.evaluate_single = lambda *a, **kw: real_single(*a, **kw)[0]
    try:
        with numpy1_percentile_compat():
            ref.evaluate(hdir, gdir, str(ref_out), idx_list,
                         output_name="par", evaluation_metric=metric)
    finally:
        ref.evaluate_single = real_single
    capsys.readouterr()  # the reference prints per-image debug lines
    evaluate_heatmap_dirs(hdir, gdir, str(vip_out), idx_list,
                          output_name="par", evaluation_metric=metric)

    for fname in ("par_ORDERED.txt", "par_FIXED.txt"):
        ref_txt = (ref_out / fname).read_text()
        vip_txt = (vip_out / fname).read_text()
        assert ref_txt == vip_txt, f"{fname} differs:\n{ref_txt}\nvs\n{vip_txt}"
    for fname in ("par_datapoint", "par_statistic"):
        ref_json = json.load(open(ref_out / fname))
        vip_json = json.load(open(vip_out / fname))
        assert set(ref_json) == set(vip_json)
        for k in ref_json:
            for kk in ref_json[k]:
                assert ref_json[k][kk] == pytest.approx(
                    vip_json[k][kk], rel=1e-12
                ), (fname, k, kk)


def test_explain_eval_batch_cli(heatmap_fixture, tmp_path):
    from vipers.cli.main import main

    hdir, gdir, _ = heatmap_fixture
    out = str(tmp_path / "cli_out")
    rc = main([
        "explain-eval-batch", "--heatmap-dir", hdir,
        "--ground-truth-dir", gdir, "--output-dir", out,
        "--output-name", "cli", "--metric", "rank",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "cli_ORDERED.txt"))
    assert os.path.exists(os.path.join(out, "cli_FIXED.txt"))
    stats = json.load(open(os.path.join(out, "cli_statistic")))
    assert set(stats) == {"sum,abs", "sum,pos", "max-norm", "l1-norm",
                         "l2-norm", "l2-norm,sq"}
    body = open(os.path.join(out, "cli_ORDERED.txt")).read()
    assert "Statistics computed over data points: 5" in body

    # --indices subset + nonzero on an empty dir
    rc = main([
        "explain-eval-batch", "--heatmap-dir", hdir,
        "--ground-truth-dir", gdir, "--output-dir", out,
        "--output-name", "sub", "--metric", "mass",
        "--indices", "1", "3",
    ])
    assert rc == 0
    assert "Statistics computed over data points: 2" in open(
        os.path.join(out, "sub_ORDERED.txt")).read()
    empty = tmp_path / "empty"
    empty.mkdir()
    rc = main([
        "explain-eval-batch", "--heatmap-dir", str(empty),
        "--ground-truth-dir", gdir, "--output-dir", out,
    ])
    assert rc == 1
