"""Run the reference's STANDALONE CorLoc evaluator in-loop.

`/root/reference/main_corloc_evaluation.py` is module-level script code, so
it is executed via ``runpy`` with patched argv/cwd. Its REAL logic — the
`datasets.Dataset` iteration, `extract_gt_VOC`, `bbox_iou`, the detectron
most-confident-box selection, and the miss/skip counting — runs on a
synthetic VOC07 (through the functional ``ShimVOCDetection``), and its
printed ``corloc: X (h/c)`` is asserted EQUAL to
`vipers.discovery.corloc.evaluate_predictions` on the same prediction files
for all three regimes: boxes_OD pkl, detectron json, and ``--no_hard``.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import pickle
import re
import runpy
import sys

import numpy as np
import pytest

from reference_loader import REFERENCE, load_reference_module

SCRIPT = os.path.join(REFERENCE, "main_corloc_evaluation.py")

# name -> (H, W, [(box_xyxy_1based, difficult, truncated)])
IMAGES = {
    "000001": (96, 128, [((25, 13, 72, 52), 0, 0)]),
    "000002": (96, 128, [((33, 21, 80, 60), 0, 0)]),
    # NOTE: an image with ZERO objects would crash the reference's pkl path
    # (`datasets.py:320` indexes an empty GT tensor) — real VOC always has
    # >=1 object, so parity is asserted on annotated images only
    "000003": (96, 128, [((49, 37, 96, 76), 0, 0)]),
    "000004": (112, 128, [((9, 9, 56, 48), 1, 0), ((65, 49, 112, 88), 1, 1)]),
    "000005": (96, 128, [((17, 29, 64, 68), 0, 0)]),
    "000006": (96, 128, [((41, 5, 88, 44), 0, 0)]),
}

MISS_BOX = [1.0, 1.0, 6.0, 6.0]  # disjoint from every GT


def _gt0(name, obj=0):
    """First GT box in 0-based xyxy (the space predictions live in)."""
    x1, y1, x2, y2 = IMAGES[name][2][obj][0]
    return [float(x1 - 1), float(y1 - 1), float(x2), float(y2)]


def _write_voc(root):
    from PIL import Image

    os.makedirs(os.path.join(root, "JPEGImages"))
    os.makedirs(os.path.join(root, "Annotations"))
    os.makedirs(os.path.join(root, "ImageSets", "Main"))
    rng = np.random.default_rng(7)
    for name, (h, w, objs) in IMAGES.items():
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "JPEGImages", name + ".jpg"))
        objs_xml = "".join(
            f"<object><name>thing</name><truncated>{tr}</truncated>"
            f"<difficult>{dif}</difficult>"
            f"<bndbox><xmin>{b[0]}</xmin><ymin>{b[1]}</ymin>"
            f"<xmax>{b[2]}</xmax><ymax>{b[3]}</ymax></bndbox></object>"
            for b, dif, tr in objs
        )
        with open(os.path.join(root, "Annotations", name + ".xml"), "w") as f:
            f.write(
                f"<annotation><filename>{name}.jpg</filename>"
                f"<size><width>{w}</width><height>{h}</height>"
                f"<depth>3</depth></size>{objs_xml}</annotation>"
            )
    with open(os.path.join(root, "ImageSets", "Main", "trainval.txt"), "w") as f:
        f.write("\n".join(IMAGES) + "\n")


@pytest.fixture(scope="module")
def voc_roots(tmp_path_factory):
    """(vipers_root, reference_cwd): same files, both directory contracts.

    The reference hardcodes root_path="datasets/VOC2007" relative to cwd and
    torchvision's VOCDetection then looks under VOCdevkit/VOC2007
    (`datasets.py:94-123`)."""
    base = tmp_path_factory.mktemp("voc_corloc")
    vipers_root = base / "voc"
    _write_voc(str(vipers_root))
    ref_cwd = base / "refcwd"
    ref_voc = ref_cwd / "datasets" / "VOC2007" / "VOCdevkit" / "VOC2007"
    ref_voc.parent.mkdir(parents=True)
    os.symlink(vipers_root, ref_voc)
    return str(vipers_root), str(ref_cwd)


@pytest.fixture(scope="module")
def pred_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("preds")
    # boxes_OD pkl: keys are annotation filenames WITH extension
    # (`main_lost.py` preds.pkl contract); one pred per image, every image
    # present (a missing key raises in the reference, `:107`)
    pkl = {
        "000001.jpg": _gt0("000001"),
        "000002.jpg": MISS_BOX,
        "000003.jpg": MISS_BOX,
        "000004.jpg": _gt0("000004", 0),   # hits a DIFFICULT object
        "000005.jpg": _gt0("000005"),
        "000006.jpg": MISS_BOX,
    }
    pkl_path = str(d / "preds.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump(pkl, f)

    def det(img, box_xyxy, score):
        x1, y1, x2, y2 = box_xyxy
        return {"image_id": img, "bbox": [x1, y1, x2 - x1, y2 - y1],
                "score": score, "category_id": 1}

    # detectron json: image_id formats mixed (zero-padded str / bare int),
    # most-confident selection pinned on 000001 (high-score miss beats
    # low-score hit), 000003 has NO prediction ("No prediction made" -> miss)
    dets = [
        det("000001", _gt0("000001"), 0.30),
        det("000001", MISS_BOX, 0.90),
        det("000002", _gt0("000002"), 0.70),
        det("000004", _gt0("000004", 1), 0.50),
        det(5, _gt0("000005"), 0.80),
        det("000006", _gt0("000006"), 0.60),
    ]
    json_path = str(d / "preds_detectron.json")
    with open(json_path, "w") as f:
        json.dump(dets, f)
    return pkl_path, json_path


def _to_tensor_normalize(pil):
    """torchvision ToTensor + ImageNet Normalize (the reference's module-
    level `transform`, `datasets.py:45-58`); only .shape is consumed by the
    corloc script."""
    import torch

    x = np.asarray(pil, np.float32).transpose(2, 0, 1) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(3, 1, 1)
    std = np.array([0.229, 0.224, 0.225], np.float32).reshape(3, 1, 1)
    return torch.from_numpy((x - mean) / std)


def _run_reference_script(cwd, type_pred, pred_file, no_hard, monkeypatch):
    ref_ds = load_reference_module("datasets")
    monkeypatch.setattr(ref_ds, "transform", _to_tensor_normalize)
    argv = ["main_corloc_evaluation.py", "--type_pred", type_pred,
            "--pred_file", pred_file, "--dataset", "VOC07",
            "--set", "trainval"]
    if no_hard:
        argv.append("--no_hard")
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.chdir(cwd)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        runpy.run_path(SCRIPT, run_name="__main__")
    return _parse_corloc_line(buf.getvalue())


def _parse_corloc_line(text):
    m = re.findall(r"corloc: ([0-9.]+) \((\d+)/(\d+)\)", text)
    assert m, f"no corloc line in output:\n{text}"
    score, hits, cnt = m[-1]
    return float(score), int(hits), int(cnt)


def _run_vipers(root, pred_file, detectron, no_hard):
    from vipers.data.detection import DiscoveryDataset
    from vipers.discovery.corloc import evaluate_predictions

    ds = DiscoveryDataset("VOC07", "trainval", root, no_hard=no_hard)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        evaluate_predictions(pred_file, ds, detectron_format=detectron)
    return _parse_corloc_line(buf.getvalue())


@pytest.mark.parametrize(
    "type_pred,no_hard",
    [("boxes_OD", False), ("boxes_OD", True), ("detectron", False)],
    ids=["pkl", "pkl-no-hard", "detectron"],
)
def test_corloc_script_reference_in_loop(voc_roots, pred_files, monkeypatch,
                                         type_pred, no_hard):
    vipers_root, ref_cwd = voc_roots
    pkl_path, json_path = pred_files
    pred = pkl_path if type_pred == "boxes_OD" else json_path
    ref = _run_reference_script(ref_cwd, type_pred, pred, no_hard, monkeypatch)
    vip = _run_vipers(vipers_root, pred, type_pred == "detectron", no_hard)
    assert vip == ref
    # non-degenerate: some hits, some misses, and the regimes count
    # different image sets (no_hard drops the all-hard image 000004)
    assert 0 < ref[1] < ref[2]
    assert ref[2] == len(IMAGES) - (1 if no_hard else 0)


def test_corloc_skips_images_missing_from_pickle(voc_roots, pred_files):
    """A default (non-strict) `vipers lost` run omits seed-in-background
    images from preds.pkl; re-scoring must skip them like the driver's
    own CorLoc counting does, not crash with KeyError."""
    import pickle

    vipers_root, _ = voc_roots
    pkl_path, _json = pred_files
    with open(pkl_path, "rb") as f:
        preds = pickle.load(f)
    dropped_key = sorted(preds)[0]
    partial = {k: v for k, v in preds.items() if k != dropped_key}
    partial_path = pkl_path + ".partial.pkl"
    with open(partial_path, "wb") as f:
        pickle.dump(partial, f)

    full = _run_vipers(vipers_root, pkl_path, False, False)
    part = _run_vipers(vipers_root, partial_path, False, False)
    assert part[2] == full[2] - 1  # one image skipped from the count
