"""CorLoc accounting + the standalone re-scoring evaluator.

Counterparts of the in-loop CorLoc accumulation
(`/root/reference/main_lost.py:675-702`: hit when any GT IoU >= 0.5; writes
``preds.pkl`` + ``results_iteration_NN.txt``) and the offline evaluator
(`/root/reference/main_corloc_evaluation.py:33-152`, incl. the detectron-json
path that picks the most confident box).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Optional

import numpy as np

from vipers.data.boxes import bbox_iou
from vipers.data.detection import DiscoveryDataset


def corloc_hit(pred_box, gt_boxes) -> bool:
    """IoU(pred, any gt) >= 0.5 (`main_lost.py:675-678`)."""
    if gt_boxes is None or len(gt_boxes) == 0:
        return False
    ious = bbox_iou(np.asarray(pred_box, dtype=np.float64), np.asarray(gt_boxes))
    return bool(np.any(ious >= 0.5))


class CorLocAccumulator:
    def __init__(self):
        self.hits = 0
        self.count = 0
        self.preds: Dict[str, list] = {}

    def add(self, im_name: str, pred_box, gt_boxes):
        self.preds[im_name] = list(np.asarray(pred_box).tolist())
        self.count += 1
        if corloc_hit(pred_box, gt_boxes):
            self.hits += 1

    @property
    def corloc(self) -> float:
        return 100.0 * self.hits / max(self.count, 1)

    def save(self, output_dir: str, iteration: int, save_preds: bool = True,
             save_results: bool = True):
        """preds.pkl + results_iteration_NN.txt contracts
        (`main_lost.py:687-702`); the two artifacts gate independently
        like the reference's --save-predictions / --no-evaluation."""
        os.makedirs(output_dir, exist_ok=True)
        if save_preds:
            with open(os.path.join(output_dir, "preds.pkl"), "wb") as f:
                pickle.dump(self.preds, f)
        txt = None
        if save_results:
            txt = os.path.join(
                output_dir, f"results_iteration_{iteration:02d}.txt"
            )
            with open(txt, "w") as f:
                f.write(f"corloc,{self.corloc:.1f},,\n")
            print(f"corloc: {self.corloc:.2f} ({self.hits}/{self.count})")
        return txt


def _canonical_image_key(key) -> str:
    """Detectron ``image_id``s are ints while VOC names are zero-padded
    strings; the reference matches them NUMERICALLY
    (`main_corloc_evaluation.py:111-117`: ``int(pred["image_id"]) ==
    int(name_ind)``). Canonicalize digit-like keys through int so
    ``image_id: 5`` finds image ``000005.jpg``."""
    s = str(key)
    return str(int(s)) if s.lstrip("-").isdigit() else s


def evaluate_predictions(
    preds_path: str,
    dataset: DiscoveryDataset,
    detectron_format: bool = False,
) -> float:
    """Re-score saved predictions against GT, with the reference evaluator's
    exact counting semantics (`main_corloc_evaluation.py:83-152`):

    * zero-GT images are skipped only under ``no_hard`` (`:100-105`);
      without it they count (and inevitably miss);
    * detectron images with no prediction count as misses (`:120-125`);
    * a boxes_OD pkl missing an image's entry raises, like the reference's
      ``predictions[im_name]`` (`:107`) — silent undercounts stay loud.

    Verified against the reference script run in-loop
    (`tests/test_reference_corloc_script.py`)."""
    detectron = detectron_format or preds_path.endswith(".json")
    if detectron:
        with open(preds_path) as f:
            dets = json.load(f)
        by_img: Dict[str, list] = {}
        for d in dets:
            by_img.setdefault(_canonical_image_key(d["image_id"]), []).append(d)
    else:
        with open(preds_path, "rb") as f:
            preds = pickle.load(f)

    hits = cnt = missing = 0
    for _path, im_name in dataset:
        gt, _cls = dataset.extract_gt(im_name)
        if gt is not None and len(gt) == 0 and dataset.no_hard:
            continue
        if detectron:
            # VOC keys drop the extension (`:110-112`); most-confident box
            # per image (`:127-139`)
            name_ind = (os.path.splitext(im_name)[0]
                        if dataset.name.startswith("VOC") else im_name)
            cand = by_img.get(_canonical_image_key(name_ind), [])
            if not cand:
                cnt += 1
                continue
            best = max(cand, key=lambda d: d.get("score", 0.0))
            x, y, w, h = best["bbox"]
            pred = [x, y, x + w, y + h]
        else:
            key = im_name if im_name in preds else os.path.splitext(im_name)[0]
            if key not in preds:
                # default (non-strict) `vipers lost` runs omit
                # seed-in-background failures from preds.pkl; the LOST
                # driver SKIPS those images in its own CorLoc count
                # (driver.py failure collection) — match that instead of
                # crashing the whole re-score
                missing += 1
                continue
            pred = preds[key]
        cnt += 1
        if corloc_hit(pred, gt):
            hits += 1
    corloc = 100.0 * hits / max(cnt, 1)
    if missing:
        print(f"warning: {missing} image(s) had no prediction in the "
              "pickle (seed-in-background failures?) — skipped, matching "
              "the lost driver's own CorLoc counting")
    print(f"corloc: {corloc:.2f} ({hits}/{cnt})")
    return corloc


def run_corloc_cli(args) -> int:
    ds = DiscoveryDataset(
        args.dataset, args.set, args.data_path, no_hard=args.no_hard,
        coco_annotations=getattr(args, "coco_annotations", None),
        coco20k_list=getattr(args, "coco20k_list", None),
    )
    evaluate_predictions(args.preds, ds)
    return 0
