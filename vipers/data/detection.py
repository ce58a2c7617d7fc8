"""Detection datasets for object discovery: VOC07/VOC12/COCO20k.

Counterpart of `/root/reference/datasets.py:61-309,366-396`:
  * ``ImageDataset``: single image at native resolution, ToTensor +
    ImageNet-normalize, **no resize** (`:45-59`),
  * ``DiscoveryDataset``: VOC (XML) / COCO (json) enumeration with
    hard-image (truncated/difficult) discovery and the ``no_hard`` filter
    (`:220-258`),
  * GT extraction with the reference's exact coordinate conventions:
    VOC 1-based inclusive -> 0-based (`:281-309`), COCO xywh -> xyxy with
    ``iscrowd`` removal and rounding (`:261-278`),
  * COCO-20k subset selection (`:366-396`).

Implementation is torch-free: XML via stdlib, images via PIL.
"""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from vipers.data.preprocess import IMAGENET_MEAN, IMAGENET_STD


def load_image_normalized(path: str) -> np.ndarray:
    """uint8 decode -> float32 (H, W, 3) normalized (no resize)."""
    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return (img - mean) / std


def extract_gt_VOC(annotation: Dict, remove_hards: bool = False):
    """`datasets.py:281-309`: 1-based inclusive xmin/ymin shifted to 0-based."""
    objects = annotation["annotation"]["object"]
    gt_bbxs, gt_clss = [], []
    for o in objects:
        if remove_hards and (o.get("truncated") == "1" or o.get("difficult") == "1"):
            continue
        gt_clss.append(o["name"])
        b = o["bndbox"]
        box = [int(b["xmin"]) - 1, int(b["ymin"]) - 1, int(b["xmax"]), int(b["ymax"])]
        gt_bbxs.append(box)
    return np.asarray(gt_bbxs), gt_clss


def extract_gt_COCO(targets: List[Dict], remove_iscrowd: bool = True):
    """`datasets.py:261-278`: xywh -> xyxy, int-rounded, crowd removed."""
    gt_bbxs, gt_clss = [], []
    for o in targets:
        if remove_iscrowd and o.get("iscrowd") == 1:
            continue
        gt_clss.append(o["category_id"])
        x, y, w, h = o["bbox"]
        gt_bbxs.append([int(round(v)) for v in (x, y, x + w, y + h)])
    return np.asarray(gt_bbxs), gt_clss


def parse_voc_xml(path: str) -> Dict:
    """VOC annotation XML -> nested dict (same shape torchvision produces)."""

    def node_to_dict(node):
        children = list(node)
        if not children:
            return node.text
        out: Dict = {}
        for c in children:
            val = node_to_dict(c)
            if c.tag == "object":
                out.setdefault("object", []).append(val)
            else:
                out[c.tag] = val
        return out

    root = ET.parse(path).getroot()
    ann = node_to_dict(root)
    if "object" in ann and not isinstance(ann["object"], list):
        ann["object"] = [ann["object"]]
    # torchvision's parser emits "object" unconditionally for the annotation
    # node (an empty list when the image has no objects) — keep that shape so
    # extract_gt_VOC sees an empty GT rather than a KeyError
    ann.setdefault("object", [])
    return {"annotation": ann}


class ImageDataset:
    """Single-image dataset at native resolution (`datasets.py:45-82`):
    decode + ImageNet-normalize, NO resize."""

    def __init__(self, path: str):
        self.path = path
        self.name = os.path.basename(path)

    def __iter__(self):
        yield load_image_normalized(self.path), self.name

    def load(self) -> np.ndarray:
        return load_image_normalized(self.path)


class DiscoveryDataset:
    """Enumerates (image_path, image_name, annotation) for VOC07/VOC12/COCO20k.

    VOC layout:  <root>/JPEGImages, <root>/Annotations,
                 <root>/ImageSets/Main/<set>.txt
    COCO layout: <root>/images/... + an instances json; ``coco20k_list``
    optionally restricts to the 20k filename list (`datasets.py:366-396`).
    """

    def __init__(
        self,
        name: str,
        set_name: str,
        root: str,
        no_hard: bool = False,
        coco_annotations: Optional[str] = None,
        coco20k_list: Optional[str] = None,
    ):
        self.name = name
        self.set_name = set_name
        self.root = root
        self.no_hard = no_hard
        self.items: List[Tuple[str, str]] = []  # (path, im_name)
        if name.startswith("VOC"):
            self._init_voc()
        elif name.startswith("COCO"):
            self._init_coco(coco_annotations, coco20k_list)
        else:
            raise ValueError(f"Unknown dataset {name!r}")

    # ----------------------------- VOC ------------------------------------
    def _init_voc(self):
        setfile = os.path.join(self.root, "ImageSets", "Main", f"{self.set_name}.txt")
        if os.path.exists(setfile):
            with open(setfile) as f:
                ids = [l.strip().split()[0] for l in f if l.strip()]
        else:
            ids = sorted(
                os.path.splitext(p)[0]
                for p in os.listdir(os.path.join(self.root, "JPEGImages"))
            )
        for i in ids:
            self.items.append(
                (os.path.join(self.root, "JPEGImages", i + ".jpg"), i + ".jpg")
            )

    # ----------------------------- COCO ------------------------------------
    def _init_coco(self, ann_file, sel_file):
        if not ann_file:
            raise ValueError(
                "COCO datasets need coco_annotations= (instances json); "
                "pass --coco-annotations on the CLI")
        with open(ann_file) as f:
            coco = json.load(f)
        anns_by_img: Dict[int, List] = {}
        for a in coco["annotations"]:
            anns_by_img.setdefault(a["image_id"], []).append(a)
        self._coco_anns = anns_by_img
        images = coco["images"]
        if sel_file:
            with open(sel_file) as f:
                sel = {
                    str(int(s.strip().split("_")[-1].split(".")[0]))
                    for s in f if s.strip()
                }
            images = [im for im in images if str(im["id"]) in sel]
        self._coco_images = {im["file_name"]: im for im in images}
        for im in images:
            self.items.append(
                (os.path.join(self.root, im["file_name"]), im["file_name"])
            )

    # ---------------------------- common ------------------------------------
    def __len__(self):
        return len(self.items)

    def __iter__(self):
        for path, name in self.items:
            yield path, name

    def annotation(self, im_name: str):
        if self.name.startswith("VOC"):
            xml = os.path.join(
                self.root, "Annotations", os.path.splitext(im_name)[0] + ".xml"
            )
            return parse_voc_xml(xml)
        return self._coco_anns.get(self._coco_images[im_name]["id"], [])

    def extract_gt(self, im_name: str):
        """(gt_boxes (n,4) xyxy, classes); hard boxes removed when no_hard."""
        ann = self.annotation(im_name)
        if self.name.startswith("VOC"):
            return extract_gt_VOC(ann, remove_hards=self.no_hard)
        return extract_gt_COCO(ann)

    def load_image(self, im_name: str) -> np.ndarray:
        path = os.path.join(os.path.dirname(self.items[0][0]), im_name)
        return np.asarray(Image.open(path).convert("RGB"))


def select_coco_20k(sel_file: str, all_annotations_file: str, out_file: str):
    """Build the 20k-image annotation subset (`datasets.py:366-396`),
    index-based (no O(20k * N) scan)."""
    with open(all_annotations_file) as f:
        full = json.load(f)
    with open(sel_file) as f:
        sel = [s.strip() for s in f if s.strip()]
    ids = {int(s.split("_")[-1].split(".")[0]) for s in sel}
    out = {
        "images": [im for im in full["images"] if im["id"] in ids],
        "annotations": [a for a in full["annotations"] if a["image_id"] in ids],
        "categories": full["categories"],
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_file)), exist_ok=True)
    with open(out_file, "w") as f:
        json.dump(out, f)
    return out
