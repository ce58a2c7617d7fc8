"""Import machinery for running `/root/reference`'s OWN code in-loop.

The parity tests in ``test_reference_parity.py`` do not re-implement oracle
logic — they ``sys.path``-import the reference's modules
(`object_discovery.py`, `vision_transformer.py`, `train.py`, `datasets.py`)
and execute them on the same inputs vipers sees. This module provides:

  * import shims for libraries absent in this environment (torchvision,
    skimage, tqdm, wandb). The shims satisfy ``import`` statements ONLY —
    every function under test executes the reference's real code on real
    torch. No reference logic is stubbed.
  * a ``redirect_scratch_saves`` context: the reference's vendored ViT
    hard-codes ``torch.save(..., '/scratch/qkv_vit.pt')`` inside every
    EncoderBlock forward (`/root/reference/vision_transformer.py:113-115`);
    we rewrite those paths into a sandbox directory.
"""

from __future__ import annotations

import contextlib
import enum
import os
import sys
import types

REFERENCE = "/root/reference"


class _InterpolationMode(enum.Enum):
    NEAREST = "nearest"
    NEAREST_EXACT = "nearest-exact"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    BOX = "box"
    HAMMING = "hamming"
    LANCZOS = "lanczos"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class ShimVOCDetection:
    """Functional stand-in for ``torchvision.datasets.VOCDetection`` with the
    real class's on-disk contract: ``root/VOCdevkit/VOC{year}`` holding
    JPEGImages/, Annotations/ and ImageSets/Main/{image_set}.txt, items are
    ``(transform(PIL image), parse_voc_xml(annotation))``. The XML parser
    reproduces torchvision's nested-dict shape (repeated tags become lists;
    the annotation node's ``object`` entry is ALWAYS a list, even with zero
    or one object). This lets the reference's `datasets.Dataset` and the
    standalone `main_corloc_evaluation.py` run their REAL logic in-loop."""

    def __init__(self, root, year="2007", image_set="train", transform=None,
                 download=False, **kw):
        base = os.path.join(root, "VOCdevkit", f"VOC{year}")
        setfile = os.path.join(base, "ImageSets", "Main", image_set + ".txt")
        with open(setfile) as f:
            ids = [line.strip().split()[0] for line in f if line.strip()]
        self.images = [os.path.join(base, "JPEGImages", i + ".jpg") for i in ids]
        self.targets = [os.path.join(base, "Annotations", i + ".xml") for i in ids]
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        from PIL import Image
        import xml.etree.ElementTree as ET

        img = Image.open(self.images[index]).convert("RGB")
        target = self.parse_voc_xml(ET.parse(self.targets[index]).getroot())
        if self.transform is not None:
            img = self.transform(img)
        return img, target

    @classmethod
    def parse_voc_xml(cls, node):
        import collections

        voc_dict = {}
        children = list(node)
        if children:
            def_dic = collections.defaultdict(list)
            for dc in map(cls.parse_voc_xml, children):
                for ind, v in dc.items():
                    def_dic[ind].append(v)
            if node.tag == "annotation":
                def_dic["object"] = [def_dic["object"]]
            voc_dict = {
                node.tag: {
                    ind: v[0] if len(v) == 1 else v for ind, v in def_dic.items()
                }
            }
        if node.text:
            text = node.text.strip()
            if not children:
                voc_dict[node.tag] = text
        return voc_dict


def install_shims() -> None:
    """Register import shims for torchvision / skimage / tqdm / wandb so the
    reference modules import; idempotent."""
    try:
        import torchvision  # noqa: F401  (real one present: nothing to do)
        return
    except ImportError:
        pass
    class _AnyTransform:
        """Constructible stand-in for any transform class referenced at
        module import time (e.g. `datasets.py:37` builds a preprocessing
        pipeline on import); never applied by the parity tests."""

        def __init__(self, *a, **kw):
            pass

        def __call__(self, x):
            return x

    def _any_transform_getattr(name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _AnyTransform

    tv = _stub("torchvision")
    tvt = _stub("torchvision.transforms",
                InterpolationMode=_InterpolationMode,
                __getattr__=_any_transform_getattr)
    tvf = _stub("torchvision.transforms.functional",
                InterpolationMode=_InterpolationMode)
    v2 = _stub("torchvision.transforms.v2",
               __getattr__=_any_transform_getattr)
    tvd = _stub("torchvision.datasets", VOCDetection=ShimVOCDetection)
    tvm = _stub("torchvision.models")
    tv.transforms = tvt
    tv.datasets = tvd
    tv.models = tvm
    tvt.functional = tvf
    tvt.v2 = v2
    sk = _stub("skimage")
    sk.io = _stub("skimage.io")
    # captum / pytorch_grad_cam: class names imported at module top in
    # `explainations_evaluation_metrics.py:31-43`; only the numpy metric
    # code paths are under test, the attribution classes never run
    cap = _stub("captum")
    cap.attr = _stub("captum.attr", __getattr__=_any_transform_getattr)
    _stub("captum.attr._utils")
    _stub("captum.attr._utils.lrp_rules",
          __getattr__=_any_transform_getattr)
    pgc = _stub("pytorch_grad_cam", __getattr__=_any_transform_getattr)
    pgc.utils = _stub("pytorch_grad_cam.utils")
    _stub("pytorch_grad_cam.utils.model_targets",
          __getattr__=_any_transform_getattr)
    _stub("pytorch_grad_cam.utils.image",
          __getattr__=_any_transform_getattr)
    _stub("tqdm", tqdm=lambda it=None, **kw: it)
    # lost_performance_plot.py's stray imports (cv2, turtle) — turtle
    # would pull tkinter in headless CI; neither is used by the parsing
    # code under test
    _stub("cv2", __getattr__=_any_transform_getattr)
    _stub("turtle", title=None)
    _stub("wandb",
          init=lambda *a, **kw: None,
          log=lambda *a, **kw: None,
          finish=lambda *a, **kw: None,
          run=None)


def load_reference_module(name: str):
    """Import a module from /root/reference by name (with shims installed).

    The reference's modules use generic top-level names (utils, datasets,
    transforms, ...) and import each other by those names, so they are
    loaded under their plain names with /root/reference first on sys.path.
    Caveat: if the test process had already imported a DIFFERENT module
    under one of those names, sys.modules would shadow the reference —
    nothing in this repo does (the vipers package is namespaced), but keep
    parity-test dependencies namespaced too."""
    install_shims()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import importlib

    if name not in sys.modules:
        # `vision_transformer.py` and `vision_transformer_no_save.py` are
        # byte-identical copies that both register the same model names in
        # `_api.BUILTIN_MODELS` at import time; the reference never imports
        # both in one process, but the parity suite does (explanation
        # metrics pull the no_save copy). Let the second import overwrite
        # instead of raise — the builders are identical.
        try:
            api = importlib.import_module("_api")
            if not getattr(api.register_model, "_vipers_tolerant", False):
                def register_model(name=None, _api=api):
                    def wrapper(fn):
                        key = name if name is not None else fn.__name__
                        _api.BUILTIN_MODELS[key] = fn
                        return fn
                    return wrapper
                register_model._vipers_tolerant = True
                api.register_model = register_model
        except ImportError:
            pass
    return importlib.import_module(name)


@contextlib.contextmanager
def numpy1_percentile_compat():
    """numpy 2 removed the ``interpolation=`` kwarg the reference passes to
    ``np.percentile`` (`explainations_evaluation_metrics.py:344-346`);
    'linear' IS numpy's default method, so accepting-and-translating the
    kwarg preserves the reference's exact semantics on this numpy."""
    import numpy as np

    real = np.percentile

    def percentile(a, q, *args, interpolation=None, **kw):
        if interpolation is not None:
            kw["method"] = interpolation
        return real(a, q, *args, **kw)

    np.percentile = percentile
    try:
        yield
    finally:
        np.percentile = real


@contextlib.contextmanager
def redirect_scratch_io(target_dir: str):
    """Rewrite '/scratch/...' paths in builtins.open (and ensure mapped
    parent dirs exist) for reference scripts that hard-code /scratch
    artifact locations (`mvh_performance_plot.py:20`,
    `lost_performance_plot.py:146-229`). Non-/scratch paths untouched."""
    import builtins

    real_open = builtins.open
    real_makedirs = os.makedirs

    def _map(path):
        if isinstance(path, str) and path.startswith("/scratch/"):
            mapped = os.path.join(target_dir, path[len("/scratch/"):])
            real_makedirs(os.path.dirname(mapped), exist_ok=True)
            return mapped
        return path

    def patched_open(file, *a, **kw):
        return real_open(_map(file), *a, **kw)

    def patched_makedirs(name, *a, **kw):
        return real_makedirs(_map(name) if isinstance(name, str)
                             and name.startswith("/scratch/") else name,
                             *a, **kw)

    builtins.open = patched_open
    os.makedirs = patched_makedirs
    try:
        yield _map
    finally:
        builtins.open = real_open
        os.makedirs = real_makedirs


@contextlib.contextmanager
def redirect_scratch_saves(target_dir: str):
    """Rewrite '/scratch/...' paths in torch.save/torch.load to
    ``target_dir`` for the duration of the context (the sandbox forbids
    writing outside the repo/tmp)."""
    import torch

    os.makedirs(target_dir, exist_ok=True)
    real_save, real_load = torch.save, torch.load

    def _map(path):
        if isinstance(path, str) and path.startswith("/scratch/"):
            return os.path.join(target_dir, os.path.basename(path))
        return path

    def save(obj, f, *a, **kw):
        return real_save(obj, _map(f), *a, **kw)

    def load(f, *a, **kw):
        return real_load(_map(f), *a, **kw)

    torch.save, torch.load = save, load
    try:
        yield
    finally:
        torch.save, torch.load = real_save, real_load
