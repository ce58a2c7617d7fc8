"""Reference-in-the-loop parity: run `/root/reference`'s OWN code on the
same inputs vipers sees and assert identical results.

Unlike the oracle tests (numpy LOST oracle, hand-built torch modules),
these import and execute the reference's modules directly:

  * `object_discovery.lost` / `patch_scoring` / `detect_box`
    (`object_discovery.py:23-134`) on vipers-extracted features,
  * the `main_lost.py:399-499` ViT flow — the vendored
    `vision_transformer.VisionTransformer` forward with its `/scratch`
    qkv/attention dumps (redirected to a tmpdir), the inline
    reshape/permute qkv scramble-split, `interpolate_embeddings` — on
    weights EXPORTED from a vipers ViT,
  * `train.snip_pruning` (`train.py:241-319`) on the exported model,
    asserting bit-identical masks against `vipers.pruning.snip_prune`.

torchvision/skimage/tqdm/wandb are absent in this environment; import
shims live in ``reference_loader`` — they satisfy import statements only,
every asserted code path is the reference's own.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reference_loader import load_reference_module, redirect_scratch_saves  # noqa: E402

pytestmark = pytest.mark.slow

PATCH = 16
TINY = dict(num_layers=2, num_heads=4, hidden_dim=64, mlp_dim=128,
            num_classes=10)
BASE_SIZE = 96  # square base grid (6x6) so interpolate_embeddings works


# ---------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def tiny_pair():
    """A vipers tiny ViT + its weights exported to the torchvision state
    dict the reference's vendored `vision_transformer` loads."""
    from vipers.core.checkpoint import export_vit_torchvision
    from vipers.core.registry import ModelSpec
    from vipers.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(PATCH, TINY["num_layers"], TINY["num_heads"],
                    TINY["hidden_dim"], TINY["mlp_dim"], TINY["num_classes"])
    module = VisionTransformer(cfg=cfg, image_size=(BASE_SIZE, BASE_SIZE))
    variables = module.init(
        jax.random.PRNGKey(3), jnp.zeros((1, BASE_SIZE, BASE_SIZE, 3)),
        train=False,
    )
    spec = ModelSpec(
        name="vit_tiny_test", module=module,
        input_size=(BASE_SIZE, BASE_SIZE), num_classes=TINY["num_classes"],
        prune_exclude=("qkv",), patch_size=PATCH, family="vit",
        extra={"num_heads": TINY["num_heads"],
               "hidden_dim": TINY["hidden_dim"],
               "num_layers": TINY["num_layers"]},
    )
    sd = export_vit_torchvision(variables["params"])
    return spec, variables, sd


def _ref_model_for(sd, image_hw):
    """The reference's per-image model construction
    (`main_lost.py:58-100` interpolate_vit, minus the pretrained
    download): vendored VisionTransformer at the padded image size,
    embeddings interpolated from the base state dict with the reference's
    own `interpolate_embeddings`."""
    import torch
    from collections import OrderedDict

    vt = load_reference_module("vision_transformer")
    model = vt.VisionTransformer(
        image_size=tuple(image_hw), patch_size=PATCH, **TINY
    )
    base_sd = OrderedDict(
        (k, torch.tensor(np.asarray(v))) for k, v in sd.items()
    )
    new_sd = vt.interpolate_embeddings(tuple(image_hw), PATCH, base_sd)
    model.load_state_dict(new_sd)
    model.eval()
    return model


def _ref_vit_features(model, img_chw, tmpdir, which="k"):
    """The `main_lost.py:439-499` extraction flow, verbatim semantics:
    forward (the vendored EncoderBlock torch.saves the last block's
    ln_1 output x3 and attention probs), load the dumps, reshape/permute
    scramble-split, pick the modality, drop CLS."""
    import torch

    with torch.no_grad(), redirect_scratch_saves(tmpdir):
        _pred = model(img_chw[None, :, :, :])
        attentions = torch.load("/scratch/attention_vit.pt")
        feat_out_qkv = torch.load("/scratch/qkv_vit.pt")
    nb_im = attentions.shape[0]
    nh = attentions.shape[1]
    nb_tokens = attentions.shape[2]
    qkv = (
        feat_out_qkv
        .reshape(nb_im, nb_tokens, 3, nh, -1 // nh)
        .permute(2, 0, 3, 1, 4)
    )
    q, k, v = qkv[0], qkv[1], qkv[2]
    k = k.transpose(1, 2).reshape(nb_im, nb_tokens, -1)
    q = q.transpose(1, 2).reshape(nb_im, nb_tokens, -1)
    v = v.transpose(1, 2).reshape(nb_im, nb_tokens, -1)
    feats = {"k": k, "q": q, "v": v}[which][:, 1:, :]
    return feats, {"k": k, "q": q, "v": v}, attentions


def _padded_voc_images(voc_root):
    """Decode + tier-1 pad every synthetic VOC image exactly like the
    product path (`discovery/driver._prefetch_decoded`)."""
    from vipers.data.detection import DiscoveryDataset, load_image_normalized

    ds = DiscoveryDataset("VOC07", "trainval", voc_root, no_hard=False)
    out = []
    for path, im_name in ds:
        img = load_image_normalized(path)
        init_size = (3, img.shape[0], img.shape[1])
        ph = int(np.ceil(img.shape[0] / PATCH) * PATCH)
        pw = int(np.ceil(img.shape[1] / PATCH) * PATCH)
        padded = np.zeros((ph, pw, 3), np.float32)
        padded[: img.shape[0], : img.shape[1]] = img
        gt, _cls = ds.extract_gt(im_name)
        out.append((im_name, padded, init_size, gt))
    return out


@pytest.fixture(scope="module")
def synthetic_voc(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("voc_refpar")
    (root / "JPEGImages").mkdir()
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(3):
        h, w = 80 + 16 * i, 112
        arr = rng.integers(0, 60, size=(h, w, 3), dtype=np.uint8)
        y0, x0 = 12 + 8 * i, 24
        arr[y0: y0 + 40, x0: x0 + 48] = 220
        name = f"im{i:03d}"
        names.append(name)
        Image.fromarray(arr).save(root / "JPEGImages" / f"{name}.jpg")
        (root / "Annotations" / f"{name}.xml").write_text(
            f"""<annotation><filename>{name}.jpg</filename>
<size><width>{w}</width><height>{h}</height><depth>3</depth></size>
<object><name>thing</name><truncated>0</truncated><difficult>0</difficult>
<bndbox><xmin>{x0 + 1}</xmin><ymin>{y0 + 1}</ymin><xmax>{x0 + 48}</xmax><ymax>{y0 + 40}</ymax></bndbox>
</object></annotation>""")
    (root / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(names))
    return str(root)


# ------------------------------------------------------------------ tests

def _assert_lost_parity(od, feats, dims, valid_dims, scales, init_size,
                        k_patches=30):
    """Run the reference's `lost` and vipers' on the SAME features and
    assert parity. Patch scores are integer degree counts, so ties are
    intrinsic — and the reference breaks them with torch.argsort's
    UNSTABLE introsort (`object_discovery.py:89`), an implementation
    artifact no independent implementation can reproduce. Parity contract:

      * scores and affinity identical,
      * both seeds belong to the same (maximal-score) tie class,
      * the reference's own `detect_box` run on vipers' seed + mass map
        reproduces vipers' box bit-for-bit,
      * when the tie break happens to coincide, the full boxes match.

    Returns (ref_pred, vip_pred, seeds_equal) — preds are None when that
    side raised seed-in-background."""
    import torch

    from vipers.discovery.lost import box_feat_to_image, lost_core

    tfeats = torch.tensor(np.asarray(feats, np.float32))
    ref_err = None
    try:
        ref_pred, ref_A, ref_scores, ref_seed = od.lost(
            tfeats, dims, scales, init_size, k_patches=k_patches
        )
    except ValueError as e:
        ref_err, ref_pred = str(e), None

    out = lost_core(
        jnp.asarray(feats)[0],
        jnp.asarray([valid_dims[0], valid_dims[1]], jnp.int32),
        grid_hw=(int(dims[0]), int(dims[1])), k_patches=k_patches,
    )
    vip_seed = int(out["seed"])
    vip_bg = bool(out["seed_in_background"])
    vip_pred = (
        None if vip_bg
        else box_feat_to_image(out["box_feat"], scales, init_size)
    )

    if ref_err is not None:
        # the reference raised inside detect_box, before returning A/scores;
        # a tie-divergent seed can legitimately land one side in the
        # background — nothing further to compare on this input
        return None, vip_pred, vip_pred is None
    # scores + affinity: exact / tight parity regardless of tie breaks
    np.testing.assert_allclose(
        np.asarray(out["affinity"]), ref_A.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(out["scores"]),
                                  ref_scores.numpy())
    assert (np.asarray(out["scores"])[vip_seed]
            == ref_scores.numpy()[int(ref_seed)]), "seeds not tied"
    # the reference's detect_box on vipers' seed + mass map must rebuild
    # vipers' box exactly (when vipers found one)
    if vip_pred is not None:
        ref_box2, _feat_box = od.detect_box(
            torch.tensor(np.asarray(out["mass"], np.float32)),
            torch.tensor(vip_seed), dims, scales=scales,
            initial_im_size=init_size[1:],
        )
        np.testing.assert_array_equal(np.asarray(ref_box2, np.float64),
                                      np.asarray(vip_pred, np.float64))
    seeds_equal = ref_err is None and not vip_bg and int(ref_seed) == vip_seed
    if seeds_equal:
        np.testing.assert_array_equal(np.asarray(ref_pred),
                                      np.asarray(vip_pred))
    return ref_pred, vip_pred, seeds_equal


def test_lost_and_detect_box_reference_in_loop(tiny_pair, synthetic_voc):
    """`object_discovery.lost`/`detect_box` run on the features vipers
    extracts must agree with `vipers.discovery.lost` (up to torch's
    unstable-sort tie break, see `_assert_lost_parity`)."""
    od = load_reference_module("object_discovery")
    from vipers.discovery.driver import LostFeatureExtractor

    spec, variables, _sd = tiny_pair
    jax.config.update("jax_default_matmul_precision", "float32")
    try:
        extractor = LostFeatureExtractor(spec, variables, arch="vit",
                                         which_features="k", bucket=1)
        compared = 0
        for im_name, padded, init_size, _gt in _padded_voc_images(synthetic_voc):
            feats, dims, valid_dims, scales, _ = extractor.extract(padded, PATCH)
            ref_pred, vip_pred, _ = _assert_lost_parity(
                od, feats, dims, valid_dims, scales, init_size
            )
            compared += vip_pred is not None
        assert compared >= 1, "every image raised seed-in-background"

        # tie-free input: full bit-parity including seed and box
        rng = np.random.default_rng(1)
        noise = rng.normal(size=(80, 112, 3)).astype(np.float32)
        feats, dims, valid_dims, scales, _ = extractor.extract(noise, PATCH)
        _, _, seeds_equal = _assert_lost_parity(
            od, feats, dims, valid_dims, scales, (3, 80, 112)
        )
        assert seeds_equal
    finally:
        jax.config.update("jax_default_matmul_precision", None)


def test_main_lost_vit_flow_reference_in_loop(tiny_pair, synthetic_voc,
                                              tmp_path):
    """The `main_lost.py:399-499` flow — vendored ViT forward on EXPORTED
    vipers weights, /scratch dump, qkv scramble-split, reference `lost` —
    must agree with the vipers extractor pipeline: same qkv dump, same
    k/q/v, same boxes, same CorLoc."""
    import torch

    od = load_reference_module("object_discovery")
    ds_mod = load_reference_module("datasets")
    from vipers.discovery.corloc import CorLocAccumulator
    from vipers.discovery.driver import LostFeatureExtractor

    spec, variables, sd = tiny_pair
    jax.config.update("jax_default_matmul_precision", "float32")
    try:
        extractors = {
            which: LostFeatureExtractor(spec, variables, arch="vit",
                                        which_features=which, bucket=1,
                                        need_attn=(which == "k"))
            for which in ("k", "q", "v")
        }
        ref_hits = []
        corloc_vip = CorLocAccumulator()
        all_seeds_equal = True
        for im_name, padded, init_size, gt in _padded_voc_images(synthetic_voc):
            H, W = padded.shape[:2]
            # ---- reference side: their model, their dump, their lost
            model = _ref_model_for(sd, (H, W))
            img_chw = torch.tensor(padded.transpose(2, 0, 1))
            ref_feats, ref_kqv, ref_attn = _ref_vit_features(
                model, img_chw, str(tmp_path / "scratch"), which="k"
            )
            w_featmap, h_featmap = H // PATCH, W // PATCH
            scales = [PATCH, PATCH]
            # full reference flow end-to-end (their model, their dump,
            # their lost) must execute and yield a well-formed box
            try:
                ref_pred, _, _, _ = od.lost(
                    ref_feats, (w_featmap, h_featmap), scales, init_size,
                    k_patches=30,
                )
                assert np.asarray(ref_pred).shape == (4,)
            except ValueError:
                ref_pred = None

            # ---- vipers side: product extractors, every modality
            feats, attn_k = {}, None
            for which, ex in extractors.items():
                f, dims, valid_dims, vscales, attn = ex.extract(padded, PATCH)
                feats[which] = f
                if which == "k":
                    attn_k = attn
                # reference keeps CLS in k/q/v and drops it at modality
                # selection (`main_lost.py:489-499`) — ours comes CLS-less
                np.testing.assert_allclose(
                    np.asarray(f, np.float32),
                    ref_kqv[which][:, 1:, :].numpy(),
                    rtol=2e-4, atol=2e-4, err_msg=f"modality {which}",
                )
            np.testing.assert_allclose(
                np.asarray(attn_k, np.float32)[0], ref_attn[0].numpy(),
                rtol=2e-4, atol=2e-4,
            )
            # full LOST parity on the same features (tie-aware)
            ref_pred2, vip_pred, seeds_equal = _assert_lost_parity(
                od, feats["k"], dims, valid_dims, vscales, init_size
            )
            all_seeds_equal = all_seeds_equal and seeds_equal
            if ref_pred2 is not None:
                # CorLoc hit judged by the reference's own bbox_iou
                ref_hits.append(ds_mod.bbox_iou(
                    torch.from_numpy(np.asarray(ref_pred2, np.float64)),
                    torch.from_numpy(np.asarray(gt, np.float64)),
                ).max().item() >= 0.5)
            if vip_pred is not None:
                corloc_vip.add(im_name, vip_pred, gt)
        assert corloc_vip.count >= 1, "every image raised seed-in-background"
        if all_seeds_equal and ref_hits:
            # tie breaks coincided everywhere: CorLoc computed with the
            # reference's own bbox_iou must equal ours
            ref_corloc = 100.0 * sum(ref_hits) / len(ref_hits)
            assert ref_corloc == pytest.approx(corloc_vip.corloc)
    finally:
        jax.config.update("jax_default_matmul_precision", None)


def test_dino_seg_reference_in_loop(tiny_pair, synthetic_voc):
    """`object_discovery.dino_seg` run on the attention maps vipers
    extracts must produce the same box as `vipers.discovery.lost.dino_seg
    (reference_bugs=True)` — including the reference's component-id
    off-by-ones."""
    import torch

    od = load_reference_module("object_discovery")
    from vipers.discovery.driver import LostFeatureExtractor
    from vipers.discovery.lost import dino_seg as vipers_dino_seg

    spec, variables, _sd = tiny_pair
    extractor = LostFeatureExtractor(spec, variables, arch="vit",
                                     which_features="k", bucket=1,
                                     need_attn=True)
    compared = 0
    for _im, padded, _init, _gt in _padded_voc_images(synthetic_voc):
        _f, dims, _vd, _s, attn = extractor.extract(padded, PATCH)
        t_attn = torch.tensor(np.asarray(attn, np.float32))
        for head in range(TINY["num_heads"]):
            ref_box = od.dino_seg(t_attn, dims, PATCH, head=head)
            vip_box = vipers_dino_seg(attn, dims, PATCH, head=head,
                                      reference_bugs=True)
            assert [int(v) for v in ref_box] == [int(v) for v in vip_box], (
                head, ref_box, vip_box
            )
            compared += 1
    assert compared >= 4


def test_snip_pruning_reference_in_loop(tiny_pair):
    """`train.snip_pruning` (`train.py:241-319`) on the exported torch
    model vs `vipers.pruning.snip_prune` on the same weights and batch:
    bit-identical masks (float64 both sides so conv/matmul grads agree to
    ~1e-13 and the k-th-smallest threshold selects the same set)."""
    import torch
    import torch.nn as nn

    tr = load_reference_module("train")
    from vipers.core.checkpoint import (
        import_vit_torchvision, normalize_torch_state_dict,
    )
    from vipers.pruning.snip import snip_prune

    spec, variables, sd = tiny_pair
    rng = np.random.default_rng(5)
    images = rng.normal(size=(4, BASE_SIZE, BASE_SIZE, 3)).astype(np.float64)
    labels = rng.integers(0, TINY["num_classes"], size=(4,))
    target_sparsity = 0.6

    # ---- reference side (torch f64)
    model = _ref_model_for(sd, (BASE_SIZE, BASE_SIZE)).double()
    model_input = torch.tensor(images.transpose(0, 3, 1, 2))
    loader = [(model_input, torch.tensor(labels))]
    with redirect_scratch_saves("/tmp/vipers_snip_scratch"):
        tr.snip_pruning(model, loader, "cpu", nn.CrossEntropyLoss(),
                        target_sparsity=target_sparsity)
    ref_sd = normalize_torch_state_dict(model.state_dict())
    _params, ref_masks = import_vit_torchvision(ref_sd, TINY["num_layers"])
    ref_masks = {k: np.asarray(v, bool) for k, v in ref_masks.items()}

    # ---- vipers side (jax f64)
    jax.config.update("jax_enable_x64", True)
    try:
        params64 = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a, np.float64)),
            jax.device_get(variables["params"]),
        )

        def loss_fn(params, batch):
            imgs, labs = batch
            logits, _aux = spec.module.apply(
                {"params": params}, imgs, train=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            # plain-mean CE, torch nn.CrossEntropyLoss semantics, kept in
            # f64 end to end (vipers' cross_entropy helper pins f32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(logp[jnp.arange(labs.shape[0]), labs])

        masks = snip_prune(
            loss_fn, params64,
            (jnp.asarray(images), jnp.asarray(labels, jnp.int64)),
            target_sparsity, exclude=spec.prune_exclude,
        )
        masks = {k: np.asarray(v, bool) for k, v in masks.items()}
    finally:
        jax.config.update("jax_enable_x64", False)

    assert set(masks) == set(ref_masks), (
        set(masks) ^ set(ref_masks)
    )
    for path in sorted(masks):
        np.testing.assert_array_equal(
            masks[path], ref_masks[path],
            err_msg=f"mask mismatch at {path}",
        )
    # global sparsity matches the reference's k = int(N * s) contract
    total = sum(m.size for m in masks.values())
    pruned = sum(int((~m).sum()) for m in masks.values())
    assert pruned == int(total * target_sparsity)


def test_vit_attention_map_reference_in_loop(monkeypatch):
    """The reference's own `vit_attention_map`
    (`explainations_evaluation_metrics.py:395-427`: per-head reshape,
    x-patch bilinear upsample, head sum, bilinear resize to the image)
    agrees with `vipers.explain.vit_attention_heatmap` on the SAME
    attention tensor — at a non-16 patch size, exercising the true
    upsample factor (bilinear-of-bilinear is not scale-invariant).
    Square image: the reference swaps (H, W) in its final resize size."""
    import torch

    from vipers.explain.gradcam import vit_attention_heatmap

    eem = load_reference_module("explainations_evaluation_metrics")

    nh, gh, gw, p = 3, 2, 2, 32
    t = gh * gw + 1
    attn = np.random.default_rng(7).random((1, nh, t, t)).astype(np.float32)
    side = gh * p
    image = torch.zeros((3, side, side))

    # the reference reads its /scratch attention dump via torch.load;
    # hand it the attention vipers' forward returns
    monkeypatch.setattr(torch, "load",
                        lambda *a, **kw: torch.from_numpy(attn.copy()))
    ref = eem.vit_attention_map(lambda x: None, image, p, "cpu")

    ours = vit_attention_heatmap(
        jnp.asarray(attn), (gh, gw), (side, side), patch_size=p
    )
    np.testing.assert_allclose(
        np.asarray(ref), ours, rtol=1e-4, atol=1e-5
    )
