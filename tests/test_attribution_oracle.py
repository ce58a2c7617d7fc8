"""Torch-in-loop attribution oracles (round-4 VERDICT item 7).

The reference's explainability stack is Captum + pytorch_grad_cam driven by
torch autograd (`/root/reference/explain.py:446-513` GradCAM/GuidedGradCam,
`:552-578` IntegratedGradients/NoiseTunnel, `:400-443` ViT attention maps).
vipers' parity for these previously rested on self-consistency (IG
completeness axiom, shape/property tests).  Here we close the loop the same
way LOST/SNIP were closed: build the EXACT algorithms in torch (20-line
oracles, faithful to the pytorch_grad_cam / Captum math the reference
calls), run them on torch models whose weights are exported into vipers via
the real `.pth` importer, and assert the attribution MAPS match numerically.

Oracles implemented:
  * GradCAM on a ViT (tap = last block ln_1 output, the reference's
    qkv-dump layer) and on ResNet-50 (tap = layer4 feature map) —
    pytorch_grad_cam semantics: weights = GAP(dS/dA), cam = relu(sum w*A),
    min-max normalize, bilinear upsample (align_corners=False), normalize
    again (scale_cam_image).
  * Integrated Gradients on the ViT — Captum defaults: zeros baseline,
    n_steps Gauss-Legendre nodes rescaled to [0,1], attribution =
    (x - 0) * sum_i w_i grad(f_target)(a_i * x).
  * ViT attention heatmap — the reference's exact interpolate chain
    (`explain.py:400-443`): per-head bilinear x patch_size, head sum,
    bilinear resize to the image.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from tests.test_full_model_parity import (_TorchResNet50, _TorchViT,
                                          _tv_resnet_sd)
from vipers.core.checkpoint import import_torch_checkpoint, to_jax

EPS = 1e-7  # pytorch_grad_cam scale_cam_image eps; vipers _minmax matches


def _minmax_t(x):
    return (x - x.min()) / (x.max() - x.min() + EPS)


def _torch_gradcam(act, grad, out_hw, channel_last=False):
    """pytorch_grad_cam core on captured (activation, gradient) pairs."""
    if not channel_last:  # (1, C, H, W) -> (1, H, W, C)
        act = act.permute(0, 2, 3, 1)
        grad = grad.permute(0, 2, 3, 1)
    w = grad.mean(dim=(1, 2), keepdim=True)
    cam = torch.relu((w * act).sum(-1))[0]
    cam = _minmax_t(cam)
    cam = F.interpolate(cam[None, None], size=out_hw, mode="bilinear",
                        align_corners=False)[0, 0]
    return _minmax_t(cam).numpy()


# ------------------------------ ViT -----------------------------------------


def _vit_pair(seed=0, grid=3, patch=4, d=16, layers=2, heads=2, mlp=32,
              classes=5):
    torch.manual_seed(seed)
    tv = _TorchViT(patch=patch, layers=layers, heads=heads, d=d, mlp=mlp,
                   classes=classes, grid=grid).eval()
    params, _bs, _masks = import_torch_checkpoint(
        tv.tv_state_dict(), "vit_b_16", num_layers=layers)
    from vipers.models.vit import ViTConfig, VisionTransformer

    module = VisionTransformer(
        cfg=ViTConfig(patch_size=patch, num_layers=layers, num_heads=heads,
                      hidden_dim=d, mlp_dim=mlp, num_classes=classes),
        image_size=(grid * patch, grid * patch),
    )
    variables = {"params": to_jax(params)}
    return tv, module, variables


def test_vit_gradcam_matches_torch_oracle():
    grid, patch = 3, 4
    tv, module, variables = _vit_pair(grid=grid, patch=patch)
    x_t = torch.randn(1, 3, grid * patch, grid * patch,
                      generator=torch.Generator().manual_seed(7))

    # torch oracle: tap the last block's ln_1 output (the layer the
    # reference feeds pytorch_grad_cam for its qkv-dump ViTs)
    cap = {}
    blk = tv.encoder.layers[-1]

    def hook(_m, _i, out):
        out.retain_grad()
        cap["a"] = out

    h = blk.ln_1.register_forward_hook(hook)
    logits = tv(x_t)
    target = int(logits[0].argmax())
    logits[0, target].backward()
    h.remove()
    A = cap["a"].detach()[:, 1:, :].reshape(1, grid, grid, -1)
    G = cap["a"].grad[:, 1:, :].reshape(1, grid, grid, -1)
    want = _torch_gradcam(A, G, x_t.shape[2:], channel_last=True)

    from vipers.explain.gradcam import gradcam

    def apply_fn(vs, xx, train=False, tap_delta=None):
        return module.apply(vs, xx, train=train, tap_delta=tap_delta)

    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    cam, pred = gradcam(apply_fn, variables, x_j,
                        tap_shape=(1, grid * grid + 1, 16),
                        token_grid=(grid, grid), aux_key="qkv_input")
    assert pred == target
    np.testing.assert_allclose(cam, want, atol=2e-5, rtol=1e-4)


def test_vit_integrated_gradients_matches_torch_oracle():
    grid, patch = 3, 4
    tv, module, variables = _vit_pair(seed=1, grid=grid, patch=patch)
    x_t = torch.randn(1, 3, grid * patch, grid * patch,
                      generator=torch.Generator().manual_seed(11))
    with torch.no_grad():
        target = int(tv(x_t)[0].argmax())

    # torch oracle: Captum IG, gausslegendre nodes on [0,1], zeros baseline
    n_steps = 16
    xs, ws = np.polynomial.legendre.leggauss(n_steps)
    alphas = (0.5 * (xs + 1)).astype(np.float32)
    weights = (0.5 * ws).astype(np.float32)
    total = torch.zeros_like(x_t)
    for a, w in zip(alphas, weights):
        xi = (float(a) * x_t).detach().requires_grad_(True)
        tv.zero_grad()
        tv(xi)[0, target].backward()
        total += float(w) * xi.grad
    want = (x_t * total).detach().numpy()

    from vipers.explain.attribution import integrated_gradients

    def score(xx, t):
        logits, _aux = module.apply(variables, xx, train=False)
        return logits[0, t]

    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    got = integrated_gradients(score, x_j, jnp.asarray(target),
                               n_steps=n_steps)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=2e-4)


def test_vit_attention_heatmap_matches_reference_chain():
    grid, patch = 3, 4
    tv, module, variables = _vit_pair(seed=2, grid=grid, patch=patch)
    x_t = torch.randn(1, 3, grid * patch, grid * patch,
                      generator=torch.Generator().manual_seed(13))

    # capture the torch MHA attention weights of the last block
    cap = {}
    blk = tv.encoder.layers[-1]

    def hook(_m, _i, out):
        cap["attn"] = out[1].detach()  # (1, nh, T, T)

    h = blk.self_attention.register_forward_hook(hook)
    with torch.no_grad():
        tv(x_t)
    h.remove()

    # torch oracle: the reference's exact interpolate chain
    # (`/root/reference/explain.py:436-441`)
    nh = cap["attn"].shape[1]
    a = cap["attn"][0, :, 0, 1:].reshape(nh, grid, grid)
    a = F.interpolate(a[None], scale_factor=patch, mode="bilinear")[0]
    a = a.sum(0)
    out_hw = (x_t.shape[2], x_t.shape[3])
    want = F.interpolate(a[None, None], size=out_hw, mode="bilinear",
                         align_corners=False)[0, 0].numpy()

    from vipers.explain.gradcam import vit_attention_heatmap

    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    _logits, aux = module.apply(variables, x_j, train=False)
    got = vit_attention_heatmap(aux["attn"], (grid, grid), out_hw, patch)
    # the torch MHA softmax vs vipers einsum agree to full-model-parity
    # tolerance; the interpolate chain itself is exact
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


# ----------------------------- ResNet-50 ------------------------------------


def test_resnet_gradcam_matches_torch_oracle():
    torch.manual_seed(3)
    tv = _TorchResNet50(rswd=(False, False, False), classes=7).eval()
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    x_t = torch.randn(1, 3, 64, 64,
                      generator=torch.Generator().manual_seed(17))

    cap = {}

    def hook(_m, _i, out):
        out.retain_grad()
        cap["a"] = out

    h = tv.layer4.register_forward_hook(hook)
    logits = tv(x_t)
    target = int(logits[0].argmax())
    logits[0, target].backward()
    h.remove()
    want = _torch_gradcam(cap["a"].detach(), cap["a"].grad, x_t.shape[2:])

    params, bstats, _ = import_torch_checkpoint(_tv_resnet_sd(tv), "resnet50")
    from vipers.core.registry import build_model

    spec = build_model("resnet50", num_classes=7)
    variables = {"params": to_jax(params), "batch_stats": to_jax(bstats)}

    from vipers.explain.gradcam import gradcam

    def apply_fn(vs, xx, train=False, tap_delta=None):
        return spec.module.apply(vs, xx, train=train, tap_delta=tap_delta)

    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    cam, pred = gradcam(apply_fn, variables, x_j,
                        tap_shape=(1, 2, 2, 2048), aux_key="features")
    assert pred == target
    # BN-heavy f32 path: full-model forward parity is ~1e-3; the doubly
    # min-max-normalized cam inherits that scale
    np.testing.assert_allclose(cam, want, atol=2e-3, rtol=1e-2)
