"""GradCAM / Guided-GradCAM / ViT attention heatmaps, all native JAX.

Replaces pytorch_grad_cam (`/root/reference/explain.py:485-513`) and Captum
GuidedGradCam (`:446-473`) with pure functions:

  * GradCAM: activations A at a tap layer and gradients G = d(score)/dA —
    obtained with one ``jax.grad`` wrt the model's ``tap_delta`` argument
    (a zeros array added to the target activation; see models) — weights =
    spatial mean of G, cam = relu(sum_c w_c A_c), min-max normalized and
    bilinearly resized to the input (pytorch_grad_cam's scale_cam_image).
  * Guided-GradCAM: guided-backprop input gradients (custom_vjp ReLU via
    ``models.activations.guided_backprop``) x upsampled non-negative
    layer-gradcam (Captum semantics).
  * ViT attention heatmap: last block CLS attention, head-summed, bilinear
    upsample (`/root/reference/explain.py:400-443`, with that function's
    H/W-swap bug fixed — we resize to (H, W), not (W, H)).

Target class = the model's own argmax prediction, like every reference
wrapper (`explain.py:455-461,500-505,566-570`).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vipers.models.activations import guided_backprop


def _resize_bilinear(img, out_hw):
    """(H, W) or (H, W, C) bilinear resize (half-pixel centers, matching
    cv2/torch align_corners=False used by pytorch_grad_cam)."""
    if img.ndim == 2:
        return jax.image.resize(img, out_hw, "bilinear")
    return jax.image.resize(img, (*out_hw, img.shape[-1]), "bilinear")


def _minmax(x, eps=1e-7):
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / (hi - lo + eps)


def make_gradcam(
    model_apply: Callable,
    variables,
    tap_shape: Tuple[int, ...],
    token_grid: Optional[Tuple[int, int]] = None,
    aux_key: str = "features",
):
    """``model_apply(variables, x, train, tap_delta) -> (logits, aux)`` with
    the tap activation in ``aux[aux_key]``; ``tap_shape`` is its shape.

    For CNNs the tap is (1, H', W', C); for ViTs it is (1, T, D) and
    ``token_grid`` reshapes tokens (minus CLS) to a grid — the reference's
    reshape_transform (`explainations_evaluation_metrics.py:931-952`).
    Returns jitted fn(x) -> (cam (H, W) in [0,1], predicted_class).
    One forward + one backward, all fused under jit.
    """

    def score_fn(x, tap_delta):
        logits, aux = model_apply(variables, x, train=False, tap_delta=tap_delta)
        target = jnp.argmax(logits[0])
        return logits[0, target], (aux[aux_key], target)

    @jax.jit
    def cam_fn(x):
        zeros = jnp.zeros(tap_shape, jnp.float32)
        # The tap contributes additively, so A = aux activation at zero
        # delta and G = dS/dA = grad wrt the delta.
        (_score, (A, target)), G = jax.value_and_grad(
            score_fn, argnums=1, has_aux=True
        )(x, zeros)
        if token_grid is not None:
            gh, gw = token_grid
            A = A[:, 1:, :].reshape(1, gh, gw, -1)
            G = G[:, 1:, :].reshape(1, gh, gw, -1)
        w = jnp.mean(G, axis=(1, 2), keepdims=True)  # GAP over spatial
        cam = jnp.sum(w * A, axis=-1)[0]
        cam = jnp.maximum(cam, 0.0)
        cam = _minmax(cam)
        cam = _resize_bilinear(cam, x.shape[1:3])
        cam = _minmax(cam)  # pytorch_grad_cam normalizes after scaling too
        return cam, target

    return cam_fn


def gradcam(model_apply, variables, x, tap_shape, token_grid=None,
            aux_key: str = "features"):
    """One-call GradCAM; returns (cam np (H, W), predicted class)."""
    fn = make_gradcam(model_apply, variables, tap_shape, token_grid, aux_key)
    cam, target = fn(x)
    return np.asarray(cam), int(target)


def guided_backprop_attr(model_apply, variables, x, target=None):
    """Guided-backprop input attribution (Captum GBP): input gradient with
    all ReLUs rewritten to pass only positive grads at positive inputs."""
    with guided_backprop():
        def score(xx):
            logits, _ = model_apply(variables, xx, train=False)
            t = jnp.argmax(logits[0]) if target is None else target
            return logits[0, t]

        g = jax.grad(score)(x)  # traced inside the guided context
    return np.asarray(g)


def guided_gradcam(model_apply, variables, x, tap_shape, token_grid=None,
                   aux_key: str = "features"):
    """Captum GuidedGradCam: elementwise product of the (upsampled,
    non-negative) layer GradCAM with the guided-backprop gradients."""
    cam, target = gradcam(model_apply, variables, x, tap_shape, token_grid, aux_key)
    gbp = guided_backprop_attr(model_apply, variables, x, target=target)
    return gbp * cam[None, :, :, None], target


def vit_attention_heatmap(attn, grid_hw, out_hw, patch_size: int):
    """Head-summed CLS attention upsampled to the image
    (`/root/reference/explain.py:400-443`,
    `explainations_evaluation_metrics.py:395-427`): attn (1, nh, T, T) ->
    (H, W) float map. The intermediate per-head upsample is x``patch_size``
    like the reference (bilinear-of-bilinear is not scale-invariant, so
    p=8/32 models need the true factor for parity)."""
    gh, gw = grid_hw
    nh = attn.shape[1]
    cls_rows = attn[0, :, 0, 1:]  # (nh, T-1)
    grid = cls_rows.reshape(nh, gh, gw)
    up = jax.image.resize(
        grid, (nh, gh * patch_size, gw * patch_size), "bilinear"
    )
    summed = jnp.sum(up, axis=0)
    return np.asarray(_resize_bilinear(summed, out_hw))
