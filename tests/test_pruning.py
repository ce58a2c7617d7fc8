"""Pruning-math parity tests, with torch.nn.utils.prune as the oracle.

SURVEY.md §4.1: SNIP threshold/mask selection (train.py:294-317), magnitude
pruning (train.py:322-344 == torch global_unstructured), sparsity accounting
(train.py:347-369), masked-training weights-stay-zero invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn as tnn
import torch.nn.utils.prune as tprune

from vipers.pruning import (
    apply_masks,
    compute_sparsity_global,
    init_masks,
    magnitude_prune,
    masked_updates,
    prunable_paths,
    snip_prune,
)
from vipers.pruning.masked_optim import mask_gradients
from vipers.pruning.snip import snip_threshold


def _params(rng):
    return {
        "conv": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32)),
                 "bias": jnp.zeros((8,))},
        "dense": {"kernel": jnp.asarray(rng.normal(size=(32, 10)).astype(np.float32)),
                  "bias": jnp.zeros((10,))},
        "norm": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
    }


def test_prunable_paths_selects_kernels_only(rng):
    p = _params(rng)
    paths = prunable_paths(p)
    assert paths == [("conv", "kernel"), ("dense", "kernel")]
    assert prunable_paths(p, exclude=("dense",)) == [("conv", "kernel")]


def test_apply_masks_zeroes(rng):
    p = _params(rng)
    masks = init_masks(p)
    masks[("conv", "kernel")] = masks[("conv", "kernel")].at[0, 0, 0, 0].set(False)
    out = apply_masks(p, masks)
    assert out["conv"]["kernel"][0, 0, 0, 0] == 0.0
    assert jnp.array_equal(out["dense"]["kernel"], p["dense"]["kernel"])


def test_snip_threshold_matches_reference_semantics(rng):
    # Reference: k = int(N*s); thr = sorted[k-1]; mask = score > thr.
    scores = rng.normal(size=301).astype(np.float32) ** 2
    sal = {("a", "kernel"): jnp.asarray(scores)}
    for s in (0.0, 0.3, 0.9, 1.0):
        thr = snip_threshold(sal, s)
        k = int(scores.size * s)
        if k >= scores.size:
            assert np.isinf(float(thr))
        elif k <= 0:
            assert float(thr) == -1.0
        else:
            assert float(thr) == pytest.approx(np.sort(scores)[k - 1], abs=0)
        mask = scores > float(thr)
        # pruned count == k exactly when no ties (random floats)
        if 0 < k < scores.size:
            assert (~mask).sum() == k


def test_snip_mask_bitmatch_torch():
    """Same weights+grads => bit-identical masks vs the reference algorithm
    run in torch (train.py:241-319)."""
    torch.manual_seed(0)
    tconv = tnn.Conv2d(2, 4, 3, bias=False)
    tfc = tnn.Linear(16, 5, bias=False)
    x = torch.randn(4, 2, 8, 8)
    y = torch.randint(0, 5, (4,))

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv = tconv
            self.fc = tfc

        def forward(self, x):
            h = torch.relu(self.conv(x))
            h = torch.nn.functional.adaptive_avg_pool2d(h, 2).flatten(1)
            return self.fc(h)

    net = Net()
    crit = tnn.CrossEntropyLoss()
    net.zero_grad()
    crit(net(x), y).backward()
    target = 0.6
    scores = {
        "conv": (tconv.weight.abs() * tconv.weight.grad.abs()).detach(),
        "fc": (tfc.weight.abs() * tfc.weight.grad.abs()).detach(),
    }
    allv = torch.cat([scores["conv"].reshape(-1), scores["fc"].reshape(-1)])
    k = int(allv.numel() * target)
    thr = torch.sort(allv).values[k - 1].item()
    t_masks = {n: (s > thr).numpy() for n, s in scores.items()}

    # Our side: same weights in a jax model with identical forward math.
    wc = jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0))  # OIHW->HWIO
    wf = jnp.asarray(tfc.weight.detach().numpy().T)
    params = {"conv": {"kernel": wc}, "fc": {"kernel": wf}}
    xb = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    yb = jnp.asarray(y.numpy())

    def loss_fn(p, batch):
        xi, yi = batch
        h = jax.lax.conv_general_dilated(
            xi, p["conv"]["kernel"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h)
        # adaptive_avg_pool2d(h, 2) on 6x6 -> mean over 3x3 windows
        n, hh, ww, c = h.shape
        h = h.reshape(n, 2, hh // 2, 2, ww // 2, c).mean(axis=(2, 4))
        # torch .flatten(1) flattens CHW order
        h = h.transpose(0, 3, 1, 2).reshape(n, -1)
        logits = h @ p["fc"]["kernel"]
        logp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(logp, yi[:, None], axis=1).mean()

    # (a) Bit-match contract (SURVEY §4.2): identical saliency inputs =>
    # bit-identical masks. Feed torch's saliencies through our threshold+mask.
    from vipers.pruning.snip import snip_threshold as our_thr

    sal = {
        ("conv", "kernel"): jnp.asarray(scores["conv"].numpy()),
        ("fc", "kernel"): jnp.asarray(scores["fc"].numpy()),
    }
    jthr = float(our_thr(sal, target))
    assert jthr == thr
    ours = {p: np.asarray(s) > jthr for p, s in sal.items()}
    assert np.array_equal(ours[("conv", "kernel")], t_masks["conv"])
    assert np.array_equal(ours[("fc", "kernel")], t_masks["fc"])

    # (b) Our jitted saliency pass reproduces torch's |w|*|g| numerically.
    from vipers.pruning.snip import snip_saliency

    jsal = snip_saliency(loss_fn, params, (xb, yb))
    np.testing.assert_allclose(
        np.asarray(jsal[("conv", "kernel")]).transpose(3, 2, 0, 1),
        scores["conv"].numpy(), atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jsal[("fc", "kernel")]).T, scores["fc"].numpy(),
        atol=1e-6, rtol=1e-4)

    # (c) End-to-end masks agree except possibly at float-rounding boundary
    # ties; demand >=99.9% agreement and identical pruned counts.
    masks = snip_prune(loss_fn, params, (xb, yb), target)
    j_conv = np.asarray(masks[("conv", "kernel")]).transpose(3, 2, 0, 1)
    j_fc = np.asarray(masks[("fc", "kernel")]).T
    total = j_conv.size + j_fc.size
    agree = (j_conv == t_masks["conv"]).sum() + (j_fc == t_masks["fc"]).sum()
    assert agree / total >= 0.999
    assert (~j_conv).sum() + (~j_fc).sum() == int(total * target)


def test_magnitude_prune_matches_torch_global_unstructured():
    torch.manual_seed(1)
    tconv = tnn.Conv2d(3, 6, 3)
    tfc = tnn.Linear(20, 7)
    params = {
        "conv": {"kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0))},
        "fc": {"kernel": jnp.asarray(tfc.weight.detach().numpy().T)},
    }
    masks = init_masks(params)
    to_prune = [(tconv, "weight"), (tfc, "weight")]
    for _ in range(3):  # iterative: 20% of remaining each round
        tprune.global_unstructured(to_prune, pruning_method=tprune.L1Unstructured, amount=0.2)
        masks = magnitude_prune(params, masks, amount=0.2)
        t_conv_mask = tconv.weight_mask.detach().numpy().astype(bool)
        t_fc_mask = tfc.weight_mask.detach().numpy().astype(bool)
        j_conv = np.asarray(masks[("conv", "kernel")]).transpose(3, 2, 0, 1)
        j_fc = np.asarray(masks[("fc", "kernel")]).T
        assert j_conv.sum() == t_conv_mask.sum() and j_fc.sum() == t_fc_mask.sum()
        assert np.array_equal(j_conv, t_conv_mask)
        assert np.array_equal(j_fc, t_fc_mask)


def test_sparsity_accounting(rng):
    p = _params(rng)
    masks = init_masks(p)
    n_conv = p["conv"]["kernel"].size
    flat = masks[("conv", "kernel")].reshape(-1).at[: n_conv // 2].set(False)
    masks[("conv", "kernel")] = flat.reshape(p["conv"]["kernel"].shape)
    total = n_conv + p["dense"]["kernel"].size
    expected = 100.0 * (n_conv // 2) / total
    assert compute_sparsity_global(p, masks) == pytest.approx(expected)


@pytest.mark.slow
def test_masked_training_weights_stay_zero(rng):
    """SURVEY.md §7 'Masked training purity' invariant: pruned weights stay
    exactly 0 through optimizer updates incl. weight decay and momentum."""
    p = _params(rng)
    masks = init_masks(p)
    km = np.asarray(masks[("dense", "kernel")]).copy()
    km[::2] = False
    masks[("dense", "kernel")] = jnp.asarray(km)
    p = apply_masks(p, masks)

    tx = optax.chain(
        optax.sgd(0.1, momentum=0.9),
        optax.add_decayed_weights(1e-2),
        masked_updates(lambda: masks),
    )
    state = tx.init(p)
    key = jax.random.PRNGKey(0)
    for i in range(5):
        grads = jax.tree.map(
            lambda w: jax.random.normal(jax.random.fold_in(key, i), w.shape), p
        )
        grads = mask_gradients(grads, masks)
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)
    zeros = np.asarray(p["dense"]["kernel"])[::2]
    assert np.all(zeros == 0.0)
    assert np.any(np.asarray(p["dense"]["kernel"])[1::2] != 0.0)


def test_magnitude_prune_scopes_match_legacy_semantics(rng):
    """original_train.py prunes ONLY Conv2d (resnets) or ONLY Linear
    (transformers) per iteration (`/root/reference/original_train.py:206-227`);
    scope="conv"/"linear" reproduces that against torch's own
    global_unstructured restricted to the same module set."""
    torch.manual_seed(2)
    tconv = tnn.Conv2d(3, 6, 3)
    tfc = tnn.Linear(20, 7)
    params = {
        "conv": {"kernel": jnp.asarray(
            tconv.weight.detach().numpy().transpose(2, 3, 1, 0))},
        "fc": {"kernel": jnp.asarray(tfc.weight.detach().numpy().T)},
    }
    masks = init_masks(params)

    # conv scope: the linear mask must be untouched
    tprune.global_unstructured(
        [(tconv, "weight")], pruning_method=tprune.L1Unstructured, amount=0.3
    )
    masks = magnitude_prune(params, masks, amount=0.3, scope="conv")
    t_conv_mask = tconv.weight_mask.detach().numpy().astype(bool)
    assert np.array_equal(
        np.asarray(masks[("conv", "kernel")]).transpose(3, 2, 0, 1), t_conv_mask
    )
    assert np.asarray(masks[("fc", "kernel")]).all()

    # linear scope on the same mask tree
    tprune.global_unstructured(
        [(tfc, "weight")], pruning_method=tprune.L1Unstructured, amount=0.4
    )
    masks = magnitude_prune(params, masks, amount=0.4, scope="linear")
    t_fc_mask = tfc.weight_mask.detach().numpy().astype(bool)
    assert np.array_equal(np.asarray(masks[("fc", "kernel")]).T, t_fc_mask)
    assert (~np.asarray(masks[("conv", "kernel")])).sum() == (~t_conv_mask).sum()

    with pytest.raises(ValueError):
        magnitude_prune(params, masks, amount=0.1, scope="bogus")
