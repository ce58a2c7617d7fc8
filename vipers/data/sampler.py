"""Index sampling: repeated-augmentation (DeiT RASampler) + host sharding.

Counterpart of `/root/reference/sampler.py:7-62` (RASampler) and the
DistributedSampler selection (`/root/reference/train.py:228-236`).  In JAX,
"rank" is `jax.process_index()` and sharding happens in the input pipeline:
each host draws the same permutation (same seed+epoch) and takes its strided
slice.
"""

from __future__ import annotations

import math

import numpy as np


def ra_sampler_indices(
    n: int,
    num_replicas: int,
    rank: int,
    epoch: int,
    seed: int = 0,
    shuffle: bool = True,
    repetitions: int = 3,
):
    """Exactly the reference's index stream, with numpy's RNG for the
    permutation: each sample appears ``repetitions`` times across ranks, the
    stream is padded to a multiple and truncated to
    floor(len/256)*256/replicas selected samples."""
    num_samples = int(math.ceil(n * float(repetitions) / num_replicas))
    total_size = num_samples * num_replicas
    num_selected = int(math.floor(n // 256 * 256 / num_replicas))
    if num_selected == 0:
        # The DeiT /256 truncation selects zero samples for datasets under
        # 256 images (the reference inherits this, sampler.py:20); keep the
        # stream usable for small runs instead of yielding an empty epoch.
        num_selected = num_samples

    if shuffle:
        g = np.random.default_rng(seed + epoch)
        indices = g.permutation(n).tolist()
    else:
        indices = list(range(n))
    indices = [ele for ele in indices for _ in range(repetitions)]
    indices += indices[: (total_size - len(indices))]
    assert len(indices) == total_size
    indices = indices[rank:total_size:num_replicas]
    assert len(indices) == num_samples
    return indices[:num_selected]


def shard_indices_for_host(
    n: int,
    num_replicas: int,
    rank: int,
    epoch: int,
    seed: int = 0,
    shuffle: bool = True,
    drop_last: bool = False,
    batch_size: int = 0,
    pad_with_sentinel: bool = False,
):
    """torch DistributedSampler semantics: pad (repeat from front) to a
    multiple of world size unless drop_last, then stride by rank.

    ``batch_size`` (multi-process only): switch from per-sample striding to
    *batch-interleaved blocks* — host ``rank``'s b-th batch is
    ``perm[b*G + rank*B : b*G + (rank+1)*B]`` (G = B*num_replicas), so the
    global batch assembled across processes (`parallel/mesh.batch_sharder`)
    equals, element for element and in order, the b-th batch a
    single-process run would draw from the same permutation.  That makes
    multi-process DP training numerically identical to the single-process
    global-batch run (the DDP-equivalence the reference gets from
    DistributedSampler + gradient all-reduce, `/root/reference/train.py:606`)
    and is what `tests/test_multiprocess.py` pins down.
    """
    if shuffle:
        g = np.random.default_rng(seed + epoch)
        indices = g.permutation(n).tolist()
    else:
        indices = list(range(n))
    if batch_size and num_replicas > 1:
        G = batch_size * num_replicas
        total = (n // G) * G if drop_last else -(-n // G) * G
        if total == 0:
            total = G  # tiny dataset: keep one (padded) global batch
        while len(indices) < total:
            indices += indices[: total - len(indices)]
        indices = indices[:total]
        arr = np.asarray(indices).reshape(-1, num_replicas, batch_size)
        return arr[:, rank, :].reshape(-1).tolist()
    if drop_last:
        per = n // num_replicas
        total = per * num_replicas
        indices = indices[:total]
    else:
        per = int(math.ceil(n / num_replicas))
        total = per * num_replicas
        if pad_with_sentinel:
            # -1 rows become zero-image/label=-1 in the loader and are
            # masked out by the eval step — multi-process eval stays exact
            # instead of inheriting torch DistributedSampler's
            # duplicate-sample bias (`/root/reference/train.py:127-137`)
            indices += [-1] * (total - len(indices))
        else:
            indices += indices[: total - len(indices)]
    return indices[rank:total:num_replicas]
