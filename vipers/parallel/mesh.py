"""Device mesh + sharding layer.

TPU-native replacement for the reference's NCCL/DDP runtime
(`/root/reference/utils.py:245-269` init_process_group,
`/root/reference/train.py:598-607` DDP/SyncBN):

  * rendezvous            -> `jax.distributed.initialize()` (multi-host)
  * DDP grad all-reduce   -> jit over a batch sharded on the "data" axis
                             (XLA inserts the psum over ICI)
  * SyncBatchNorm          -> batch stats reduce over the *global* jit batch
                             by construction
  * metric all_reduce     -> the metrics come out of the jitted step already
                             reduced
  * barrier/broadcast     -> blocking collectives / device_put replication

The mesh is N-D (``("data", "model")``) per SURVEY §2.2: the reference only
ships data parallelism, but tensor-parallel shardings for the ViT
MLP/attention are provided so TP is a configuration change, not a rewrite.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    model_parallel: int = 1,
    axis_names=("data", "model"),
) -> Mesh:
    """Factor the device list into a (data, model) mesh. model_parallel=1
    reproduces the reference's pure-DP layout."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


def shard_batch(mesh: Mesh):
    """Batch arrays: sharded along the data axis, replicated over model."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def vit_param_sharding(mesh: Mesh, params):
    """Tensor-parallel PartitionSpecs for ViT params over the "model" axis:

      * qkv / mlp fc1 kernels: shard the output features (column parallel),
      * attention out / mlp fc2 kernels: shard the input features (row
        parallel — XLA inserts the psum after the matmul),
      * everything else replicated.

    Megatron-style pairing keeps activations sharded head-wise between the
    two matmuls with a single collective per block.
    """
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    specs = {}
    for path, leaf in flat.items():
        joined = "/".join(path)
        spec = P()
        if path[-1] == "kernel" and leaf.ndim == 2:
            if "qkv" in joined or "fc1" in joined:
                spec = P(None, "model")
            elif "attention/out" in joined or "attn/proj" in joined or "fc2" in joined:
                spec = P("model", None)
        elif path[-1] == "bias" and ("qkv" in joined or "fc1" in joined):
            spec = P("model")
        specs[path] = NamedSharding(mesh, spec)
    return traverse_util.unflatten_dict(specs)


def sharding_like(mesh: Mesh, tree, spec_tree=None):
    """Replicated shardings for a whole pytree (or apply spec_tree)."""
    if spec_tree is not None:
        return spec_tree
    return jax.tree.map(lambda _: replicate(mesh), tree)
