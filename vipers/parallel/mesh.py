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


def maybe_initialize_distributed(verbose: bool = True) -> bool:
    """Multi-host rendezvous — the `jax.distributed.initialize()` analogue
    of the reference's `init_process_group(backend="nccl")` with env/SLURM
    rank pickup (`/root/reference/utils.py:245-269`).

    Coordinator discovery, mirroring the reference's precedence:
      * JAX-native env (``JAX_COORDINATOR_ADDRESS`` or the standard
        coordinator envs jax.distributed reads itself),
      * torchrun-style ``RANK``/``WORLD_SIZE``/``MASTER_ADDR[:PORT]``,
      * SLURM (``SLURM_PROCID`` etc. — jax.distributed auto-detects).

    Returns True if a multi-process runtime was initialized; single-process
    runs (no env present, or WORLD_SIZE==1) return False without touching
    the backend — exactly like the reference's "Not using distributed mode"
    branch (`utils.py:254-257`).

    NCCL -> TPU mapping (SURVEY §2.2): after initialization there is no
    user-visible backend — grad/metric all-reduce become ``psum`` inside
    jitted steps (XLA lowers them to ICI collectives within a slice, DCN
    across slices), barrier becomes any blocking collective, and broadcast
    is ``device_put`` with a replicated sharding.  Master-only side effects
    key on ``jax.process_index() == 0`` (`utils.py:236-242`).
    """
    import os

    # ORDER MATTERS: decide from the ENVIRONMENT only. Touching
    # jax.process_count()/jax.devices() here would initialize the XLA
    # backend, after which jax.distributed.initialize() refuses to run
    # ("must be called before any JAX calls").
    if jax.distributed.is_initialized():
        return True
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if coord is None and "MASTER_ADDR" in os.environ and "RANK" in os.environ:
        # torchrun-style env:// rendezvous (`utils.py:246-252`)
        coord = (
            f"{os.environ['MASTER_ADDR']}:{os.environ.get('MASTER_PORT', '29500')}"
        )
        nproc = os.environ.get("WORLD_SIZE")
        pid = os.environ.get("RANK")
    slurm = "SLURM_PROCID" in os.environ and int(
        os.environ.get("SLURM_NTASKS", "1")
    ) > 1
    if coord is None and not slurm:
        if verbose:
            print("Not using distributed mode")
        return False
    if nproc is not None and int(nproc) <= 1:
        if verbose:
            print("Not using distributed mode (world size 1)")
        return False
    kwargs = {}
    if coord is not None:
        kwargs = {
            "coordinator_address": coord,
            "num_processes": int(nproc) if nproc else None,
            "process_id": int(pid) if pid else None,
        }
    jax.distributed.initialize(**kwargs)  # SLURM: auto-detected, no kwargs
    if verbose:
        print(
            f"| distributed init (rank {jax.process_index()}): "
            f"{jax.process_count()} processes, "
            f"{jax.device_count()} devices"
        )
    return True


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


def batch_sharder(mesh: Mesh):
    """(images, labels) -> device_put onto the mesh's data axis; ragged
    tail batches (batch % data-degree != 0) replicate instead — their
    shape forces a recompile anyway, and GSPMD handles the replicated
    layout without uneven-shard placement."""
    import jax.numpy as jnp

    data_sh = shard_batch(mesh)
    repl = replicate(mesh)
    n_data = mesh.shape[mesh.axis_names[0]]

    def shard_io(batch):
        images, labels = batch
        images, labels = jnp.asarray(images), jnp.asarray(labels)
        sh = data_sh if images.shape[0] % n_data == 0 else repl
        return jax.device_put(images, sh), jax.device_put(labels, sh)

    return shard_io


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
