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
    """(images, labels) -> global arrays on the mesh's data axis.

    Single process: plain ``device_put`` onto ``P("data")``; ragged tail
    batches (batch % data-degree != 0) replicate instead — their shape
    forces a recompile anyway, and GSPMD handles the replicated layout
    without uneven-shard placement.

    Multi-process (``jax.process_count() > 1``): each process's loader
    yields a *host-local* shard (`data.sampler.shard_indices_for_host`), so
    ``device_put`` onto a global mesh would be wrong — the global batch is
    assembled with ``jax.make_array_from_process_local_data`` instead (the
    TPU-native analogue of DDP's implicit per-rank batch placement,
    `/root/reference/train.py:606`).  Ragged local tails are padded to the
    per-process shard multiple with ``label = -1`` sentinel rows, which the
    eval step masks out of loss/top-k/sample counts (`train.steps
    make_eval_step`) so multi-process eval sums stay exact.
    """
    import jax.numpy as jnp

    data_sh = shard_batch(mesh)
    repl = replicate(mesh)
    n_data = mesh.shape[mesh.axis_names[0]]
    nproc = jax.process_count()

    def shard_io(batch):
        images, labels = batch
        if nproc > 1:
            images = np.asarray(images)
            labels = np.asarray(labels)
            per_proc = max(n_data // nproc, 1)
            pad = -images.shape[0] % per_proc
            if pad:
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
                )
                labels = np.concatenate(
                    [labels, np.full((pad,) + labels.shape[1:], -1, labels.dtype)]
                )
            return (
                jax.make_array_from_process_local_data(data_sh, images),
                jax.make_array_from_process_local_data(data_sh, labels),
            )
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


_ALLGATHER_CALLS = 0


def allgather_host_objects(obj, timeout_s: int = 1200):
    """All-gather arbitrary picklable HOST objects across processes;
    returns ``[obj_from_process_0, ..., obj_from_process_P-1]``.

    The multi-process drivers accumulate host-side Python state (CorLoc
    predictions, failure lists, observer dicts) that must be merged on
    rank 0 before the artifact write (torch-land would use
    ``torch.distributed.all_gather_object``).  Deliberately NOT a device
    collective: the callers' per-rank sweeps are independent work whose
    durations can drift far apart (compile skew, unequal shards), and
    the backend's Gloo/ICI context initialization enforces a short
    rendezvous deadline (~30 s) on the FIRST collective a communicator
    runs — a late rank would kill the whole job at the finish line.  The
    coordination-service key-value store (the same channel
    `jax.distributed.initialize` rendezvous rides) has no such
    constraint: each rank publishes its pickled payload under a
    per-call key, blocking-reads every peer's (``timeout_s`` budget for
    stragglers), and a barrier fences the keys' deletion.  Every process
    MUST call this the same number of times (keys are sequence-numbered);
    single-process returns ``[obj]`` without touching the backend.
    """
    import pickle

    nproc = jax.process_count()
    if nproc == 1:
        return [obj]
    global _ALLGATHER_CALLS
    seq = _ALLGATHER_CALLS
    _ALLGATHER_CALLS += 1

    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # pragma: no cover - initialize() precedes nproc>1
        raise RuntimeError(
            "allgather_host_objects: multi-process run without an "
            "initialized jax.distributed client"
        )
    rank = jax.process_index()
    prefix = f"vipers/allgather/{seq}"
    client.key_value_set_bytes(f"{prefix}/{rank}", pickle.dumps(obj))
    out = [
        pickle.loads(
            client.blocking_key_value_get_bytes(
                f"{prefix}/{r}", timeout_s * 1000))
        for r in range(nproc)
    ]
    # fence: nobody deletes a key a peer has not read yet
    client.wait_at_barrier(f"{prefix}/done", timeout_s * 1000, None)
    client.key_value_delete(f"{prefix}/{rank}")
    return out


def host_replicated_tree(tree):
    """Materialize a pytree of (possibly cross-process) jax.Arrays as host
    numpy on every process.

    Under a multi-process runtime, leaves living on a global mesh are not
    fully addressable by any one process, so rank-0 checkpointing
    (`/root/reference/utils.py:240-242` save_on_master) cannot simply
    ``device_get`` them.  This all-gathers such leaves to a fully-replicated
    layout with one compiled identity (a collective — EVERY process must
    call this, before any rank gate) and reads the local copy.  Leaves that
    are already host arrays or fully addressable pass through via
    ``device_get``.  Single-process: returns the tree's host copy untouched.
    """
    leaves, treedef = jax.tree.flatten(tree)
    if jax.process_count() == 1:
        return tree
    idxs = [
        i for i, x in enumerate(leaves)
        if isinstance(x, jax.Array) and not x.is_fully_addressable
    ]
    if idxs:
        mesh = Mesh(np.asarray(jax.devices()), ("all",))
        repl = NamedSharding(mesh, P())
        gathered = jax.jit(
            lambda xs: xs, out_shardings=(repl,) * len(idxs)
        )(tuple(leaves[i] for i in idxs))
        for i, g in zip(idxs, gathered):
            leaves[i] = np.asarray(g.addressable_data(0))
    leaves = [
        np.asarray(jax.device_get(x)) if isinstance(x, jax.Array) else x
        for x in leaves
    ]
    return jax.tree.unflatten(treedef, leaves)
