"""Sequence (context) parallelism for whole-image transformer inference.

Beyond the reference's capability set (SURVEY §2.2: only data parallelism
exists upstream): for batch-1 native-resolution LOST — where DP has
nothing to shard — the TOKEN axis of every activation is sharded over a
mesh axis instead.  GSPMD-style: the model applies
``with_sharding_constraint`` at block boundaries and XLA inserts the
collectives (the scaling-book recipe: pick a mesh, annotate shardings,
let the compiler place the all-gathers/reduce-scatters on ICI).  No
hand-written ring: at ViT scales (T up to a few thousand, head_dim 64)
the k/v all-gather is small next to the T^2/n_dev attention compute each
device keeps.

Manual Pallas kernels (flash attention, fused inference MLP, fused train
attention) gate OFF while SP is active — a ``pallas_call`` is opaque to
the partitioner and would force a full re-gather; the einsum paths
partition cleanly.

Usage: the LOST feature extractor wraps its ``module.apply`` in
``sequence_parallel(mesh, axis)`` so the constraints are baked in at
trace time of ITS jitted programs only; other models/extractors in the
same process are untouched.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: list = []  # stack of (mesh, axis); consulted at TRACE time


@contextlib.contextmanager
def sequence_parallel(mesh: Mesh, axis: str = "seq"):
    """Activate token-axis sharding over ``mesh[axis]`` for every
    ``shard_tokens`` call traced inside the context."""
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has axes {mesh.axis_names}, not {axis!r}")
    _ACTIVE.append((mesh, axis))
    try:
        yield
    finally:
        _ACTIVE.pop()


def sequence_axis() -> Optional[Tuple[Mesh, str]]:
    """The active (mesh, axis) or None — models consult this at trace time
    to gate partitioner-opaque Pallas kernels off."""
    return _ACTIVE[-1] if _ACTIVE else None


def shard_tokens(x):
    """Constrain the second-to-last (token) axis of an (..., T, D)
    activation onto the active SP mesh axis; identity when SP is off."""
    if not _ACTIVE or x is None:
        return x
    mesh, axis = _ACTIVE[-1]
    spec = [None] * x.ndim
    spec[-2] = axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def make_seq_mesh(devices=None, axis: str = "seq") -> Mesh:
    """A 1-D mesh over all (or the given) devices for sequence parallelism."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))
