"""Device mesh + sharding annotations for multi-chip execution.

The reference has no functional distributed backend (its torch.distributed
imports are dead code — reference inference_dual_p2e.py:17-19,
SURVEY.md §2.4); this module is the TPU-native scale-out design:

- one mesh axis "view": the 2x(CFG) x 20 perspective views fold into a
  40-row batch that shards evenly over 8 ICI-connected chips;
- the panorama branch (single image per CFG half) shards its *frame* axis
  over the same mesh axis, so pano convs/attention are also parallel;
- WarpAttn is the only cross-branch op: pano queries need all perspective
  keys (an all-gather over "view"), perspective queries need the full pano
  (an all-gather over frames). Both ride ICI and are inserted automatically
  by GSPMD from the sharding constraints below.

Constraints are applied via a module-level active mesh so model code stays
pure; with no active mesh every annotation is a no-op (single-chip path).
"""
from __future__ import annotations

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: Optional[Mesh] = None

VIEW_AXIS = "view"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devices), (VIEW_AXIS,))


@contextlib.contextmanager
def activate_mesh(mesh: Optional[Mesh]):
    """Makes shard_views/shard_frames below emit real constraints."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


def current_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def _constrain(x, spec: P):
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    axis = spec  # find which dim carries the axis
    for dim, name in enumerate(spec):
        if name == VIEW_AXIS and x.shape[dim] % mesh.shape[VIEW_AXIS] != 0:
            return x  # not evenly divisible: leave placement to GSPMD
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_views(x):
    """Constrain the leading folded (CFG*views) axis over the mesh."""
    return _constrain(x, P(VIEW_AXIS, *([None] * (x.ndim - 1))))


def shard_frames(x):
    """Constrain the frame axis (dim 1 of [B, F, ...]) over the mesh."""
    return _constrain(x, P(None, VIEW_AXIS, *([None] * (x.ndim - 2))))


def replicate(x):
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*([None] * x.ndim))))
