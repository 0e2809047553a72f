"""Device mesh + sharding annotations for multi-chip execution.

The reference has no functional distributed backend (its torch.distributed
imports are dead code — reference inference_dual_p2e.py:17-19,
SURVEY.md §2.4); this module is the TPU-native scale-out design:

- mesh axes ("replica", "view"): "view" shards the folded 2x(CFG) x 20
  perspective-view batch (and the pano branch's latent HEIGHT axis — see
  shard_pano for why not frames) over ICI-connected chips; "replica" is
  data parallelism over independent clips (training batches / serving
  requests) — size 1 on a single v5e-8.
- WarpAttn is the only cross-branch op: pano queries need all perspective
  keys (an all-gather over "view"), perspective queries need the full pano
  (an all-gather over its sharded height rows). Both ride ICI and are inserted automatically
  by GSPMD from the sharding constraints below.
- Gradients in the training step reduce over "replica" via GSPMD psum
  (optax update on replicated params).

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
REPLICA_AXIS = "replica"


def make_mesh(n_devices: Optional[int] = None, devices=None,
              replicas: int = 1) -> Mesh:
    """1D ('view',) mesh by default; pass replicas>1 for a 2D
    ('replica', 'view') mesh (data parallel x view parallel)."""
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    devices = np.array(devices)
    if replicas > 1:
        assert len(devices) % replicas == 0, (len(devices), replicas)
        return Mesh(devices.reshape(replicas, -1),
                    (REPLICA_AXIS, VIEW_AXIS))
    return Mesh(devices, (VIEW_AXIS,))


@contextlib.contextmanager
def activate_mesh(mesh: Optional[Mesh]):
    """Makes shard_views/shard_pano/... below emit real constraints."""
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
    for dim, name in enumerate(spec):
        names = name if isinstance(name, tuple) else (name,)
        total = 1
        for n in names:
            if n is not None:
                total *= mesh.shape[n]
        if total > 1 and x.shape[dim] % total != 0:
            return x  # not evenly divisible: leave placement to GSPMD
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_views(x):
    """Constrain the leading folded (CFG*views | batch*views) axis. With a
    2D mesh the fold shards over BOTH axes (replica-major)."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    lead = ((REPLICA_AXIS, VIEW_AXIS) if REPLICA_AXIS in mesh.shape
            else VIEW_AXIS)
    return _constrain(x, P(lead, *([None] * (x.ndim - 1))))


def shard_frames(x):
    """Constrain the frame axis (dim 1 of [B, F, ...]) over 'view'; the
    clip axis (dim 0) shards over 'replica' when present."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    lead = REPLICA_AXIS if REPLICA_AXIS in mesh.shape else None
    return _constrain(x, P(lead, VIEW_AXIS, *([None] * (x.ndim - 2))))


def shard_pano(x):
    """Constrain a 5-D pano activation [B, F, H, W, C] over 'view' on the
    latent HEIGHT axis (dim 2); the clip axis shards over 'replica'.

    Why H and not F: every pano module folds [B, F, H, W, C] ->
    [B*F, H, W, C] (InflatedConv/GroupNorm/Transformer3D), and a merge
    whose *minor* dim carries the sharding is not representable in GSPMD —
    an F-sharded pano de-shards at the first fold and the spatial ops run
    ~replicated (measured: per-device FLOPs divided only ~4.8x on an
    8-device mesh, scripts/sharded_flops.py). H survives every fold as its
    own dim (and is merge-MAJOR in the [H*W] token flattens), so convs
    (halo exchange), GroupNorm (psum stats), temporal attention (local)
    and FF all stay sharded; only spatial attention gathers K/V. The pano
    wrap-pad touches W only, never H (models/unet3d.py:wpad).
    """
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    lead = REPLICA_AXIS if REPLICA_AXIS in mesh.shape else None
    return _constrain(
        x, P(lead, None, VIEW_AXIS, *([None] * (x.ndim - 3))))


def shard_batch(x):
    """Constrain the leading axis over 'replica' only (training batches)."""
    mesh = _ACTIVE_MESH
    if mesh is None or REPLICA_AXIS not in mesh.shape:
        return x
    return _constrain(x, P(REPLICA_AXIS, *([None] * (x.ndim - 1))))


def replicate(x):
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*([None] * x.ndim))))
