from .mesh import (make_mesh, activate_mesh, current_mesh,
                   shard_views, shard_frames, shard_pano, shard_batch, replicate,
                   VIEW_AXIS, REPLICA_AXIS)
