"""Multi-chip scale-out: meshes, shardings, parallel engines."""

from .mesh import (make_mesh, shard_channel_bank, pcps_sharded,  # noqa: F401
                   tracking_step_sharded)
