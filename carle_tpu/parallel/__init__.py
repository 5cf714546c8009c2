"""Multi-chip / multi-host scaling (SURVEY.md §2 parallelism checklist).

The scale axes of this domain are **environment batch** and **grid size**:

* env-batch data parallelism (`mesh.py`): the instances dimension shards over
  a device mesh; wrapper/agent params replicate; XLA inserts the cross-device
  reductions (batch-mean losses, batch-global statistics) automatically from
  the sharding annotations — the idiomatic jit/GSPMD path.
* spatial grid sharding (`spatial.py`): one huge universe sharded by rows
  with a 1-cell halo exchanged per step over ICI via ``shard_map`` +
  ``ppermute`` — the structural analogue of ring-attention halos; needed only
  for grids that outgrow one chip's HBM/VMEM.

The reference has no distributed anything (single process, one device); these
modules are the TPU-native replacement for "scale = bigger instances count"
(reference env.py:46-48, 558-573).
"""

from .mesh import env_sharding, make_mesh, shard_carry, replicate
from ..nets import SpaceSharding
from .packed_env import (PackedSpatialStack, packed_spatial_sharding,
                         shard_carry_packed)
from .spatial import bit_spatial_multi_step, spatial_ca_step, spatial_multi_step
from .spatial_env import (shard_carry_2d, shard_carry_spatial,
                          spatial_sharding)
from .pallas_halo import (
    bit_spatial_multi_step_pallas,
    spatial_ca_step_pallas,
    spatial_multi_step_pallas,
)

__all__ = [
    "PackedSpatialStack",
    "env_sharding",
    "make_mesh",
    "packed_spatial_sharding",
    "shard_carry_packed",
    "shard_carry",
    "shard_carry_2d",
    "shard_carry_spatial",
    "spatial_sharding",
    "replicate",
    "bit_spatial_multi_step",
    "bit_spatial_multi_step_pallas",
    "spatial_ca_step",
    "spatial_ca_step_pallas",
    "spatial_multi_step_pallas",
    "spatial_multi_step",
]
