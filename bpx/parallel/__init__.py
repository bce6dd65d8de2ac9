"""Device meshes and sharding rules (DP / FSDP / TP)."""

from bpx.parallel.mesh import make_mesh
from bpx.parallel.sharding import (
    batch_sharding,
    param_shardings,
    replicated,
)
