from .mesh import (
    make_mesh, walker_sharding, cluster_walker_sharding, replicated,
)
from .sharded import (
    make_sharded_drive, run_sharded_ensemble, run_multi_cluster,
)

__all__ = [
    "make_mesh", "walker_sharding", "cluster_walker_sharding", "replicated",
    "make_sharded_drive", "run_sharded_ensemble", "run_multi_cluster",
]
