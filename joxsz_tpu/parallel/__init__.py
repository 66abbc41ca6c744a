from .mesh import (
    make_mesh, walker_sharding, cluster_walker_sharding, replicated,
)
from .sharded import (
    make_sharded_drive, run_sharded_ensemble, run_multi_cluster,
)
from .kernel_sharded import (
    make_sharded_kernel_step, run_sharded_kernel_ensembles,
    make_sharded_tempered_step, run_sharded_tempered_ensembles,
    make_sharded_multicluster_step, run_coupled_sharded_ensemble,
    run_hybrid_coupled_ensemble,
)
from .multihost import (
    initialize as initialize_multihost, global_mesh, replicated_to_global,
    local_block, run_multihost_multi_cluster,
    make_multihost_multicluster_step,
)

__all__ = [
    "make_mesh", "walker_sharding", "cluster_walker_sharding", "replicated",
    "make_sharded_drive", "run_sharded_ensemble", "run_multi_cluster",
    "make_sharded_kernel_step", "run_sharded_kernel_ensembles",
    "make_sharded_tempered_step", "run_sharded_tempered_ensembles",
    "make_sharded_multicluster_step", "run_coupled_sharded_ensemble",
    "run_hybrid_coupled_ensemble",
    "initialize_multihost", "global_mesh", "replicated_to_global",
    "local_block", "run_multihost_multi_cluster",
    "make_multihost_multicluster_step",
]
