from .abel import forward_abel_matrix, forward_abel
from .splines import interp_matrix, mirrored_interp_matrix, lerp_lookup
from .pallas_joint import make_joint_core
from .szkernel import (
    sz_map_pipeline,
    build_sz_operator,
    SZOperator,
    compton_y_prefactor,
)

__all__ = [
    "forward_abel_matrix", "forward_abel", "interp_matrix", "make_joint_core",
    "mirrored_interp_matrix", "lerp_lookup", "sz_map_pipeline",
    "build_sz_operator", "SZOperator", "compton_y_prefactor",
]
