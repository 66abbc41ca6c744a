from .stretch import (
    run_ensemble, make_step, generate_init_positions, EnsembleResult,
)
from .mle import find_mle
from .driver import run_fit, FitResult

__all__ = [
    "run_ensemble", "make_step", "generate_init_positions",
    "EnsembleResult", "find_mle", "run_fit", "FitResult",
]
