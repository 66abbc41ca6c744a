from .stretch import (
    run_ensemble, make_step, generate_init_positions, EnsembleResult,
)
from .tempered import run_tempered_ensemble, default_betas, TemperedResult
from .evidence import (
    run_evidence_ladder, model_evidence, power_betas, EvidenceResult,
)
from .mle import find_mle, find_mle_multistart
from .laplace import laplace_approximation, laplace_fit, model_laplace, \
    LaplaceResult
from .priors import sample_prior, prior_log_norm
from .sbc import run_sbc, sbc_uniformity, run_batched_ensembles, SBCResult
from .hmc import run_hmc, HMCResult
from .nuts import run_nuts, NUTSResult
from .kernel import make_kernel_sampler, KernelSampler
from .driver import run_fit, FitResult

__all__ = [
    "run_ensemble", "make_step", "generate_init_positions",
    "EnsembleResult", "run_tempered_ensemble", "default_betas",
    "TemperedResult", "find_mle", "find_mle_multistart", "run_fit",
    "run_hmc", "HMCResult", "run_nuts", "NUTSResult",
    "make_kernel_sampler", "KernelSampler",
    "run_evidence_ladder", "model_evidence", "power_betas",
    "EvidenceResult",
    "laplace_approximation", "laplace_fit", "model_laplace",
    "LaplaceResult", "sample_prior", "prior_log_norm",
    "run_sbc", "sbc_uniformity", "run_batched_ensembles", "SBCResult",
    "FitResult",
]
