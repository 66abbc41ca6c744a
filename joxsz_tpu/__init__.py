"""JoXSZ-TPU: a TPU-native joint SZ + X-ray galaxy-cluster fitting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
fcastagna/JoXSZ (joint Sunyaev-Zel'dovich + Chandra X-ray fitting of cluster
thermodynamic profiles): the full forward model + joint likelihood is one
fused, jittable function; the affine-invariant ensemble sampler runs
TPU-resident with all walkers evaluated as a single vmapped batch, shardable
over a device mesh for multi-chip and multi-cluster scaling.

Layer map (bottom-up):
  constants / cosmology     CGS constants, FLRW distances
  io                        FITS/OGIP/text readers, chain checkpointing
  geometry                  map grids, beam, transfer function, X-ray annuli
  ops                       Abel/spline/FFT chains fused to dense operators
  models                    pressure/density/temperature/mass components,
                            SZ + X-ray forward models, joint likelihood
  sampling                  TPU-resident stretch-move ensemble sampler, MLE
  parallel                  mesh/sharding helpers (walkers x clusters)
  tablegen                  offline count-rate table generator (native core)
  postproc / plotting       vmapped posterior profiles, figures, summaries
"""

__version__ = "0.1.0"

from . import constants
from .cosmology import Cosmology

__all__ = ["constants", "Cosmology", "__version__"]
