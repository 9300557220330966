"""
bayeslim_tpu: a TPU-native (JAX/XLA/Pallas) differentiable Bayesian
forward-modeling framework for line-intensity-mapping cosmology, with the
capabilities of the reference BayesLIM package re-designed TPU-first.

Layer map (mirrors SURVEY.md section 1):
- utils/      : pytree Module system, ParamDict, healpix, interpolation
- ops/        : fringe phase math, linalg, special functions, spherical
                harmonics, Pallas RIME kernels
- models/     : telescope, sky, beam, calibration, RIME, cosmology, filters,
                imaging
- data/       : VisData/MapData/CalData containers, datasets, IO
- inference/  : priors, LogProb, optimizers (BFGS/LBFGS), HMC/NUTS samplers
- parallel/   : device-mesh sharding of the posterior (data/bl-freq axes)
"""

__version__ = "0.1.0"

from . import utils
from .utils import (
    ParamDict, Module, Sequential, model2pdict,
    _float, _cfloat, viewreal, viewcomp,
)
