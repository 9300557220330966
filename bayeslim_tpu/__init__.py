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

__version__ = "0.3.0"


def version():
    """Human-readable version string (reference: bayeslim/version.py)."""
    return "bayeslim_tpu v{}".format(__version__)

# TPU XLA's DEFAULT f32 matmul precision rounds operands to bf16 —
# ~2e-3 relative error on cancellation-heavy reductions (measured by
# bench.py --check; see docs/performance.md). For a Bayesian framework
# whose correctness bar is 1e-5 gradients, true-f32 matmuls are the only
# defensible default: Ylm synthesis, imaging A-matrices, covariance
# solves and linear models all run through jnp matmuls/einsums. The hot
# RIME path is unaffected (its fused Pallas kernels manage their own
# MXU precision). Opt out (e.g. for throughput experiments) with
# BAYESLIM_TPU_MATMUL_PRECISION=default, or set any other value the
# jax_default_matmul_precision config accepts.
import os as _os

import jax as _jax

_prec = _os.environ.get("BAYESLIM_TPU_MATMUL_PRECISION", "highest")
if _prec and _prec.lower() not in ("default", "none"):
    if _jax.config.jax_default_matmul_precision != _prec:
        # import-time global config change: log it so co-resident JAX
        # code that sees different numerics/perf can trace the cause
        import logging as _logging
        _logging.getLogger(__name__).info(
            "bayeslim_tpu: setting jax_default_matmul_precision=%s "
            "process-wide (opt out with BAYESLIM_TPU_MATMUL_PRECISION="
            "default)", _prec)
    _jax.config.update("jax_default_matmul_precision", _prec)

from . import utils
from .utils import (
    ParamDict, Module, Sequential, model2pdict,
    _float, _cfloat, viewreal, viewcomp,
)
from . import ops
from . import data
from . import models

from . import inference
from . import parallel

# reference-style module aliases (bayeslim.telescope_model etc.)
from .models import telescope as telescope_model
from .models import sky as sky_model
from .models import beam as beam_model
from .models import rime as rime_model
from .models import linear_model
from .models import calibration
from .models import cosmology
from .models import fft
from .models import filt
from .models import imaging
from .ops import sph_harm
from .ops import special
from .ops import linalg
from .inference import prob as optim
from .inference import bfgs
from .inference import sampler
from .inference import hmat
from .data import containers as dataset
from .data import io
from .data.containers import VisData, MapData, CalData
from .data.dataset import Dataset
from .models.rime import RIME
from .models.telescope import TelescopeModel, ArrayModel
from .models.sky import PointSky, PixelSky
from .models.beam import PixelBeam
from .inference import LogProb, Trainer, BFGS, LBFGS
from .utils.paramdict import read_pdict, write_pdict

# complete the reference-style aliases with names the reference keeps in
# those modules but this package organizes elsewhere (so notebook-style
# access like ba.optim.Trainer / ba.dataset.Dataset works verbatim)
from .inference import hessian as _hessian
dataset.Dataset = Dataset
optim.Trainer = Trainer
optim.compute_hessian = _hessian.compute_hessian
optim.invert_hessian = _hessian.invert_hessian
optim.compute_icov = _hessian.compute_icov
optim.DistributedLogProb = parallel.DistributedLogProb
