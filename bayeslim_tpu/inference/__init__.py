"""Inference engine: priors, LogProb, optimizers, samplers."""
from .prob import (
    BaseLogPrior, LogUniformPrior, LogTaperedUniformPrior, LogGaussPrior,
    LogLaplacePrior, apply_icov, LogProb,
)
from .bfgs import BFGS, LBFGS, strong_wolfe, lbfgs_approx_cov
from .trainer import Trainer
from .hessian import (
    compute_hessian, invert_hessian, mask_hessian, unmask_hessian,
    main_params_index, main_params_kron_inv_hess, compute_icov,
    implicit_to_dense, FactoredInvHessian, factor_pairs, factored_hvp,
    factored_lvp,
)
from .sampler import (HMC, NUTS, RecycledHMC, Potential, leapfrog,
                      make_leapfrog_traj, SamplerBase)
from . import hmat
