"""Inference engine: priors, LogProb, optimizers, samplers."""
from .prob import (
    BaseLogPrior, LogUniformPrior, LogTaperedUniformPrior, LogGaussPrior,
    LogLaplacePrior, apply_icov, LogProb,
)
from .bfgs import BFGS, LBFGS, strong_wolfe, lbfgs_approx_cov
from .trainer import Trainer
