"""Compute ops: phase math, linalg, RIME reductions, spherical harmonics."""
from . import phase, linalg, rime_kernel
from .phase import fringe_phasor, fringe_cycles, mod1
from .rime_kernel import rime_reduce, rime_reduce_ref
