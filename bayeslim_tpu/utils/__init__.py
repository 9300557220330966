"""Core substrate: dtypes, pytree modules, ParamDict, healpix, interpolation."""
from .dtypes import (
    _float, _cfloat, set_default_dtype, viewreal, viewcomp, isreal_view,
    D2R, R2D, C_MS,
)
from .paramdict import ParamDict, read_pdict, write_pdict
from .module import Module, Sequential, model2pdict, tree_replace
from .indexing import (
    AntposDict, blnum2ants, ants2blnum, make_hex, split_into_groups,
    flatten, white_noise, gauss_taper, tukey_taper, SimpleIndex, Jy_to_KStr,
    colat2lat, stripe_tukey_mask, half_gaussian_taper, voigt_beam,
    fit_zero, get_zeros, conjbl, inflate_bls, freq_interp,
)
from .interp import PixInterp, interp_gather, bipoly_interp_weights
from . import healpix
from . import multires
from . import logging  # noqa: F401  (structured logging + profiler hooks)
from . import checkpoint  # noqa: F401  (orbax training-state checkpoints)

# reference-compat alias (utils.py:1943 names it _make_hex)
_make_hex = make_hex


def __getattr__(name):
    # reference-compat: these live in bayeslim.utils in the reference
    # but in models/ here; lazy import avoids utils<->models circularity
    if name in ("prep_xarr", "whiten_xarr"):
        from ..models import linear_model as _lm
        return getattr(_lm, name)
    raise AttributeError(name)
