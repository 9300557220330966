"""
Default dtype management and small tensor helpers.

TPU-first conventions:
- default real dtype is float32 (TPU native); float64 available when
  ``jax.config.update('jax_enable_x64', True)`` is set (used by parity tests).
- complex data is stored natively as complex64/complex128 (JAX supports
  complex on TPU via XLA); the reference's real-pair "viewreal/viewcomp"
  convention (bayeslim/utils.py:42-43) is kept only as an IO/compat shim.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "_float", "_cfloat", "set_default_dtype", "viewreal", "viewcomp",
    "isreal_view", "D2R", "R2D", "C_MS",
]

D2R = np.pi / 180.0
R2D = 180.0 / np.pi
C_MS = 2.99792458e8  # speed of light [m/s], matches reference telescope_model.py:355

_DEFAULT_REAL = None  # None -> infer from jax x64 flag


def set_default_dtype(dtype=None):
    """Set the default real dtype used by model constructors.

    Parameters
    ----------
    dtype : jnp dtype or None
        e.g. jnp.float32 / jnp.float64. None resets to automatic
        (float64 iff jax x64 is enabled else float32).
    """
    global _DEFAULT_REAL
    _DEFAULT_REAL = None if dtype is None else jnp.dtype(dtype)


def _float():
    """Default real floating dtype (reference: bayeslim/utils.py _float)."""
    if _DEFAULT_REAL is not None:
        return _DEFAULT_REAL
    return jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 else jnp.dtype(jnp.float32)


def _cfloat():
    """Default complex floating dtype (reference: bayeslim/utils.py _cfloat)."""
    return jnp.dtype(jnp.complex128) if _float() == jnp.float64 else jnp.dtype(jnp.complex64)


def viewcomp(x):
    """View a real array with trailing dim 2 as complex.

    Compat shim for the reference's complex-as-real-pairs convention
    (bayeslim/utils.py:42-43). Native complex arrays pass through.
    """
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return x
    assert x.shape[-1] == 2, "viewcomp requires trailing dim of 2"
    return jax.lax.complex(x[..., 0], x[..., 1])


def viewreal(x):
    """View a complex array as real with a trailing dim of 2."""
    x = jnp.asarray(x)
    if not jnp.iscomplexobj(x):
        return x
    return jnp.stack([x.real, x.imag], axis=-1)


def isreal_view(x):
    """True if x looks like a real-pair view of a complex array."""
    x = jnp.asarray(x)
    return (not jnp.iscomplexobj(x)) and x.ndim > 0 and x.shape[-1] == 2
