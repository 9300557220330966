"""
Numerically-careful fringe phase computation.

The RIME fringe is exp(+2*pi*i * f * tau) with tau = (b . s)/c up to ~1e-5 s
and f up to ~2e8 Hz, so the phase argument reaches ~1e4 radians. In float32
this loses ~3-4 digits of phase (catastrophic for visibility parity), which
is why a naive port of the reference fringe (bayeslim/telescope_model.py:
350-357, computed in float64 on GPU) would not run accurately on TPU.

TPU-first solution: phases only matter modulo 2*pi, so compute cycles
m = f * tau mod 1 with the frequency grid split as f = f0 + k*df (exact
channel index k). Then::

    m_k mod 1 = ( (f0*tau mod 1) + (k * (df*tau mod 1)) mod 1 ) mod 1

Each factor is computed with two-product style splitting so that float32
retains ~1e-6 cycles of accuracy. Gradients w.r.t. tau are exact: d/dtau of
(f*tau mod 1) is f (mod is piecewise linear), so autodiff through this
reduction matches the unreduced phase derivative.

When x64 is enabled everything is exact to float64 and the reduction is a
no-op numerically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mod1", "split_mul_mod1", "fringe_cycles", "fringe_phasor"]


@jax.custom_jvp
def mod1(x):
    """x mod 1 with the derivative of the identity (piecewise-linear mod)."""
    return x - jnp.floor(x)


@mod1.defjvp
def _mod1_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return mod1(x), dx


def _split_const(f):
    """Split a float scalar/array into hi + lo float32 parts (host)."""
    f = np.asarray(f, dtype=np.float64)
    hi = np.asarray(f, dtype=np.float32).astype(np.float64)
    lo = (f - hi).astype(np.float32)
    return hi.astype(np.float32), lo


def split_mul_mod1(f, tau):
    """Compute (f * tau) mod 1 accurately for large products.

    f : python/NumPy scalar (static, split on host into hi+lo parts)
    tau : array (traced), any float dtype.

    Uses mod1(f_hi*tau) + f_lo*tau style accumulation. For float32 tau this
    keeps ~1e-6 cycles accuracy for f*tau up to ~1e5 cycles.
    """
    dtype = jnp.result_type(tau)
    if dtype == jnp.float64:
        return mod1(jnp.float64(f) * tau)
    fhi, flo = _split_const(f)
    # further split fhi so fhi*tau's integer part is exactly representable:
    # fhi = a * 2^12 + b with a, b < 2^12-ish keeps partial products small
    scale = 4096.0
    a = np.float32(np.floor(np.float64(fhi) / scale) * scale)
    b = np.float32(np.float64(fhi) - np.float64(a))
    t = tau.astype(jnp.float32)
    m = mod1(mod1(a * t) + mod1(b * t) + flo.astype(jnp.float32) * t)
    return m


def fringe_cycles(tau, freqs, f0=None, df=None):
    """Fringe phase in cycles, (freq-major) for a regular or arbitrary grid.

    Parameters
    ----------
    tau : (...,) delay array [s] (traced; typically blvec.s/c)
    freqs : (Nfreqs,) static numpy frequency array [Hz]
    f0, df : optional scalars declaring freqs = f0 + k*df exactly; detected
        automatically when the grid is regular.

    Returns
    -------
    cycles : (..., Nfreqs) array of (f*tau mod 1) in [0, 1)
    """
    freqs = np.asarray(freqs, dtype=np.float64)
    dtype = jnp.result_type(tau)
    if dtype == jnp.float64:
        return mod1(tau[..., None] * jnp.asarray(freqs))

    if f0 is None and len(freqs) > 1:
        d = np.diff(freqs)
        if np.allclose(d, d[0], rtol=1e-12, atol=1e-6):
            f0, df = freqs[0], d[0]
    if f0 is None:
        f0, df = freqs[0], 0.0

    k = jnp.arange(len(freqs), dtype=dtype)
    c0 = split_mul_mod1(f0, tau)                       # (...,)
    c1 = split_mul_mod1(df, tau) if df else jnp.zeros_like(tau)
    # k*c1 up to ~Nfreqs cycles: reduce in f32 (error ~ Nf * eps cycles)
    cyc = mod1(c0[..., None] + mod1(k * c1[..., None]))
    # correct for non-regular grids
    resid = freqs - (np.float64(f0) + np.arange(len(freqs)) * np.float64(df))
    if np.any(np.abs(resid) > 0):
        cyc = mod1(cyc + jnp.asarray(resid, dtype=dtype) * tau[..., None])
    return cyc


def fringe_phasor(tau, freqs, conj=False, f0=None, df=None):
    """exp(+/- 2 pi i f tau) with phase-accurate reduction.

    Matches the reference fringe convention exp(+2j pi f (b.s)/c)
    (telescope_model.py:355-357); conj flips the sign.
    """
    cyc = fringe_cycles(tau, freqs, f0=f0, df=df)
    ang = (2 * np.pi) * cyc
    s = -1.0 if conj else 1.0
    return jax.lax.complex(jnp.cos(ang), s * jnp.sin(ang))
