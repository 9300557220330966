"""
The RIME pixel reduction: V[..., b, f] = sum_pix psky[..., b, f, pix] *
exp(2 pi i f tau[b, pix]).

This is the framework's hot op (reference rime_model.py:391-440
_prod_and_sum: materialize fringe (Nbls, Nfreqs, Npix), multiply by the
beam-weighted sky and reduce over pixels). Implementations:

- `rime_reduce_ref`: straightforward XLA version (materializes the fringe;
  used for correctness tests and as autodiff reference).
- `rime_reduce`: pixel-chunked lax.scan version — streams the pixel axis so
  the (Nbls, Nfreqs, Npix) fringe is never materialized; HBM traffic drops
  to the psky tile reads. This is the default device path; a fused Pallas
  kernel (rime_pallas.py) replaces the inner block on real TPUs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .phase import fringe_cycles

__all__ = ["rime_reduce", "rime_reduce_ref"]


def _phasor(tau, freqs, conj=False):
    cyc = fringe_cycles(tau, freqs)            # (..., Npix, Nfreqs)
    ang = (2 * np.pi) * cyc
    s = -1.0 if conj else 1.0
    return jax.lax.complex(jnp.cos(ang), s * jnp.sin(ang))


def rime_reduce_ref(psky, tau, freqs, conj=False):
    """Reference XLA implementation.

    psky : (..., Nbls, Nfreqs, Npix) beam-weighted sky (complex or real)
    tau : (Nbls, Npix) geometric delay b.s/c [s]
    freqs : (Nfreqs,) static numpy array [Hz]

    Returns (..., Nbls, Nfreqs) complex visibilities.
    """
    fr = jnp.moveaxis(_phasor(tau, freqs, conj=conj), -1, -2)  # (Nbls, Nf, Npix)
    return jnp.sum(psky * fr, axis=-1)


def rime_reduce(psky, tau, freqs, conj=False, chunk=1024):
    """Pixel-chunked RIME reduction (streaming over the sky axis).

    Same contract as rime_reduce_ref. `chunk` pixels are processed per
    scan step; the pixel axis must be a multiple of the chunk (callers pad
    with masked pixels). Memory high-water: O(Nbls * Nfreqs * chunk).
    """
    npix = psky.shape[-1]
    if npix <= chunk or npix % chunk != 0:
        return rime_reduce_ref(psky, tau, freqs, conj=conj)
    nchunks = npix // chunk

    # reshape pixel axis -> (nchunks, chunk), scan over chunks
    psky_c = jnp.moveaxis(
        psky.reshape(psky.shape[:-1] + (nchunks, chunk)), -2, 0)
    tau_c = jnp.moveaxis(tau.reshape(tau.shape[:-1] + (nchunks, chunk)), -2, 0)

    cdtype = jnp.result_type(psky.dtype, jnp.complex64)

    def step(acc, xs):
        ps, tc = xs
        fr = jnp.moveaxis(_phasor(tc, freqs, conj=conj), -1, -2)
        return acc + jnp.sum(ps * fr, axis=-1), None

    init = jnp.zeros(psky.shape[:-1], dtype=cdtype)
    out, _ = jax.lax.scan(step, init, (psky_c, tau_c))
    return out
