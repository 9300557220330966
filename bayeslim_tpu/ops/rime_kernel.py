"""
The RIME pixel reduction: V[..., b, f] = sum_pix psky[..., mp(b), f, pix] *
exp(+/- 2 pi i f tau[b, pix]).

This is the framework's hot op (reference rime_model.py:391-440
_prod_and_sum). The reference materializes the fringe (Nbls, Nfreqs, Npix)
AND expands the beam-weighted sky to per-baseline shape; at HERA scale
that is O(50 GB). TPU-first redesign:

1. psky stays in *model-pair* space (..., Nmp, Nfreqs, Npix). For the
   common shared-beam case Nmp == 1 and the per-baseline expansion never
   happens (the reference's torch `expand` view trick, beam_model.py:367,
   becomes simply not gathering at all).
2. The pixel axis is processed in chunks with lax.scan; each chunk builds
   cos/sin fringe factors (Nbls, chunk, Nfreqs-batched) and contracts over
   pixels with einsum -> batched real matmuls on the MXU:
       V_re[..., f, b] (+)= psky[..., f, c] @ cos[b, c, f)
   Chunks are wrapped in jax.checkpoint so the backward pass recomputes
   the fringe instead of storing it: peak memory is O(Nbls * chunk *
   Nfreqs), independent of Npix.
3. Phases use ops.phase.fringe_cycles (float32-safe mod-1 reduction).

A fused Pallas kernel (ops/rime_pallas.py) replaces the chunk body on
real TPU hardware for additional HBM-traffic savings.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .phase import fringe_cycles

__all__ = ["rime_reduce", "rime_reduce_ref"]


import contextlib

_FORCE_XLA = [False]


@contextlib.contextmanager
def force_xla():
    """Disable the fused Pallas dispatch inside the block.

    Needed for second-order differentiation (HVP / compute_hessian):
    forward-over-reverse cannot cross a custom_vjp primitive, and the
    Pallas backward kernels define no VJP of their own -- the chunked
    XLA path is fully traceable at any order."""
    _FORCE_XLA[0] = True
    try:
        yield
    finally:
        _FORCE_XLA[0] = False


def _pallas_eligible(psky, mp_idx, freqs, use_pallas):
    """float32, regular freq grid, on TPU. Multi-pol leading dims and
    Nmp > 1 model pairs are handled by row-stacking / baseline grouping
    in _rime_fused_dispatch; only a per-baseline psky without an mp_idx
    (psky dim -3 == Nbls) falls back to the XLA path."""
    if _FORCE_XLA[0]:
        return False
    if psky.ndim < 3:
        return False
    if mp_idx is None and psky.shape[-3] != 1:
        return False  # per-baseline psky: kernel shares rows over bls
    if psky.real.dtype != jnp.float32:
        return False
    if len(freqs) > 1:
        d = np.diff(freqs)
        if not np.allclose(d, d[0], rtol=1e-10):
            return False
    if use_pallas == "auto":
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False
    return True


def _rime_fused_dispatch(psky, tau, freqs, mp_idx, conj, blvecs=None,
                         s_c=None):
    """Map the general (..., Nmp, Nfreqs, Npix) contract onto the 2D
    stacked-row fused kernel: polarization blocks stack as extra
    frequency rows; Nmp > 1 groups baselines by model pair (mp_idx is
    host metadata) and inverse-permutes the concatenated result.

    When (blvecs, s_c) are given, the delay matrix is factored through
    rime_fused_bs so tau is never a stored VJP residual (O(Npix) memory
    under a time scan instead of O(Ntimes*Nbls*Npix))."""
    from .rime_pallas import rime_fused, rime_fused_bs
    lead = psky.shape[:-3]
    nmp, nf, npx = psky.shape[-3:]
    nb = blvecs.shape[0] if blvecs is not None else tau.shape[0]
    L = 1
    for s in lead:
        L *= s
    ftup = tuple(np.asarray(freqs, dtype=np.float64).tolist())

    def run(ps2d, bl_sel=None):
        if blvecs is not None:
            bv = blvecs if bl_sel is None else \
                jnp.take(blvecs, jnp.asarray(bl_sel), axis=0)
            return rime_fused_bs(ps2d, bv, s_c, ftup, conj)
        t = tau if bl_sel is None else \
            jnp.take(tau, jnp.asarray(bl_sel), axis=0)
        return rime_fused(ps2d, t, ftup, conj)

    if mp_idx is None or nmp == 1:
        ps2d = psky.reshape(L * nf, npx)
        out = run(ps2d)                                   # (L*nf, nb)
        out = out.reshape(lead + (nf, nb))
        return jnp.moveaxis(out, -2, -1)                  # (..., nb, nf)

    if isinstance(mp_idx, jax.Array):
        # device mp_idx (bl-sharded shard_map: per-shard host grouping
        # is impossible in one traced program — shard_rime pins the
        # baseline->pair map as a bl-sharded device leaf instead): run
        # EVERY model pair over all local baselines and mask-select per
        # baseline. Costs Nmp x the kernel triples — the price of
        # baseline sharding with heterogeneous beams; prefer time
        # sharding when Nmp is large.
        outs = []
        for m in range(nmp):
            ps2d = psky[..., m, :, :].reshape(L * nf, npx)
            outs.append(run(ps2d))                        # (L*nf, nb)
        stack = jnp.stack(outs)                           # (nmp, L*nf, nb)
        sel = (mp_idx[None, None, :]
               == jnp.arange(nmp, dtype=mp_idx.dtype)[:, None, None])
        out = jnp.sum(stack * sel.astype(stack.real.dtype), axis=0)
        out = out.reshape(lead + (nf, nb))
        return jnp.moveaxis(out, -2, -1)

    mp = np.asarray(mp_idx)
    outs, order = [], []
    for m in range(nmp):
        idx = np.where(mp == m)[0]
        if len(idx) == 0:
            continue
        order.append(idx)
        ps2d = psky[..., m, :, :].reshape(L * nf, npx)
        outs.append(run(ps2d, idx))                       # (L*nf, nb_m)
    out = jnp.concatenate(outs, axis=-1)
    perm = np.concatenate(order)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    out = jnp.take(out, jnp.asarray(inv), axis=-1)
    out = out.reshape(lead + (nf, nb))
    return jnp.moveaxis(out, -2, -1)


def _phasor(tau, freqs, conj=False):
    cyc = fringe_cycles(tau, freqs)            # (..., Npix, Nfreqs)
    ang = (2 * np.pi) * cyc
    s = -1.0 if conj else 1.0
    return jax.lax.complex(jnp.cos(ang), s * jnp.sin(ang))


def rime_reduce_ref(psky, tau, freqs, mp_idx=None, conj=False):
    """Reference XLA implementation (materializes the fringe).

    psky : (..., Nmp, Nfreqs, Npix) or (..., Nbls, Nfreqs, Npix) if
        mp_idx is None and psky's third-to-last dim == Nbls
    tau : (Nbls, Npix) geometric delay b.s/c [s]
    freqs : (Nfreqs,) static numpy array [Hz]
    mp_idx : optional (Nbls,) int array mapping baseline -> model pair

    Returns (..., Nbls, Nfreqs) complex visibilities.
    """
    fr = jnp.moveaxis(_phasor(tau, freqs, conj=conj), -1, -2)  # (Nb, Nf, Np)
    nbls = tau.shape[0]
    if mp_idx is not None:
        psky = jnp.take(psky, jnp.asarray(mp_idx), axis=-3)
    elif psky.shape[-3] == 1 and nbls != 1:
        pass  # broadcast below
    return jnp.sum(psky * fr, axis=-1)


def _chunk_body(psky_c, tau_c, freqs, mp_idx, conj, out_dtype):
    """Reduce one pixel chunk: returns (..., Nbls, Nfreqs) complex.

    All contractions run at Precision.HIGHEST: TPU XLA's DEFAULT f32
    matmul precision is bf16-multiply (~2e-3 relative error on this
    reduction, measured by bench.py --check); this path is the parity
    reference for the fused kernels and the HVP fallback, so it must be
    true f32."""
    cyc = fringe_cycles(tau_c, freqs)          # (Nb, C, F)
    ang = (2 * np.pi) * cyc
    cosf = jnp.cos(ang)
    sinf = -jnp.sin(ang) if conj else jnp.sin(ang)
    _es = functools.partial(jnp.einsum,
                            precision=jax.lax.Precision.HIGHEST)

    nmp = psky_c.shape[-3]
    if mp_idx is None and nmp == 1:
        ps = psky_c[..., 0, :, :]              # (..., F, C)
        if jnp.iscomplexobj(ps):
            # (..., F, C) x (B, C, F): contract C, batch F
            re = _es("...fc,bcf->...bf", ps.real, cosf) - \
                _es("...fc,bcf->...bf", ps.imag, sinf)
            im = _es("...fc,bcf->...bf", ps.real, sinf) + \
                _es("...fc,bcf->...bf", ps.imag, cosf)
        else:
            re = _es("...fc,bcf->...bf", ps, cosf)
            im = _es("...fc,bcf->...bf", ps, sinf)
    else:
        ps = psky_c if mp_idx is None else \
            jnp.take(psky_c, jnp.asarray(mp_idx), axis=-3)  # (..., B, F, C)
        if jnp.iscomplexobj(ps):
            re = _es("...bfc,bcf->...bf", ps.real, cosf) - \
                _es("...bfc,bcf->...bf", ps.imag, sinf)
            im = _es("...bfc,bcf->...bf", ps.real, sinf) + \
                _es("...bfc,bcf->...bf", ps.imag, cosf)
        else:
            re = _es("...bfc,bcf->...bf", ps, cosf)
            im = _es("...bfc,bcf->...bf", ps, sinf)
    return jax.lax.complex(re, im).astype(out_dtype)


def rime_reduce(psky, tau, freqs, mp_idx=None, conj=False, chunk=1024,
                remat=True, use_pallas="auto", blvecs=None, s_c=None):
    """Pixel-chunked, remat'ed RIME reduction.

    Same contract as rime_reduce_ref (psky in model-pair space). `chunk`
    pixels per scan step; if Npix is not divisible the remainder runs as
    one extra unrolled block.

    use_pallas: 'auto' dispatches float32 regular-frequency-grid cases
    to the fused Pallas TPU kernels (ops/rime_pallas.py) when running on
    TPU; True forces it; False disables.

    tau may be None if (blvecs, s_c) are given: the delay matrix is then
    built inside the fused op's fwd/bwd (never a VJP residual) or, on
    the XLA fallback, materialized here.
    """
    npix = psky.shape[-1]
    freqs = np.asarray(freqs, dtype=np.float64)

    if use_pallas and _pallas_eligible(psky, mp_idx, freqs, use_pallas):
        return _rime_fused_dispatch(psky, tau, freqs, mp_idx, conj,
                                    blvecs=blvecs, s_c=s_c)
    if tau is None:
        # true-f32 delays (TPU default matmul precision is bf16; phase
        # accuracy scales as 2*pi*f*dtau)
        tau = jnp.matmul(blvecs, s_c,
                         precision=jax.lax.Precision.HIGHEST)
    rdtype = jnp.result_type(psky.real.dtype, tau.dtype)
    out_dtype = jnp.result_type(rdtype, jnp.complex64)

    def body(ps, tc):
        return _chunk_body(ps, tc, freqs, mp_idx, conj, out_dtype)

    if remat:
        body = jax.checkpoint(body)

    if npix <= chunk:
        return body(psky, tau)

    nfull = npix // chunk
    rem = npix - nfull * chunk

    # main chunks via scan
    ps_main = psky[..., :nfull * chunk]
    ps_c = jnp.moveaxis(
        ps_main.reshape(ps_main.shape[:-1] + (nfull, chunk)), -2, 0)
    tau_c = jnp.moveaxis(
        tau[..., :nfull * chunk].reshape(tau.shape[:-1] + (nfull, chunk)),
        -2, 0)

    def step(acc, xs):
        ps, tc = xs
        return acc + body(ps, tc), None

    nb = tau.shape[0]
    out_shape = psky.shape[:-3] + (nb, psky.shape[-2])
    init = jnp.zeros(out_shape, dtype=out_dtype)
    out, _ = jax.lax.scan(step, init, (ps_c, tau_c))

    if rem:
        out = out + body(psky[..., -rem:], tau[..., -rem:])
    return out
