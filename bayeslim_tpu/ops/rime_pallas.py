"""
Fused Pallas TPU kernel for the RIME pixel reduction.

Computes V[b, f] = sum_c psky[f, c] * exp(2 pi i f tau[b, c]) without ever
materializing the (Nbls, Nfreqs, Npix) fringe in HBM: each grid step
streams a (bl-tile x pixel-tile) block of tau and a (freq-tile x
pixel-tile) block of psky into VMEM, builds the cos/sin fringe factors
on the fly (float32-safe mod-1 phase reduction, see ops/phase.py), and
accumulates the visibility block with two MXU matmuls.

Grid order (bl, pix, freq): the phase seeds c0 = mod1(f0 tau) and
c1 = mod1(df tau) depend only on (bl, pix), so they are computed once per
(bl, pix) tile (at freq-tile 0) into VMEM scratch and reused across the
frequency sweep.

Forward only: the backward pass recomputes fringe factors via the chunked
XLA path (ops/rime_kernel.py) through jax.custom_vjp — the VJP
contractions are themselves matmul-shaped and XLA handles them well.

Constraints of this kernel (callers fall back to rime_reduce otherwise):
- shared beam (Nmp == 1), real or complex psky collapsed to (Nfreqs, Npix)
- regular frequency grid f = f0 + k df
- float32 data.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .phase import fringe_cycles, mod1

__all__ = ["rime_pallas_reduce", "pallas_available"]


def pallas_available():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _tile(n, pref, mult):
    """Pick a tile size (multiple of `mult`, <= pref) and the padded
    total; Mosaic requires lane dims to be 128-multiples and sublane
    dims 8-multiples at runtime."""
    padded = _round_up(n, mult)
    t = min(pref, padded)
    t = _round_up(t, mult)
    padded = _round_up(padded, t)
    return t, padded


def _split_f32(f):
    """Split a float into (a, b, lo): a has <=12 mantissa bits scaled,
    a + b + lo == f in f64; used for exact mod-1 products in f32."""
    f = float(f)
    hi = np.float32(f)
    a = np.float32(np.floor(np.float64(hi) / 4096.0) * 4096.0)
    b = np.float32(np.float64(hi) - np.float64(a))
    lo = np.float32(f - float(hi))
    return float(a), float(b), float(lo)


def _rime_kernel(tau_ref, ps_re_ref, ps_im_ref, out_re_ref, out_im_ref,
                 acc_re_ref, acc_im_ref, *, f0_split, df_split, tf, nc,
                 conj):
    """Grid (bl, freq, pix): pixel tiles innermost so the (bl, freq)
    output block accumulates contiguously; phase seeds recomputed per
    pixel tile (cheap relative to the tf-deep frequency loop)."""
    ic = pl.program_id(2)

    @pl.when(ic == 0)
    def _():
        acc_re_ref[:, :] = jnp.zeros_like(acc_re_ref)
        acc_im_ref[:, :] = jnp.zeros_like(acc_im_ref)

    # phase seeds for this (bl, pix) tile
    tau = tau_ref[:, :]                        # (TB, TC)
    a0, b0, l0 = f0_split
    a1, b1, l1 = df_split
    c0 = mod1(mod1(a0 * tau) + mod1(b0 * tau) + l0 * tau)
    c1 = mod1(mod1(a1 * tau) + mod1(b1 * tau) + l1 * tau)

    if_ = pl.program_id(1)
    k0 = (if_ * tf).astype(jnp.float32)
    sgn = -1.0 if conj else 1.0

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tf), 1)

    # phasor recurrence: seed E = exp(i 2 pi (c0 + k0 c1)) once per tile,
    # then rotate by delta = exp(i 2 pi c1) per frequency step — replaces
    # per-step transcendentals with 4 FMAs (unitary rotation: error grows
    # only as sqrt(tf) * eps, re-seeded exactly at every freq tile).
    ang0 = (2 * np.pi) * mod1(c0 + mod1(k0 * c1))
    cos0 = jnp.cos(ang0)
    sin0 = sgn * jnp.sin(ang0)
    angd = (2 * np.pi) * c1
    cosd = jnp.cos(angd)
    sind = sgn * jnp.sin(angd)

    def freq_body(j, carry):
        cosf, sinf = carry
        pr = ps_re_ref[pl.ds(j, 1), :]          # (1, TC)
        pi_ = ps_im_ref[pl.ds(j, 1), :]
        re = jnp.sum(cosf * pr - sinf * pi_, axis=1, keepdims=True)
        im = jnp.sum(sinf * pr + cosf * pi_, axis=1, keepdims=True)
        # dynamic lane writes must be 128-aligned: scatter the (TB, 1)
        # column into the (TB, TF) accumulator via a one-hot broadcast
        onehot = (lane == j).astype(jnp.float32)
        acc_re_ref[:, :] += re * onehot
        acc_im_ref[:, :] += im * onehot
        return (cosf * cosd - sinf * sind, sinf * cosd + cosf * sind)

    jax.lax.fori_loop(0, tf, freq_body, (cos0, sin0))

    @pl.when(ic == nc - 1)
    def _():
        out_re_ref[:, :] = acc_re_ref[:, :]
        out_im_ref[:, :] = acc_im_ref[:, :]


def rime_pallas_reduce(psky, tau, freqs, conj=False, tb=256, tc=512, tf=128,
                       interpret=False):
    """Fused RIME reduction on TPU.

    psky : (Nfreqs, Npix) float32 or complex64 (shared-beam, 1-pol)
    tau : (Nbls, Npix) float32
    freqs : (Nfreqs,) numpy, regular grid

    Returns (Nbls, Nfreqs) complex64.
    """
    freqs = np.asarray(freqs, dtype=np.float64)
    nb, npx = tau.shape
    nf = len(freqs)
    assert psky.shape == (nf, npx), (psky.shape, (nf, npx))
    f0 = float(freqs[0])
    df = float(freqs[1] - freqs[0]) if nf > 1 else 0.0
    assert nf == 1 or np.allclose(np.diff(freqs), df, rtol=1e-10), \
        "pallas kernel needs a regular frequency grid"

    tb, NB = _tile(nb, tb, 8)
    tc, NC = _tile(npx, tc, 128)
    # freq: trailing dim of the output block -> 128-multiple (or full)
    tf, NF = (nf, nf) if nf <= 128 else _tile(nf, tf, 128)

    def pad_axis(x, axis, size):
        n = x.shape[axis]
        if n == size:
            return x
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, size - n)
        return jnp.pad(x, pads)

    tau_p = pad_axis(pad_axis(jnp.asarray(tau, jnp.float32), 0, NB), 1, NC)
    if jnp.iscomplexobj(psky):
        ps_re = pad_axis(pad_axis(psky.real.astype(jnp.float32), 0, NF), 1, NC)
        ps_im = pad_axis(pad_axis(psky.imag.astype(jnp.float32), 0, NF), 1, NC)
    else:
        ps_re = pad_axis(pad_axis(psky.astype(jnp.float32), 0, NF), 1, NC)
        ps_im = jnp.zeros_like(ps_re)

    nc = NC // tc
    grid = (NB // tb, NF // tf, nc)

    kernel = functools.partial(
        _rime_kernel, f0_split=_split_f32(f0), df_split=_split_f32(df),
        tf=tf, nc=nc, conj=conj)

    out_shape = [jax.ShapeDtypeStruct((NB, NF), jnp.float32),
                 jax.ShapeDtypeStruct((NB, NF), jnp.float32)]
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tc), lambda ib, if_, ic: (ib, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tf, tc), lambda ib, if_, ic: (if_, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tf, tc), lambda ib, if_, ic: (if_, ic),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, tf), lambda ib, if_, ic: (ib, if_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tf), lambda ib, if_, ic: (ib, if_),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, tf), jnp.float32),
            pltpu.VMEM((tb, tf), jnp.float32),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(tau_p, ps_re, ps_im)

    out = jax.lax.complex(out_re, out_im)[:nb, :nf]
    return out


def _dtau_kernel(tau_ref, psr_ref, psi_ref, ctr_ref, cti_ref, out_ref,
                 *, f0_split, df_split, nf, conj):
    """tau cotangent: out[b,c] = sum_f 2 pi f * d/dtau of
    Re(conj(ct) V). Grid (bl, pix), each block visited once; full
    frequency sweep in-kernel with the phasor recurrence."""
    tau = tau_ref[:, :]                        # (TB, TC)
    a0, b0, l0 = f0_split
    a1, b1, l1 = df_split
    c0 = mod1(mod1(a0 * tau) + mod1(b0 * tau) + l0 * tau)
    c1 = mod1(mod1(a1 * tau) + mod1(b1 * tau) + l1 * tau)
    sgn = -1.0 if conj else 1.0
    ang0 = (2 * np.pi) * c0
    cos0 = jnp.cos(ang0)
    sin0 = sgn * jnp.sin(ang0)
    angd = (2 * np.pi) * c1
    cosd = jnp.cos(angd)
    sind = sgn * jnp.sin(angd)

    f0v = a0 + b0 + l0
    dfv = a1 + b1 + l1

    def body(j, carry):
        cosf, sinf, acc = carry
        jf = j.astype(jnp.float32)
        pr = psr_ref[pl.ds(j, 1), :]            # (1, TC)
        pi_ = psi_ref[pl.ds(j, 1), :]
        # ct passed transposed (NF, TB): dynamic sublane reads are legal,
        # dynamic lane reads are not; (1, TB) -> (TB, 1) is a reshape
        ctr = ctr_ref[pl.ds(j, 1), :].reshape(-1, 1)
        cti = cti_ref[pl.ds(j, 1), :].reshape(-1, 1)
        # w = conj(ct) * ps * E ; tau_bar -= 2 pi f * Im(w) * (+1|-1 conj)
        u = ctr * pr + cti * pi_                # Re(conj(ct) ps)
        v = ctr * pi_ - cti * pr                # Im(conj(ct) ps)
        im_w = u * sinf + v * cosf
        two_pi_f = (2 * np.pi) * (f0v + jf * dfv)
        # tau_bar = -+ 2 pi f Im(w): minus for the +i phase convention,
        # plus when the forward used the conjugated fringe
        acc = acc - sgn * two_pi_f * im_w
        return (cosf * cosd - sinf * sind,
                sinf * cosd + cosf * sind, acc)

    acc0 = jnp.zeros_like(tau)
    _, _, acc = jax.lax.fori_loop(0, nf, body, (cos0, sin0, acc0))
    out_ref[:, :] = acc


def _dtau_pallas(ct, psky, tau, freqs, conj=False, tb=256, tc=512,
                 interpret=False):
    """Pallas tau-cotangent: ct (Nbls, Nfreqs) complex, psky (Nf, Npix),
    tau (Nbls, Npix) -> dtau (Nbls, Npix) float32."""
    freqs = np.asarray(freqs, dtype=np.float64)
    nb, npx = tau.shape
    nf = len(freqs)
    f0 = float(freqs[0])
    df = float(freqs[1] - freqs[0]) if nf > 1 else 0.0
    # tb is a lane dim of the transposed ct blocks -> 128-multiple
    tb, NB = _tile(nb, tb, 128)
    tc, NC = _tile(npx, tc, 128)

    def pad_axis(x, axis, size):
        n = x.shape[axis]
        if n == size:
            return x
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, size - n)
        return jnp.pad(x, pads)

    tau_p = pad_axis(pad_axis(jnp.asarray(tau, jnp.float32), 0, NB), 1, NC)
    if jnp.iscomplexobj(psky):
        psr = pad_axis(psky.real.astype(jnp.float32), 1, NC)
        psi = pad_axis(psky.imag.astype(jnp.float32), 1, NC)
    else:
        psr = pad_axis(psky.astype(jnp.float32), 1, NC)
        psi = jnp.zeros_like(psr)
    ctr = pad_axis(ct.real.astype(jnp.float32).T, 1, NB)   # (NF, NB)
    cti = pad_axis(ct.imag.astype(jnp.float32).T, 1, NB)

    kernel = functools.partial(_dtau_kernel, f0_split=_split_f32(f0),
                               df_split=_split_f32(df), nf=nf, conj=conj)
    out = pl.pallas_call(
        kernel,
        grid=(NB // tb, NC // tc),
        in_specs=[
            pl.BlockSpec((tb, tc), lambda ib, ic: (ib, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nf, tc), lambda ib, ic: (0, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nf, tc), lambda ib, ic: (0, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nf, tb), lambda ib, ic: (0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nf, tb), lambda ib, ic: (0, ib),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tc), lambda ib, ic: (ib, ic),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, NC), jnp.float32),
        interpret=interpret,
    )(tau_p, psr, psi, ctr, cti)
    return out[:nb, :npx]


def _chunk_forward(ps, tu, freqs, conj):
    """XLA forward of one pixel chunk: sum_c ps[f,c] E[b,f,c]."""
    cyc = fringe_cycles(tu, freqs)            # (B, C, F)
    ang = (2 * np.pi) * cyc
    s = -1.0 if conj else 1.0
    cosf, sinf = jnp.cos(ang), s * jnp.sin(ang)
    if jnp.iscomplexobj(ps):
        re = jnp.einsum("fc,bcf->bf", ps.real, cosf) - \
            jnp.einsum("fc,bcf->bf", ps.imag, sinf)
        im = jnp.einsum("fc,bcf->bf", ps.real, sinf) + \
            jnp.einsum("fc,bcf->bf", ps.imag, cosf)
    else:
        re = jnp.einsum("fc,bcf->bf", ps, cosf)
        im = jnp.einsum("fc,bcf->bf", ps, sinf)
    return jax.lax.complex(re, im)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rime_fused(psky, tau, freqs_tuple, conj=False):
    """Differentiable fused reduction: forward on the Pallas kernel,
    backward via chunked automatic VJP of the XLA path (recomputes fringe
    factors; memory stays O(chunk))."""
    freqs = np.asarray(freqs_tuple)
    return rime_pallas_reduce(psky, tau, freqs, conj=conj)


def _fwd(psky, tau, freqs_tuple, conj):
    return rime_fused(psky, tau, freqs_tuple, conj), (psky, tau)


def _bwd(freqs_tuple, conj, res, ct):
    psky, tau = res
    freqs = np.asarray(freqs_tuple)

    if pallas_available():
        # dpsky: the b-reduction has the same chirp structure as the
        # forward's c-reduction with (b <-> c) swapped and the phasor
        # conjugated: ps_bar[f,c] = sum_b conj(E) ct = fwd(ct^T, tau^T,
        # conj=not conj)^T
        D = rime_pallas_reduce(ct.T, tau.T, freqs, conj=not conj)
        dps = D.T
        if not jnp.iscomplexobj(psky):
            dps = dps.real.astype(psky.dtype)
        else:
            dps = dps.astype(psky.dtype)
        dtau = _dtau_pallas(ct, psky, tau, freqs, conj=conj).astype(tau.dtype)
        return dps, dtau

    # XLA fallback: chunked automatic VJP (V = sum over chunks -> each
    # chunk's vjp uses the same cotangent)
    npx = tau.shape[-1]
    chunk = 2048
    dps_parts, dtau_parts = [], []
    for i in range(max(1, int(np.ceil(npx / chunk)))):
        sl = slice(i * chunk, min((i + 1) * chunk, npx))
        f = lambda ps, tu: _chunk_forward(ps, tu, freqs, conj)
        _, vjp_fn = jax.vjp(f, psky[..., sl], tau[..., sl])
        dps, dtau = vjp_fn(ct)
        dps_parts.append(dps)
        dtau_parts.append(dtau)
    return (jnp.concatenate(dps_parts, axis=-1),
            jnp.concatenate(dtau_parts, axis=-1))


rime_fused.defvjp(_fwd, _bwd)
