"""
Spherical-harmonic beam response (YlmResponse) and AlmBeam.

Reference parity: bayeslim/beam_model.py YlmResponse (:1019-1405),
AlmBeam (:1408). The response maps a_lm beam coefficients -> pixelized
beam: frequency linear mapping, then AlmModel.forward_alm onto a fixed
angular grid, then interpolation onto requested angles ('interpolate'
mode; the memory-sane default, beam_model.py:1239-1265) or direct
evaluation at per-time angles via per-grid Ylm matrices ('generate'
mode).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import Module, PixInterp
from ..utils.dtypes import D2R, _float, viewcomp
from ..ops.sph_harm import AlmModel, gen_sph2pix
from .beam import beam_edge_taper

__all__ = ["YlmResponse", "AlmBeam"]


class YlmResponse(Module):
    """a_lm -> beam response for PixelBeam (reference :1019-1405).

    params (Npol, Nvec, Nmodel, Ndeg, Ncoeff): Ndeg are frequency
    coefficients (freq_mode 'channel' keeps Ndeg == Nfreqs; 'linear' maps
    through freq_LM first).

    mode='interpolate': the beam is synthesized once per forward on the
    native grid (theta_grid/phi_grid or healpix nside) and interpolated
    onto requested angles using the precomputed ctx — the jit path used
    by RIME. mode='generate' synthesizes directly at the requested
    angles; the per-angle Ylm matrix must be supplied via ctx (RIME
    precompute) or set with setup_Ylm.
    """

    def __init__(self, l, m, freqs, mode="interpolate", pixtype="healpix",
                 nside=None, theta_grid=None, phi_grid=None,
                 interp_mode="linear", freq_mode="channel", freq_LM=None,
                 comp_params=False, powerbeam=True, realbeam=True, log=False,
                 beam0=None, norm_pix=None, taper_kwargs=None, Ylm_kwargs=None,
                 name=None):
        super().__init__(name=name)
        self.alm = AlmModel(l, m, real_output=realbeam)
        self.freqs = np.asarray(freqs, dtype=np.float64)
        self.mode = mode
        self.pixtype = pixtype
        self.freq_mode = freq_mode
        self.freq_LM = freq_LM
        self.comp_params = comp_params
        self.powerbeam = powerbeam
        self.realbeam = realbeam
        self.log = log
        self.beam0 = None if beam0 is None else jnp.asarray(beam0)
        self.norm_pix = norm_pix
        self.taper_kwargs = taper_kwargs
        Ylm_kwargs = Ylm_kwargs or {}

        if mode == "interpolate":
            # build the native grid + its Ylm transform + interpolator
            if pixtype == "healpix":
                from ..utils import healpix as hp
                assert nside is not None
                npix = hp.nside2npix(nside)
                theta, phi = hp.pix2ang(nside, np.arange(npix))
                self.interp = PixInterp("healpix", nside=nside,
                                        interp_mode=interp_mode)
                self.alm.generate_Ylm(theta, phi, **Ylm_kwargs)
            else:
                assert theta_grid is not None and phi_grid is not None
                th, ph = AlmModel.setup_angs(np.asarray(theta_grid) * D2R,
                                             np.asarray(phi_grid) * D2R,
                                             separable=True)
                self.interp = PixInterp("rect", interp_mode=interp_mode,
                                        theta_grid=theta_grid,
                                        phi_grid=phi_grid)
                sep = Ylm_kwargs.pop("separable", True)
                self.alm.generate_Ylm(
                    np.asarray(theta_grid) * D2R, np.asarray(phi_grid) * D2R,
                    separable=True, **Ylm_kwargs) if sep else \
                    self.alm.generate_Ylm(th, ph, **Ylm_kwargs)

    def setup_Ylm(self, Ylm, alm_mult=None):
        """Attach a precomputed Ylm (generate mode / custom grids)."""
        self.alm.setup_Ylm(Ylm, alm_mult=alm_mult)

    def precompute(self, zen, az):
        """Interp ctx for target angles [deg] (interpolate mode)."""
        assert self.mode == "interpolate"
        return self.interp.precompute(np.asarray(zen), np.asarray(az))

    def _freq_transform(self, params):
        if self.comp_params and not jnp.iscomplexobj(params):
            params = viewcomp(params)
        if self.beam0 is not None:
            params = params + self.beam0
        if self.freq_mode == "linear":
            params = self.freq_LM(params)
        if getattr(self, "_lm_poly", False):
            params = self.lm_poly_forward(params)
        return params

    # --- per-m polynomial compression over l (reference :1284-1405) -------
    def lm_poly_setup(self, lm_poly_kwargs=None):
        """Compress the l axis per integer m with polynomial bases: the
        params' last dim holds poly weights (concatenated over m groups in
        increasing-m order); lm_poly_forward expands them to Ncoeff."""
        from .linear_model import gen_poly_A
        self._lm_poly_kwargs = lm_poly_kwargs or {}
        self._lm_poly = bool(lm_poly_kwargs)
        if not self._lm_poly:
            return
        l, m = np.asarray(self.alm.l), np.asarray(self.alm.m)
        munique = np.unique(m)
        assert np.allclose(munique % 1, 0), "lm_poly needs integer m"
        self.lm_poly_A = {}
        i = 0
        for mm in munique:
            lm_inds = np.where(m == mm)[0]
            kw = dict(lm_poly_kwargs.get(mm, lm_poly_kwargs)
                      if mm in lm_poly_kwargs else lm_poly_kwargs)
            Ndeg = kw.pop("Ndeg")
            if Ndeg is None:
                Ndeg = len(lm_inds)
                A = None
            else:
                A = gen_poly_A(l[lm_inds], Ndeg, **{k: v for k, v in kw.items()
                                                    if k != "Ndeg"})
            p_inds = i + np.arange(Ndeg)
            i += Ndeg
            self.lm_poly_A[float(mm)] = (lm_inds, p_inds, A)
        self._lm_poly_ncoeff_in = i

    def lm_poly_fit(self, params, fit_kwargs=None):
        """Least-squares fit per-m poly weights from a full a_lm tensor:
        the inverse of lm_poly_forward (reference beam_model.py
        lm_poly_fit :1347-1381). params (..., Ncoeff) -> (..., Nweights)."""
        from ..ops.linalg import least_squares as _lsq
        assert self._lm_poly
        out = jnp.zeros(params.shape[:-1] + (self._lm_poly_ncoeff_in,),
                        dtype=params.dtype)
        fit_kwargs = fit_kwargs or {}
        for mm, (lm_inds, p_inds, A) in self.lm_poly_A.items():
            kw = fit_kwargs.get(mm, fit_kwargs) \
                if mm in fit_kwargs else fit_kwargs
            if A is not None:
                xhat, _ = _lsq(jnp.asarray(A, dtype=params.dtype),
                               params[..., lm_inds], dim=-1, **kw)
            else:
                xhat = params[..., lm_inds]
            out = out.at[..., p_inds].set(xhat)
        return out

    def lm_poly_forward(self, params):
        """Expand per-m poly weights (..., Nweights) -> (..., Ncoeff)."""
        out = jnp.zeros(params.shape[:-1] + (len(self.alm.l),),
                        dtype=params.dtype)
        for mm, (lm_inds, p_inds, A) in self.lm_poly_A.items():
            block = params[..., p_inds]
            if A is not None:
                block = jnp.einsum("lc,...c->...l", A.astype(params.dtype),
                                   block)
            out = out.at[..., lm_inds].set(block)
        return out

    def grid_beam(self, params):
        """params -> beam maps on the native grid (Np,Nv,Nm,Nf,Npix)."""
        p = self._freq_transform(params)
        # alm -> map: contract Ncoeff (last axis)
        beam = self.alm.forward_alm(p)
        if self.log:
            beam = jnp.exp(beam)
        if self.realbeam and jnp.iscomplexobj(beam):
            beam = beam.real
        if self.norm_pix is not None:
            beam = beam / beam[..., self.norm_pix:self.norm_pix + 1]
        return beam

    def forward(self, params, zen, az, freqs, ctx=None, **kwargs):
        if self.mode == "interpolate":
            beam = self.grid_beam(params)
            if ctx is None:
                inds, wgts = self.precompute(zen, az)
            else:
                inds, wgts = ctx
            out = self.interp.interp(beam, inds=inds, wgts=wgts)
        else:
            # generate: ctx is a (Ylm, alm_mult) pair evaluated at zen/az
            p = self._freq_transform(params)
            if ctx is not None:
                Ylm, alm_mult = ctx
                out = self.alm.forward_alm(p, Ylm=Ylm, alm_mult=alm_mult)
            else:
                out = self.alm.forward_alm(p)
            if self.log:
                out = jnp.exp(out)
            if self.realbeam and jnp.iscomplexobj(out):
                out = out.real
        if self.powerbeam:
            out = jnp.abs(out)
        if self.taper_kwargs is not None:
            out = out * beam_edge_taper(zen, **self.taper_kwargs)
        return out

    def gen_grid_Ylm(self, zen, az, **kwargs):
        """Host: generate a Ylm matrix at arbitrary angles [deg]
        (generate-mode per-time precompute)."""
        Y, _, am = gen_sph2pix(np.asarray(zen) * D2R, np.asarray(az) * D2R,
                               self.alm.l, self.alm.m, **kwargs)
        return Y, am


class AlmBeam(Module):
    """Beam parameterized directly in the harmonic domain
    (reference beam_model.py:1408 stub — implemented here as a thin
    YlmResponse in generate mode)."""

    def __init__(self, l, m, freqs, **kwargs):
        super().__init__()
        self.R = YlmResponse(l, m, freqs, mode="generate", **kwargs)

    def forward(self, params, zen, az, freqs, ctx=None, Ylm_kwargs=None,
                **kwargs):
        if ctx is None and self.R.alm.Ylm is None:
            # host angles [deg]: generate the harmonic transform on the
            # fly (precompute+pass ctx for traced/jitted callers)
            ctx = self.R.gen_grid_Ylm(np.asarray(zen), np.asarray(az),
                                      **(Ylm_kwargs or {}))
        return self.R(params, zen, az, freqs, ctx=ctx, **kwargs)
