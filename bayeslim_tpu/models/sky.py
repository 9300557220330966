"""
Sky models: point-source and pixelized skies with composable response
functions.

Reference parity: bayeslim/sky_model.py (SkyBase :13, PointSky :154,
PointSkyResponse :289, PixelSky :389, PixelSkyResponse :510,
CompositeModel :778, Stokes2Coherency :1160, read/write_catalogue
:1007,1088, Jy2K :1140).

Conventions preserved: sky data (Nstokes, 1, Nfreqs, Nsources); angs are
(2, Nsources) equatorial [RA, Dec] in degrees; PixelSky multiplies pixel
solid angle so the output is flux density [Jy].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import yaml

from ..utils import Module
from ..utils.dtypes import _float, viewcomp
from ..data.containers import MapData

__all__ = [
    "SkyBase", "DefaultResponse", "PointSky", "PointSkyResponse",
    "PixelSky", "PixelSkyResponse", "CompositeModel", "Stokes2Coherency",
    "read_catalogue", "write_catalogue", "Jy2K", "stokes2coherency",
]


class DefaultResponse(Module):
    """Identity response (reference sky_model.py:133-151)."""

    def __init__(self, freqs=None):
        super().__init__()
        self.freqs = None if freqs is None else np.asarray(freqs)
        self.freq_mode = "channel"

    def set_freq_index(self, idx=None):
        """No-op for the identity response (reference sky_model.py:141)."""
        pass

    def forward(self, params, **kwargs):
        return params


class SkyBase(Module):
    """Base sky block: output = R(params + p0) (reference :13-128)."""

    def __init__(self, params, angs, R=None, name=None, parameter=True,
                 p0=None):
        super().__init__(name=name)
        self.params = jnp.asarray(params)
        self.p0 = None if p0 is None else jnp.asarray(p0)
        self.R = R if R is not None else DefaultResponse()
        host = None if isinstance(angs, jax.Array) \
            else np.asarray(angs, dtype=np.float64)
        self.angs = jnp.asarray(angs)
        if host is not None:
            # host copy: angs are precompute metadata; a device->host
            # fetch of them pays the remote backend's first-fetch warmup
            self._angs_host = (self.angs, host)
        if parameter:
            self.set_param("params")

    @property
    def angs_np(self):
        """Host float64 numpy view of angs (cached; avoids device->host
        fetches in precompute paths — see AntposDict.asnumpy)."""
        h = getattr(self, "_angs_host", None)
        if h is None or h[0] is not self.angs:
            h = (self.angs, np.asarray(self.angs, dtype=np.float64))
            self._angs_host = h
        return h[1]

    def _response(self, params):
        if params is None:
            params = self.params
        p = params + self.p0 if self.p0 is not None else params
        return self.R(p)

    def forward(self, params=None, prior_cache=None, **kwargs):
        sky = self._response(params)
        self.eval_prior(prior_cache, inp_params=self.params, out_params=sky)
        md = MapData()
        md.setup_meta(name=self.name)
        md.setup_data(freqs=self.R.freqs, data=sky, angs=self.angs)
        return md

    def freq_interp(self, freqs, kind="linear"):
        """Interpolate channel-mode params onto new freqs (reference :99).
        No-op when the frequencies already match to 1 Hz (reference
        sky_model.py:115)."""
        from scipy.interpolate import interp1d
        freqs = np.asarray(freqs)
        cur = np.asarray(self.R.freqs)
        if len(freqs) == len(cur) and np.allclose(cur, freqs, atol=1.0):
            return
        if self.R.freq_mode == "channel":
            f = interp1d(np.asarray(self.R.freqs), np.asarray(self.params),
                         axis=2, kind=kind, fill_value="extrapolate")
            self.params = jnp.asarray(f(freqs), dtype=self.params.dtype)
        self.R.freqs = freqs


class PointSky(SkyBase):
    """Fixed-position point sources with variable flux (reference :154-287)."""

    def forward(self, params=None, prior_cache=None, **kwargs):
        return super().forward(params=params, prior_cache=prior_cache, **kwargs)


class PointSkyResponse(Module):
    """Frequency response for PointSky (reference :289-387).

    freq_mode: 'channel' | 'linear' | 'powerlaw'. params shape
    (Nstokes, 1, Ncoeff, Nsources); powerlaw uses Ncoeff=2 (amp, spix).
    """

    def __init__(self, freqs, freq_mode="channel", log=False, LM=None,
                 freq_LM=None, f0=None):
        super().__init__()
        self.freqs = np.asarray(freqs, dtype=np.float64)
        self.freq_mode = freq_mode
        self.log = log
        self.LM = LM
        self.freq_LM = freq_LM
        self.f0 = f0
        self._freqs_arr = jnp.asarray(self.freqs, dtype=_float())
        self._freq_idx = None

    def set_freq_index(self, idx=None):
        """Index the frequency axis of the response output (reference
        sky_model.py:368-378) — frequency minibatching hook."""
        self._freq_idx = None if idx is None else np.asarray(idx)

    def forward(self, params, **kwargs):
        if self.LM is not None:
            params = self.LM(params)
        if self.freq_mode == "channel":
            pass
        elif self.freq_mode == "linear":
            params = self.freq_LM(params)
        elif self.freq_mode == "powerlaw":
            amp = params[..., 0:1, :]
            if self.log:
                amp = jnp.exp(amp)
            params = amp * (self._freqs_arr[:, None] / self.f0) ** params[..., 1:2, :]
        if self.log and self.freq_mode in ("channel", "linear"):
            params = jnp.exp(params)
        if self._freq_idx is not None:
            params = jnp.take(params, jnp.asarray(self._freq_idx), axis=-2)
        return params


class PixelSky(SkyBase):
    """Pixelized sky brightness; output multiplied by pixel solid angle
    (reference :389-508)."""

    def __init__(self, params, angs, px_area, R=None, name=None,
                 parameter=True, p0=None):
        super().__init__(params, angs, R=R, name=name, parameter=parameter,
                         p0=p0)
        self.px_area = jnp.asarray(px_area)

    def forward(self, params=None, prior_cache=None, **kwargs):
        sky = self._response(params)
        self.eval_prior(prior_cache, inp_params=self.params, out_params=sky)
        md = MapData()
        md.setup_meta(name=self.name)
        md.setup_data(freqs=self.R.freqs, data=sky * self.px_area,
                      angs=self.angs, px_area=self.px_area)
        return md


class PixelSkyResponse(Module):
    """Spatial x frequency response for PixelSky (reference :510-733).

    spatial_mode: 'pixel' | 'linear' | 'alm' (spat_LM is a LinearModel or
    AlmModel). freq_mode: 'channel' | 'linear' | 'powerlaw' | 'bessel'
    (gln dict of per-l radial design matrices, kbins alongside).
    transform_order 0: spatial then freq; 1: freq then spatial.
    """

    def __init__(self, freqs, comp_params=False, spatial_mode="pixel",
                 freq_mode="channel", transform_order=0, cosmo=None,
                 spat_LM=None, freq_LM=None, f0=None, gln=None, kbins=None,
                 log=False, real_output=True, abs_output=False, LM=None,
                 sky0=None):
        super().__init__()
        self.freqs = np.asarray(freqs, dtype=np.float64)
        self.Nfreqs = len(self.freqs)
        self.comp_params = comp_params
        self.spatial_mode = spatial_mode
        self.freq_mode = freq_mode
        self.transform_order = transform_order
        self.log = log
        self.real_output = real_output
        self.abs_output = abs_output
        self.LM = LM
        self.spat_LM = spat_LM
        self.freq_LM = freq_LM
        self.f0 = f0
        self.gln = gln
        self.kbins = kbins
        self.sky0 = None if sky0 is None else jnp.asarray(sky0)
        self._freqs_arr = jnp.asarray(self.freqs, dtype=_float())
        self._freq_idx = None
        if freq_mode == "bessel":
            if cosmo is None:
                from .cosmology import Cosmology
                cosmo = Cosmology()
            self.cosmo = cosmo
            self.l_arr = np.unique(np.concatenate([np.atleast_1d(k) for k in gln.keys()]))

    def spatial_transform(self, params):
        if self.comp_params and not jnp.iscomplexobj(params):
            params = viewcomp(params)
        if self.spatial_mode == "pixel":
            return params
        return self.spat_LM(params)

    def freq_transform(self, params):
        if self.comp_params and not jnp.iscomplexobj(params):
            params = viewcomp(params)
        if self.freq_mode == "channel":
            return params
        if self.freq_mode == "linear":
            return self.freq_LM(params)
        if self.freq_mode == "powerlaw":
            return params[..., 0:1, :] * (self._freqs_arr[:, None] / self.f0) ** params[..., 1:2, :]
        if self.freq_mode == "bessel":
            assert self.transform_order == 1, \
                "bessel freq mode requires transform_order=1"
            out = jnp.zeros(params.shape[:-2] + (self.Nfreqs,) + params.shape[-1:],
                            dtype=params.dtype)
            for l, g in self.gln.items():
                inds = np.where(self.l_arr == l)[0]
                # g: (Nfreqs, Nn); params slice (..., Nn, Nl_modes)
                contrib = jnp.einsum("fn,...nc->...fc", jnp.asarray(g),
                                     params[..., :, inds])
                out = out.at[..., inds].add(contrib)
            return out
        raise ValueError(f"unknown freq_mode {self.freq_mode}")

    def forward(self, params, **kwargs):
        if self.LM is not None:
            params = self.LM(params)
        if self.transform_order == 0:
            params = self.spatial_transform(params)
            params = self.freq_transform(params)
        else:
            params = self.freq_transform(params)
            params = self.spatial_transform(params)
        if self.real_output and jnp.iscomplexobj(params):
            params = params.real
        if self.log:
            params = jnp.exp(params)
        if self.sky0 is not None:
            params = params + self.sky0
        if self.abs_output:
            params = jnp.abs(params)
        if self._freq_idx is not None:
            params = jnp.take(params, jnp.asarray(self._freq_idx), axis=-2)
        return params

    def set_freq_index(self, idx=None):
        """Index the frequency axis of the response output (reference
        sky_model.py:703-713) — frequency minibatching hook."""
        self._freq_idx = None if idx is None else np.asarray(idx)


class CompositeModel(Module):
    """Multiple sky components, optionally summed (reference :778-936).

    index (reference sky_model.py:805-830) enables summing components of
    DIFFERENT resolutions / spatial extents into the first (highest
    resolution) component: {model_key: (pred_index, this_index)} where
    pred_index selects the accumulating map's Npix entries that receive
    this component (e.g. a truncated-extent map's pixels) and this_index
    expands this component's pixels onto the accumulator's grid (e.g.
    nside-32 -> nside-64 by repeating each coarse pixel). Either may be
    None. Without sum_output the components are returned as a list (the
    RIME integrates each on its own grid).
    """

    def __init__(self, models, sum_output=False, index=None, name=None):
        super().__init__(name=name)
        self.models = dict(models) if isinstance(models, dict) else \
            {m.name: m for m in models}
        self.sum_output = sum_output
        self.index = None
        if index is not None:
            self.index = {k: (None if pi is None else np.asarray(pi),
                              None if ti is None else np.asarray(ti))
                          for k, (pi, ti) in index.items()}

    def set_eval_models(self, models=None):
        """Restrict which components are evaluated on forward
        (reference :845-861)."""
        self.eval_models = None if models is None else (
            [models] if isinstance(models, str) else list(models))

    def forward(self, prior_cache=None, **kwargs):
        keys = getattr(self, "eval_models", None) or list(self.models)
        outs = {k: self.models[k].forward(prior_cache=prior_cache, **kwargs)
                for k in keys}
        if self.sum_output:
            md = outs[keys[0]]
            data = md.data
            for k in keys[1:]:
                d = outs[k].data
                pi, ti = (None, None) if self.index is None \
                    else self.index.get(k, (None, None))
                if ti is not None:
                    d = jnp.take(d, jnp.asarray(ti), axis=-1)
                if pi is not None:
                    data = data.at[..., jnp.asarray(pi)].add(d)
                else:
                    data = data + d
            md.data = data
            return md
        return list(outs.values())


def stokes2coherency(S):
    """Stokes sky (Nstokes<=4, 1, ...) or (2, 2, ...) -> 2x2 coherency B
    in the linear feed basis, with the REFERENCE's conventions
    (sky_model.py:1160-1330): entries after I are FRACTIONAL
    ([I, f_Q, f_U, f_V] with Q = I f_Q etc.; the (2, 2, ...) ordering is
    [[I, f_Q], [f_U, f_V]]), and

        B = [[I + Q, U - iV], [U + iV, I - Q]]

    (no 1/2: the reference folds the normalization into the sky
    amplitude). Stokes-I-only input returns the (1, 1, ...) power sky.
    """
    if S.shape[:2] == (2, 2):
        I, fQ, fU, fV = S[0, 0], S[0, 1], S[1, 0], S[1, 1]
    else:
        ns = S.shape[0]
        if ns == 1:
            return S
        I = S[0, 0]
        fQ = S[1, 0]
        fU = S[2, 0] if ns > 2 else 0.0
        fV = S[3, 0] if ns > 3 else 0.0
    Q, U, V = I * fQ, I * fU, I * fV
    B00 = I + Q
    B11 = I - Q
    B01 = U - 1j * V
    B10 = U + 1j * V
    cdt = jnp.result_type(B00, 1j)
    row0 = jnp.stack([jnp.asarray(B00, dtype=cdt),
                      jnp.asarray(B01, dtype=cdt)], axis=0)
    row1 = jnp.stack([jnp.asarray(B10, dtype=cdt),
                      jnp.asarray(B11, dtype=cdt)], axis=0)
    return jnp.stack([row0, row1], axis=0)


class Stokes2Coherency(Module):
    """Block converting a Stokes sky MapData to coherency form
    (reference :1160-1355)."""

    def forward(self, sky_comp, prior_cache=None, **kwargs):
        if isinstance(sky_comp, list):
            return [self.forward(s) for s in sky_comp]
        md = sky_comp.copy()
        md.data = stokes2coherency(sky_comp.data)
        return md


def read_catalogue(catfile, freqs=None, device=None, parameter=False,
                   freq_interp="linear"):
    """Read a YAML point-source catalogue (reference sky_model.py:1007-1086).

    Uses the reference's columnar schema — ``sources`` holds parallel
    lists (``name``, ``ra``, ``dec``, plus ``amp``/``alpha`` for powerlaw
    or ``freq{i}`` rows for channel mode) with ``mode_kwargs: {f0: ...}``
    — exactly as in the reference's bundled GLEAM_ATEAM.yml and
    pointsource_*_cat.yaml files, which load verbatim (parity-tested).

    Returns (params, angs, meta) arrays ready for PointSky; powerlaw
    catalogues yield params (1, 1, 2, Nsource) [amp, alpha] and need a
    PointSkyResponse(freq_mode='powerlaw', f0=meta['f0']).  Channel
    catalogues are interpolated onto `freqs` when given (scipy interp1d,
    fill_value='extrapolate', matching the reference); with freqs=None the
    catalogue's own channel fluxes are returned (the reference instead
    returns all-ones here — sky_model.py:1060-1062 — discarding the
    fluxes; we keep them).
    """
    with open(catfile) as f:
        cat = yaml.safe_load(f)
    sources = cat["sources"]
    mode = cat.get("freq_mode", "powerlaw")
    mode_kwargs = dict(cat.get("mode_kwargs") or {})

    ra = np.asarray(sources["ra"], dtype=np.float64)
    dec = np.asarray(sources["dec"], dtype=np.float64)
    names = (list(sources["name"]) if "name" in sources
             else [f"src{i}" for i in range(len(ra))])
    angs = np.stack([ra, dec])

    if mode == "powerlaw":
        f0 = mode_kwargs.get("f0", cat.get("f0", 150e6))
        f0 = float(f0) if f0 is not None else None
        amp = np.asarray(sources["amp"], dtype=np.float64)
        alpha = np.asarray(sources.get("alpha", sources.get("spix", 0.0)),
                           dtype=np.float64)
        alpha = np.broadcast_to(np.atleast_1d(alpha), amp.shape)
        params = np.stack([amp, alpha])[None, None]  # (1, 1, 2, Nsrc)
        meta = dict(f0=f0, freq_mode="powerlaw", names=names)
    elif mode == "channel":
        cat_freqs = np.asarray(cat["freqs"], dtype=np.float64)
        S = np.asarray([sources[f"freq{i}"] for i in range(len(cat_freqs))],
                       dtype=np.float64)  # (Nfreq_cat, Nsrc)
        if freqs is not None:
            from scipy import interpolate
            S = interpolate.interp1d(cat_freqs, S, kind=freq_interp, axis=0,
                                     fill_value="extrapolate")(np.asarray(freqs))
            out_freqs = np.asarray(freqs, dtype=np.float64)
        else:
            out_freqs = cat_freqs
        params = S[None, None]  # (1, 1, Nfreq, Nsrc)
        meta = dict(freq_mode="channel", names=names, freqs=out_freqs,
                    f0=None)
    else:
        raise NotImplementedError(f"freq_mode {mode}")
    return jnp.asarray(params, dtype=_float()), jnp.asarray(angs), meta


def write_catalogue(catfile, params, angs=None, names=None,
                    freq_mode="powerlaw", f0=150e6, freqs=None,
                    overwrite=False, sky=None):
    """Write a YAML point-source catalogue in the reference's columnar
    schema (reference sky_model.py:1088-1138), readable by the reference's
    own read_catalogue. The reference form write_catalogue(catfile, sky,
    names) passes a PointSky as the 2nd positional (or sky=): its
    params/angs/response mode are extracted."""
    import os
    if sky is None and hasattr(params, "angs") and hasattr(params, "params"):
        sky = params
    if sky is not None:
        if names is None and angs is not None and not hasattr(angs, "ndim"):
            names = angs  # reference positional: (catfile, sky, names)
        params, angs = sky.params, sky.angs
        R = getattr(sky, "R", None)
        if R is not None:
            freq_mode = getattr(R, "freq_mode", freq_mode)
            f0 = getattr(R, "f0", f0)
        if freq_mode == "channel":
            freqs = getattr(sky, "freqs", freqs)
    if os.path.exists(catfile) and not overwrite:
        raise FileExistsError(catfile)
    params = np.asarray(params)
    angs = np.asarray(angs)
    n = angs.shape[1]
    names = names if names is not None else [f"src{i}" for i in range(n)]
    sources = dict(name=list(names), ra=angs[0].tolist(),
                   dec=angs[1].tolist())
    d = dict(freq_mode=freq_mode, sources=sources)
    if freq_mode == "powerlaw":
        assert params.shape[0] == 1, \
            ("the columnar catalogue schema holds Stokes-I only; "
             f"got Nstokes={params.shape[0]} (polarized catalogues are "
             "'under development' in the reference too, sky_model.py:1078)")
        sources["amp"] = params[0, 0, 0].tolist()
        sources["alpha"] = params[0, 0, 1].tolist()
        d["mode_kwargs"] = dict(f0=float(f0))
    elif freq_mode == "channel":
        assert freqs is not None, "channel catalogue needs freqs"
        freqs = np.asarray(freqs, dtype=np.float64)
        for i in range(len(freqs)):
            sources[f"freq{i}"] = params[0, 0, i].tolist()
        d["freqs"] = freqs.tolist()
        d["mode_kwargs"] = dict(f0=None)
    else:
        raise NotImplementedError(f"freq_mode {freq_mode}")
    with open(catfile, "w") as f:
        yaml.safe_dump(d, f)


def Jy2K(freqs, steradians=None, px_area=None):
    """Jy -> Kelvin conversion factor per frequency (reference :1140-1158).
    steradians is the reference's name for the pixel solid angle
    (px_area kept as an alias).

    K = Jy * 1e-26 * c^2 / (2 kB nu^2 Omega_px)
    """
    px_area = steradians if steradians is not None else px_area
    kb = 1.380649e-23
    c = 2.99792458e8
    freqs = np.asarray(freqs, dtype=np.float64)
    return 1e-26 * c ** 2 / (2 * kb * freqs ** 2 * px_area)


class SphHarmSky(SkyBase):
    """Spherical-harmonic sky parameterization (reference sky_model.py:735
    is a NotImplemented stub; here it is a thin PixelSky with an AlmModel
    spatial response)."""

    def __init__(self, params, angs, px_area, alm_model, freqs,
                 freq_mode="channel", name=None, parameter=True, p0=None,
                 **resp_kwargs):
        R = PixelSkyResponse(freqs, spatial_mode="alm", freq_mode=freq_mode,
                             spat_LM=alm_model, **resp_kwargs)
        super().__init__(params, angs, R=R, name=name, parameter=parameter,
                         p0=p0)
        self.px_area = jnp.asarray(px_area)

    def forward(self, params=None, prior_cache=None, **kwargs):
        sky = self._response(params)
        self.eval_prior(prior_cache, inp_params=self.params, out_params=sky)
        md = MapData()
        md.setup_meta(name=self.name)
        md.setup_data(freqs=self.R.freqs, data=sky * self.px_area,
                      angs=self.angs, px_area=self.px_area)
        return md


class InterpSky(Module):
    """Wrap a sky model and interpolate its output (e.g. onto new
    frequencies) at forward time (reference sky_model.py:938-975)."""

    def __init__(self, sky, freq_interp=None, new_freqs=None, name=None):
        super().__init__(name=name)
        self.sky = sky
        self.freq_interp = freq_interp
        self.new_freqs = None if new_freqs is None else np.asarray(new_freqs)

    def forward(self, *args, prior_cache=None, **kwargs):
        skymap = self.sky(prior_cache=prior_cache)
        if self.freq_interp is not None:
            skymap = self.freq_interp(skymap)
            skymap.freqs = self.new_freqs
        return skymap


def ang_index(theta, phi, theta_min=None, theta_max=None, phi_min=None,
              phi_max=None):
    """Index tensor selecting angles within cuts
    (reference sky_model.py:976-1006)."""
    theta = np.asarray(theta)
    phi = np.asarray(phi)
    idx = np.ones(len(theta), dtype=bool)
    if phi_min:
        idx &= phi >= phi_min
    if phi_max:
        idx &= phi <= phi_max
    if theta_min:
        idx &= theta >= theta_min
    if theta_max:
        idx &= theta <= theta_max
    return np.where(idx)[0]


def pixelsky_Ylm_cut(obj, lmin=None, lmax=None, mmin=None, mmax=None,
                     other=None):
    """Cut the lm modes of a PixelSky with an alm spatial response, in
    place (reference sky_model.py:1356-1382 — which asserts an `R.Alm`
    attribute its own PixelSkyResponse constructor never sets, so it
    crashes on every response built through the public API; we use the
    documented `spat_LM`). The mode trim itself is AlmModel.select."""
    alm = obj.R.spat_LM
    s = alm.select(lmin=lmin, lmax=lmax, mmin=mmin, mmax=mmax,
                   other=other)
    idx = np.where(s)[0]
    # params stored as real pairs (viewreal, trailing axis 2, flagged by
    # R.comp_params) keep the alm axis at -2 — the reference's
    # `params[..., s, :]` convention
    pair = bool(getattr(obj.R, "comp_params", False))

    def _cut(p):
        if p is None:
            return None
        if pair and not jnp.iscomplexobj(p):
            return p[..., idx, :]
        return p[..., idx]
    obj.p0 = _cut(obj.p0)
    obj.params = _cut(obj.params)
    return idx


def eqarea_grid(resol):
    """Equal-area (theta, phi) grid with cell side `resol` degrees at the
    equator (reference sky_model.py:1384-1412). Returns theta, phi [rad].
    """
    n = int(2 * np.pi / (resol * np.pi / 180))
    phi, dphi = np.linspace(0, 2 * np.pi, n, endpoint=False, retstep=True)
    t = np.arange(0, 1, dphi)
    t = np.concatenate([t[::-1], -t[1:]])
    theta = np.arccos(t)
    return theta, phi


def index_sky_pixels(angs_large, angs_small):
    """Indices mapping angs_small into angs_large
    (reference sky_model.py:1413-1443)."""
    large = np.asarray(angs_large, dtype=np.float64).T  # (N, 2)
    idx = []
    for ph, th in zip(*np.asarray(angs_small)):
        target = np.asarray([ph % 360 % 360, th])
        idx.append(int(np.argmin(np.linalg.norm(large - target, axis=1))))
    return np.asarray(idx)
