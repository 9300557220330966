"""
Primary-beam models evaluated on sky pixels.

Reference parity: bayeslim/beam_model.py (PixelBeam :17-568, PixelResponse
:570-845, GaussResponse :848, AiryResponse :902, UniformResponse :991,
airy_disk :1418, beam_edge_taper :1701, cut_sky_fov :1681). YlmResponse
lives in models/beam_ylm.py (needs ops/sph_harm).

Polarization modes preserved (beam_model.py:46-54):
- '1pol':  powerbeam (Npol=1, Nvec=1, Nmodel>=1) or Jones (Npol=1, Nvec=2)
- '2pol':  powerbeam (Npol=2, Nvec=1)
- '4pol':  Jones (Npol=2, Nvec=2)
Beam tensors are (Npol, Nvec, Nmodel, Nfreqs, Npix).

TPU-first redesign:
- The FOV cut is precomputed on host into static-shape padded gather
  indices + a boolean mask (see RIME.precompute_times); gen_beam simply
  evaluates the response at the given (possibly time-batched) angles.
  The reference's dynamic `torch.where(zen < fov/2)` (beam_model.py:222)
  cannot jit.
- Responses take an optional precomputed `ctx` (interpolation indices /
  design matrices) instead of hash-keyed runtime caches.
- apply_beam uses host-precomputed model-pair index arrays; the einsum
  contractions map onto the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import Module, PixInterp
from ..utils.dtypes import D2R, _float, viewcomp
from ..utils.indexing import gauss_taper

__all__ = [
    "PixelBeam", "GaussResponse", "AiryResponse", "UniformResponse",
    "PixelResponse", "airy_disk", "beam_edge_taper", "cut_sky_fov",
    "pointing_offset",
]


def cut_sky_fov(sky, cut):
    """Select sky pixels by (padded) index array along last axis
    (reference beam_model.py:1681)."""
    if cut is None:
        return sky
    if isinstance(cut, slice):
        return sky[..., cut]
    return jnp.take(sky, jnp.asarray(cut), axis=-1)


def pointing_offset(zen, az, theta_x=0.0, theta_y=0.0):
    """Small-angle pointing offset rotation (reference :1631-1680).

    zen/az in radians; theta_x/theta_y are rotations about the x/y axes
    [rad]. Returns new (zen, az) radians.
    """
    # jnp so the offset also works on traced angles inside jit (the
    # RIME time scan); host numpy inputs come back as device arrays,
    # which every caller treats interchangeably
    xp = jnp if isinstance(zen, jax.Array) else np
    sz, cz = xp.sin(zen), xp.cos(zen)
    sa, ca = xp.sin(az), xp.cos(az)
    # the reference's cartesian frame (beam_model.py:1651-1655):
    # x = sin(zen) cos(az), y = sin(zen) sin(az), z = cos(zen)
    x, y, z = sz * ca, sz * sa, cz
    # rotate about x-hat then y-hat with the reference's matrices
    # (:1532-1541). Divergence: the reference silently SKIPS negative
    # offsets (`if theta_x > 0`, :1658); we apply any nonzero offset.
    y2 = y * np.cos(theta_x) - z * np.sin(theta_x)
    z2 = y * np.sin(theta_x) + z * np.cos(theta_x)
    x3 = x * np.cos(theta_y) + z2 * np.sin(theta_y)
    z3 = -x * np.sin(theta_y) + z2 * np.cos(theta_y)
    new_zen = xp.arccos(xp.clip(z3, -1, 1))
    new_az = xp.mod(xp.arctan2(y2, x3), 2 * np.pi)
    return new_zen, new_az


def beam_edge_taper(zen, mode="gauss", fov=180.0, mu=85.0, sigma=2.5,
                    alpha=0.1, zen_start=None):
    """Taper the beam to zero toward the horizon (reference
    beam_model.py:1701-1736, matching parameter names and defaults).

    zen in degrees (array, possibly batched). 'gauss': unity below mu,
    Gaussian rolloff beyond (zen_start is the pre-rename alias for mu);
    'tukey': a Tukey window over [-fov/2, fov/2] sampled at zen.
    """
    zen = jnp.asarray(zen)
    if zen_start is not None:
        mu = zen_start
    if mode == "gauss":
        return jnp.where(zen >= mu,
                         jnp.exp(-0.5 * ((zen - mu) / sigma) ** 2), 1.0)
    if mode == "tukey":
        from scipy.signal import windows
        th = np.linspace(-fov / 2, fov / 2, 5000, endpoint=True)
        mask = windows.tukey(5000, alpha=alpha)
        # linear interp onto zen, zero outside the fov (host or traced)
        x = (zen - th[0]) / (th[1] - th[0])
        i = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, 4998)
        f = x - i
        w = jnp.asarray(mask)
        t = w[i] * (1 - f) + w[i + 1] * f
        return jnp.where((zen >= th[0]) & (zen <= th[-1]), t, 0.0)
    raise ValueError(f"unknown taper mode {mode}")


def airy_disk(zen_rad, az_rad, Dew, freqs, Dns=None, freq_ratio=1.0,
              square=True, brute_force=False, Ntau=100):
    """Airy-disk beam (reference beam_model.py:1418-1483).

    b = [2 J1(x) / x]^2 with x = 2 pi nu (D/2) sin(zen) / c, optionally
    elliptical via separate EW/NS diameters projected by azimuth.

    Parameters
    ----------
    zen_rad, az_rad : (...,) arrays [rad] (device ok)
    Dew : aperture diameter [m], array broadcastable to params leading dims,
        typically (Npol, Nvec, Nmodel, 1, 1)
    freqs : (Nfreqs,) [Hz]
    Dns : optional NS diameter (elliptical aperture)
    square : return power beam (squared)

    Returns
    -------
    beam : (..., Nfreqs, Npix)
    """
    zen_rad = jnp.asarray(zen_rad)
    az_rad = jnp.asarray(az_rad)
    freqs = jnp.asarray(np.asarray(freqs) * freq_ratio)
    nb = zen_rad.ndim  # batch dims of the angle arrays (e.g. [Ntimes,] Npix)
    # params (Npol, Nvec, Nmodel, 1, 1) -> (Npol, Nvec, Nmodel, 1, *1s)
    Dew = jnp.reshape(jnp.asarray(Dew), jnp.shape(Dew)[:3] + (1,) * (nb + 1))
    if Dns is not None:
        # reference convention (beam_model.py:1467-1470):
        # D(az) = Dns + sin^2(az) (Dew - Dns)
        Dns = jnp.reshape(jnp.asarray(Dns), jnp.shape(Dns)[:3] + (1,) * (nb + 1))
        diameter = Dns + jnp.sin(az_rad) ** 2 * (Dew - Dns)
    else:
        diameter = Dew
    # clip sin(zen) below horizon so the beam doesn't wrap
    szen = jnp.where(zen_rad > np.pi / 2, 1.0, jnp.sin(zen_rad))
    fshape = freqs.reshape((-1,) + (1,) * nb)
    x = 2 * np.pi * fshape * (diameter / 2.0) / 2.99792458e8 * szen
    if brute_force:
        # trapezoidal Bessel integral (reference special.j1 Ntau path,
        # special.py:498-535): J1(x) = (1/pi) int_0^pi cos(t - x sin t) dt
        from ..ops.special import j1_integral as _j1f

        def _j1(v):
            return _j1f(v, Ntau=Ntau)
    else:
        from .bessel import j1 as _j1
    small = x < 1e-8
    xs = jnp.where(small, 1.0, x)
    b = jnp.where(small, 1.0, (2 * _j1(xs) / xs))
    return b ** 2 if square else jnp.abs(b)


class GaussResponse(Module):
    """Gaussian beam in image-plane l,m (reference :848-899).

    params (Npol, Nvec, Nmodel, Nfreqs, 2): sigma_EW, sigma_NS.
    Output (Npol, Nvec, Nmodel, Nfreqs, Npix); zen/az may carry leading
    batch dims (e.g. Ntimes) which broadcast into the pixel axis.
    """

    def __init__(self, powerbeam=True):
        super().__init__()
        self.freq_mode = "channel"
        self.powerbeam = powerbeam

    def forward(self, params, zen, az, freqs, ctx=None, **kwargs):
        zr = jnp.asarray(zen) * D2R
        ar = jnp.asarray(az) * D2R
        srad = jnp.where(zr > np.pi / 2, 1.0, jnp.sin(zr))
        l = srad * jnp.sin(ar)
        m = srad * jnp.cos(ar)
        beam = jnp.exp(-0.5 * ((l / params[..., 0:1]) ** 2
                               + (m / params[..., 1:2]) ** 2))
        if not self.powerbeam:
            beam = jnp.sqrt(beam)
        return beam


class AiryResponse(Module):
    """Airy-disk beam (reference :902-988).

    params (Npol, Nvec, Nmodel, 1, 2): EW/NS aperture diameters [m]
    (or (..., 1, 1) for circular).
    """

    def __init__(self, freq_ratio=1.0, powerbeam=True, taper_kwargs=None,
                 brute_force=False, Ntau=100):
        """brute_force/Ntau: evaluate J1 by Ntau-point trapezoidal
        integration of the Bessel integral instead of the polynomial
        approximation (reference airy_disk Ntau path,
        beam_model.py:928-988)."""
        super().__init__()
        self.freq_ratio = freq_ratio
        self.freq_mode = "other"
        self.powerbeam = powerbeam
        self.taper_kwargs = taper_kwargs
        self.brute_force = brute_force
        self.Ntau = Ntau

    def forward(self, params, zen, az, freqs, ctx=None, **kwargs):
        Dew = params[..., 0, 0:1]                # (Npol, Nvec, Nmodel, 1)
        Dns = params[..., 0, 1:2] if params.shape[-1] > 1 else None
        beam = airy_disk(jnp.asarray(zen) * D2R, jnp.asarray(az) * D2R,
                         Dew[..., None], freqs, None if Dns is None else Dns[..., None],
                         freq_ratio=self.freq_ratio, square=self.powerbeam,
                         brute_force=self.brute_force, Ntau=self.Ntau)
        if self.taper_kwargs is not None:
            beam = beam * beam_edge_taper(zen, **self.taper_kwargs)
        return beam


class UniformResponse(Module):
    """Uniform (tophat) beam (reference :991-1016)."""

    def __init__(self, taper_kwargs=None):
        super().__init__()
        self.freq_mode = "other"
        self.taper_kwargs = taper_kwargs

    def forward(self, params, zen, az, freqs, ctx=None, **kwargs):
        zen = jnp.asarray(zen)
        shape = params.shape[:3] + (len(np.atleast_1d(freqs)),) + zen.shape
        out = jnp.ones(shape, dtype=_float())
        if self.taper_kwargs is not None:
            out = out * beam_edge_taper(zen, **self.taper_kwargs)
        return out


class PixelResponse(Module):
    """Pixelized beam: params live on a fixed angular grid; evaluation
    interpolates onto requested angles (reference :570-845).

    params (Npol, Nvec, Nmodel, Nfreqs[-coeff], Npix_grid). pixtype
    'healpix' (nside) or 'rect' (theta_grid/phi_grid [deg]).

    TPU-first: interpolation indices/weights are either passed per-call via
    ctx=(inds, wgts) (precomputed by RIME for each time) or computed on
    host on the fly (slow path, non-jit).
    """

    def __init__(self, freqs, pixtype, nside=None, theta_grid=None,
                 phi_grid=None, interp_mode="linear", freq_mode="channel",
                 freq_LM=None, comp_params=False, log=False, powerbeam=True,
                 realbeam=True, beam0=None, norm_pix=None, taper_kwargs=None):
        super().__init__()
        self.freqs = np.asarray(freqs, dtype=np.float64)
        self.pixtype = pixtype
        self.interp = PixInterp(pixtype, nside=nside, interp_mode=interp_mode,
                                theta_grid=theta_grid, phi_grid=phi_grid)
        self.freq_mode = freq_mode
        self.freq_LM = freq_LM
        self.comp_params = comp_params
        self.log = log
        self.powerbeam = powerbeam
        self.realbeam = realbeam
        self.beam0 = None if beam0 is None else jnp.asarray(beam0)
        self.norm_pix = norm_pix
        self.taper_kwargs = taper_kwargs

    def precompute(self, zen, az):
        """Host precompute of interpolation ctx for target angles [deg]."""
        return self.interp.precompute(np.asarray(zen), np.asarray(az))

    def grid_beam(self, params):
        """Map params -> beam maps on the native grid (freq transform etc)."""
        if self.comp_params and not jnp.iscomplexobj(params):
            params = viewcomp(params)
        if self.beam0 is not None:
            params = params + self.beam0
        if self.freq_mode == "linear":
            params = self.freq_LM(params)
        if self.log:
            params = jnp.exp(params)
        if self.realbeam and jnp.iscomplexobj(params):
            params = params.real
        if self.norm_pix is not None:
            # normalize by the beam value at a reference pixel (e.g. zenith)
            norm = params[..., self.norm_pix:self.norm_pix + 1]
            params = params / norm
        return params

    def forward(self, params, zen, az, freqs, ctx=None, **kwargs):
        beam = self.grid_beam(params)
        if ctx is None:
            inds, wgts = self.precompute(zen, az)
        else:
            inds, wgts = ctx
        out = self.interp.interp(beam, inds=inds, wgts=wgts)
        if self.powerbeam and jnp.iscomplexobj(out):
            out = out.real
        if self.powerbeam:
            out = jnp.abs(out)
        if self.taper_kwargs is not None:
            out = out * beam_edge_taper(zen, **self.taper_kwargs)
        return out


class PixelBeam(Module):
    """Antenna primary beam block (reference beam_model.py:17-568).

    forward contract: gen_beam evaluates R(params+p0) at given angles;
    apply_beam computes psky = A_p B A_q^H per baseline model-pair.
    """

    def __init__(self, params, freqs, R=None, ant2beam=None, parameter=True,
                 pol=None, powerbeam=True, fov=180.0, name=None, p0=None):
        super().__init__(name=name)
        self.params = jnp.asarray(params)
        self.p0 = None if p0 is None else jnp.asarray(p0)
        if parameter:
            self.set_param("params")
        self.freqs = np.asarray(freqs, dtype=np.float64)
        self.R = R if R is not None else UniformResponse()
        self.pol = pol
        self.powerbeam = powerbeam
        self.fov = fov
        self.Npol = self.params.shape[0]
        self.Nvec = self.params.shape[1]
        self.Nmodel = self.params.shape[2]
        if ant2beam is None:
            self.ant2beam = None  # all ants -> model 0
        else:
            self.ant2beam = dict(ant2beam)
        if powerbeam:
            assert self.Nvec == 1, "powerbeam requires Nvec=1"
        self.theta_x = 0.0
        self.theta_y = 0.0

    def set_pointing_offset(self, theta_x=0.0, theta_y=0.0):
        """Small-angle pointing offset [rad] applied to the (degree-
        valued) sky angles in gen_beam (non-differentiable; reference
        beam_model.py:515-536). Model the beam to a zenith angle buffered
        beyond fov/2 by theta_x & theta_y so interpolating responses
        don't extrapolate.

        Note: RIME and VisMapper fold the offset into their host
        precompute (angles AND interpolation ctx) — set the offset
        BEFORE constructing them, or re-run `rime.precompute()` /
        rebuild the mapper after changing it."""
        self.theta_x = float(theta_x)
        self.theta_y = float(theta_y)

    def apply_pointing(self, zen, az):
        """Offset degree-valued zen/az by the stored pointing offset;
        identity when no offset is set. Host numpy in, numpy out (or
        traced jnp in jit)."""
        if self.theta_x == 0.0 and self.theta_y == 0.0:
            return zen, az
        zr, ar = pointing_offset(zen * D2R, az * D2R,
                                 self.theta_x, self.theta_y)
        return zr / D2R, ar / D2R

    # --- host precompute -----------------------------------------------------
    def fov_cut(self, zen, pad_to=None):
        """Host-side FOV cut: indices of pixels with zen < fov/2, padded to a
        static size (multiple of 8) with mask (replaces reference's dynamic
        torch.where at beam_model.py:222)."""
        zen = np.asarray(zen)
        idx = np.where(zen < self.fov / 2)[0]
        n = len(idx)
        if pad_to is None:
            pad_to = max(8, int(np.ceil(n / 8) * 8))
        assert pad_to >= n, "pad_to smaller than FOV pixel count"
        pad_idx = np.zeros(pad_to, dtype=np.int32)
        pad_idx[:n] = idx
        mask = np.zeros(pad_to, dtype=bool)
        mask[:n] = True
        return pad_idx, mask

    def modelpair_index(self, bls):
        """Host-side map bls -> (m1_idx, m2_idx) into the Nmodel axis."""
        if self.ant2beam is None:
            z = np.zeros(len(bls), dtype=np.int32)
            return z, z
        m1 = np.asarray([self.ant2beam[bl[0]] for bl in bls], dtype=np.int32)
        m2 = np.asarray([self.ant2beam[bl[1]] for bl in bls], dtype=np.int32)
        return m1, m2

    def modelpairs(self, bls):
        """Unique model pairs + baseline->pair index (host-side).

        Returns (mp1, mp2, mp_idx): mp1/mp2 (Nmp,) index the Nmodel axis
        for each unique (beam_p, beam_q) pair; mp_idx (Nbls,) maps each
        baseline to its pair — or None when Nmp == 1 (shared beam), in
        which case the per-baseline expansion is skipped entirely
        (TPU-first replacement for the reference's expand at
        beam_model.py:363-370).
        """
        m1, m2 = self.modelpair_index(bls)
        pairs = sorted(set(zip(m1.tolist(), m2.tolist())))
        mp1 = np.asarray([p[0] for p in pairs], dtype=np.int32)
        mp2 = np.asarray([p[1] for p in pairs], dtype=np.int32)
        if len(pairs) == 1:
            return mp1, mp2, None
        lut = {p: i for i, p in enumerate(pairs)}
        mp_idx = np.asarray([lut[(a, b)] for a, b in zip(m1, m2)],
                            dtype=np.int32)
        return mp1, mp2, mp_idx

    # --- device ops ---------------------------------------------------------------
    def gen_beam(self, zen, az, prior_cache=None, ctx=None, params=None,
                 angles_offset=False):
        """Evaluate the beam response at angles [deg] (device,
        jit-friendly).

        zen/az may carry leading batch dims (Ntimes, Npix). Returns
        (Npol, Nvec, Nmodel, Nfreqs, [Ntimes,] Npix).

        angles_offset: True when the caller already folded the pointing
        offset into zen/az (and any interp ctx) at precompute time —
        RIME/VisMapper do; raw-angle callers leave it False.
        """
        p = self.params if params is None else params
        if self.p0 is not None:
            p = p + self.p0
        if not angles_offset:
            zen, az = self.apply_pointing(zen, az)
        beam = self.R(p, zen, az, self.freqs, ctx=ctx)
        self.eval_prior(prior_cache, inp_params=self.params, out_params=None)
        return beam

    def apply_beam_mp(self, beam, mp1, mp2, sky):
        """Model-pair space psky: like apply_beam but indexed by unique
        model pairs (Nmp) instead of baselines — no per-baseline blowup.

        beam : (Npol, Nvec, Nmodel, Nfreqs, Npix)
        mp1, mp2 : (Nmp,) int arrays into the Nmodel axis
        sky : (Nvec, Nvec, Nfreqs, Npix) coherency / (1,1,...) Stokes-I

        Returns psky (Npol, Npol, Nmp, Nfreqs, Npix).
        """
        return self.apply_beam(beam, mp1, mp2, sky)

    def apply_beam(self, beam, m1, m2, sky):
        """psky = A_p B A_q^H for each baseline (reference :273-372).

        beam : (Npol, Nvec, Nmodel, Nfreqs, Npix)
        m1, m2 : (Nbls,) int arrays indexing the Nmodel axis
        sky : (Nvec, Nvec, [Nbls,] Nfreqs, Npix) coherency (or (1,1,...) for
              Stokes-I powerbeam mode)

        Returns psky (Npol, Npol, Nbls, Nfreqs, Npix).
        """
        m1 = jnp.asarray(m1)
        m2 = jnp.asarray(m2)
        beam1 = jnp.take(beam, m1, axis=2)      # (Npol, Nvec, Nbls, Nf, Npix)
        if sky.ndim == 4:
            sky = sky[:, :, None]               # add Nbls dim

        if self.Npol == 1:
            if self.Nvec == 1:
                if self.powerbeam:
                    return beam1 * sky
                beam2 = jnp.take(beam, m2, axis=2)
                return beam1 * beam2.conj() * sky
            beam2 = jnp.take(beam, m2, axis=2)
            return jnp.einsum("ab...,bc...,dc...->ad...", beam1, sky,
                              beam2.conj())
        if self.powerbeam:
            # 2pol: diagonal power beams on Stokes I (reference :352-358)
            psky = beam1 * sky                   # (2, 1, Nbls, Nf, Npix)
            return _expand_2pol(psky)
        beam2 = jnp.take(beam, m2, axis=2)
        return jnp.einsum("ab...,bc...,dc...->ad...", beam1, sky,
                          beam2.conj())

    def forward(self, sky_comp, telescope, time, bls, prior_cache=None,
                **kwargs):
        """Standalone single-time forward (reference :374-421): host-side
        eq2top + FOV cut + beam application. Not the jit path (RIME owns
        that); used by imaging and notebooks."""
        ra, dec = np.asarray(sky_comp.angs)
        zen, az = telescope.eq2top(time, ra, dec)
        cut, mask = self.fov_cut(zen)
        # pointing offset folded on host: beam angles + interp ctx (the
        # FOV cut stays on the true zenith angle, as in the reference)
        zen_c, az_c = self.apply_pointing(zen[cut], az[cut])
        ctx = self.R.precompute(zen_c, az_c) if hasattr(self.R, "precompute") else None
        beam = self.gen_beam(jnp.asarray(zen_c), jnp.asarray(az_c),
                             prior_cache=prior_cache, ctx=ctx,
                             angles_offset=True)
        beam = beam * jnp.asarray(mask, dtype=beam.real.dtype)
        sky = cut_sky_fov(sky_comp.data, cut)
        m1, m2 = self.modelpair_index(bls)
        psky = self.apply_beam(beam, m1, m2, sky)
        return dict(sky=psky, angs=cut_sky_fov(sky_comp.angs, cut),
                    zenaz=jnp.stack([jnp.asarray(zen_c), jnp.asarray(az_c)]),
                    cut=cut, mask=mask)

    def freq_interp(self, freqs, kind="linear"):
        """Interpolate channel-mode beam params onto new freqs
        (reference :480)."""
        from scipy.interpolate import interp1d
        freqs = np.asarray(freqs)
        if getattr(self.R, "freq_mode", "channel") == "channel" and \
                self.params.shape[3] == len(self.freqs):
            f = interp1d(self.freqs, np.asarray(self.params), axis=3,
                         kind=kind, fill_value="extrapolate")
            self.params = jnp.asarray(f(freqs), dtype=self.params.dtype)
        self.freqs = freqs
        if hasattr(self.R, "freqs"):
            self.R.freqs = freqs


def _expand_2pol(psky):
    """(2, 1, ...) per-pol powerbeam psky -> (2, 2, ...) with zero cross."""
    z = jnp.zeros_like(psky[:, 0:1])
    top = jnp.concatenate([psky[0:1, 0:1], z[0:1]], axis=1)
    bot = jnp.concatenate([z[1:2], psky[1:2, 0:1]], axis=1)
    return jnp.concatenate([top, bot], axis=0)


# ---------------------------------------------------------------------------
# polarization / frame rotation utilities (reference beam_model.py:1485-1630)
# ---------------------------------------------------------------------------

def R_eq_to_xyz(alpha, delta):
    """Equatorial (alpha, delta) unit vectors expressed in xyz
    (reference :1485-1512). Returns (3, 2, ...) ndarray."""
    alpha = np.asarray(alpha)
    delta = np.asarray(delta)
    return np.array([
        [-np.sin(alpha), np.cos(alpha) * np.sin(delta)],
        [np.cos(alpha), np.sin(alpha) * np.sin(delta)],
        [np.zeros_like(alpha), -np.cos(delta)],
    ])


def rotation(beta, axis):
    """3x3 rotation by beta [rad] about 'x' or 'y'
    (reference :1514-1546)."""
    c, s = np.cos(beta), np.sin(beta)
    if axis.lower() == "x":
        return np.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])
    if axis.lower() == "y":
        return np.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])
    raise ValueError(f"unknown axis {axis}")


def R_beta(beta):
    """xyz -> XYZ rotation about y-hat (reference :1548-1563)."""
    return rotation(beta, "y")


def R_XYZ_to_top(phi, theta):
    """Project XYZ unit vectors onto topocentric (phi, theta)
    (reference :1565-1586). Returns (2, 3, ...)."""
    phi = np.asarray(phi)
    theta = np.asarray(theta)
    return np.array([
        [-np.sin(phi), np.cos(phi), np.zeros_like(phi)],
        [np.cos(phi) * np.cos(theta), np.sin(phi) * np.cos(theta),
         -np.sin(theta)],
    ])


def R_chi(alpha, delta, beta):
    """Rotation from equatorial basis [e_alpha, e_delta] to spherical
    basis [e_phi, e_theta] for polarized beams (reference :1588-1630).

    Returns (2, 2, Nangles)."""
    alpha = np.atleast_1d(np.asarray(alpha, dtype=np.float64))
    delta = np.atleast_1d(np.asarray(delta, dtype=np.float64))
    eq2xyz = R_eq_to_xyz(alpha, delta)                  # (3, 2, N)
    Rb = R_beta(beta)                                   # (3, 3)
    xyz = np.einsum("ij,jk...->ik...", Rb, eq2xyz)      # (3, 2, N)
    # topocentric angles of the rotated positions
    v = np.array([np.cos(delta) * np.cos(alpha),
                  np.cos(delta) * np.sin(alpha),
                  np.sin(delta)])
    V = Rb @ v
    theta = np.arccos(np.clip(V[2], -1, 1))
    phi = np.mod(np.arctan2(V[1], V[0]), 2 * np.pi)
    top = R_XYZ_to_top(phi, theta)                      # (2, 3, N)
    return np.einsum("ij...,jk...->ik...", top, xyz)    # (2, 2, N)
