"""
Direction-independent calibration blocks: antenna gains, per-baseline and
per-redundant-group visibility models, and redcal degeneracy handling.

Reference parity: bayeslim/calibration.py (BaseResponse :11-212,
params2complex/complex2params :215-288, JonesModel :416-743, JonesResponse
:745-875, RedVisModel :877-1054, VisModel :1056-1211, VisModelResponse
:1212, apply_cal/_apply_cal :2348-2489, rephase_to_refant :2490,
remove_redcal_degen :2611, compute_redcal_degen :2665, redcal_degen_gains
:2760). VisCoupling/RedVisCoupling live in models/coupling.py.

TPU-first notes: the reference's IndexCache (calibration.py:291-414) is
kept as a HOST-side mixin: index maps are numpy computed once per distinct
batch (keyed by arr_hash) and enter jit as static gather indices — a new
time/bl batch means a retrace, never a per-element device fetch. Antenna
-> baseline index arrays are precomputed on host (`ant_index`). All
forwards are pure & jit-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import Module, AntposDict, blnum2ants
from ..utils.dtypes import _float, _cfloat, viewcomp
from ..data.containers import VisData, CalData

__all__ = [
    "params2complex", "complex2params", "BaseResponse", "JonesResponse",
    "JonesModel", "VisModelResponse", "VisModel", "RedVisModel",
    "IndexCache", "apply_cal", "_apply_cal", "rephase_to_refant",
    "compute_redcal_degen", "redcal_degen_gains", "remove_redcal_degen",
]


class IndexCache:
    """Time/baseline minibatch index cache (reference calibration.py
    :291-414): maps a data batch's times / blnums onto the params axes.

    TPU-first: indices are computed with HOST numpy from static metadata
    and cached by `arr_hash` (cache_tidx / cache_bidx); the selection is
    one `jnp.take` with a static index, so under jit a distinct batch is
    a distinct trace and there is never a per-element device fetch."""

    def _init_index_cache(self, times=None, bls=None, atol=1e-5):
        self._times = None if times is None else np.asarray(times)
        if bls is not None and not isinstance(bls, list):
            bls = np.asarray(bls)
        self._bls = bls   # blnum array or list of antpair tuples
        self._atol = atol
        self.clear_time_cache()
        self.clear_bl_cache()

    def clear_time_cache(self):
        self.cache_tidx = {}

    def clear_bl_cache(self):
        self.cache_bidx = {}

    def clear_cache(self):
        """Clear all index caches (reference :377-380)."""
        self.clear_time_cache()
        self.clear_bl_cache()

    def get_time_idx(self, times):
        """Indices of `times` in the params time axis (reference
        :322-350); isclose within atol, nearest-match fallback."""
        if times is None or getattr(self, "_times", None) is None:
            return None
        from ..utils.indexing import arr_hash
        t = np.atleast_1d(np.asarray(times))
        h = arr_hash(t)
        if h not in self.cache_tidx:
            idx = []
            for tt in t:
                w = np.where(np.isclose(self._times, tt,
                                        atol=self._atol, rtol=1e-15))[0]
                idx.append(int(w[0]) if len(w)
                           else int(np.argmin(np.abs(self._times - tt))))
            self.cache_tidx[h] = np.asarray(idx, dtype=np.int32)
        return self.cache_tidx[h]

    def get_bl_idx(self, bls):
        """Indices of `bls` (blnums or antpair tuples) in the params
        baseline axis (reference :352-375)."""
        if bls is None or getattr(self, "_bls", None) is None:
            return None
        from ..utils.indexing import arr_hash, ants2blnum
        own = self._bls
        if isinstance(own, list):
            own = np.asarray([int(ants2blnum(b)) for b in own])
        if isinstance(bls, list):
            q = np.asarray([int(ants2blnum(b)) for b in bls])
        else:
            q = np.asarray(bls)
        h = arr_hash(q)
        if h not in self.cache_bidx:
            lut = {int(b): i for i, b in enumerate(own)}
            self.cache_bidx[h] = np.asarray(
                [lut[int(b)] for b in q], dtype=np.int32)
        return self.cache_bidx[h]

    def index_params(self, params, times=None, bls=None):
        """Down-select params onto the batch times/bls (reference
        :382-414); no-op when the index covers the full axis in order."""
        tidx = self.get_time_idx(times)
        if tidx is not None and not (
                len(tidx) == params.shape[-2]
                and np.array_equal(tidx, np.arange(len(tidx)))):
            params = jnp.take(params, jnp.asarray(tidx), axis=-2)
        bidx = self.get_bl_idx(bls)
        if bidx is not None and not (
                len(bidx) == params.shape[-3]
                and np.array_equal(bidx, np.arange(len(bidx)))):
            params = jnp.take(params, jnp.asarray(bidx), axis=-3)
        return params


def params2complex(params, param_type, freqs=None):
    """Convert a params tensor to complex gains given its type
    (reference :215-270).

    param_type:
    - 'com': params already complex (or real-pair view)
    - 'real': real part only -> complex
    - 'amp': g = exp(params)
    - 'phs': g = exp(i params)
    - 'amp_phs': params (..., 2) holding (amp, phs): g = exp(amp + i phs)
    - 'dly': delays [ns]: g = exp(2 pi i f tau); requires freqs [Hz]
    """
    if param_type == "com":
        if not jnp.iscomplexobj(params):
            params = viewcomp(params)
        return params
    if param_type == "real":
        return params.astype(_cfloat())
    if param_type == "amp":
        return jnp.exp(params).astype(_cfloat())
    if param_type == "phs":
        return jnp.exp(1j * params)
    if param_type == "amp_phs":
        return jnp.exp(params[..., 0] + 1j * params[..., 1])
    if param_type == "dly":
        assert freqs is not None, "dly type needs freqs"
        f = jnp.asarray(freqs)
        return jnp.exp(2j * np.pi * f * params * 1e-9)
    raise ValueError(f"unknown param_type {param_type}")


def complex2params(gains, param_type):
    """Inverse of params2complex where well-defined (reference :271-288)."""
    if param_type == "com":
        return gains
    if param_type == "real":
        return gains.real
    if param_type == "amp":
        return jnp.log(jnp.abs(gains))
    if param_type == "phs":
        return jnp.angle(gains)
    if param_type == "amp_phs":
        return jnp.stack([jnp.log(jnp.abs(gains)), jnp.angle(gains)], axis=-1)
    raise ValueError(f"cannot invert param_type {param_type}")


class BaseResponse(Module):
    """Parameter response for calibration blocks (reference :11-212).

    Maps a (possibly compressed) params tensor to full
    (..., Ntimes, Nfreqs) complex values: optional LM, then freq/time
    linear mappings, then param_type conversion, then degeneracy
    projection.
    """

    def __init__(self, freq_mode="channel", time_mode="channel",
                 param_type="com", freq_LM=None, time_LM=None, freqs=None,
                 times=None, LM=None, base0=None, antpos=None, name=None,
                 **proj_kwargs):
        super().__init__(name=name)
        self.freq_mode = freq_mode
        self.time_mode = time_mode
        self.param_type = param_type
        self.freq_LM = freq_LM
        self.time_LM = time_LM
        self.freqs = None if freqs is None else np.asarray(freqs)
        self.times = None if times is None else np.asarray(times)
        self.LM = LM
        self.base0 = None if base0 is None else jnp.asarray(base0)
        self.antpos = antpos
        self.setup_projection(**proj_kwargs)

    def setup_projection(self, abs_amp_gain=False, phs_slope_gain=False,
                         wgts_gain=None, refant_idx=None):
        """Configure post-response projection (reference :155-211)."""
        self._proj_abs_amp = abs_amp_gain
        self._proj_phs_slope = phs_slope_gain
        self._proj_wgts = wgts_gain
        self._proj_refant_idx = refant_idx
        if phs_slope_gain:
            assert self.antpos is not None, "phs_slope needs antpos"
        self._projection = abs_amp_gain or phs_slope_gain or \
            refant_idx is not None

    def projection(self, params):
        if not self._projection:
            return params
        if self._proj_abs_amp or self._proj_phs_slope:
            ants = None if self.antpos is None else self.antpos.ants
            params = remove_redcal_degen(params, ants, self.antpos,
                                         abs_amp=self._proj_abs_amp,
                                         phs_slope=self._proj_phs_slope,
                                         wgts=self._proj_wgts)[0]
        if self._proj_refant_idx is not None:
            i = self._proj_refant_idx
            phs = jnp.angle(jax.lax.stop_gradient(params[:, :, i:i + 1]))
            params = params * jnp.exp(-1j * phs)
        return params

    def forward(self, params, **kwargs):
        if self.LM is not None:
            params = self.LM(params)
        if self.param_type == "com" and not jnp.iscomplexobj(params):
            params = viewcomp(params)
        if self.freq_mode == "linear":
            params = self.freq_LM(params)
        if self.time_mode == "linear":
            params = self.time_LM(params)
        if self.base0 is not None:
            params = params + self.base0
        params = params2complex(params, self.param_type, freqs=self.freqs)
        return self.projection(params)


class JonesResponse(BaseResponse):
    """Gain response with extra redcal-degeneracy parameterizations
    (reference :745-875): param_type additionally supports
    'dly_slope' / 'phs_slope' — params (Npol,Npol,2,Ntimes,Nfreqs) of
    EW/NS slopes mapped onto antennas via antpos."""

    def __init__(self, vis_type="com", antpos=None, **kwargs):
        ptype = kwargs.get("param_type", "com")
        slope = ptype in ("dly_slope", "phs_slope")
        if slope:
            kwargs = dict(kwargs)
            kwargs["param_type"] = "com"  # handled here
        super().__init__(antpos=antpos, **kwargs)
        self.vis_type = vis_type
        self.slope_type = ptype if slope else None
        if slope:
            self.param_type = ptype

    def forward(self, params, **kwargs):
        if self.slope_type is None:
            return super().forward(params, **kwargs)
        # slope types: params (Npol, Npol, 2, Ntimes, Nfreqs) EW/NS
        if self.LM is not None:
            params = self.LM(params)
        if self.freq_mode == "linear":
            params = self.freq_LM(params)
        if self.time_mode == "linear":
            params = self.time_LM(params)
        A = jnp.asarray(self.antpos.antvecs[:, :2])  # (Nants, 2)
        slope = jnp.einsum("ab,ijblm->ijalm", A, params)
        if self.slope_type == "dly_slope":
            f = jnp.asarray(self.freqs)
            return jnp.exp(2j * np.pi * f * slope * 1e-9)
        return jnp.exp(1j * slope)


class JonesModel(Module, IndexCache):
    """Antenna-based direction-independent gains: V_d = J_p V_m J_q^H
    (reference calibration.py:416-743)."""

    def __init__(self, params, ants, p0=None, refant=None, R=None,
                 parameter=True, polmode="1pol", single_ant=False,
                 name=None, vis_type="com", atol=1e-5):
        super().__init__(name=name)
        self.params = jnp.asarray(params)
        self.p0 = None if p0 is None else jnp.asarray(p0)
        self.ants = [int(a) for a in ants]
        self.Nants = len(self.ants)
        if parameter:
            self.set_param("params")
        self.R = R if R is not None else JonesResponse()
        self.polmode = polmode
        self.single_ant = single_ant
        self.vis_type = vis_type
        self._g1_idx = None
        self._g2_idx = None
        self._init_index_cache(times=getattr(self.R, "times", None),
                               atol=atol)
        self.set_refant(refant)

    def set_refant(self, refant):
        """Record reference antenna; its phase is projected out in
        forward (reference :565-586)."""
        self.refant = refant
        self.refant_idx = None
        if refant is not None:
            assert refant in self.ants, "need a valid refant"
            self.refant_idx = self.ants.index(refant)
            if self.R.time_mode == "channel" and self.R.freq_mode == "channel":
                self.rephase_mode = "rephase"
            else:
                self.rephase_mode = "zero"
            # fix the initial params in place (host-side, like reference)
            self.fix_refant_phs()

    def fix_refant_phs(self):
        """Zero the reference antenna's phase on the CURRENT params
        (reference calibration.py:587-597) — e.g. after an optimizer
        step drifted it. No-op without a refant."""
        if self.refant_idx is None:
            return
        was_real_pair = (self.R.param_type == "com"
                         and not jnp.iscomplexobj(self.params))
        new = rephase_to_refant(self.params, self.R.param_type,
                                self.refant_idx, p0=self.p0,
                                mode=self.rephase_mode)
        if was_real_pair and jnp.iscomplexobj(new):
            from ..utils.dtypes import viewreal
            new = viewreal(new)
        self.params = new

    def ant_index(self, bls):
        """Host: (g1_idx, g2_idx) into the Nants axis for baselines."""
        bls = blnum2ants(bls)
        if isinstance(bls, tuple):
            bls = [bls]
        if self.single_ant:
            z = np.zeros(len(bls), dtype=np.int32)
            return z, z
        lut = {a: i for i, a in enumerate(self.ants)}
        g1 = np.asarray([lut[bl[0]] for bl in bls], dtype=np.int32)
        g2 = np.asarray([lut[bl[1]] for bl in bls], dtype=np.int32)
        return g1, g2

    def set_bls(self, bls):
        """Pin the baseline->antenna gain indices as DEVICE arrays
        (traced pytree leaves) instead of per-forward host metadata.

        This is what lets the Jones block ride BASELINE sharding through
        shard_map (parallel.sharding): the index leaves partition over
        the bl mesh axis exactly like RIME._blidx_groups, so each device
        gathers gains for its local baselines only. When set, forward
        uses these indices verbatim (the wrapped VisData's baseline
        metadata is not re-consulted), so the model is pinned to this
        baseline order — ShardedLogProb cross-checks it against the
        target's baselines. Accepts tuples, (N, 2) arrays, or blnum
        codes (ant_index normalizes all three)."""
        if np.ndim(bls) == 2:   # (N, 2) ant-pair array
            bls = [tuple(int(a) for a in b) for b in bls]
        g1, g2 = self.ant_index(bls)
        self._g1_idx = jnp.asarray(g1)
        self._g2_idx = jnp.asarray(g2)
        return self

    def get_jones(self, params=None):
        """Response-evaluated complex gains (Npol,Npol,Nant,Nt,Nf)."""
        p = self.params if params is None else params
        if self.p0 is not None:
            p = p + self.p0
        jones = self.R(p)
        if self.refant_idx is not None:
            # keep refant phase fixed during optimization (differentiably
            # projects out the refant phase, reference fix_refant_phs)
            i = self.refant_idx
            phs = jnp.angle(jones[:, :, i:i + 1])
            jones = jones * jnp.exp(-1j * phs)
        return jones

    def index_params(self, jones, times=None, bls=None):
        """Down-select the gain time axis onto the data times via the
        arr_hash-cached host index maps (IndexCache, reference
        calibration.py:291-414 / :654). bls is accepted for the
        reference surface: gains are antenna-indexed, so baseline
        selection happens in apply_cal via the per-baseline antenna
        gathers instead."""
        if times is None or self.R.times is None or \
                jones.shape[-2] == len(np.atleast_1d(times)):
            return jones
        if jones.shape[-2] == 1:
            return jones  # broadcast single time bin
        rt = np.asarray(self.R.times)
        if self._times is None or not np.array_equal(self._times, rt):
            self._times = rt          # R.times assigned post-init
            self.clear_time_cache()
        idx = self.get_time_idx(times)
        return jnp.take(jones, jnp.asarray(idx), axis=-2)

    def forward(self, vd, undo=False, prior_cache=None, jones=None,
                **kwargs):
        """Apply gains to a VisData (reference :598-663)."""
        if jones is None:
            jones = self.get_jones()
        self.eval_prior(prior_cache, inp_params=self.params,
                        out_params=jones)
        jones = self.index_params(jones, times=getattr(vd, "times", None))
        if getattr(self, "_g1_idx", None) is not None:
            g1_idx, g2_idx = self._g1_idx, self._g2_idx
        else:
            g1_idx, g2_idx = self.ant_index(vd.blnums)
        vout = vd.copy()
        vout.data, _ = _apply_cal(vd.data, jones, g1_idx, g2_idx,
                                  cal_2pol=self.polmode == "2pol",
                                  vis_type=self.vis_type, undo=undo)
        return vout

    def to_CalData(self, freqs, times, pol=None, telescope=None,
                   antpos=None, flags=None, cov=None, cov_axis=None,
                   icov=None, history="", **kwargs):
        """Export gains as a CalData (reference :688-743)."""
        cd = CalData()
        cd.setup_meta(telescope=telescope, antpos=antpos)
        cd.setup_data(ants=self.ants, times=times, freqs=freqs, pol=pol,
                      data=jax.lax.stop_gradient(self.get_jones()),
                      flags=flags, cov=cov, cov_axis=cov_axis, icov=icov,
                      history=history)
        return cd


class VisModelResponse(BaseResponse):
    """Response for (Red)VisModel (reference :1212-1257)."""


class VisModel(Module, IndexCache):
    """Full per-baseline visibility model: vout = vd + R(params)
    (reference :1056-1211). blnums (params baseline order) and R.times
    enable bl/time minibatching: a vd carrying a subset of either axis
    gets the matching params rows via the IndexCache host maps."""

    def __init__(self, params, R=None, p0=None, parameter=True,
                 blnums=None, name=None, atol=1e-5):
        super().__init__(name=name)
        self.params = jnp.asarray(params)
        self.p0 = None if p0 is None else jnp.asarray(p0)
        if parameter:
            self.set_param("params")
        self.R = R if R is not None else VisModelResponse()
        self._init_index_cache(times=getattr(self.R, "times", None),
                               bls=blnums, atol=atol)

    def forward(self, vd, undo=False, prior_cache=None, **kwargs):
        p = self.params if self.p0 is None else self.params + self.p0
        vis = self.R(p)
        self.eval_prior(prior_cache, inp_params=self.params, out_params=vis)
        # down-select on times / bls for minibatching (reference
        # :1176-1181)
        times = bls = None
        if getattr(vd, "blnums", None) is not None \
                and vd.Nbls != vis.shape[-3]:
            bls = vd.blnums
        if getattr(vd, "times", None) is not None \
                and vd.Ntimes != vis.shape[-2]:
            times = vd.times
        vis = self.index_params(vis, times=times, bls=bls)
        vout = vd.copy()
        vout.data = vd.data - vis if undo else vd.data + vis
        return vout


class RedVisModel(Module, IndexCache):
    """Per-redundant-group visibility model, expanded onto baselines
    (reference :877-1054).

    bl2red maps each data baseline (tuple) to its redundant-group index
    along the params Nredvis axis. R.times enables time minibatching
    (reference :986); the group-expansion index is cached per distinct
    baseline batch (reference get_bl_idx overload :1002-1024).
    """

    def __init__(self, params, bl2red, R=None, p0=None, parameter=True,
                 name=None, atol=1e-5):
        super().__init__(name=name)
        self.params = jnp.asarray(params)
        self.p0 = None if p0 is None else jnp.asarray(p0)
        self.bl2red = dict(bl2red)
        self._red_idx = None
        if parameter:
            self.set_param("params")
        self.R = R if R is not None else VisModelResponse()
        self._init_index_cache(times=getattr(self.R, "times", None),
                               atol=atol)

    def red_index(self, bls):
        from ..utils.indexing import arr_hash
        h = arr_hash(np.asarray(bls))
        if h not in self.cache_bidx:
            pairs = blnum2ants(bls)
            self.cache_bidx[h] = np.asarray(
                [self.bl2red[tuple(bl)] for bl in pairs], dtype=np.int32)
        return self.cache_bidx[h]

    def set_bls(self, bls):
        """Pin the baseline->group expansion index as a DEVICE array
        (traced leaf) so the block can ride baseline sharding through
        shard_map (same mechanism as JonesModel.set_bls). Accepts
        tuples, (N, 2) arrays, or blnum codes."""
        if np.ndim(bls) == 2:   # (N, 2) ant-pair array
            bls = [tuple(int(a) for a in b) for b in bls]
        self._red_idx = jnp.asarray(self.red_index(bls))
        return self

    def forward(self, vd, undo=False, prior_cache=None, **kwargs):
        p = self.params if self.p0 is None else self.params + self.p0
        redvis = self.R(p)
        self.eval_prior(prior_cache, inp_params=self.params,
                        out_params=redvis)
        # time minibatching (reference :986)
        if getattr(vd, "times", None) is not None \
                and vd.Ntimes != redvis.shape[-2]:
            redvis = self.index_params(redvis, times=vd.times)
        if getattr(self, "_red_idx", None) is not None:
            idx = self._red_idx
        else:
            idx = jnp.asarray(self.red_index(vd.blnums))
        expanded = jnp.take(redvis, idx, axis=2)
        vout = vd.copy()
        vout.data = vd.data - expanded if undo else vd.data + expanded
        return vout


# ---------------------------------------------------------------------------
# functional calibration application
# ---------------------------------------------------------------------------

def _apply_cal(vis, gains, g1_idx, g2_idx, cal_2pol=False, cov=None,
               vis_type="com", undo=False):
    """V_out = g1 V g2* per baseline (reference :2413-2489).

    vis (Npol,Npol,Nbls,Nt,Nf), gains (Npol,Npol,Nants,Nt,Nf); g1_idx,
    g2_idx index antennas per baseline.
    """
    assert vis.shape[:2] == gains.shape[:2], "vis/gains Npol mismatch"
    polmode = "1pol" if vis.shape[:2] == (1, 1) else "4pol"
    if cal_2pol and polmode == "4pol":
        polmode = "2pol"

    g1 = jnp.take(gains, jnp.asarray(g1_idx), axis=2)
    g2 = jnp.take(gains, jnp.asarray(g2_idx), axis=2)

    if polmode in ("1pol", "2pol"):
        if vis_type == "com":
            G = g1 * g2.conj()
            if undo:
                vout = vis / G
                cov_out = None if cov is None else cov / (G * G.conj()).real
            else:
                vout = vis * G
                cov_out = None if cov is None else cov * (G * G.conj()).real
        elif vis_type == "dly":
            vout = vis + (g2 - g1 if undo else g1 - g2)
            cov_out = cov
        else:
            raise ValueError(vis_type)
    else:
        assert vis_type == "com", "4pol needs complex vis"
        if undo:
            # invert 2x2 Jones per antenna: move pol axes last
            g1m = jnp.moveaxis(jnp.moveaxis(g1, 0, -1), 0, -1)
            g2m = jnp.moveaxis(jnp.moveaxis(g2, 0, -1), 0, -1)
            g1i = jnp.linalg.inv(g1m)
            g2i = jnp.linalg.inv(g2m)
            g1 = jnp.moveaxis(jnp.moveaxis(g1i, -1, 0), -1, 0)
            g2 = jnp.moveaxis(jnp.moveaxis(g2i, -1, 0), -1, 0)
        vout = jnp.einsum("ab...,bc...,dc...->ad...", g1, vis, g2.conj())
        cov_out = cov
    return vout, cov_out


def apply_cal(vis, bls, gains, ants, cal_2pol=False, cov=None,
              vis_type="com", undo=False):
    """apply_cal with baseline tuples (reference :2348-2411)."""
    bls = blnum2ants(bls)
    if isinstance(bls, tuple):
        bls = [bls]
    lut = {int(a): i for i, a in enumerate(ants)}
    g1 = np.asarray([lut[bl[0]] for bl in bls], dtype=np.int32)
    g2 = np.asarray([lut[bl[1]] for bl in bls], dtype=np.int32)
    return _apply_cal(vis, gains, g1, g2, cal_2pol=cal_2pol, cov=cov,
                      vis_type=vis_type, undo=undo)


def rephase_to_refant(params, param_type, refant_idx, p0=None,
                      mode="rephase"):
    """Zero the reference antenna's phase (reference :2490-2610).

    mode 'rephase': divide all antennas by the refant phasor ('com') or
    subtract refant ('phs'/'dly'); mode 'zero': zero the refant imag/phase
    component only.
    """
    if refant_idx is None:
        return params
    i = refant_idx
    if param_type == "com":
        if not jnp.iscomplexobj(params):
            params = viewcomp(params)
        full = params if p0 is None else params + p0
        if mode == "rephase":
            # lax.complex (not 1j*angle): a complex scalar constant
            # cannot be transferred to the axon TPU backend
            ang = jnp.angle(full[:, :, i:i + 1])
            phs = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
            return params / phs if p0 is None else (full / phs) - p0
        # zero mode: strip imag of refant
        return params.at[:, :, i:i + 1].set(params[:, :, i:i + 1].real
                                            .astype(params.dtype))
    if param_type in ("phs", "dly"):
        full = params if p0 is None else params + p0
        if mode == "rephase":
            out = full - full[:, :, i:i + 1]
            return out if p0 is None else out - p0
        return params.at[:, :, i:i + 1].set(0.0)
    return params


def compute_redcal_degen(gains, ants, antpos, wgts=None, abs_amp=True,
                         phs_slope=True):
    """Redcal degeneracies of a gain tensor: overall amplitude and the
    EW/NS phase gradient (reference :2665-2759).

    Note: with wgts=None the amplitude parameter here is the *mean* of
    |g|^2 over antennas (the reference sums without normalizing when
    wgts is None, calibration.py:2768-2771, which makes
    remove_redcal_degen not idempotent — fixed here).
    """
    if wgts is None:
        w, wsum = 1.0, gains.shape[2]
    else:
        w = jnp.asarray(wgts)[:, None, None]
        wsum = jnp.sum(jnp.asarray(wgts))

    abs_amp_param = None
    if abs_amp:
        aa = jnp.sum(jnp.abs(gains) ** 2 * w, axis=2, keepdims=True) / wsum
        abs_amp_param = jnp.log(jnp.sqrt(aa))

    phs_slope_param = None
    if phs_slope:
        phs = jnp.angle(gains)
        A = jnp.asarray(antpos[[a for a in ants]][:, :2])
        if wgts is None:
            proj = jnp.linalg.pinv(A.T @ A) @ A.T
        else:
            W = jnp.eye(len(ants)) * jnp.asarray(wgts) / wsum
            proj = jnp.linalg.pinv(A.T @ W @ A) @ A.T @ W
        phs_slope_param = jnp.einsum("ab,ijblm->ijalm", proj, phs)
    return abs_amp_param, phs_slope_param


def redcal_degen_gains(abs_amp=None, phs_slope=None, ants=None, antpos=None):
    """Degeneracy parameters -> complex gains (reference :2760-2850)."""
    out = None
    if abs_amp is not None:
        out = jnp.exp(abs_amp).astype(_cfloat())
    if phs_slope is not None:
        A = jnp.asarray(antpos[[a for a in ants]][:, :2])
        phs = jnp.einsum("ab,ijblm->ijalm", A, phs_slope)
        g = jnp.exp(1j * phs)
        out = g if out is None else out * g
    return out


def remove_redcal_degen(gains, ants, antpos, degen=None, wgts=None,
                        redvis=None, bls=None, abs_amp=True,
                        phs_slope=True):
    """Divide out (or replace) redcal degeneracies (reference :2611-2664).

    Returns (new_gains, new_vis, degen_gains).
    """
    rd = compute_redcal_degen(jax.lax.stop_gradient(gains), ants, antpos,
                              wgts=wgts, abs_amp=abs_amp,
                              phs_slope=phs_slope)
    degen_gains = redcal_degen_gains(abs_amp=rd[0], phs_slope=rd[1],
                                     ants=ants, antpos=antpos)
    if degen is not None:
        degen_gains = degen_gains / degen
    new_gains = gains / degen_gains
    new_vis = None
    if redvis is not None:
        new_vis = apply_cal(redvis, bls, degen_gains, ants, undo=False)[0]
    return new_gains, new_vis, degen_gains


def compute_redcal_degen_vis(vd, wgts=None, abs_amp=True, phs_slope=True,
                             bls=None, antpos=None):
    """Redcal degeneracies of a visibility set (reference :2788-2851):
    baseline-averaged log-amplitude (Npol, Npol, 1, Nt, Nf) and the
    EW/NS phase-slope gradient [rad/m] (Npol, Npol, 2, Nt, Nf)."""
    from ..data.containers import VisData
    data = vd.data if isinstance(vd, VisData) else jnp.asarray(vd)
    if isinstance(vd, VisData):
        bls, antpos = vd.bls, vd.antpos
    if wgts is None:
        w, wsum = 1.0, data.shape[2]
    else:
        w = jnp.asarray(wgts)[:, None, None]
        wsum = jnp.sum(jnp.asarray(wgts))

    abs_amp_param = None
    if abs_amp:
        aa = jnp.sum(jnp.abs(data) * w, axis=2, keepdims=True) / wsum
        abs_amp_param = jnp.log(aa)

    phs_slope_param = None
    if phs_slope:
        phs = jnp.angle(data)
        a1, a2 = zip(*bls)
        A = jnp.asarray((antpos[list(a1)] - antpos[list(a2)])[:, :2])
        if wgts is None:
            proj = jnp.linalg.pinv(A.T @ A) @ A.T
        else:
            W = jnp.eye(len(bls)) * jnp.asarray(wgts) / wsum
            proj = jnp.linalg.pinv(A.T @ W @ A) @ A.T @ W
        phs_slope_param = jnp.einsum("ab,ijblm->ijalm", proj, phs)
    return abs_amp_param, phs_slope_param


def redcal_degen_vis(abs_amp=None, phs_slope=None, vd=None, bls=None,
                     antpos=None):
    """Visibilities carrying ONLY the redcal degenerate modes
    (reference :2853-2916): V_degen = exp(abs_amp) exp(i b_EW/NS . Phi).
    Returns a VisData when vd is given, else a tensor."""
    from ..data.containers import VisData
    if vd is not None:
        bls, antpos = vd.bls, vd.antpos
    amp = 1.0 if abs_amp is None else jnp.exp(abs_amp)
    phs = 0.0
    if phs_slope is not None:
        a1, a2 = zip(*bls)
        A = jnp.asarray((antpos[list(a1)] - antpos[list(a2)])[:, :2])
        phs = jnp.einsum("ba,ijalm->ijblm", A, phs_slope)
    data = amp * jnp.exp(1j * phs)
    if vd is None:
        return data
    out = VisData()
    out.setup_meta(telescope=vd.telescope, antpos=vd.antpos)
    data = jnp.broadcast_to(data, vd.data.shape)
    out.setup_data(vd.bls, vd.times, vd.freqs, pol=vd.pol, data=data,
                   history="redcal degenerate visibilities")
    return out


def vis2JonesModel(vis, param_type="com", freq_mode="channel",
                   time_mode="channel", freqs=None, freq_LM=None,
                   time_LM=None, refant=None, single_ant=False):
    """Vanilla JonesModel sized from a VisData (reference :2918-2955):
    unity (com) or zero (amp/phs) starting gains for every antenna in
    the data."""
    from ..utils.indexing import flatten
    R = JonesResponse(param_type=param_type, antpos=vis.antpos,
                      freq_mode=freq_mode, freq_LM=freq_LM, freqs=freqs,
                      time_mode=time_mode, time_LM=time_LM)
    ants = sorted(set(flatten([list(b) for b in vis.bls])))
    polmode = "1pol" if vis.Npol == 1 else "4pol"
    nants = len(ants)
    if "slope" in param_type:
        nants = 2
    elif single_ant:
        nants = 1
    ntp = len(vis.times) if time_mode == "channel" else \
        np.shape(time_LM.A)[-1]
    nfp = len(vis.freqs) if freq_mode == "channel" else \
        np.shape(freq_LM.A)[-1]
    shape = (vis.Npol, vis.Npol, nants, ntp, nfp)
    if param_type == "com":
        from ..utils.dtypes import viewreal
        params = viewreal(jnp.ones(shape, dtype=_cfloat()))
    else:
        params = jnp.zeros(shape, dtype=_float())
    return JonesModel(params, ants=ants, R=R, refant=refant,
                      polmode=polmode, single_ant=single_ant)


def vis2RedVisModel(vis, param_type="com", freq_mode="channel",
                    time_mode="channel", freqs=None, freq_LM=None,
                    time_LM=None, redtol=1.0):
    """Vanilla RedVisModel sized from a VisData (reference :2957-2995):
    zero starting parameters per redundant group."""
    from .telescope import build_reds
    reds, rvecs, bl2red = build_reds(vis.antpos, bls=vis.bls,
                                     redtol=redtol)[:3]
    R = VisModelResponse(param_type=param_type, freq_mode=freq_mode,
                         freqs=freqs, freq_LM=freq_LM,
                         time_mode=time_mode, time_LM=time_LM)
    ntp = len(vis.times) if time_mode == "channel" else \
        np.shape(time_LM.A)[-1]
    nfp = len(vis.freqs) if freq_mode == "channel" else \
        np.shape(freq_LM.A)[-1]
    shape = (vis.Npol, vis.Npol, len(reds), ntp, nfp)
    if param_type == "com":
        from ..utils.dtypes import viewreal
        params = viewreal(jnp.zeros(shape, dtype=_cfloat()))
    else:
        params = jnp.zeros(shape, dtype=_float())
    return RedVisModel(params, bl2red, R=R)


def chisq(raw_data, forward_model, wgts, axis=None, dof=None,
          cov_axis=None, mode="vis"):
    """Chi-square between two tensors weighted by wgts (the icov)
    (reference calibration.py:2986-3044): |res|^2-weighted via
    apply_icov for any supported covariance structure; elementwise
    unless axis is given; divided by dof if provided."""
    from ..inference.prob import apply_icov
    res = raw_data - forward_model
    out = apply_icov(res, wgts, cov_axis, mode=mode)
    out = out.real
    if dof is not None:
        out = out / dof
    if axis is not None:
        out = jnp.sum(out, axis=axis)
    return out
