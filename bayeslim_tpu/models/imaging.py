"""
Dirty-map imaging: m = D A^T W y with PSF matrix P = A^T W A.

Reference parity: bayeslim/imaging.py (VisMapper :12-972, make_map :717,
compute_P :818, deconvolve_map :739, VisData2MapData :864).

TPU-first: the per-time imaging matrix A = conj(fringe) x beam is built
from host-precomputed zen/az + static padded FOV cuts (same precompute
pattern as the RIME) and the accumulation over times is a jitted scan;
the inner products A^T(w v) and A^T W A are MXU matmuls.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dtypes import C_MS, _float, _cfloat
from ..data.containers import VisData, MapData
from ..ops.phase import fringe_phasor
from .telescope import ArrayModel
from .beam import cut_sky_fov

__all__ = ["VisMapper", "make_map", "compute_P", "deconvolve_map",
           "VisData2MapData"]


def make_map(v, w, A):
    """Single-time dirty map: m = A^T (w * v) (reference imaging.py:717).

    v (Nbls, Nfreqs) complex, w (Nbls, Nfreqs) weights,
    A (Nbls, Nfreqs, Npix) imaging matrix. Returns (Nfreqs, Npix) real.
    """
    wv = (w * v).astype(A.dtype)
    return jnp.einsum("...bf,bfp->...fp", wv, A).real


def compute_P(A, w, D=None, contract=None):
    """PSF matrix P = D A^T W A* (reference imaging.py:833-863).

    contract: 'diag' -> (Nfreqs, Npix) diagonal; 'rowsum' -> row sums
    (also (Nfreqs, Npix), contracted without building the full matrix);
    None -> full (Nfreqs, Npix, Npix). D (Nfreqs, Npix) multiplies the
    result (broadcast over the trailing pixel axis for the full matrix).
    """
    if contract == "diag":
        P = jnp.einsum("bfp,bf,bfp->fp", A, w.astype(A.dtype),
                       A.conj()).real
    elif contract == "rowsum":
        P = jnp.einsum("bfp,bf,bfq->fp", A, w.astype(A.dtype),
                       A.conj()).real
    else:
        P = jnp.einsum("bfp,bf,bfq->fpq", A, w.astype(A.dtype),
                       A.conj()).real
    if D is not None:
        P = P * (D if contract is not None else D[:, :, None])
    return P


def deconvolve_map(m, P, pinv=True, rcond=1e-15, hermitian=True):
    """dm = pinv(P) @ m per frequency (reference imaging.py:739-752).

    pinv=False uses only the diagonal of P (the reference's fallback
    branch); a P passed with m's dimensionality is treated as an
    already-diagonal PSF."""
    if P.ndim == m.ndim:
        # diagonal P
        return m / jnp.clip(P, 1e-30)
    if pinv:
        Pinv = jnp.linalg.pinv(P, rcond=rcond, hermitian=hermitian)
    else:
        d = jnp.diagonal(P, axis1=1, axis2=2)
        Pinv = jnp.zeros_like(P)
        idx = jnp.arange(P.shape[1])
        Pinv = Pinv.at[..., idx, idx].set(1.0 / d)
    return jnp.einsum("fpq,fq->fp", Pinv, m)


class VisMapper:
    """Dirty-map imaging of VisData (reference imaging.py:12-972).

    Single-pol imaging: per time, A = conj(fringe) * beam; maps are
    accumulated over times and normalized by D per
    set_normalization(method): 'w' (1/sum w), 'Aw' (1/w|A|), 'A2w'
    (1/w|A|^2, standard least squares).
    """

    def __init__(self, vd, ra, dec, beam=None, fov=180.0, pad_to=None):
        self.vd = vd
        self.telescope = vd.telescope
        self.array = ArrayModel(vd.antpos, freqs=vd.freqs, skip_reds=True)
        self.ra = np.asarray(ra, dtype=np.float64)
        self.dec = np.asarray(dec, dtype=np.float64)
        self.Npix = len(self.ra)
        self.beam = beam
        self.fov = beam.fov if beam is not None else fov
        self.freqs = np.asarray(vd.freqs)
        self.Nfreqs = len(self.freqs)
        self.times = np.asarray(vd.times)
        self.bls = vd.bls
        self.Nbls = len(self.bls)
        self.blvecs = self.array.get_blvecs(self.bls)
        self.icov = None
        self._vd_full = vd
        self._sel = {}
        self._pad_to = pad_to
        self.set_normalization()
        self._precompute(pad_to)

    # --- observation sub-selection (reference imaging.py:105-227) ---------
    def _reselect(self):
        vd = self._vd_full.select(**self._sel, inplace=False) \
            if self._sel else self._vd_full
        self.vd = vd
        self.freqs = np.asarray(vd.freqs)
        self.Nfreqs = len(self.freqs)
        self.times = np.asarray(vd.times)
        self.bls = vd.bls
        self.Nbls = len(self.bls)
        self.blvecs = self.array.get_blvecs(self.bls)
        self.D = None
        # the jitted map fns close over freqs/Npix/Nbls: drop them (a
        # same-shape different-frequency selection would otherwise reuse
        # an executable with the OLD freqs baked in)
        self._mm_cache = {}
        self._reslice_icov()
        self._precompute(self._pad_to)

    def _reslice_icov(self):
        """Slice the user-supplied normalization icov (original VisData
        shape) onto the current set_*_inds selection."""
        if getattr(self, "_icov_full", None) is None:
            return
        inds = self._vd_full.get_inds(**self._sel)
        self.icov = self._vd_full._index_arr(
            jnp.asarray(self._icov_full), inds)

    def set_bl_inds(self, bl_inds=None, blnums=None):
        """Image only these baselines (indices into the original VisData,
        or blnums) (reference imaging.py:192-227)."""
        assert not ((blnums is not None) and (bl_inds is not None))
        if bl_inds is None and blnums is None:
            self._sel.pop("bl", None)
        elif bl_inds is not None:
            self._sel["bl"] = [self._vd_full.bls[int(i)]
                               for i in np.atleast_1d(bl_inds)]
        else:
            from ..utils.indexing import blnum2ants
            self._sel["bl"] = [tuple(b) for b in
                               blnum2ants(np.atleast_1d(blnums))]
        self._reselect()

    def set_time_inds(self, time_inds=None, times=None):
        """Image only these times (indices or JD values)
        (reference imaging.py:140-191)."""
        assert not ((times is not None) and (time_inds is not None))
        if time_inds is None and times is None:
            self._sel.pop("times", None)
        else:
            t = np.asarray(self._vd_full.times)[np.atleast_1d(time_inds)] \
                if time_inds is not None else np.atleast_1d(times)
            self._sel["times"] = t
        self._reselect()

    def set_freq_inds(self, freq_inds=None, freqs=None):
        """Image only these frequencies (indices or Hz values)
        (reference imaging.py:105-139)."""
        assert not ((freqs is not None) and (freq_inds is not None))
        if freq_inds is None and freqs is None:
            self._sel.pop("freqs", None)
        else:
            f = np.asarray(self._vd_full.freqs)[np.atleast_1d(freq_inds)] \
                if freq_inds is not None else np.atleast_1d(freqs)
            self._sel["freqs"] = f
        self._reselect()

    def _precompute(self, pad_to=None):
        """Host precompute: per-time zen/az, FOV cut (padded), s-vectors,
        beam interp ctx."""
        zen_l, az_l, cut_l, mask_l, ctx_l = [], [], [], [], []
        raw = []
        ncut = 0
        for t in self.times:
            zen, az = self.telescope.eq2top(t, self.ra, self.dec)
            raw.append((zen, az))
            ncut = max(ncut, int((zen < self.fov / 2).sum()))
        pad = pad_to or max(8, int(np.ceil(ncut / 8) * 8))
        s_l = []
        for zen, az in raw:
            idx = np.where(zen < self.fov / 2)[0]
            cut = np.zeros(pad, dtype=np.int32)
            cut[:len(idx)] = idx
            mask = np.zeros(pad, dtype=bool)
            mask[:len(idx)] = True
            # fringe s-vectors from the TRUE angles; the beam's pointing
            # offset applies only to beam evaluation (angles + ctx)
            s_l.append(ArrayModel.s_vector(zen[cut], az[cut]))
            zen_b, az_b = (self.beam.apply_pointing(zen[cut], az[cut])
                           if self.beam is not None
                           else (zen[cut], az[cut]))
            zen_l.append(zen_b)
            az_l.append(az_b)
            cut_l.append(cut)
            mask_l.append(mask)
            if self.beam is not None and hasattr(self.beam.R, "precompute"):
                ctx_l.append(self.beam.R.precompute(zen_b, az_b))
        self._zen = np.stack(zen_l)
        self._az = np.stack(az_l)
        self._cut = np.stack(cut_l)
        self._mask = np.stack(mask_l)
        self._s = np.stack(s_l)
        self._ctx = None
        if ctx_l:
            self._ctx = (jnp.asarray(np.stack([c[0] for c in ctx_l])),
                         jnp.asarray(np.stack([c[1] for c in ctx_l])))

    def set_normalization(self, method="A2w", icov=None, clip=1e-8):
        """icov (if given) must have the ORIGINAL VisData's shape; the
        set_*_inds selections re-slice it automatically."""
        assert method in ("w", "Aw", "A2w")
        self.method = method
        self._icov_full = icov
        self.icov = icov
        self.clip = clip
        self.D = None
        if getattr(self, "_sel", None):
            self._reslice_icov()

    def build_A(self, time_ind):
        """Imaging matrix for one time: (Nbls, Nfreqs, Npad) complex
        (reference :250-296); pixels beyond the FOV are masked to 0."""
        i = time_ind
        s = jnp.asarray(self._s[i], dtype=_float())
        tau = (self.blvecs @ s) / C_MS
        A = jnp.moveaxis(fringe_phasor(tau, self.freqs, conj=True), -1, 1)
        if self.beam is not None:
            ctx = None if self._ctx is None else \
                (self._ctx[0][i], self._ctx[1][i])
            b = self.beam.gen_beam(jnp.asarray(self._zen[i]),
                                   jnp.asarray(self._az[i]), ctx=ctx,
                                   angles_offset=True)
            b = b[0, 0, 0]  # single-pol, antenna-independent
            fidx = self._beam_fidx()
            if fidx is not None and b.shape[0] != self.Nfreqs:
                b = b[jnp.asarray(fidx)]
            if not self.beam.powerbeam:
                b = b ** 2
            A = A * b
        A = A * jnp.asarray(self._mask[i])
        return A

    def build_v(self, time_ind, vd=None):
        vd = self.vd if vd is None else vd
        return vd.data[0, 0, :, time_ind, :]

    def build_w(self, time_ind):
        icov = self.icov if self.icov is not None else self.vd.icov
        if icov is not None:
            return icov[0, 0, :, time_ind, :].real
        return jnp.ones((self.Nbls, self.Nfreqs), dtype=_float())

    def _beam_fidx(self):
        """Indices of the active (possibly sub-selected) freqs in the
        beam's native freq axis (the reference slices the beam by
        freq_inds after evaluation, imaging.py:277-278)."""
        if self.beam is None:
            return None
        bf = np.asarray(self.beam.freqs)
        if len(bf) == len(self.freqs) and np.allclose(bf, self.freqs):
            return None
        return np.asarray([int(np.argmin(np.abs(bf - f)))
                           for f in self.freqs])

    def _a_builder(self):
        """Traced per-time imaging-matrix build shared by the jitted
        analysis loops (same math as build_A, indexed into the stacked
        precompute)."""
        freqs = self.freqs
        fidx = self._beam_fidx()

        def build(i, s_all, cut_all, mask_all, zen_all, az_all, ctx,
                  blvecs, beam):
            s, cut, mask = s_all[i], cut_all[i], mask_all[i]
            tau = (blvecs @ s) / C_MS
            A = jnp.moveaxis(fringe_phasor(tau, freqs, conj=True), -1, 1)
            if beam is not None:
                c = None if len(ctx) == 0 else (ctx[0][i], ctx[1][i])
                b = beam.gen_beam(zen_all[i], az_all[i], ctx=c,
                                  angles_offset=True)[0, 0, 0]
                if fidx is not None and b.shape[0] != len(freqs):
                    b = b[jnp.asarray(fidx)]
                if not beam.powerbeam:
                    b = b ** 2
                A = A * b
            return A * mask, cut, mask

        return build

    def _pre_args(self):
        ctx = self._ctx if self._ctx is not None else ()
        return (jnp.asarray(self._s, dtype=_float()),
                jnp.asarray(self._cut),
                jnp.asarray(self._mask, dtype=_float()),
                jnp.asarray(self._zen, dtype=_float()),
                jnp.asarray(self._az, dtype=_float()), ctx,
                jnp.asarray(self.blvecs, dtype=_float()))

    @staticmethod
    def _maps2tensor(maps):
        """MapData / list / tensor -> (..., Nfreqs, Npix) jnp array
        (reference imaging.py:488-496 map2ten)."""
        from ..data.containers import MapData
        m2t = lambda m: m.get_data() if isinstance(m, MapData) else m
        if isinstance(maps, list):
            maps = jnp.stack([jnp.asarray(m2t(m)) for m in maps])
        else:
            maps = jnp.asarray(m2t(maps))
        return maps

    def compute_Am(self, maps):
        """A @ maps per time integration: the RIME forward transform of
        maps through the cached imaging matrices (reference
        imaging.py:469-527). maps: MapData, list, or tensor of shape
        (..., Nfreqs, Npix). Returns (Nmaps, Nbls, Ntimes, Nfreqs),
        leading axis squeezed when maps carried none.

        The reference's per-time Python loop runs here as one jitted
        fori_loop (cached per maps-shape)."""
        maps = self._maps2tensor(maps)
        squeeze = maps.ndim == 2
        m = maps[None] if squeeze else maps.reshape((-1,) + maps.shape[-2:])
        nbls, nf, nt = self.Nbls, self.Nfreqs, len(self.times)
        build = self._a_builder()

        def fn(m, s_all, cut_all, mask_all, zen_all, az_all, ctx, blvecs,
               beam):
            v0 = jnp.zeros((m.shape[0], nbls, nt, nf), dtype=_cfloat())

            def body(i, v):
                A, cut, mask = build(i, s_all, cut_all, mask_all,
                                     zen_all, az_all, ctx, blvecs, beam)
                vt = compute_Am(A, m[..., cut].astype(A.dtype))
                return v.at[..., i, :].set(vt)

            return jax.lax.fori_loop(0, nt, body, v0)

        if not hasattr(self, "_an_cache"):
            self._an_cache = {}
        key = ("Am", m.shape)
        if key not in self._an_cache:
            self._an_cache[key] = jax.jit(fn)
        v = self._an_cache[key](m, *self._pre_args(), self.beam)
        if squeeze:
            v = v[0]
        else:
            v = v.reshape(maps.shape[:-2] + v.shape[1:])
        return v

    def compute_Pm(self, maps, D=None):
        """PSF action on maps, P @ maps = D A^T w (A* maps), accumulated
        over time integrations with the mapper's normalization
        (reference imaging.py:528-611). Returns (..., Nfreqs, Npix)."""
        maps = self._maps2tensor(maps)
        squeeze = maps.ndim == 2
        m = maps[None] if squeeze else maps.reshape((-1,) + maps.shape[-2:])
        nf, npix, nbls, nt = (self.Nfreqs, self.Npix, self.Nbls,
                              len(self.times))
        method, clip = self.method, self.clip
        icov = self.icov if self.icov is not None else self.vd.icov
        has_icov = icov is not None
        has_D = D is not None
        build = self._a_builder()

        def fn(m, D, icov, s_all, cut_all, mask_all, zen_all, az_all,
               ctx, blvecs, beam):
            Pm0 = jnp.zeros((m.shape[0], nf, npix), dtype=_float())
            Aw0 = jnp.zeros((nf, 1 if method == "w" else npix),
                            dtype=_float())

            def body(i, carry):
                Pm, Aw = carry
                A, cut, mask = build(i, s_all, cut_all, mask_all,
                                     zen_all, az_all, ctx, blvecs, beam)
                w = icov[0, 0, :, i, :].real if has_icov else \
                    jnp.ones((nbls, nf), dtype=_float())
                _Pm = compute_Pm(A, w, m[..., cut])
                Pm = Pm.at[..., cut].add(_Pm * mask)
                if not has_D:
                    if method == "w":
                        Aw = Aw + w.sum(0)[:, None]
                    elif method == "Aw":
                        Aw = Aw.at[:, cut].add(
                            jnp.einsum("bf,bfp->fp", w, jnp.abs(A)))
                    else:
                        Aw = Aw.at[:, cut].add(
                            jnp.einsum("bf,bfp->fp", w, jnp.abs(A) ** 2))
                return Pm, Aw

            Pm, Aw = jax.lax.fori_loop(0, nt, body, (Pm0, Aw0))
            if not has_D:
                D = 1.0 / jnp.clip(Aw, clip)
            return Pm * D

        if not hasattr(self, "_an_cache"):
            self._an_cache = {}
        key = ("Pm", m.shape, method, clip, has_icov, has_D)
        if key not in self._an_cache:
            self._an_cache[key] = jax.jit(fn)
        Dv = jnp.asarray(D, dtype=_float()) if has_D else \
            jnp.zeros((1, 1), dtype=_float())
        icv = icov if has_icov else jnp.zeros((1, 1, nbls, nt, nf),
                                              dtype=_float())
        Pm = self._an_cache[key](m, Dv, icv, *self._pre_args(), self.beam)
        if squeeze:
            Pm = Pm[0]
        else:
            Pm = Pm.reshape(maps.shape[:-2] + Pm.shape[1:])
        return Pm

    def compute_P(self, D=None, contract="diag"):
        """Full PSF matrix across all sky pixels, summed over time
        integrations and normalized (reference imaging.py:612-692).
        contract: 'diag'/'rowsum' -> (Nfreqs, Npix); None -> the full
        (Nfreqs, Npix, Npix) matrix."""
        nf, npix, nbls, nt = (self.Nfreqs, self.Npix, self.Nbls,
                              len(self.times))
        method, clip = self.method, self.clip
        icov = self.icov if self.icov is not None else self.vd.icov
        has_icov = icov is not None
        has_D = D is not None
        build = self._a_builder()

        def fn(D, icov, s_all, cut_all, mask_all, zen_all, az_all, ctx,
               blvecs, beam):
            P0 = jnp.zeros((nf, npix) if contract is not None
                           else (nf, npix, npix), dtype=_float())
            Aw0 = jnp.zeros((nf, 1 if method == "w" else npix),
                            dtype=_float())

            def body(i, carry):
                P, Aw = carry
                A, cut, mask = build(i, s_all, cut_all, mask_all,
                                     zen_all, az_all, ctx, blvecs, beam)
                w = icov[0, 0, :, i, :].real if has_icov else \
                    jnp.ones((nbls, nf), dtype=_float())
                _P = compute_P(A, w, contract=contract)
                if contract is not None:
                    P = P.at[:, cut].add(_P * mask)
                else:
                    P = P.at[:, cut[:, None], cut[None, :]].add(_P)
                if not has_D:
                    if method == "w":
                        Aw = Aw + w.sum(0)[:, None]
                    elif method == "Aw":
                        Aw = Aw.at[:, cut].add(
                            jnp.einsum("bf,bfp->fp", w, jnp.abs(A)))
                    else:
                        Aw = Aw.at[:, cut].add(
                            jnp.einsum("bf,bfp->fp", w, jnp.abs(A) ** 2))
                return P, Aw

            P, Aw = jax.lax.fori_loop(0, nt, body, (P0, Aw0))
            if not has_D:
                D = 1.0 / jnp.clip(Aw, clip)
            return P * (D if contract is not None else D[:, :, None])

        if not hasattr(self, "_an_cache"):
            self._an_cache = {}
        key = ("P", contract, method, clip, has_icov, has_D)
        if key not in self._an_cache:
            self._an_cache[key] = jax.jit(fn)
        Dv = jnp.asarray(D, dtype=_float()) if has_D else \
            jnp.zeros((1, 1), dtype=_float())
        icv = icov if has_icov else jnp.zeros((1, 1, nbls, nt, nf),
                                              dtype=_float())
        return self._an_cache[key](Dv, icv, *self._pre_args(), self.beam)

    def make_map(self, vd=None, return_P=True, contract="diag"):
        """Accumulate dirty maps over times and normalize
        (reference :360-470). Returns (maps (Nfreqs, Npix), P).

        The whole time loop runs inside ONE jitted fori_loop (the
        reference's per-time Python loop would cost an RPC per op on the
        remote TPU backend); jitted executables are cached per
        (return_P, contract, method, has_icov) on this mapper.
        """
        vd = self.vd if vd is None else vd

        def _mat(d):
            # lazy (HDF5/cat) tensors: materialize once before entering
            # jit (reference imaging.py reads vd.get_data per time; one
            # bulk read is strictly cheaper)
            return d if isinstance(d, jnp.ndarray) else jnp.asarray(d[:])

        if isinstance(vd, (list, tuple)):
            # multi-map form (reference :387-398): stack along a leading
            # Nmaps axis; weights stay shared (see below)
            data = jnp.stack([_mat(v.data) for v in vd])
        else:
            data = _mat(vd.data) if vd.data is not None else None
        # weights ALWAYS come from self (reference build_w :328-358:
        # self.icov, else self.vd.icov), even when imaging another vd
        icov = self.icov if self.icov is not None else self.vd.icov
        if icov is not None:
            icov = _mat(icov)
        if not hasattr(self, "_mm_cache"):
            self._mm_cache = {}
        key = (return_P, contract, self.method, self.clip,
               icov is not None, np.shape(data))
        if key not in self._mm_cache:
            self._mm_cache[key] = jax.jit(
                self._build_mm_fn(return_P, contract, icov is not None))
        fn = self._mm_cache[key]

        s_all = jnp.asarray(self._s, dtype=_float())
        cut_all = jnp.asarray(self._cut)
        mask_all = jnp.asarray(self._mask, dtype=_float())
        zen_all = jnp.asarray(self._zen, dtype=_float())
        az_all = jnp.asarray(self._az, dtype=_float())
        ctx = self._ctx if self._ctx is not None else ()
        maps, P, D = fn(data, icov, s_all, cut_all, mask_all, zen_all,
                        az_all, ctx, jnp.asarray(self.blvecs,
                                                 dtype=_float()), self.beam)
        self.D = D
        return maps, P

    def _build_mm_fn(self, return_P, contract, has_icov):
        method, clip = self.method, self.clip
        nf, npix, nbls = self.Nfreqs, self.Npix, self.Nbls
        ntimes = len(self.times)
        build = self._a_builder()

        def fn(data, icov, s_all, cut_all, mask_all, zen_all, az_all,
               ctx, blvecs, beam):
            lead = tuple(data.shape[:-5])  # () or (Nmaps,)
            maps0 = jnp.zeros(lead + (nf, npix), dtype=_float())
            Aw0 = jnp.zeros((nf, 1 if method == "w" else npix),
                            dtype=_float())
            if not return_P:
                P0 = jnp.zeros((1,), dtype=_float())
            elif contract is not None:
                P0 = jnp.zeros((nf, npix), dtype=_float())
            else:
                P0 = jnp.zeros((nf, npix, npix), dtype=_float())

            def body(i, carry):
                maps, Aw, P = carry
                A, cut, mask = build(i, s_all, cut_all, mask_all,
                                     zen_all, az_all, ctx, blvecs, beam)
                v = data[..., 0, 0, :, i, :]
                w = icov[0, 0, :, i, :].real if has_icov else \
                    jnp.ones((nbls, nf), dtype=_float())
                m = make_map(v, w, A)
                maps = maps.at[..., cut].add(m * mask)
                if return_P:
                    _P = compute_P(A, w, contract=contract)
                    if contract is not None:
                        P = P.at[:, cut].add(_P * mask)
                    else:
                        P = P.at[:, cut[:, None], cut[None, :]].add(_P)
                if method == "w":
                    Aw = Aw + w.sum(0)[:, None]
                elif method == "Aw":
                    Aw = Aw.at[:, cut].add(
                        jnp.einsum("bf,bfp->fp", w, jnp.abs(A)))
                else:
                    Aw = Aw.at[:, cut].add(
                        jnp.einsum("bf,bfp->fp", w, jnp.abs(A) ** 2))
                return maps, Aw, P

            maps, Aw, P = jax.lax.fori_loop(0, ntimes, body,
                                            (maps0, Aw0, P0))
            D = 1.0 / jnp.clip(Aw, clip)
            maps = maps * D
            if not return_P:
                P = None
            elif contract is not None:
                P = P * D
            else:
                P = P * D[:, :, None]
            return maps, P, D

        return fn

    def deconvolve_map(self, m, P, **kwargs):
        return deconvolve_map(m, P, **kwargs)

    def to_MapData(self, maps, name="dirty_map"):
        return VisData2MapData(
            self.vd, data=jnp.asarray(maps)[None, None],
            angs=jnp.asarray(np.stack([self.ra, self.dec])),
            norm=self.D, name=name)


def VisData2MapData(vd, data=None, angs=None, cov=None, icov=None,
                    cov_axis=None, norm=None, df=None, name=None):
    """MapData carrying a VisData's metadata (reference
    imaging.py:864-930): pols from vd.pol, per-freq flags reduced over
    baselines+times and broadcast over pixels."""
    md = MapData()
    md.setup_meta(name=name)
    pols = ["ee", "nn"] if vd.pol is None else [vd.pol]
    npix = np.shape(angs)[1] if angs is not None else 1
    flags = None
    if vd.flags is not None:
        flags = np.asarray(vd.flags).all(axis=(2, 3))
        flags = np.broadcast_to(flags[..., None], flags.shape + (npix,))
    md.setup_data(vd.freqs, df=df, data=data, pols=pols, angs=angs,
                  flags=flags, cov=cov, icov=icov, cov_axis=cov_axis,
                  norm=norm)
    return md


def compute_Am(A, m):
    """A.conj @ m: the RIME forward transform of maps through the
    imaging matrix (reference imaging.py:755-775).

    A : (Nbls, Nfreqs, Npix); m : (..., Nfreqs, Npix)
    Returns (..., Nbls, Nfreqs)."""
    return jnp.einsum("vfp,...fp->...vf", A.conj(), m)


def compute_Pm(A, w, m, D=None):
    """P @ m = D A^T w (A.conj m): PSF action on maps (reference
    imaging.py:778-830). Matrix-free: never builds the (Npix, Npix) P."""
    wAm = w * compute_Am(A, m.astype(A.dtype))
    Pm = jnp.einsum("vfp,...vf->...fp", A, wAm).real
    if D is not None:
        Pm = Pm * D
    return Pm


def get_visdata(vd, bl_inds=None, time_inds=None, freq_inds=None,
                squeeze=False):
    """Extract a tensor from a VisData / tensor / list thereof
    (reference imaging.py:933-975)."""
    from ..data.containers import VisData
    if isinstance(vd, list):
        return jnp.stack([get_visdata(v, bl_inds, time_inds, freq_inds,
                                      squeeze) for v in vd])
    data = vd.data if isinstance(vd, VisData) else jnp.asarray(vd)
    bl_inds = slice(None) if bl_inds is None else np.asarray(bl_inds)
    time_inds = slice(None) if time_inds is None else np.asarray(time_inds)
    freq_inds = slice(None) if freq_inds is None else np.asarray(freq_inds)
    out = data[..., bl_inds, :, :][..., time_inds, :][..., freq_inds]
    return out.squeeze() if squeeze else out
