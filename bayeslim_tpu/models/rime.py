"""
RIME forward model: V_pq = sum_pix A_p I A_q^H K_pq.

Reference parity: bayeslim/rime_model.py (RIME :13-482). Minibatch
semantics preserved: batches iterate (time groups x baseline groups) with
Nbatch / batch_idx (rime_model.py:253-289); redundant sim_bls -> data_bls
expansion via an index map (:148-226); run_batches sweeps and concatenates
(:442-482).

TPU-first redesign of the forward pass (vs the reference's per-time Python
loop with astropy calls and hash caches, rime_model.py:291-440):

1. All time/angle-dependent host work is done ONCE at construction
   (`precompute`): eq2top per (time, sky pixel), the static-shape padded
   FOV cut (indices + mask), unit pointing vectors s, and the beam
   response's interpolation ctx. These are stored as stacked constant
   arrays (Ntimes, ...).
2. `forward` is pure and jit-friendly: it lax.map's over the stacked
   per-time constants; each step is beam-eval + apply_beam + fringe
   reduction (`ops.rime_kernel.rime_reduce`, pixel-streaming).
3. Gradients flow through sky params, beam params and antenna positions
   (via tau = b.s/c) exactly as in the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import Module
from ..utils.module import HostState
from ..utils.dtypes import C_MS, _float
from ..utils.indexing import flatten as _flatten
from ..data.containers import VisData, concat_VisData
from ..ops.rime_kernel import rime_reduce
from .beam import cut_sky_fov

__all__ = ["RIME"]


class RIME(Module):
    """The sky-integral RIME forward model (reference rime_model.py:13)."""

    def __init__(self, sky, telescope, beam, array, sim_bls, times, freqs,
                 data_bls=None, name=None, pix_chunk=1024, remat=False,
                 time_mode="scan", vis_sharding=None, verbose=False):
        """time_mode: 'scan' (lax.map over times; memory-light, single
        chip) or 'vmap' (all times at once; required for sharding the time
        axis over a mesh). vis_sharding: optional
        jax.sharding.NamedSharding/PartitionSpec applied to the per-time
        visibility block (Npol, Npol, Nbls, Nfreqs) via
        with_sharding_constraint, letting XLA partition baselines/freqs
        across mesh axes (see parallel.sharding)."""
        super().__init__(name=name)
        self.sky = sky
        self.telescope = telescope
        self.beam = beam
        self.array = array
        self.pix_chunk = pix_chunk
        self.remat = remat
        self.time_mode = time_mode
        self.vis_sharding = vis_sharding
        self.verbose = verbose
        self.indexed_batching = False
        self._tg_arg = None
        self._pre_stack = None
        self._host = HostState(tg=0)
        self.setup_freqs(freqs)
        self.setup_sim_bls(sim_bls, data_bls)
        self.setup_sim_times(times)
        self.precompute()

    # ------------------------------------------------------------------ setup
    def setup_freqs(self, freqs):
        self.freqs = np.asarray(freqs, dtype=np.float64)
        self.Nfreqs = len(self.freqs)
        self.array.set_freqs(self.freqs)

    def setup_sim_bls(self, sim_bls, data_bls=None):
        """Group baselines; build sim->data redundancy expansion index
        (reference :148-226)."""
        if isinstance(sim_bls, dict):
            groups = {k: [tuple(b) for b in v] for k, v in sim_bls.items()}
        elif isinstance(sim_bls[0], tuple):
            groups = {0: [tuple(b) for b in sim_bls]}
        else:
            groups = {i: [tuple(b) for b in g] for i, g in enumerate(sim_bls)}
        self.sim_bl_groups = groups
        self.all_sim_bls = _flatten(groups.values(), max_depth=1)
        self.Nbl_groups = len(groups)
        self.bl_group_id = 0

        # baseline vectors per group: differentiable through array.antvecs,
        # so store index pairs (as device arrays -- pytree leaves, which
        # lets parallel.sharding partition the baseline axis for
        # shard_map execution) and compute vectors inside forward
        self._blidx_groups = {
            k: tuple(jnp.asarray(np.asarray(ix), dtype=jnp.int32)
                     for ix in self.array.bl_index(v))
            for k, v in groups.items()}

        if data_bls is None:
            self.data_bl_groups = dict(groups)
            self._sim2data = {k: None for k in groups}
        else:
            data_bls = [tuple(b) for b in data_bls]
            self._sim2data = {}
            self.data_bl_groups = {}
            for k, blg in groups.items():
                sim_red = [self.array.bl2red[bl] for bl in blg]
                dbls = [bl for bl in data_bls
                        if self.array.bl2red[bl] in sim_red]
                data_red = [self.array.bl2red[bl] for bl in dbls]
                assert set(sim_red) == set(data_red), \
                    "non-overlapping bl type(s) in data_bls and sim_bls"
                self.data_bl_groups[k] = dbls
                self._sim2data[k] = np.asarray(
                    [sim_red.index(i) for i in data_red], dtype=np.int32)
        # post-construction re-batching (reference rime_model.py:148-226
        # allows it at any point): the model-pair dispatch built by
        # precompute from the OLD groups would silently mispair beams
        if hasattr(self, "_pre"):
            self.precompute()
            if self.indexed_batching:
                self.enable_indexed_batching()

    def setup_sim_times(self, times):
        if isinstance(times, dict):
            groups = {k: np.asarray(v, dtype=np.float64)
                      for k, v in times.items()}
        elif isinstance(times, (list,)) and np.ndim(times[0]) > 0:
            groups = {i: np.asarray(t, dtype=np.float64)
                      for i, t in enumerate(times)}
        else:
            t = np.atleast_1d(np.asarray(times, dtype=np.float64))
            groups = {0: t} if t.ndim == 1 else \
                {i: t[i] for i in range(t.shape[0])}
        self.sim_time_groups = groups
        self.all_sim_times = np.concatenate(list(groups.values()))
        self.Ntime_groups = len(groups)
        self.time_group_id = 0
        # re-batching after construction (reference rime_model.py:241-266
        # allows it at any point): rebuild the per-group precompute and
        # any indexed-batching stack built from it
        if hasattr(self, "_pre"):
            self.precompute()
            if self.indexed_batching:
                self.enable_indexed_batching()

    # ------------------------------------------------------------ batching API
    @property
    def Ntimes_all(self):
        return len(self.all_sim_times)

    @property
    def Nbls_all(self):
        return len(self.all_sim_bls)

    @property
    def Nbatch(self):
        return self.Nbl_groups * self.Ntime_groups

    @property
    def batch_idx(self):
        if self.indexed_batching:
            return self._host.tg * self.Nbl_groups + self.bl_group_id
        return self.time_group_id * self.Nbl_groups + self.bl_group_id

    @batch_idx.setter
    def batch_idx(self, val):
        assert 0 <= val < self.Nbatch
        if self.indexed_batching:
            # traced leaf selects the group: time_group_id (static aux)
            # stays pinned so the model treedef -- and hence the jitted
            # executable -- is identical for every batch
            self._host.tg = int(val // self.Nbl_groups)
            self._tg_arg = jnp.asarray(self._host.tg, jnp.int32)
            return
        self.time_group_id = int(val // self.Nbl_groups)
        self.bl_group_id = int(val % self.Nbl_groups)

    @property
    def sim_bls(self):
        return self.sim_bl_groups[self.bl_group_id]

    @property
    def data_bls(self):
        return self.data_bl_groups[self.bl_group_id]

    @property
    def sim_times(self):
        tg = self._host.tg if self.indexed_batching else self.time_group_id
        return self.sim_time_groups[tg]

    # ------------------------------------------------------------- precompute
    def _sky_components(self):
        """Static info about the sky components (host)."""
        from .sky import CompositeModel
        if isinstance(self.sky, CompositeModel):
            return list(self.sky.models.values())
        return [self.sky]

    def precompute(self):
        """Host precompute per (time group, sky component): zen/az, padded
        FOV indices+mask, s-vectors, beam interp ctx. Replaces the
        reference's runtime arr_hash caches (telescope_model.py:89-131,
        utils.py:742-813, beam_model.py:538-567)."""
        self._pre = {}
        comps = self._sky_components()
        rdt = _float()
        for tg, times in self.sim_time_groups.items():
            for ci, comp in enumerate(comps):
                angs = comp.angs_np if hasattr(comp, "angs_np") \
                    else np.asarray(comp.angs, dtype=np.float64)
                ra, dec = angs[0], angs[1]
                zen_list, az_list, cut_list, mask_list = [], [], [], []
                ncut = 0
                raw = []
                for t in times:
                    zen, az = self.telescope.eq2top(t, ra, dec)
                    raw.append((zen, az))
                    ncut = max(ncut, int((zen < self.beam.fov / 2).sum()))
                # pad to a multiple of the pixel chunk (or 8)
                base = self.pix_chunk if ncut >= self.pix_chunk else 8
                pad = int(np.ceil(max(ncut, 1) / base) * base)
                ctx_list = []
                s_list = []
                for (zen, az) in raw:
                    cut, mask = self.beam.fov_cut(zen, pad_to=pad)
                    zen_c, az_c = zen[cut], az[cut]
                    # fringe s-vectors from the TRUE angles; the beam's
                    # pointing offset applies only to beam evaluation
                    # (angles + interp ctx), as in the reference
                    # (beam_model.py:246-255 offsets inside gen_beam)
                    s_list.append(self.array.s_vector(zen_c, az_c))
                    zen_b, az_b = self.beam.apply_pointing(zen_c, az_c)
                    zen_list.append(zen_b)
                    az_list.append(az_b)
                    cut_list.append(cut)
                    mask_list.append(mask)
                    if hasattr(self.beam.R, "precompute"):
                        ctx_list.append(self.beam.R.precompute(zen_b, az_b))
                s = np.stack(s_list)
                pre = dict(
                    zen=jnp.asarray(np.stack(zen_list), dtype=rdt),
                    az=jnp.asarray(np.stack(az_list), dtype=rdt),
                    cut=jnp.asarray(np.stack(cut_list)),
                    mask=jnp.asarray(np.stack(mask_list)),
                    s=jnp.asarray(s, dtype=rdt),
                )
                if ctx_list:
                    pre["ctx"] = (
                        jnp.asarray(np.stack([c[0] for c in ctx_list])),
                        jnp.asarray(np.stack([c[1] for c in ctx_list]), dtype=rdt),
                    )
                self._pre[(tg, ci)] = pre

        # unique model pairs + bl->pair map per bl group
        self._mp_groups = {k: self.beam.modelpairs(v)
                           for k, v in self.sim_bl_groups.items()}

    def enable_indexed_batching(self):
        """Stack per-time-group precompute arrays and select the active
        group with a traced int32 leaf: ONE compiled executable then
        serves every time batch. This removes the per-batch retrace the
        reference pays by rebuilding closures per batch (optim.py:
        1191-1226) and that a naive jit port pays through static
        aux-data changes.

        Requires a single baseline group and identical padded shapes
        across time groups (uniform minibatches).
        """
        assert self.Nbl_groups == 1, "indexed batching: one bl group only"
        ncomp = len(self._sky_components())
        self._pre_stack = []
        for ci in range(ncomp):
            pres = [self._pre[(tg, ci)] for tg in self.sim_time_groups]
            shapes = {k: pres[0][k].shape if k != "ctx"
                      else tuple(x.shape for x in pres[0][k])
                      for k in pres[0]}
            for p in pres[1:]:
                for k in p:
                    s = p[k].shape if k != "ctx" else \
                        tuple(x.shape for x in p[k])
                    assert s == shapes[k], \
                        "indexed batching needs uniform group shapes"
            st = {}
            for k in pres[0]:
                if k == "ctx":
                    st[k] = tuple(jnp.stack([p[k][i] for p in pres])
                                  for i in range(len(pres[0][k])))
                else:
                    st[k] = jnp.stack([p[k] for p in pres])
            self._pre_stack.append(st)
        self.indexed_batching = True
        self._host.tg = 0
        self._tg_arg = jnp.asarray(0, jnp.int32)
        self.time_group_id = 0
        return self

    def _select_pre(self, ci):
        """The active time group's precompute dict (traced gather in
        indexed mode, static dict lookup otherwise)."""
        if self.indexed_batching:
            st = self._pre_stack[ci]
            tg = self._tg_arg
            return {k: (tuple(jnp.take(x, tg, axis=0) for x in v)
                        if isinstance(v, tuple) else jnp.take(v, tg, axis=0))
                    for k, v in st.items()}
        return self._pre[(self.time_group_id, ci)]

    # ---------------------------------------------------------------- forward
    def _sim_component(self, sky_data, pre, blvecs, mp1, mp2, mp_idx,
                       sim2data):
        """Simulate one sky component over the current time group.

        sky_data: (Nstokes, 1|Nvec, Nfreqs, Npix); returns
        (Npol, Npol, Ndata_bls, Ntimes, Nfreqs) complex.
        """
        freqs = self.freqs
        chunk = self.pix_chunk
        beam = self.beam
        has_ctx = "ctx" in pre

        # psky construction is cheap relative to the fused reduction but
        # chains many (Nfreqs, Ncut)-sized elementwise intermediates;
        # checkpoint it so a time scan's backward stores only psky
        # itself per step, not every beam/sky intermediate
        @jax.checkpoint
        def make_psky(sky_d, zen, az, cut, mask, ctx):
            csky = cut_sky_fov(sky_d, cut)
            csky = csky * mask.astype(csky.real.dtype)
            b = beam.gen_beam(zen, az, ctx=ctx,
                              angles_offset=True)       # (Np,Nv,Nm,Nf,Ncut)
            return beam.apply_beam_mp(b, mp1, mp2, csky)

        def one_time(xs):
            if has_ctx:
                zen, az, cut, mask, s, ctx = xs
            else:
                zen, az, cut, mask, s = xs
                ctx = None
            psky = make_psky(sky_data, zen, az, cut, mask, ctx)
            # delay factored as (blvecs, s/c): tau = blvecs @ s_c is
            # built inside the fused op (or the XLA fallback) and is
            # never a stored VJP residual across the time scan
            return rime_reduce(psky, None, freqs, mp_idx=mp_idx,
                               chunk=chunk, blvecs=blvecs,
                               s_c=s / C_MS)

        if self.remat:
            one_time = jax.checkpoint(one_time)

        xs = (pre["zen"], pre["az"], pre["cut"], pre["mask"], pre["s"])
        if has_ctx:
            xs = xs + (pre["ctx"],)
        if self.time_mode == "vmap":
            vis_t = jax.vmap(one_time)(xs)           # (Nt, Np,Np,Nb,Nf)
        else:
            vis_t = jax.lax.map(one_time, xs)        # (Nt, Np,Np,Nb,Nf)
        if self.vis_sharding is not None:
            # partition (Nt, Npol, Npol, Nbls, Nfreqs) across the mesh
            vis_t = jax.lax.with_sharding_constraint(vis_t, self.vis_sharding)
        vis = jnp.moveaxis(vis_t, 0, 3)              # (Np,Np,Nb,Nt,Nf)
        if sim2data is not None:
            vis = jnp.take(vis, jnp.asarray(sim2data), axis=2)
        return vis

    def forward(self, *args, prior_cache=None, **kwargs):
        """Forward model -> VisData (reference :291-440)."""
        sky_comps = self.sky.forward(prior_cache=prior_cache)
        if not isinstance(sky_comps, list):
            sky_comps = [sky_comps]

        bg = self.bl_group_id
        a1, a2 = self._blidx_groups[bg]
        blvecs = self.array.antvecs[a2] - self.array.antvecs[a1]
        mp1, mp2, mp_idx = self._mp_groups[bg]
        mpdev = getattr(self, "_mp_idx_dev", None)
        if mpdev is not None and bg in mpdev:
            # bl-sharded device baseline->pair map (shard_rime pins it
            # as a leaf so shard_map can partition the grouped dispatch)
            mp_idx = mpdev[bg]
        sim2data = self._sim2data[bg]

        vis = None
        for ci, comp in enumerate(sky_comps):
            pre = self._select_pre(ci)
            v = self._sim_component(comp.data, pre, blvecs, mp1, mp2,
                                    mp_idx, sim2data)
            vis = v if vis is None else vis + v

        # prior on beam params (sky priors were evaluated in sky.forward)
        self.beam.eval_prior(prior_cache, inp_params=self.beam.params)

        pol = None
        if self.beam.Npol == 1 and self.beam.pol is not None:
            pol = f"{self.beam.pol}{self.beam.pol}"
        vd = VisData()
        vd.setup_meta(self.telescope, self.array.to_antpos())
        vd.setup_data(self.data_bls, self.sim_times, self.freqs, pol=pol,
                      data=vis, history=f"RIME forward ({self.name})")
        return vd

    def run_batches(self, concat=True):
        """Sweep all batches and concatenate (reference :442-482)."""
        vis_times, vis_bls = [], []
        for i in range(self.Nbatch):
            self.batch_idx = i
            vis = self.forward()
            vis_bls.append(vis)
            if self.Nbatch == 1:
                vis_times.append(vis)
            elif self.bl_group_id == self.Nbl_groups - 1:
                if concat:
                    vis_times.append(concat_VisData(vis_bls, "bl"))
                else:
                    vis_times.extend(vis_bls)
                vis_bls = []
        out = concat_VisData(vis_times, "time") if concat else vis_times
        self.batch_idx = 0
        return out
