"""
Device-mesh sharding of the log-posterior.

This replaces the reference's hand-rolled single-node data parallelism
(`DistributedLogProb`, bayeslim/optim.py:1391-1628: replicate the model on
each device, loop replicas in Python, sum main_params.grad onto a master
device) with JAX SPMD: annotate shardings on the model's precomputed
per-time arrays and the target data, jit the training step, and XLA
inserts the gradient all-reduce over ICI.

Mesh semantics for this domain (SURVEY.md section 2.7):
- 'data' axis  <-> times (the minibatch axis) — data parallelism
- 'model' axis <-> baselines (and/or freqs) of the visibility grid —
  the tensor-parallel analog; the pixel reduction stays local per shard.

The prior is computed on replicated parameters, so it is counted once per
*logical* model exactly like DistributedLogProb's compute='like' replicas
(optim.py:1426-1429) — but here that falls out of SPMD for free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .multihost import global_put as _gput


def _dtype(x):
    return jnp.float32 if x.dtype in (jnp.complex64, jnp.float32) \
        else jnp.float64


def _bl_index_leaves(m):
    """Names of a chain block's pinned baseline-index leaves (the
    set_bls protocol: JonesModel -> _g1_idx/_g2_idx, RedVisModel ->
    _red_idx). Single source of truth for the bl-sharding walk and the
    smap eligibility gate."""
    return [n for n in ("_g1_idx", "_g2_idx", "_red_idx")
            if getattr(m, n, None) is not None]


def _walk_chain_blocks(model):
    """Yield (container_dict, key, block) for every block in a (possibly
    nested) Sequential."""
    if not hasattr(model, "models"):
        return
    for k, m in list(model.models.items()):
        if hasattr(m, "models"):
            yield from _walk_chain_blocks(m)
        else:
            yield model.models, k, m


def _copy_nested_chains(seq):
    """Shallow-copy every nested Sequential (and its models dict) in
    place, so block replacement during the set_bls walk never mutates
    the caller's original model (the top-level dict is copied by the
    ShardedLogProb constructor; nested ones need the same treatment)."""
    import copy as _copy
    for k, m in list(seq.models.items()):
        if hasattr(m, "models"):
            m = _copy.copy(m)
            m.models = dict(m.models)
            seq.models[k] = m
            _copy_nested_chains(m)

__all__ = ["make_mesh", "shard_rime", "shard_visdata", "shard_pixels",
           "ShardedLogProb",
           "DistributedLogProb", "replicate"]


def make_mesh(axis_sizes, devices=None):
    """Build a Mesh from {'data': n_dp, 'model': n_tp, ...}."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    assert int(np.prod(shape)) <= devices.size, \
        f"mesh {shape} needs {np.prod(shape)} devices, have {devices.size}"
    devices = devices[:int(np.prod(shape))].reshape(shape)
    return Mesh(devices, names)


def replicate(tree, mesh):
    """Place every leaf replicated on the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: _gput(x, s)
                                  if isinstance(x, (jax.Array, np.ndarray))
                                  else x, tree)


def shard_rime(rime, mesh, time_axis="data", bl_axis=None, inplace=False):
    """Shard a RIME model's per-time precompute over the mesh's time axis
    and (optionally) constrain the visibility block over a bl axis.

    Returns a shallow copy by default (inplace=False), leaving the
    wrapped model valid for single-device use:
    - every array in rime._pre (and the indexed-batching stack) gets its
      (Ntimes) dim sharded over `time_axis`
    - rime.time_mode switched to 'vmap' so the time axis is
      SPMD-partitioned rather than scanned
    - rime.vis_sharding set to partition (Nt, Np, Np, Nbls, Nf) over
      (time_axis, ..., bl_axis, ...)
    """
    if not inplace:
        from ..utils.module import HostState
        rime = rime.copy()
        rime._pre = {k: dict(v) for k, v in rime._pre.items()}
        if getattr(rime, "_pre_stack", None) is not None:
            rime._pre_stack = [dict(st) for st in rime._pre_stack]
        rime.sky = rime.sky.copy()
        rime.beam = rime.beam.copy()
        rime.array = rime.array.copy()
        # decouple host-side batch bookkeeping from the original (a
        # shared HostState would leak batch selection between them)
        rime._host = HostState(**vars(rime._host))

    def shard_leaf(x, lead_dims=0):
        spec = P(*((None,) * lead_dims + (time_axis,)
                   + (None,) * (x.ndim - lead_dims - 1)))
        return _gput(x, NamedSharding(mesh, spec))

    for key, pre in rime._pre.items():
        for name in ("zen", "az", "cut", "mask", "s"):
            pre[name] = shard_leaf(pre[name])
        if "ctx" in pre:
            pre["ctx"] = tuple(shard_leaf(a) for a in pre["ctx"])
    if getattr(rime, "_pre_stack", None) is not None:
        for st in rime._pre_stack:
            for name in list(st):
                if name == "ctx":
                    st[name] = tuple(shard_leaf(a, 1) for a in st[name])
                else:
                    st[name] = shard_leaf(st[name], 1)

    if bl_axis is not None:
        # baseline-index arrays partition over the bl axis (enables the
        # shard_map execution path: each device computes its local
        # baselines' visibilities)
        bspec = NamedSharding(mesh, P(bl_axis))
        rime._blidx_groups = {
            k: tuple(_gput(ix, bspec) for ix in v)
            for k, v in rime._blidx_groups.items()}
        # Nmp > 1: pin the baseline->model-pair map as a bl-sharded
        # device leaf; the kernel dispatch then runs every pair on the
        # local baselines and mask-selects (Nmp x triples — see
        # ops/rime_kernel._rime_fused_dispatch)
        mpdev = {k: _gput(jnp.asarray(np.asarray(v[2]), jnp.int32), bspec)
                 for k, v in rime._mp_groups.items() if v[2] is not None}
        if mpdev:
            rime._mp_idx_dev = mpdev

    rime.time_mode = "vmap"
    rime.vis_sharding = NamedSharding(
        mesh, P(time_axis, None, None, bl_axis, None))

    # replicate parameters and other model leaves
    rep = NamedSharding(mesh, P())
    rime.sky.push(rep)
    rime.beam.push(rep)
    rime.array.antvecs = _gput(rime.array.antvecs, rep)
    return rime


def shard_visdata(vd, mesh, time_axis="data", bl_axis=None):
    """Shard VisData (Npol, Npol, Nbls, Ntimes, Nfreqs) arrays over the
    mesh: times over `time_axis`, baselines over `bl_axis`.

    Structured covariances shard over their batch dims: cov_axis='bl'
    icov (P,P,T,F,B,B) gets T over time_axis; 'freq' icov (P,P,B,T,F,F)
    gets (B, T) over (bl_axis, time_axis). cov_axis='time' couples times
    and is left replicated (only bl sharding partitions it)."""
    spec = P(None, None, bl_axis, time_axis, None)
    s = NamedSharding(mesh, spec)
    cov_axis = getattr(vd, "cov_axis", None)
    cov_specs = {
        "bl": P(None, None, time_axis, None, bl_axis, None),
        "freq": P(None, None, bl_axis, time_axis, None, None),
        "time": P(None, None, bl_axis, None, None, None),
    }
    for f in ("data", "flags", "icov", "cov"):
        v = getattr(vd, f, None)
        if v is None:
            continue
        if np.ndim(v) == 5:
            setattr(vd, f, _gput(jnp.asarray(v), s))
        elif np.ndim(v) == 6 and cov_axis in cov_specs:
            setattr(vd, f, _gput(
                jnp.asarray(v), NamedSharding(mesh, cov_specs[cov_axis])))
    return vd


class ShardedLogProb:
    """Data/model-parallel LogProb over a device mesh.

    The TPU-native replacement for the reference DistributedLogProb
    (optim.py:1391-1628). Wraps an existing LogProb whose model is a RIME
    (or Sequential starting with one): shards the model's time axis and
    the target data over the mesh, then exposes the same
    value_and_grad(pdict) API. Gradients come out replicated (XLA psums
    over ICI automatically).
    """

    def __init__(self, prob, mesh=None, time_axis="data", bl_axis=None,
                 param_shardings=None):
        """param_shardings: optional {pdict key: PartitionSpec} for
        parameters that should shard over the mesh instead of
        replicating — e.g. per-time gain params under time ('data')
        sharding: {'models.jones.params': P(None, None, None, 'data',
        None)}. The model leaf is device_put with the spec and the
        shard_map closure passes the parameter through with it, so each
        device updates/applies only its local slice (gradients come back
        as the global sharded array)."""
        import copy as _copy
        if mesh is None:
            mesh = make_mesh({"data": len(jax.devices())})
        self.mesh = mesh
        self.time_axis = time_axis
        self.bl_axis = bl_axis
        self.param_shardings = None if param_shardings is None else {
            k: (v if isinstance(v, P) else P(*v))
            for k, v in param_shardings.items()}

        # non-destructive: wrap shallow copies so the original prob and
        # model stay valid for single-device use
        prob = _copy.copy(prob)
        prob._jit_cache = {}
        model = prob.model
        if hasattr(model, "_pre"):
            prob.model = shard_rime(model, mesh, time_axis=time_axis,
                                    bl_axis=bl_axis)
        elif hasattr(model, "models"):
            seq = _copy.copy(model)
            seq.models = dict(model.models)
            found = False
            for k, m in seq.models.items():
                if hasattr(m, "_pre"):
                    seq.models[k] = shard_rime(m, mesh, time_axis=time_axis,
                                               bl_axis=bl_axis)
                    found = True
                    break
            assert found, "ShardedLogProb needs a RIME in the model"
            prob.model = seq
        else:
            raise AssertionError("ShardedLogProb needs a RIME in the model")
        prob.target = [
            shard_visdata(t.copy(), mesh, time_axis=time_axis,
                          bl_axis=bl_axis) if hasattr(t, "blnums") else t
            for t in prob.target]
        if bl_axis is not None and hasattr(prob.model, "models"):
            # chain blocks that pinned their baseline indices as device
            # leaves (the set_bls protocol) shard them over the bl axis
            # like RIME._blidx_groups — after cross-checking them
            # against the TARGET's baselines (a pinned model silently
            # applies its indices verbatim, so an order mismatch here
            # would corrupt results without error)
            bspec = NamedSharding(mesh, P(bl_axis))
            tgt0 = prob.target[0] if len(prob.target) else None
            _copy_nested_chains(prob.model)
            for container, k2, m in _walk_chain_blocks(prob.model):
                names = _bl_index_leaves(m)
                if (not names and hasattr(m, "set_bls")
                        and not hasattr(m, "_pre")
                        and tgt0 is not None and hasattr(tgt0, "blnums")):
                    # auto-pin: a block that declares baseline indexing
                    # (exposes set_bls) but was never pinned gets its
                    # indices pinned to the TARGET's baselines here —
                    # exactly what a manual set_bls(data_bls) would do.
                    # The smap bl-axis path needs device-leaf indices;
                    # with this, Jones/RedVisModel chains ride baseline
                    # sharding with no construction-time opt-in.
                    m = m.copy()
                    m.set_bls(np.asarray(tgt0.blnums))
                    names = _bl_index_leaves(m)
                    container[k2] = m
                if not names:
                    continue
                if tgt0 is not None and hasattr(tgt0, "blnums"):
                    if "_g1_idx" in names:
                        g1e, g2e = m.ant_index(tgt0.blnums)
                        ok = (np.array_equal(np.asarray(m._g1_idx), g1e)
                              and np.array_equal(np.asarray(m._g2_idx),
                                                 g2e))
                    else:
                        ok = np.array_equal(
                            np.asarray(m._red_idx),
                            m.red_index(tgt0.blnums))
                    assert ok, \
                        (f"chain block '{k2}': set_bls indices do not "
                         f"match the target's baselines/order — re-call "
                         f"set_bls with the target's bls")
                m = m.copy()   # non-destructive to the wrapped model
                for n in names:
                    setattr(m, n, _gput(getattr(m, n), bspec))
                container[k2] = m
        if self.param_shardings:
            # leaf copies keep the wrapped model untouched
            prob.model = prob.model.copy()
            for k, spec in self.param_shardings.items():
                prob.model[k] = _gput(
                    prob.model[k], NamedSharding(mesh, spec))
        self.prob = prob

    def collect_main_params(self, inplace=True):
        pd = self.prob.collect_main_params()
        rep = NamedSharding(self.mesh, P())
        from ..utils import ParamDict
        ps = self.param_shardings or {}
        return ParamDict({
            k: _gput(v, NamedSharding(self.mesh, ps[k]))
            if k in ps else _gput(v, rep)
            for k, v in pd.items()})

    def send_main_params(self, main_params=None, send_probs=False,
                         **kwargs):
        """Scatter main params into the wrapped prob's model (reference
        DistributedLogProb.send_main_params, optim.py:1494); send_probs
        is implicit here — the mesh shares one model, so a single send
        reaches every shard."""
        return self.prob.send_main_params(main_params=main_params,
                                          **kwargs)

    def set_main_params(self, *args, **kwargs):
        """Forward to the wrapped prob (reference optim.py:1450) and
        drop stale smap closures."""
        out = self.prob.set_main_params(*args, **kwargs)
        self._smap_cache.clear() if hasattr(self, "_smap_cache") else None
        return out

    def sort_main_params(self, *args, **kwargs):
        return self.prob.sort_main_params(*args, **kwargs)

    def value_and_grad(self, pdict=None):
        with jax.sharding.use_mesh(self.mesh) if hasattr(jax.sharding, "use_mesh") else self.mesh:
            return self.prob.value_and_grad(pdict)

    # ------------------------------------------------------- shard_map path
    def smap_value_and_grad(self, pdict=None):
        """value_and_grad through jax.shard_map: each device runs the
        forward (including the fused Pallas kernel, which XLA cannot
        partition as a custom call) on its LOCAL (time, baseline) shard;
        the chi^2 psums over the mesh and the prior is added once on
        replicated parameters.

        Carries the production configurations: Sequential chains,
        sim->data redundancy expansion, multi-pol / Nmp > 1 model pairs,
        structured covariances ('bl'/'freq'), LM preconditioners,
        main_params sub-slices, and Nbatch > 1 minibatch accumulation
        (prior counted once on batch 0) — all under time ('data')
        sharding. bl_axis sharding carries Nmp > 1 (device
        baseline->pair map), sim->data redundancy expansion (all_gather
        + bl-sharded expansion index), and Jones/RedVisModel chains —
        their baseline indices are auto-pinned to the target's
        baselines at construction (the set_bls protocol). Custom
        blocks that index baselines via host metadata without exposing
        set_bls cannot ride bl sharding (use time sharding).
        """
        prob = self.prob
        if pdict is None:
            pdict = self.collect_main_params()
        from ..utils import ParamDict
        if prob.compute == "prior":
            # pure parameter-space work: nothing to shard
            return prob.value_and_grad(pdict)
        if prob.grad_type == "accumulate" and prob.Nbatch > 1:
            loss, grads = None, None
            for i in range(prob.Nbatch):
                prob.batch_idx = i
                v, g = self._smap_eval(i, pdict)
                g = ParamDict(dict(g))
                loss = v if loss is None else loss + v
                grads = g if grads is None else grads + g
            prob.batch_idx = 0
            return loss / prob.Nbatch, prob.grad_modify(grads)
        idx = prob.batch_idx
        v, g = self._smap_eval(idx, pdict)
        return v, prob.grad_modify(ParamDict(dict(g)))

    def _smap_eval(self, idx, pdict):
        """Evaluate one batch through the cached shard_map closure."""
        prob = self.prob
        tgt, _ = prob.get_batch_data(idx)
        # cache keyed on the statics the closure bakes in (LogProb clears
        # its _jit_cache on such changes; mirror that here)
        key = (prob._fn_key(idx), tgt.get_icov() is not None,
               getattr(tgt, "cov_axis", None), tgt.cov_logdet,
               id(prob.prior_dict), prob.compute, prob.negate,
               prob.complex_circular, id(prob.LM), id(prob.main_params),
               jax.tree_util.tree_structure(prob.model))
        cache = getattr(self, "_smap_cache", None)
        if cache is None:
            cache = self._smap_cache = {}
        if key not in cache:
            # keys fully encode the closure statics, so entries never go
            # stale — and batches 0 and >0 ALTERNATE keys (the prior
            # enters at batch 0 only), so clearing on miss would rebuild
            # and re-jit every batch of every accumulate step. Bound the
            # cache instead. Strong refs to the id()-keyed objects are
            # stored with the entry so a GC'd prior/LM/main_params can
            # never recycle an id into a stale hit.
            if len(cache) > 16:
                cache.pop(next(iter(cache)))
            cache[key] = (self._build_smap_vg(idx),
                          (prob.prior_dict, prob.LM, prob.main_params))
        data, icov = prob._batch_args(idx)
        icov = icov if icov is not None else jnp.ones((1,), _dtype(data))
        return cache[key][0](dict(pdict), prob.model, data, icov)

    # --- LogProb._batch_fn protocol: the samplers' fused on-device
    # trajectories (HMC._traj / NUTS._subtree / sample_chains) gate on
    # hasattr(prob, "_batch_fn") — exposing the PURE smap loss here lets
    # whole leapfrog trajectories, NUTS tree doublings, and vectorized
    # multi-chain runs execute over the mesh in one dispatch, with the
    # psum'd chi^2 inside.
    @property
    def Nbatch(self):
        return getattr(self.prob, "Nbatch", 1)

    @property
    def grad_mods(self):
        return getattr(self.prob, "grad_mods", None)

    @property
    def main_params(self):
        return getattr(self.prob, "main_params", None)

    def _batch_fn(self, idx):
        """Pure loss(pdict, model, data, icov) with the shard_map
        (mesh collectives) inside; accepts ParamDict pdicts (the smap
        in_specs are built for plain dicts)."""
        total = self._build_smap_total(idx)

        def fn(q, model, data, icov):
            return total(dict(q), model, data, icov)

        return fn

    def _batch_args(self, idx):
        data, icov = self.prob._batch_args(idx)
        icov = icov if icov is not None else jnp.ones((1,), _dtype(data))
        return data, icov

    def _build_smap_vg(self, idx=0):
        return jax.jit(jax.value_and_grad(self._build_smap_total(idx)))

    def _build_smap_total(self, idx=0):
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from ..inference.prob import _walk_priors, apply_icov
        prob = self.prob
        model = prob.model
        if hasattr(model, "_pre"):
            rimes = [model]
        elif hasattr(model, "models"):
            rimes = [m for m in model.models.values() if hasattr(m, "_pre")]
        else:
            rimes = []
        assert len(rimes) == 1, "shard_map path needs exactly one RIME"
        rime = rimes[0]
        tgt, inp = prob.get_batch_data(idx)
        cov_axis = getattr(tgt, "cov_axis", None)
        assert inp is None, "shard_map path: start_inp not supported"
        assert prob.compute in ("post", "like")
        expand_s2d = None
        if self.bl_axis is not None:
            # per-baseline host metadata (mp grouping, Jones/VisModel
            # baseline indexing) cannot differ across the shards of ONE
            # traced program — those features ride the time axis or the
            # GSPMD path instead
            mp = rime._mp_groups[rime.bl_group_id]
            if model is not rime:
                # chains can ride baseline sharding IF every non-RIME
                # block indexes baselines through device leaves that
                # were sharded at construction (JonesModel.set_bls);
                # blocks with host-metadata baseline indexing cannot
                # differ across the shards of one traced program
                for _cont, k2, m2 in _walk_chain_blocks(model):
                    if m2 is rime:
                        continue
                    # only blocks that DECLARE baseline indexing (they
                    # expose set_bls) must be pinned; blocks that never
                    # index baselines (broadcast VisModels, filters on
                    # other axes) pass through
                    if hasattr(m2, "set_bls") and not _bl_index_leaves(m2):
                        # unreachable for standard construction (the
                        # __init__ walk auto-pins such blocks to the
                        # target's baselines); kept as a safety net for
                        # targets without baseline metadata
                        raise AssertionError(
                            f"bl_axis sharding: chain block '{k2}' "
                            f"indexes baselines via host metadata; call "
                            f"its .set_bls(data_bls) before "
                            f"ShardedLogProb (or use time sharding)")
            mpdev = getattr(rime, "_mp_idx_dev", None)
            assert mp[2] is None or (
                mpdev is not None and rime.bl_group_id in mpdev), \
                ("bl_axis sharding with Nmp > 1 needs the device "
                 "baseline->pair map (shard_rime pins it; rebuild the "
                 "ShardedLogProb) or time sharding")
            s2d = rime._sim2data[rime.bl_group_id]
            if s2d is not None:
                # sim->data redundancy expansion across baseline shards:
                # each device computes its LOCAL sim baselines, the sim
                # cube (small: Nred rows) is all-gathered over the bl
                # axis, and each device takes ITS shard of data-baseline
                # rows (the expansion index arrives as a bl-sharded
                # input). The model handed to shard_map has the internal
                # expansion stripped (static metadata; the leaf list is
                # identical). In a chain, the expansion re-runs at the
                # RIME's position (local_fn threads the blocks manually)
                # so post-RIME blocks still see data-baseline rows.
                nsh = dict(zip(self.mesh.axis_names,
                               self.mesh.devices.shape))[self.bl_axis]
                nsim = len(rime.sim_bl_groups[rime.bl_group_id])
                assert nsim % nsh == 0 and len(s2d) % nsh == 0, \
                    (f"bl_axis expansion needs Nsim ({nsim}) and Ndata "
                     f"({len(s2d)}) divisible by the '{self.bl_axis}' "
                     f"axis size {nsh}")
                stripped = rime.copy()
                stripped._sim2data = dict(rime._sim2data)
                stripped._sim2data[rime.bl_group_id] = None
                stripped.data_bl_groups = dict(rime.sim_bl_groups)
                if model is rime:
                    model = stripped  # treedef donor; leaves identical
                else:
                    import copy as _copy
                    seq = _copy.copy(model)
                    seq.models = {k: (stripped if v is rime else v)
                                  for k, v in model.models.items()}
                    model = seq
                expand_s2d = _gput(
                    jnp.asarray(np.asarray(s2d), jnp.int32),
                    NamedSharding(self.mesh, P(self.bl_axis)))
        if cov_axis is not None:
            # a coupled covariance can shard along any axis it does NOT
            # couple: 'freq' icov (P,P,B,T,F,F) shards over baselines
            # and/or times; 'bl' (P,P,T,F,B,B) only over times; 'time'
            # (P,P,B,F,T,T) only over baselines
            allowed = ["freq"]
            if self.bl_axis is None:
                allowed.append("bl")
            if self.time_axis is None:
                allowed.append("time")
            assert cov_axis in allowed, \
                f"cov_axis '{cov_axis}' couples an axis this sharding " \
                f"partitions (allowed here: {allowed})"
        include_prior = (idx == 0) and prob.compute == "post"
        cc, negate = prob.complex_circular, prob.negate
        LM, main_params = prob.LM, prob.main_params
        has_icov = tgt.get_icov() is not None
        if has_icov and tgt.cov_logdet is not None:
            norm = (tgt.cov_ndim * np.log(np.pi) + tgt.cov_logdet) if cc \
                else 0.5 * (tgt.cov_ndim * np.log(2 * np.pi)
                            + tgt.cov_logdet)
        else:
            norm = 0.0
        mesh = self.mesh
        # psum ONLY over the axes that partition the data: a mesh axis
        # that shards nothing sees identical replicas on every device,
        # and summing those would multiply the likelihood by its size
        axes = tuple(a for a in (self.time_axis, self.bl_axis)
                     if a is not None)

        def spec_of(x):
            s = getattr(x, "sharding", None)
            sp = getattr(s, "spec", None)
            return sp if sp is not None else P()

        data, icov = prob._batch_args(idx)
        # Module pytrees classify attributes by VALUE (arrays=leaves), so
        # a spec-shaped model tree would reflatten differently; hand the
        # model to shard_map as its flat leaf list instead
        _, model_def = jax.tree_util.tree_flatten(model)
        data_spec = spec_of(data)
        icov_spec = spec_of(icov) if icov is not None else P()
        pd_specs = {k: P() for k in dict(prob.collect_main_params())}
        for k, spec in (self.param_shardings or {}).items():
            if k in pd_specs:
                pd_specs[k] = spec

        def apply_pd(m, pd):
            """LM preconditioning + (sub-slice) scatter, as _batch_fn."""
            if LM is not None:
                pd = {k: LM(k, v) for k, v in pd.items()}
            if main_params is not None:
                return main_params.scatter(pd["main"], m)
            return m.updated(pd)

        def strip_vis_sharding(m):
            # inside shard_map every mesh axis is manual: the global
            # with_sharding_constraint must not run on local blocks
            mc = m.copy()
            if hasattr(mc, "_pre"):
                mc.vis_sharding = None
            elif hasattr(mc, "models"):
                mc.models = {k: strip_vis_sharding(v)
                             if hasattr(v, "_pre") else v
                             for k, v in mc.models.items()}
            return mc

        bl_axis = self.bl_axis

        def expand_local(vis, s2d):
            # gather the (small) sim cube across baseline shards,
            # expand onto this device's data-baseline shard
            visg = jax.lax.all_gather(vis, bl_axis, axis=2, tiled=True)
            return jnp.take(visg, s2d, axis=2)

        def local_fn(pd, model_leaves, data, icov, s2d):
            m = jax.tree_util.tree_unflatten(model_def, model_leaves)
            m = strip_vis_sharding(m)
            mm = apply_pd(m, pd)
            # prior_cache captures priors evaluated during the forward,
            # incl. priors on response OUTPUTS (params and responses are
            # replicated over the mesh, so every device computes the
            # same prior; it is added once outside the psum)
            pc = {}
            if expand_s2d is not None and hasattr(mm, "models"):
                # chain + redundancy expansion: thread the blocks
                # manually so the expansion re-runs at the RIME's
                # position — post-RIME blocks (set_bls-pinned) see
                # data-baseline rows, exactly as in the unsharded chain
                out = None
                for k2 in mm._order:
                    blk = mm.models[k2]
                    out = blk(out, prior_cache=pc)
                    if hasattr(blk, "_pre"):
                        out.data = expand_local(out.data, s2d)
                vis = out.data if hasattr(out, "data") else out
            else:
                out = mm.forward(None, prior_cache=pc)
                vis = out.data if hasattr(out, "data") else out
                if expand_s2d is not None:
                    vis = expand_local(vis, s2d)
            res = vis - data
            chi = apply_icov(res, icov if has_icov else None, cov_axis)
            chi = jnp.sum(chi)
            if jnp.iscomplexobj(chi):
                chi = chi.real
            prior = jnp.asarray(0.0)
            for k in pc:
                prior = prior + pc[k]
            return jax.lax.psum(chi, axes), prior

        # whether the model's forward populates its prior cache is a
        # STATIC model property (priors are host metadata): probe with
        # an abstract trace so the closure can branch at build time.
        # Probe the ORIGINAL model (prob.model): the expansion-stripped
        # chain donor cannot run a plain forward (post-RIME blocks with
        # pinned data-baseline indices would see sim rows), and priors
        # are identical either way.
        pc_probe = {}
        _, probe_def = jax.tree_util.tree_flatten(prob.model)

        def _probe(leaves):
            m = strip_vis_sharding(
                jax.tree_util.tree_unflatten(probe_def, leaves))
            out = m.forward(None, prior_cache=pc_probe)
            return out.data if hasattr(out, "data") else out

        jax.eval_shape(_probe, jax.tree_util.tree_leaves(prob.model))
        fwd_has_priors = len(pc_probe) > 0
        if self.param_shardings and prob.prior_dict is None \
                and fwd_has_priors:
            # module-attached (forward-cache) priors evaluate on each
            # device's LOCAL slice of a sharded parameter and are NOT
            # psummed — only prior_dict priors (computed globally outside
            # shard_map) are correct with param_shardings
            raise AssertionError(
                "param_shardings with module-attached priors would count "
                "only one shard's prior; attach priors via LogProb's "
                "prior_dict instead (evaluated on global parameters)")

        # leaf specs from the CONCRETE sharded model (tracers inside the
        # jit have no .sharding)
        leaf_specs = [spec_of(x) for x in jax.tree_util.tree_leaves(model)]
        s2d_spec = P(self.bl_axis) if expand_s2d is not None else P()
        in_specs = (pd_specs, leaf_specs, data_spec, icov_spec, s2d_spec)
        try:
            smap = shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                             out_specs=(P(), P()), check_vma=False)
        except TypeError:  # older jax spells it check_rep
            smap = shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                             out_specs=(P(), P()), check_rep=False)

        prior_dict = prob.prior_dict
        s2d_arg = expand_s2d if expand_s2d is not None \
            else jnp.zeros((1,), jnp.int32)

        def total(pd, m, data, icov):
            leaves = jax.tree_util.tree_leaves(m)
            chisq, fwd_prior = smap(pd, leaves, data, icov, s2d_arg)
            loglike = (-chisq - norm) if cc else (-0.5 * chisq - norm)
            if not include_prior:
                lp = loglike
                return -lp if negate else lp
            logprior = jnp.asarray(0.0)
            if prior_dict is not None:
                mm = apply_pd(m, pd)
                for key, pr in prior_dict.items():
                    prs = pr if isinstance(pr, (list, tuple)) else [pr]
                    val = mm[key]
                    for p_ in prs:
                        logprior = logprior + p_(val)
            elif fwd_has_priors:
                # priors evaluated during the (replicated-param) forward,
                # incl. response-output priors — counted once
                logprior = fwd_prior
            else:
                mm = apply_pd(m, pd)
                pc = {}
                _walk_priors(mm, pc)
                for k in pc:
                    logprior = logprior + pc[k]
            lp = loglike + logprior
            return -lp if negate else lp

        return total

    def __call__(self, pdict=None, **kwargs):
        with jax.sharding.use_mesh(self.mesh) if hasattr(jax.sharding, "use_mesh") else self.mesh:
            return self.prob(pdict, **kwargs)

    def closure(self, pdict=None):
        return self.value_and_grad(pdict)

    def update(self, pdict):
        self.prob.update(pdict)

    @property
    def model(self):
        return self.prob.model


def shard_pixels(rime, mesh, pix_axis="model", inplace=False):
    """Shard the sky-pixel long axis over the mesh (SURVEY §2.7: the
    reference's 'sequence axis' analog is Npix, which it only chunks
    implicitly via FOV cuts and multigrid Ylm).

    The per-time FOV-cut precompute arrays (trailing Ncut axis), the
    pointing vectors, and the sky parameters' Npix dim get partitioned;
    the expensive (Nfreqs, Ncut) beam/psky intermediates and the pixel
    reduction then run SPMD with XLA inserting the psum over `pix_axis`
    (the FOV-cut gather all-gathers only the small raw parameter
    tensor). Compute and intermediate memory scale 1/n_shards.

    Only the XLA reduction path propagates shardings through the
    contraction (the Pallas custom call would force an all-gather of
    its operands), so use this with use_pallas=False models (CPU mesh
    tests; multi-chip XLA). Requires the padded Ncut to be divisible by
    the axis size.
    """
    if not inplace:
        from ..utils.module import HostState
        rime = rime.copy()
        rime._pre = {k: dict(v) for k, v in rime._pre.items()}
        rime.sky = rime.sky.copy()
        rime._host = HostState(**vars(rime._host))

    def put(x, axes_before):
        spec = P(*((None,) * axes_before + (pix_axis,)))
        return _gput(x, NamedSharding(mesh, spec))

    for key, pre in rime._pre.items():
        for name in ("zen", "az", "cut", "mask"):
            pre[name] = put(pre[name], pre[name].ndim - 1)
        pre["s"] = put(pre["s"], pre["s"].ndim - 1)
        if "ctx" in pre:
            pre["ctx"] = tuple(put(a, a.ndim - 1) for a in pre["ctx"])

    # sky params carry Npix as the trailing dim
    sky = rime.sky
    if hasattr(sky, "params") and np.ndim(sky.params) >= 1:
        sky.params = put(sky.params, np.ndim(sky.params) - 1)
    return rime


# reference-compat name: the reference's DistributedLogProb
# (optim.py:1391-1628) is the single-node data-parallel posterior; its
# TPU-native equivalent is the mesh-sharded posterior above.
DistributedLogProb = ShardedLogProb
