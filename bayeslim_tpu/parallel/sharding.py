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
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s)
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
        return jax.device_put(x, NamedSharding(mesh, spec))

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

    rime.time_mode = "vmap"
    rime.vis_sharding = NamedSharding(
        mesh, P(time_axis, None, None, bl_axis, None))

    # replicate parameters and other model leaves
    rep = NamedSharding(mesh, P())
    rime.sky.push(rep)
    rime.beam.push(rep)
    rime.array.antvecs = jax.device_put(rime.array.antvecs, rep)
    return rime


def shard_visdata(vd, mesh, time_axis="data", bl_axis=None):
    """Shard VisData (Npol, Npol, Nbls, Ntimes, Nfreqs) arrays over the
    mesh: times over `time_axis`, baselines over `bl_axis`."""
    spec = P(None, None, bl_axis, time_axis, None)
    s = NamedSharding(mesh, spec)
    for f in ("data", "flags", "icov"):
        v = getattr(vd, f, None)
        if v is not None and np.ndim(v) == 5:
            setattr(vd, f, jax.device_put(jnp.asarray(v), s))
    if vd.cov is not None and vd.cov_axis is None and np.ndim(vd.cov) == 5:
        vd.cov = jax.device_put(jnp.asarray(vd.cov), s)
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

    def __init__(self, prob, mesh=None, time_axis="data", bl_axis=None):
        import copy as _copy
        if mesh is None:
            mesh = make_mesh({"data": len(jax.devices())})
        self.mesh = mesh
        self.time_axis = time_axis
        self.bl_axis = bl_axis

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
        self.prob = prob

    def collect_main_params(self):
        pd = self.prob.collect_main_params()
        return pd.push(NamedSharding(self.mesh, P()))

    def value_and_grad(self, pdict=None):
        with jax.sharding.use_mesh(self.mesh) if hasattr(jax.sharding, "use_mesh") else self.mesh:
            return self.prob.value_and_grad(pdict)

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
        return jax.device_put(x, NamedSharding(mesh, spec))

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
