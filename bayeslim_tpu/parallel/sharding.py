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

__all__ = ["make_mesh", "shard_rime", "shard_visdata", "ShardedLogProb",
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


def shard_rime(rime, mesh, time_axis="data", bl_axis=None):
    """Shard a RIME model's per-time precompute over the mesh's time axis
    and (optionally) constrain the visibility block over a bl axis.

    Returns the same RIME object mutated in place (host-side setup):
    - every array in rime._pre gets its leading (Ntimes) dim sharded over
      `time_axis`
    - rime.time_mode switched to 'vmap' so the time axis is SPMD-partitioned
      rather than scanned
    - rime.vis_sharding set to partition (Nt, Np, Np, Nbls, Nf) over
      (time_axis, ..., bl_axis, ...)
    """
    t_spec = P(time_axis)

    def shard_leaf(x, extra_dims):
        spec = P(*((time_axis,) + (None,) * extra_dims))
        return jax.device_put(x, NamedSharding(mesh, spec))

    for key, pre in rime._pre.items():
        for name in ("zen", "az", "cut", "mask", "s"):
            arr = pre[name]
            pre[name] = shard_leaf(arr, arr.ndim - 1)
        if "ctx" in pre:
            pre["ctx"] = tuple(shard_leaf(a, a.ndim - 1) for a in pre["ctx"])

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
        from jax.sharding import Mesh as _M
        self.prob = prob
        if mesh is None:
            mesh = make_mesh({"data": len(jax.devices())})
        self.mesh = mesh
        self.time_axis = time_axis
        self.bl_axis = bl_axis

        # find the RIME inside the model
        model = prob.model
        rime = None
        if hasattr(model, "_pre"):
            rime = model
        elif hasattr(model, "models"):
            for m in model.models.values():
                if hasattr(m, "_pre"):
                    rime = m
                    break
        assert rime is not None, "ShardedLogProb needs a RIME in the model"
        shard_rime(rime, mesh, time_axis=time_axis, bl_axis=bl_axis)
        for tgt in prob.target:
            if hasattr(tgt, "blnums"):
                shard_visdata(tgt, mesh, time_axis=time_axis, bl_axis=bl_axis)
        # force re-jit with the new shardings
        prob._jit_cache = {}

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


# reference-compat name: the reference's DistributedLogProb
# (optim.py:1391-1628) is the single-node data-parallel posterior; its
# TPU-native equivalent is the mesh-sharded posterior above.
DistributedLogProb = ShardedLogProb
