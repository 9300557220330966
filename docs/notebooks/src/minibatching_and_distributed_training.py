# %% [markdown]
# # Minibatching and distributed training
#
# This tutorial mirrors the reference BayesLIM notebook of the same name
# (reference docs/notebooks/minibatching_and_distributed_training.ipynb)
# for the TPU-native `bayeslim_tpu` package. It covers:
#
# 1. building a point-source RIME forward model,
# 2. a full-dataset posterior and its gradients,
# 3. **time minibatching** (`setup_sim_times` / `batch_idx` /
#    `run_batches`) and gradient **accumulation**,
# 4. **lazy HDF5 targets** that stream from disk per batch, and
# 5. the **distributed posterior**: a `jax.sharding.Mesh` replaces the
#    reference's per-GPU replica loop — XLA inserts the gradient psum.
#
# Everything runs on CPU or a single TPU chip as-is; the distributed
# section uses however many devices `jax.devices()` reports.

# %%
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

import bayeslim_tpu as ba

# %% [markdown]
# ## 1. A point-source RIME simulation
#
# A 7-element hex array, a frequency-dependent Gaussian beam, and 50
# random point sources with log-powerlaw spectra. The `RIME` block
# composes sky x beam x fringe and integrates to visibilities
# (reference rime_model.py).

# %%
freqs = np.linspace(120e6, 130e6, 6)
times = np.linspace(2458148.15, 2458148.16, 6)

ants, antvecs = ba.utils._make_hex(2)
array = ba.telescope_model.ArrayModel(dict(zip(ants, antvecs)),
                                      freqs=freqs)
telescope = ba.telescope_model.TelescopeModel(
    (21.42827, -30.72148, 1051.69))
lsts = ba.telescope_model.JD2LST(times, telescope.location[0])
print("LST range [hr]:", np.unwrap(lsts)[[0, -1]] * 12 / np.pi)

# %%
R = ba.beam_model.GaussResponse()
beam_params = np.ones((1, 1, 1, len(freqs), 2))
beam_params[..., :, 0] = np.linspace(.25, .30, len(freqs))
beam_params[..., :, 1] = np.linspace(.20, .25, len(freqs))
beam = ba.beam_model.PixelBeam(jnp.asarray(beam_params), freqs, R=R,
                               pol="e", parameter=True)

rng = np.random.default_rng(6)
nsrc = 50
ra0 = telescope.JD2RA(float(times[0]))
ra = ra0 + rng.uniform(-30, 30, nsrc)
dec = (rng.uniform(size=nsrc) - .5) * 60 - 30.72
sky_params = np.stack([rng.normal(size=nsrc),
                       rng.normal(size=nsrc) * .1 - 2.2])[None, None]
Rs = ba.sky_model.PointSkyResponse(freqs, freq_mode="powerlaw",
                                   log=True, f0=float(freqs[0]))
sky = ba.sky_model.PointSky(jnp.asarray(sky_params),
                            jnp.asarray(np.stack([ra, dec])), R=Rs,
                            name="sky", parameter=True)

sim_bls = array.get_bls(uniq_bls=True, keep_autos=False)
rime = ba.rime_model.RIME(sky, telescope, beam, array, sim_bls, times,
                          freqs)
vis = rime.forward()
print("visibility cube:", vis.data.shape, "(Npol, Npol, Nbls, Nt, Nf)")

# %% [markdown]
# ## 2. Full-dataset posterior
#
# Add noise to make a target, wrap it in a `Dataset`, and build the
# Gaussian `LogProb`. `collect_main_params` gathers the trainable
# leaves into a `ParamDict`; `value_and_grad` is one jitted posterior
# evaluation (reference optim.py `closure`).

# %%
rng = np.random.default_rng(0)
raw_vis = vis + jnp.asarray(rng.normal(size=vis.data.shape)
                            + 1j * rng.normal(size=vis.data.shape))
raw_vis.setup_meta()
target = ba.dataset.Dataset(raw_vis)

prob = ba.optim.LogProb(rime, target)
pd = prob.collect_main_params()
v0, g0 = prob.value_and_grad(pd)
print("posterior:", float(v0))
print("gradient keys:", list(g0.keys()))

# %% [markdown]
# ## 3. Time minibatching and gradient accumulation
#
# Split the time axis into groups. `setup_sim_times` re-batches an
# existing RIME (rebuilding its pointing precompute); `batch_idx`
# selects the active minibatch; `run_batches(concat=True)` sweeps and
# reassembles the full cube. With `grad_type="accumulate"` the LogProb
# sums gradients over batches — identical to the unbatched gradient —
# while the reported loss is the batch mean (reference optim.py:1210
# semantics).

# %%
time_groups = ba.utils.split_into_groups(times, Ngroup=3)
batched_targets = ba.dataset.Dataset(
    [raw_vis.select(times=tg, inplace=False) for tg in time_groups])

rime.setup_sim_times(time_groups)
rime.precompute()
print("Nbatch:", rime.Nbatch)

rime.batch_idx = 1
print("batch 1 times:", np.asarray(rime.sim_times))
full = rime.run_batches(concat=True)
print("run_batches == unbatched:",
      bool(np.allclose(np.asarray(full.data), np.asarray(vis.data),
                       atol=1e-10)))

# %%
prob2 = ba.optim.LogProb(rime, batched_targets, grad_type="accumulate")
v2, g2 = prob2.value_and_grad(pd)
print("accumulated == full gradients:",
      all(np.allclose(np.asarray(g0[k]), np.asarray(g2[k]), rtol=1e-8)
          for k in g0))

# %% [markdown]
# ## 4. Lazy HDF5 targets
#
# Per-batch targets can live on disk and stream at evaluation time:
# `read_hdf5(lazy_load=True)` leaves `vd.data` as an `HDF5Tensor` that
# materializes per batch — the reference's CPU<->GPU staging pattern is
# replaced by host->device streaming.

# %%
tmpdir = tempfile.mkdtemp()
lazy_targets = []
for i, tg in enumerate(time_groups):
    f = f"{tmpdir}/raw_vis{i}.h5"
    batched_targets[i].write_hdf5(f)
    lt = ba.VisData()
    lt.read_hdf5(f, lazy_load=True)
    lazy_targets.append(lt)
print("lazy target type:", type(lazy_targets[0].data).__name__)

prob3 = ba.optim.LogProb(rime, ba.dataset.Dataset(lazy_targets),
                         grad_type="accumulate")
v3, _ = prob3.value_and_grad(pd)
print("lazy == in-memory loss:",
      bool(np.isclose(float(v2), float(v3), rtol=1e-10)))

# %% [markdown]
# ## 5. Distributed posterior on a device mesh
#
# The TPU-native replacement for the reference's `DistributedLogProb`
# replica loop: lay a `Mesh` over the devices, shard the time axis
# along `'data'`, and evaluate — XLA inserts the cross-device psum for
# both the loss and the gradients. `ba.optim.DistributedLogProb` is an
# alias of `parallel.ShardedLogProb`; `smap_value_and_grad` runs the
# explicitly-collective `shard_map` path that scales the fused Pallas
# kernels across chips.

# %%
from bayeslim_tpu.parallel import make_mesh

ndev = min(2, len(jax.devices()))
rime4 = ba.rime_model.RIME(sky, telescope, beam, array, sim_bls, times,
                           freqs)
prob4 = ba.optim.LogProb(rime4, target)
dprob = ba.optim.DistributedLogProb(prob4, make_mesh({"data": ndev}))
v4, g4 = dprob.value_and_grad(pd)
print(f"sharded over {ndev} device(s):",
      bool(np.isclose(float(v0), float(v4), rtol=1e-10)),
      "| gradients match:",
      all(np.allclose(np.asarray(g0[k]), np.asarray(g4[k]), rtol=1e-8)
          for k in g0))

# %% [markdown]
# From here, `inference.Trainer` drives any of these posteriors with an
# optax optimizer, and `bench.py --size hera-stat` shows the production
# redundant-array configuration of the same pipeline.
