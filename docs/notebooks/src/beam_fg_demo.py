# %% [markdown]
# # Beam + foreground inference demo
#
# This tutorial mirrors the reference BayesLIM notebook
# (reference docs/notebooks/beam_fg_demo.ipynb) for the TPU-native
# `bayeslim_tpu` package: jointly inferring a point-source foreground
# sky and a chromatic Gaussian beam from simulated visibilities.
#
# It covers:
#
# 1. priors on (indexed) model parameters,
# 2. simulating data from a perturbed truth with known noise,
# 3. delay-space inspection with the windowed `FFT` block,
# 4. a **sub-slice `main_params`** LBFGS solve (optimize 10 of the 50
#    source fluxes + the beam widths, everything else frozen), and
# 5. posterior / prior **Hessians and covariances** at the MAP.

# %%
import numpy as np
import jax.numpy as jnp

import bayeslim_tpu as ba

# %% [markdown]
# ## 1. Model setup with priors
#
# The same hex-array point-source RIME as the minibatching tutorial,
# plus Gaussian priors: 10% on the log-fluxes (an `index` selects the
# flux row of the sky params) and 10% on the beam widths.

# %%
freqs = np.linspace(120e6, 130e6, 6)
times = np.linspace(2458148.15, 2458148.16, 4)

ants, antvecs = ba.utils._make_hex(2)
array = ba.telescope_model.ArrayModel(dict(zip(ants, antvecs)),
                                      freqs=freqs)
telescope = ba.telescope_model.TelescopeModel(
    (21.42827, -30.72148, 1051.69))

beam_params = np.ones((1, 1, 1, len(freqs), 2))
beam_params[..., :, 0] = np.linspace(.25, .30, len(freqs))
beam_params[..., :, 1] = np.linspace(.20, .25, len(freqs))
beam = ba.beam_model.PixelBeam(jnp.asarray(beam_params), freqs,
                               R=ba.beam_model.GaussResponse(), pol="e",
                               parameter=True)

rng = np.random.default_rng(6)
nsrc = 50
ra0 = telescope.JD2RA(float(times[0]))
ra = ra0 + rng.uniform(-30, 30, nsrc)
dec = (rng.uniform(size=nsrc) - .5) * 60 - 30.72
sky_params = np.stack([rng.normal(size=nsrc),
                       rng.normal(size=nsrc) * .1 - 2.2])[None, None]
sky = ba.sky_model.PointSky(
    jnp.asarray(sky_params), jnp.asarray(np.stack([ra, dec])),
    R=ba.sky_model.PointSkyResponse(freqs, freq_mode="powerlaw",
                                    log=True, f0=float(freqs[0])),
    name="sky", parameter=True)

sim_bls = array.get_bls(uniq_bls=True, keep_autos=False)
rime = ba.rime_model.RIME(sky, telescope, beam, array, sim_bls, times,
                          freqs)

# %%
mean = np.asarray(sky.params)[0, 0, 0]
sky.set_priors(ba.optim.LogGaussPrior(
    jnp.asarray(mean), jnp.ones_like(jnp.asarray(mean)) * 0.1 ** 2,
    diag_cov=True, index=(0, 0, 0)))
beam.set_priors(ba.optim.LogGaussPrior(
    beam.params, (beam.params * 0.1) ** 2, diag_cov=True))
print("priors attached on sky fluxes and beam widths")

# %% [markdown]
# ## 2. Simulate data from a perturbed truth
#
# Perturb the true fluxes by ~10% and the beam widths slightly, forward
# model, and add complex Gaussian noise with a known variance. `updated`
# returns a functionally-updated copy of the model pytree — the original
# `rime` keeps the unperturbed starting parameters.

# %%
rng = np.random.default_rng(10)
sky_pert = np.zeros(sky.params.shape)
sky_pert[0, 0, 0] = rng.normal(size=nsrc) * 0.1
beam_pert = rng.normal(size=2) / 10
true_model = rime.updated({
    "sky.params": sky.params + jnp.asarray(sky_pert),
    "beam.params": beam.params + jnp.asarray(beam_pert)})
raw_vis = true_model.forward()
noise = (rng.normal(size=raw_vis.data.shape)
         + 1j * rng.normal(size=raw_vis.data.shape)) * 0.05
raw_vis.data = raw_vis.data + jnp.asarray(noise)
raw_vis.set_cov(jnp.ones(raw_vis.data.shape) * 0.05 ** 2, None)
raw_vis.compute_icov()
print("target cube:", raw_vis.data.shape)

# %% [markdown]
# ## 3. Delay-space view
#
# A Blackman-Harris-windowed FFT along the frequency axis maps each
# baseline to delay space (reference fft.py) — the standard 21 cm
# foreground / systematics diagnostic.

# %%
FT = ba.fft.FFT(dim=-1, window="blackmanharris", N=len(freqs), ndim=5,
                dx=float(freqs[1] - freqs[0]), abs=True)
raw_fft = FT(raw_vis)
print("delay bins [ns]:", np.round(np.asarray(FT.freqs) * 1e9, 1))
print("peak delay power per bl:",
      np.round(np.asarray(raw_fft.data[0, 0, :3]).max(axis=(-1, -2)), 3))

# %% [markdown]
# ## 4. Sub-slice MAP solve with LBFGS
#
# `set_main_params` restricts the solve to a flat sub-slice of the
# parameter space: 10 of the 50 log-fluxes plus all beam parameters.
# The LBFGS (strong-Wolfe line search, reference bfgs.py) then runs in
# that reduced space; `send_main_params` pushes the MAP back into the
# model. Like the reference's own demo, we start from a small diagonal
# inverse Hessian `H0` — with a line search the first trial step is
# `lr * H0 @ grad`, and this posterior's raw gradients are ~1e5, so an
# identity H0 would overshoot catastrophically on the first iteration.

# %%
prob = ba.optim.LogProb(rime, ba.dataset.Dataset(raw_vis),
                        compute="post")
ps_idx = np.sort(rng.choice(nsrc, size=10, replace=False))
flat_idx = np.ravel_multi_index(
    (np.zeros(10, int), np.zeros(10, int), np.zeros(10, int), ps_idx),
    sky.params.shape)
prob.set_main_params({"sky.params": flat_idx, "beam.params": None})
mp = prob.collect_main_params()
print("solving", mp["main"].shape[0], "of",
      sky.params.size + beam.params.size, "parameters")

H0 = ba.hmat.DiagMat(jnp.asarray(1e-5), mp["main"].shape[0])
opt = ba.bfgs.LBFGS(prob, history_size=10, H0=H0)
losses = opt.minimize(15)
print("loss:", round(float(losses[0]), 2), "->",
      round(float(losses[-1]), 2))
prob.send_main_params(opt.pdict["main"])

# %% [markdown]
# ## 5. Hessians and covariances at the MAP
#
# `compute_hessian` builds the dense Hessian of the posterior in the
# main-params space (HVPs through the XLA path). Inverting the
# prior-only Hessian recovers the attached prior widths; the posterior
# covariance is tighter wherever the data constrain a source.

# %%
post_h, idx = ba.optim.compute_hessian(prob)
prob.compute = "prior"
prob._jit_cache = {}
prior_h, _ = ba.optim.compute_hessian(prob)
prob.compute = "post"
prob._jit_cache = {}

post_cov = np.linalg.pinv(np.asarray(post_h))
prior_cov = np.linalg.pinv(np.asarray(prior_h))
off = prob.main_params.offsets["sky.params"]
sl = slice(off, off + prob.main_params.sizes["sky.params"])
print("prior sigma^2 recovered:",
      bool(np.allclose(np.diag(prior_cov)[sl], 0.1 ** 2, rtol=1e-6)))
ratio = np.diag(post_cov)[sl] / np.diag(prior_cov)[sl]
print("posterior/prior variance ratio per solved source:",
      np.round(ratio, 3))

# %% [markdown]
# The same posterior object drives `inference.HMC` / `NUTS` for full
# posterior sampling (on-device leapfrog trajectories), and
# `inference.Trainer` for optax-based optimization — see the package
# README and docs/tutorials.md.
