"""Mirror of the reference's minibatching_and_distributed_training
notebook flow (docs/notebooks, cells 5-58), written against THIS package
the way a reference user would port it: same API names, same steps.

Covers: hex array + telescope + JD2LST, Gaussian beam + log-powerlaw
point sky, RIME forward, LogProb closure gradients, time-group
minibatching (setup_sim_times / batch_idx / run_batches / concat),
gradient accumulation == unbatched gradients, lazy HDF5 targets
(instance-style vd.read_hdf5(lazy_load=True)), and the distributed
(sharded) posterior matching the single-device gradients.
"""
import numpy as np
import jax
import jax.numpy as jnp

import bayeslim_tpu as ba


def _build(freqs, times):
    ants, antvecs = ba.utils._make_hex(2)
    antpos_dict = dict(zip(ants, antvecs))
    array = ba.telescope_model.ArrayModel(antpos_dict, freqs=freqs)
    telescope = ba.telescope_model.TelescopeModel(
        (21.42827, -30.72148, 1051.69))

    lsts = ba.telescope_model.JD2LST(times, telescope.location[0])
    assert np.all(np.isfinite(np.unwrap(lsts) * 12 / np.pi))

    R = ba.beam_model.GaussResponse()
    beam_params = np.ones((1, 1, 1, len(freqs), 2))
    beam_params[..., :, 0] = np.linspace(.25, .30, len(freqs))
    beam_params[..., :, 1] = np.linspace(.20, .25, len(freqs))
    beam_model = ba.beam_model.PixelBeam(jnp.asarray(beam_params), freqs,
                                         R=R, pol="e", parameter=True)

    rng = np.random.default_rng(6)
    nsrc = 50
    ra0 = telescope.JD2RA(float(times[0]))
    ra = ra0 + rng.uniform(-30, 30, nsrc)
    dec = (rng.uniform(size=nsrc) - .5) * 60 - 30.72
    fluxes = rng.normal(size=nsrc)
    spix = rng.normal(size=nsrc) * .1 - 2.2
    Rs = ba.sky_model.PointSkyResponse(freqs, freq_mode="powerlaw",
                                       log=True, f0=float(freqs[0]))
    sky_params = np.stack([fluxes, spix])[None, None]
    sky_angs = np.stack([ra, dec])
    sky_model = ba.sky_model.PointSky(jnp.asarray(sky_params),
                                      jnp.asarray(sky_angs), R=Rs,
                                      name="sky", parameter=True)

    sim_bls = array.get_bls(uniq_bls=True, keep_autos=False)
    rime = ba.rime_model.RIME(sky_model, telescope, beam_model, array,
                              sim_bls, times, freqs)
    return rime, sim_bls


def test_notebook_minibatching_flow(tmp_path):
    freqs = np.linspace(120e6, 130e6, 6)
    times = np.linspace(2458148.15, 2458148.16, 6)

    rime, sim_bls = _build(freqs, times)
    vis = rime.forward()
    assert vis.data.shape == (1, 1, len(sim_bls), 6, 6)

    # noisy target + full-dataset gradients (cells 24-26)
    rng = np.random.default_rng(0)
    raw_vis = vis + jnp.asarray(
        rng.normal(size=vis.data.shape)
        + 1j * rng.normal(size=vis.data.shape))
    raw_vis.setup_meta()  # keep metadata consistent
    target = ba.dataset.Dataset(raw_vis)
    prob = ba.optim.LogProb(rime, target)
    pd = prob.collect_main_params()
    v0, g0 = prob.value_and_grad(pd)
    assert np.isfinite(float(v0))

    # time-group minibatching (cells 28-46)
    time_groups = ba.utils.split_into_groups(times, Ngroup=3)
    batched_targets = ba.dataset.Dataset(
        [raw_vis.select(times=tg, inplace=False) for tg in time_groups])
    rime2, _ = _build(freqs, times)
    rime2.setup_sim_times(time_groups)
    rime2.precompute()
    assert rime2.Nbatch == len(time_groups)
    rime2.batch_idx = 1
    assert np.allclose(rime2.sim_times, time_groups[1])
    batch_vis = rime2.forward()
    assert batch_vis.data.shape[3] == len(time_groups[1])

    # run_batches + concat == unbatched forward (cells 38-42)
    full = rime2.run_batches(concat=True)
    assert np.allclose(np.asarray(full.data), np.asarray(vis.data),
                       atol=1e-10)

    # accumulate gradients == unbatched gradients (cell 46)
    prob2 = ba.optim.LogProb(rime2, batched_targets,
                             grad_type="accumulate")
    v2, g2 = prob2.value_and_grad(pd)
    # reference closure semantics (optim.py:1210): accumulated loss is
    # the batch MEAN while gradients are the batch SUM
    assert np.isclose(float(v0), float(v2) * len(time_groups), rtol=1e-10)
    for k in g0:
        assert np.allclose(np.asarray(g0[k]), np.asarray(g2[k]),
                           rtol=1e-8), k

    # lazy HDF5 targets, instance-style read (cells 49-50)
    lazy_targets = []
    for i, tg in enumerate(time_groups):
        f = str(tmp_path / f"raw_vis{i}.h5")
        batched_targets[i].write_hdf5(f)
        lt = ba.VisData()
        lt.read_hdf5(f, lazy_load=True)
        from bayeslim_tpu.data.containers import HDF5Tensor
        assert isinstance(lt.data, HDF5Tensor)
        lazy_targets.append(lt)
    prob3 = ba.optim.LogProb(rime2, ba.dataset.Dataset(lazy_targets),
                             grad_type="accumulate")
    v3, g3 = prob3.value_and_grad(pd)
    assert np.isclose(float(v0), float(v3) * len(time_groups), rtol=1e-10)

    # distributed posterior (cells 52-58): mesh SPMD replaces the
    # reference's per-device replica loop; gradients match single-device
    from bayeslim_tpu.parallel import make_mesh
    rime3, _ = _build(freqs, times)
    prob4 = ba.optim.LogProb(rime3, target)
    dprob = ba.optim.DistributedLogProb(prob4, make_mesh({"data": 2}))
    v4, g4 = dprob.value_and_grad(pd)
    assert np.isclose(float(v0), float(v4), rtol=1e-10)
    for k in g0:
        assert np.allclose(np.asarray(g0[k]), np.asarray(g4[k]),
                           rtol=1e-8), k


def test_notebook_beam_fg_flow():
    """Mirror of the reference's beam_fg_demo notebook (cells 12-92):
    priors on indexed params, perturbed-truth simulation, delay-space
    FFT, a sub-slice main_params LBFGS solve at the MAP, and
    posterior/prior Hessians + covariances."""
    freqs = np.linspace(120e6, 130e6, 6)
    times = np.linspace(2458148.15, 2458148.16, 4)
    rime, sim_bls = _build(freqs, times)

    # priors: 10% Gaussian on log-fluxes only (index selects them), and
    # on the beam widths (cells 15, 29)
    sky = rime.sky
    beam = rime.beam
    mean = np.asarray(sky.params)[0, 0, 0]
    sky.set_priors(ba.optim.LogGaussPrior(
        jnp.asarray(mean), jnp.ones_like(jnp.asarray(mean)) * 0.1 ** 2,
        diag_cov=True, index=(0, 0, 0)))
    beam.set_priors(ba.optim.LogGaussPrior(
        beam.params, (beam.params * 0.1) ** 2, diag_cov=True))

    # perturbed truth -> raw data (+ known noise) (cells 43-47, 56)
    rng = np.random.default_rng(10)
    sky_pert = np.zeros(sky.params.shape)
    sky_pert[0, 0, 0] = rng.normal(size=sky.params.shape[-1]) * 0.1
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

    # delay-space FFT of the VisData (cells 52-54)
    FT = ba.fft.FFT(dim=-1, window="blackmanharris", N=len(freqs), ndim=5,
                    dx=float(freqs[1] - freqs[0]), abs=True)
    raw_fft = FT(raw_vis)
    assert raw_fft.data.shape == raw_vis.data.shape
    assert FT.freqs is not None and np.all(np.asarray(raw_fft.data) >= 0)

    # posterior + sub-slice main_params: a subset of log-fluxes + all
    # beam params (cells 57-59, 88)
    prob = ba.optim.LogProb(rime, ba.dataset.Dataset(raw_vis),
                            compute="post")
    nsrc = sky.params.shape[-1]
    ps_idx = np.sort(rng.choice(nsrc, size=10, replace=False))
    flat_idx = np.ravel_multi_index(
        (np.zeros(10, int), np.zeros(10, int), np.zeros(10, int), ps_idx),
        sky.params.shape)
    prob.set_main_params({"sky.params": flat_idx, "beam.params": None})
    mp = prob.collect_main_params()
    assert mp["main"].shape == (10 + beam.params.size,)

    # LBFGS solve from the un-perturbed start (cells 63-68). Small H0
    # like the reference demo: with strong_wolfe the first trial is
    # lr * H0 @ grad (no first-iteration scaling, reference bfgs.py:282)
    # and this posterior's raw gradients are ~1e5 — identity H0 NaNs.
    opt = ba.bfgs.LBFGS(prob, history_size=10,
                        H0=ba.hmat.DiagMat(jnp.asarray(1e-5),
                                           mp["main"].shape[0]))
    losses = opt.minimize(15)
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    # push the MAP into the model (optimized params live in opt.pdict)
    prob.send_main_params(opt.pdict["main"])

    # Hessians at the MAP: posterior and prior-only (cells 89-92)
    post_h, idx = ba.optim.compute_hessian(prob)
    n = 10 + beam.params.size
    assert np.asarray(post_h).shape == (n, n)
    prob.compute = "prior"
    prob._jit_cache = {}
    prior_h, _ = ba.optim.compute_hessian(prob)
    prob.compute = "post"
    prob._jit_cache = {}
    post_cov = np.linalg.pinv(np.asarray(post_h))
    prior_cov = np.linalg.pinv(np.asarray(prior_h))
    # the prior covariance recovers the attached prior widths (use the
    # returned index map: main-params keys are sorted, beam comes first)
    # sub-slice main_params: the flat layout comes from MainParams
    off = prob.main_params.offsets["sky.params"]
    sl = slice(off, off + prob.main_params.sizes["sky.params"])
    assert np.allclose(np.diag(prior_cov)[sl], 0.1 ** 2, rtol=1e-6), \
        np.diag(prior_cov)[sl]
    # data tightens the posterior for most sources (at a 15-step
    # approximate MAP the non-PSD curvature terms can nudge a marginal
    # slightly above its prior, so assert the bulk behavior)
    ratio = np.diag(post_cov)[sl] / np.diag(prior_cov)[sl]
    assert (ratio < 1.0).mean() >= 0.8, ratio
    assert ratio.max() < 2.0, ratio
