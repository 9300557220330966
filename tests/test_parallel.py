"""Multi-device sharding tests on the virtual 8-CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

import bayeslim_tpu as bl
from bayeslim_tpu.parallel import make_mesh, ShardedLogProb
from bayeslim_tpu.inference import LogProb
from tests.test_rime import (setup_Telescope, setup_PointSky, setup_Array,
                             setup_UniformBeam, setup_GaussBeam, JD0)


def _build_prob(Ntimes=8, Nbls=6):
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:Nbls]
    times = JD0 + np.arange(Ntimes) * 5e-4
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs)
    vd = rime.forward()
    tgt = vd.copy()
    tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data,
                   cov=jnp.ones(vd.data.shape), cov_axis=None,
                   icov=jnp.ones(vd.data.shape))
    return LogProb(rime, tgt), rime


def test_vmap_equals_scan():
    prob, rime = _build_prob()
    pd = prob.collect_main_params()
    v1, g1 = prob.value_and_grad(pd)
    rime.time_mode = "vmap"
    prob._jit_cache = {}
    v2, g2 = prob.value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-12)
    for k in g1:
        assert np.allclose(np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-10)


def test_sharded_logprob_matches_single_device():
    """Sharded (data-parallel over times) == single-device evaluation.

    This is the TPU-native analog of DistributedLogProb's replica-sum
    (reference notebook cell 52 uses 3 CPU devices as stand-ins)."""
    prob1, _ = _build_prob(Ntimes=8)
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    prob2, _ = _build_prob(Ntimes=8)
    mesh = make_mesh({"data": 4})
    sprob = ShardedLogProb(prob2, mesh)
    v2, g2 = sprob.value_and_grad(pd)

    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    for k in g1:
        assert np.allclose(np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-8), k


def test_sharded_2d_mesh():
    """2D mesh: times over 'data', baselines over 'model'."""
    prob1, _ = _build_prob(Ntimes=4, Nbls=6)
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    prob2, _ = _build_prob(Ntimes=4, Nbls=6)
    mesh = make_mesh({"data": 2, "model": 2})
    sprob = ShardedLogProb(prob2, mesh, bl_axis="model")
    v2, g2 = sprob.value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    for k in g1:
        assert np.allclose(np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-8), k
