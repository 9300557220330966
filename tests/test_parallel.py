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


def test_shard_pixels_long_axis():
    """Pixel (long-axis) sharding: the FOV-cut precompute and sky pixel
    dims partition over the mesh; forward and gradients match the
    unsharded model (SURVEY §2.7 sequence-parallel analog)."""
    from bayeslim_tpu.parallel import make_mesh, shard_pixels
    from bayeslim_tpu.inference import LogProb
    import bayeslim_tpu as bl
    from bayeslim_tpu.utils import make_hex, AntposDict, healpix as hp
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse

    loc = (21.428, -30.721, 1073.0)
    T = bl.TelescopeModel(loc)
    ants, antvecs = make_hex(2, D=15.0)
    freqs = np.linspace(1e8, 1.1e8, 8)
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs)
    nside = 8
    npix = hp.nside2npix(nside)
    th, ph = hp.pix2ang(nside, np.arange(npix))
    angs = np.stack([ph * 180 / np.pi, 90 - th * 180 / np.pi])
    rng = np.random.default_rng(0)
    p = np.zeros((1, 1, 2, npix))
    p[0, 0, 0] = rng.uniform(1, 10, npix)
    p[0, 0, 1] = -2.5
    R = PixelSkyResponse(freqs, spatial_mode="pixel", freq_mode="powerlaw",
                         f0=1e8)
    sky = PixelSky(jnp.asarray(p), jnp.asarray(angs),
                   hp.nside2pixarea(nside), R=R)
    beam = bl.PixelBeam(jnp.ones((1, 1, 1, 1, 2)) * 14.0, freqs,
                        R=bl.beam_model.AiryResponse(), pol="e",
                        powerbeam=True, fov=180.0)
    bls = arr.get_bls(keep_autos=False)[:10]
    times = 2458168.3 + np.arange(2) * 5e-4
    # pix_chunk > ncut so padding is a single 8-divisible block; pad to
    # a multiple of 4 shards is guaranteed by the 8-alignment
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs, pix_chunk=4096)

    vd = rime.forward()
    tgt = vd.copy()
    tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data)
    prob = LogProb(rime, tgt)
    pd = prob.collect_main_params()
    v0, g0 = prob.value_and_grad(pd)

    mesh = make_mesh({"model": 4})
    rime_s = shard_pixels(rime, mesh, pix_axis="model")
    assert rime_s is not rime
    prob_s = LogProb(rime_s, tgt)
    v1, g1 = prob_s.value_and_grad(pd)
    assert np.allclose(float(v0), float(v1), rtol=1e-10)
    for k in g0:
        assert np.allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                           rtol=1e-8, atol=1e-12), k


def test_shard_map_path_matches_single_device():
    """smap_value_and_grad (per-device local forward + psum, the path
    that scales the fused kernel across chips) matches the single-device
    posterior gradient, including the prior term."""
    from bayeslim_tpu.parallel import make_mesh, ShardedLogProb
    from bayeslim_tpu.inference import LogProb, LogGaussPrior
    import bayeslim_tpu as bl
    from bayeslim_tpu.utils import make_hex, AntposDict, healpix as hp
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse

    loc = (21.428, -30.721, 1073.0)
    T = bl.TelescopeModel(loc)
    ants, antvecs = make_hex(2, D=15.0)
    freqs = np.linspace(1e8, 1.1e8, 8)
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs)
    nside = 8
    npix = hp.nside2npix(nside)
    th, ph = hp.pix2ang(nside, np.arange(npix))
    angs = np.stack([ph * 180 / np.pi, 90 - th * 180 / np.pi])
    rng = np.random.default_rng(0)
    p = np.zeros((1, 1, 2, npix))
    p[0, 0, 0] = rng.uniform(1, 10, npix)
    p[0, 0, 1] = -2.5
    R = PixelSkyResponse(freqs, spatial_mode="pixel", freq_mode="powerlaw",
                         f0=1e8)
    sky = PixelSky(jnp.asarray(p), jnp.asarray(angs),
                   hp.nside2pixarea(nside), R=R)
    beam = bl.PixelBeam(jnp.ones((1, 1, 1, 1, 2)) * 14.0, freqs,
                        R=bl.beam_model.AiryResponse(), pol="e",
                        powerbeam=True, fov=180.0)
    bls = arr.get_bls(keep_autos=False)[:20]   # divisible by model axis
    times = 2458168.3 + np.arange(4) * 5e-4
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs, time_mode="vmap")
    vd = rime.forward()
    tgt = vd.copy()
    tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data,
                   cov=jnp.ones(vd.data.shape), cov_axis=None,
                   icov=jnp.ones(vd.data.shape))

    prob = LogProb(rime, tgt)
    pd = prob.collect_main_params()
    pd["sky.params"] = pd["sky.params"] * 1.03   # non-trivial residual
    v0, g0 = prob.value_and_grad(pd)

    mesh = make_mesh({"data": 4, "model": 2})
    sprob = ShardedLogProb(prob, mesh, time_axis="data", bl_axis="model")
    v1, g1 = sprob.smap_value_and_grad(pd)
    assert np.allclose(float(v0), float(v1), rtol=1e-10)
    for k in g0:
        assert np.allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                           rtol=1e-8, atol=1e-12), k

    # with a prior attached (counted once despite 8 devices)
    sky.set_priors(LogGaussPrior(jnp.zeros(1), jnp.ones(1) * 100.0))
    prob2 = LogProb(rime, tgt)
    v2, g2 = prob2.value_and_grad(pd)
    sprob2 = ShardedLogProb(prob2, mesh, time_axis="data", bl_axis="model")
    v3, g3 = sprob2.smap_value_and_grad(pd)
    assert np.allclose(float(v2), float(v3), rtol=1e-10)
    for k in g2:
        assert np.allclose(np.asarray(g2[k]), np.asarray(g3[k]),
                           rtol=1e-8, atol=1e-12), k


def test_shard_map_runs_fused_kernel(monkeypatch):
    """The Pallas kernels execute INSIDE shard_map on local shards
    (interpret mode; on hardware this is the path that scales the fused
    kernel across chips)."""
    from bayeslim_tpu.parallel import make_mesh, ShardedLogProb
    from bayeslim_tpu.inference import LogProb
    from bayeslim_tpu.ops import rime_kernel, rime_pallas
    import bayeslim_tpu as bl
    from bayeslim_tpu.utils import make_hex, AntposDict, healpix as hp
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse

    loc = (21.428, -30.721, 1073.0)
    T = bl.TelescopeModel(loc)
    ants, antvecs = make_hex(2, D=15.0)
    freqs = np.linspace(1e8, 1.1e8, 8)
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs)
    nside = 8
    npix = hp.nside2npix(nside)
    th, ph = hp.pix2ang(nside, np.arange(npix))
    angs = np.stack([ph * 180 / np.pi, 90 - th * 180 / np.pi])
    rng = np.random.default_rng(1)
    p = np.zeros((1, 1, 2, npix))
    p[0, 0, 0] = rng.uniform(1, 10, npix)
    p[0, 0, 1] = -2.5
    R = PixelSkyResponse(freqs, spatial_mode="pixel", freq_mode="powerlaw",
                         f0=1e8)
    sky = PixelSky(jnp.asarray(p, dtype=jnp.float32), jnp.asarray(angs),
                   hp.nside2pixarea(nside), R=R)
    beam = bl.PixelBeam(jnp.ones((1, 1, 1, 1, 2), jnp.float32) * 14.0,
                        freqs, R=bl.beam_model.AiryResponse(), pol="e",
                        powerbeam=True, fov=180.0)
    bls = arr.get_bls(keep_autos=False)[:20]
    times = 2458168.3 + np.arange(4) * 5e-4
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs, time_mode="vmap")
    vd = rime.forward()   # XLA reference (pallas off on CPU)
    tgt = vd.copy()
    tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data)
    prob = LogProb(rime, tgt)
    pd = prob.collect_main_params()
    pd["sky.params"] = pd["sky.params"] * 1.03
    v0, g0 = prob.value_and_grad(pd)

    # force the fused kernel (interpret mode) inside shard_map
    monkeypatch.setattr(rime_kernel, "_pallas_eligible",
                        lambda *a, **k: True)
    rime_pallas.INTERPRET = True
    try:
        mesh = make_mesh({"data": 4, "model": 2})
        sprob = ShardedLogProb(prob, mesh, time_axis="data",
                               bl_axis="model")
        v1, g1 = sprob.smap_value_and_grad(pd)
    finally:
        rime_pallas.INTERPRET = False
    assert np.isfinite(float(v1))
    assert abs(float(v0) - float(v1)) / abs(float(v0)) < 1e-3
    # f32 kernel vs f64 XLA: loose agreement
    assert np.abs(np.asarray(g1["sky.params"])
                  - np.asarray(g0["sky.params"])).max() \
        <= 1e-2 * np.abs(np.asarray(g0["sky.params"])).max() + 1e-8


def test_sharded_redundant_expansion():
    """Redundant sim->data expansion under the sharded (GSPMD) path:
    sim baselines shard over 'model', the expansion gathers across
    shards (XLA inserts the collective), gradients match single-device."""
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)
    sim_bls = [r[0] for r in arr.reds if r[0][0] != r[0][1]]
    # pad sim count to a multiple of the model axis by duplicating a bl
    # group list (sharding needs even division) — use first 8 groups
    sim_bls = sim_bls[:8]
    gids = {arr.bl2red[b] for b in sim_bls}
    data_bls = [b for b in bls if arr.bl2red[b] in gids]
    times = JD0 + np.arange(4) * 5e-4

    def build():
        rime = bl.RIME(sky, T, beam, arr, sim_bls, times, freqs,
                       data_bls=data_bls)
        vd = rime.forward()
        tgt = vd.copy()
        tgt.setup_data(data_bls, times, freqs, pol="ee",
                       data=vd.data + 0.1,
                       cov=jnp.ones(vd.data.shape), cov_axis=None,
                       icov=jnp.ones(vd.data.shape))
        return LogProb(rime, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    mesh = make_mesh({"data": 2, "model": 2})
    sprob = ShardedLogProb(build(), mesh, bl_axis="model")
    v2, g2 = sprob.value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    for k in g1:
        assert np.allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                           rtol=1e-8), k


def test_shard_map_unused_mesh_axis():
    """bl_axis=None on a data x model mesh: the chi^2 psum must skip the
    replicated 'model' axis (it previously double-counted the
    likelihood by that axis' size)."""
    prob1, _ = _build_prob(Ntimes=4)
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    prob2, _ = _build_prob(Ntimes=4)
    mesh = make_mesh({"data": 2, "model": 2})
    sprob = ShardedLogProb(prob2, mesh, time_axis="data", bl_axis=None)
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10), \
        (float(v1), float(v2))
    for k in g1:
        assert np.allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                           rtol=1e-8), k


def test_shard_map_out_params_priors():
    """Priors on response OUTPUTS must survive the shard_map path (they
    were previously dropped: the forward's prior_cache was discarded
    and _walk_priors sees inp_params only)."""
    from bayeslim_tpu.inference.prob import LogGaussPrior

    def build():
        prob, rime = _build_prob(Ntimes=4)
        rime.sky.set_priors(
            priors_out_params=LogGaussPrior(0.0, 4.0, diag_cov=True))
        prob._jit_cache = {}
        return prob

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    mesh = make_mesh({"data": 4})
    sprob = ShardedLogProb(build(), mesh)
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10), \
        (float(v1), float(v2))
    for k in g1:
        assert np.allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                           rtol=1e-8), k


def test_shard_map_rejects_unsupported():
    """Features that genuinely cross baseline shards must fail loudly on
    the bl-sharded smap path, not silently disagree. Standard blocks
    (Jones/RedVisModel) are AUTO-PINNED to the target's baselines at
    construction, so the remaining rejection is a CUSTOM block that
    declares baseline indexing (exposes set_bls) but keeps it as host
    metadata (no device-leaf indices for the shards to partition)."""
    import pytest as _pt
    from bayeslim_tpu.utils import Sequential, Module

    class HostIdxBlock(Module):
        """Indexes baselines via host metadata; set_bls stores a host
        list, never device leaves."""

        def __init__(self):
            super().__init__()
            self._host_bls = None

        def set_bls(self, bls):
            self._host_bls = list(np.asarray(bls).ravel())
            return self

        def forward(self, vd, prior_cache=None, **kwargs):
            return vd

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:4]
    times = JD0 + np.arange(4) * 5e-4
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                   time_mode="vmap")
    seq = Sequential({"rime": rime, "host": HostIdxBlock()})
    vd = seq.forward()
    tgt = vd.copy()
    tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data)
    prob = LogProb(seq, tgt)
    mesh = make_mesh({"data": 2, "model": 2})
    sprob = ShardedLogProb(prob, mesh, bl_axis="model")
    with _pt.raises(AssertionError, match="host metadata"):
        sprob.smap_value_and_grad(sprob.collect_main_params())


def test_shard_map_bl_sharded_redundant_expansion():
    """sim->data redundancy expansion ACROSS baseline shards: each
    device simulates its local sim baselines, the sim cube all-gathers
    over the 'model' axis, and each device expands onto its local
    data-baseline shard. Gradients match single-device."""
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)
    red_groups = [r for r in arr.reds if r[0][0] != r[0][1]]
    # pick an EVEN number of groups whose total data count is even
    # (both axes must divide the 'model' axis size 2)
    chosen = None
    for k in range(2, len(red_groups) + 1, 2):
        gids_k = {arr.bl2red[r[0]] for r in red_groups[:k]}
        data_k = [b for b in bls if arr.bl2red[b] in gids_k]
        if len(data_k) % 2 == 0 and len(data_k) > k:
            chosen = (red_groups[:k], data_k)
            break
    assert chosen is not None
    sim_bls = [r[0] for r in chosen[0]]
    data_bls = chosen[1]
    times = JD0 + np.arange(4) * 5e-4

    def build():
        rime = bl.RIME(sky, T, beam, arr, sim_bls, times, freqs,
                       data_bls=data_bls, time_mode="vmap")
        vd = rime.forward()
        tgt = vd.copy()
        tgt.setup_data(data_bls, times, freqs, pol="ee",
                       data=vd.data + 0.05,
                       cov=jnp.ones(vd.data.shape), cov_axis=None,
                       icov=jnp.ones(vd.data.shape))
        return LogProb(rime, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    sprob = ShardedLogProb(build(), make_mesh({"data": 2, "model": 2}),
                           bl_axis="model")
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)

    # indivisible sim count fails loudly
    import pytest as _pt
    sim3 = [r[0] for r in red_groups[:3]]
    data3 = [b for b in bls
             if arr.bl2red[b] in {arr.bl2red[x] for x in sim3}]
    rime3 = bl.RIME(sky, T, beam, arr, sim3, times, freqs,
                    data_bls=data3, time_mode="vmap")
    vd3 = rime3.forward()
    tgt3 = vd3.copy()
    tgt3.setup_data(data3, times, freqs, pol="ee", data=vd3.data)
    with _pt.raises((AssertionError, ValueError)):
        # either the construction-time device_put (indivisible sim-bl
        # index arrays) or the smap divisibility assert fires
        sprob3 = ShardedLogProb(LogProb(rime3, tgt3),
                                make_mesh({"data": 2, "model": 2}),
                                bl_axis="model")
        sprob3.smap_value_and_grad(sprob3.collect_main_params())


def _grad_allclose(g0, g1, rtol=1e-8, atol=1e-12):
    for k in g0:
        assert np.allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                           rtol=rtol, atol=atol), k


def test_shard_map_redundant_expansion_time_sharded():
    """sim->data redundancy expansion (the production redundant-array
    configuration) through the smap path under time sharding: gradients
    match single-device exactly."""
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)
    sim_bls = [r[0] for r in arr.reds if r[0][0] != r[0][1]]
    gids = {arr.bl2red[b] for b in sim_bls}
    data_bls = [b for b in bls if arr.bl2red[b] in gids]
    times = JD0 + np.arange(8) * 5e-4

    def build():
        rime = bl.RIME(sky, T, beam, arr, sim_bls, times, freqs,
                       data_bls=data_bls, time_mode="vmap")
        vd = rime.forward()
        tgt = vd.copy()
        tgt.setup_data(data_bls, times, freqs, pol="ee",
                       data=vd.data + 0.05,
                       cov=jnp.ones(vd.data.shape), cov_axis=None,
                       icov=jnp.ones(vd.data.shape))
        return LogProb(rime, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    sprob = ShardedLogProb(build(), make_mesh({"data": 4}))
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)


def test_shard_map_sequential_jones_chain():
    """A Sequential RIME + Jones calibration chain runs through the smap
    path (time sharding): the full chain executes per-device on local
    time shards, gradients (sky, beam AND gain params) match
    single-device."""
    from bayeslim_tpu.utils import Sequential
    from bayeslim_tpu.models.calibration import JonesModel, JonesResponse

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:6]
    times = JD0 + np.arange(4) * 5e-4
    ants = sorted(set(a for b in bls for a in b))
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(1, 0.05, (1, 1, len(ants), 1, len(freqs)))
                    + 1j * rng.normal(0, 0.05,
                                      (1, 1, len(ants), 1, len(freqs))))

    def build():
        rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                       time_mode="vmap")
        J = JonesModel(g, ants, R=JonesResponse())
        seq = Sequential({"rime": rime, "cal": J})
        vd = seq.forward()
        tgt = vd.copy()
        tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data + 0.02)
        return LogProb(seq, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)
    assert "models.cal.params" in g1

    sprob = ShardedLogProb(build(), make_mesh({"data": 4}))
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)


def test_shard_map_time_sharded_gain_params():
    """Per-time gain parameters shard over the 'data' axis via
    param_shardings: each device applies only its local gain slice, and
    the returned gradient is the correct global per-time gradient."""
    from jax.sharding import PartitionSpec as P
    from bayeslim_tpu.utils import Sequential
    from bayeslim_tpu.models.calibration import JonesModel, JonesResponse

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:6]
    Ntimes = 8
    times = JD0 + np.arange(Ntimes) * 5e-4
    ants = sorted(set(a for b in bls for a in b))
    rng = np.random.default_rng(1)
    g = jnp.asarray(
        rng.normal(1, 0.05, (1, 1, len(ants), Ntimes, len(freqs)))
        + 1j * rng.normal(0, 0.05,
                          (1, 1, len(ants), Ntimes, len(freqs))))

    def build():
        rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                       time_mode="vmap")
        J = JonesModel(g, ants, R=JonesResponse())
        seq = Sequential({"rime": rime, "cal": J})
        vd = seq.forward()
        tgt = vd.copy()
        tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data + 0.02)
        return LogProb(seq, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    sprob = ShardedLogProb(
        build(), make_mesh({"data": 4}),
        param_shardings={"models.cal.params":
                         P(None, None, None, "data", None)})
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)


def test_shard_map_minibatch_accumulate():
    """Nbatch > 1 time minibatches accumulate through the smap path
    (prior counted once on batch 0), matching the single-device
    accumulate loop."""
    from bayeslim_tpu.inference import LogGaussPrior

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    sky.set_priors(LogGaussPrior(jnp.zeros(1), jnp.ones(1) * 50.0))
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:6]
    tgroups = [JD0 + np.arange(4) * 5e-4,
               JD0 + 0.01 + np.arange(4) * 5e-4]

    def build():
        rime = bl.RIME(sky, T, beam, arr, bls, tgroups, freqs,
                       time_mode="vmap")
        tgts = []
        for i in range(rime.Nbatch):
            rime.batch_idx = i
            vd = rime.forward()
            tgt = vd.copy()
            tgt.setup_data(bls, tgroups[i], freqs, pol="ee",
                           data=vd.data + 0.05)
            tgts.append(tgt)
        rime.batch_idx = 0
        return LogProb(rime, tgts)

    prob1 = build()
    assert prob1.Nbatch == 2
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    sprob = ShardedLogProb(build(), make_mesh({"data": 4}))
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)


def test_shard_map_cov_axis_freq():
    """Frequency-coupled covariance (icov (P,P,B,T,F,F)) through the
    smap path under time sharding."""
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:6]
    times = JD0 + np.arange(4) * 5e-4
    nf = len(freqs)
    rng = np.random.default_rng(2)
    A = rng.normal(size=(nf, nf))
    icov_f = np.eye(nf) * 2.0 + 0.1 * (A @ A.T)  # SPD
    icov = jnp.asarray(np.broadcast_to(
        icov_f, (1, 1, len(bls), len(times), nf, nf)))

    def build():
        rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                       time_mode="vmap")
        vd = rime.forward()
        tgt = vd.copy()
        tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data + 0.05,
                       cov=None, cov_axis="freq", icov=icov)
        return LogProb(rime, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    sprob = ShardedLogProb(build(), make_mesh({"data": 4}))
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)


def test_shard_map_main_params_and_compute_like():
    """main_params sub-slice solving and compute='like' both run through
    the smap path (replicated parameter-space work composes with the
    sharded likelihood)."""
    prob1, _ = _build_prob(Ntimes=8)
    spec = {"sky.params": np.arange(3)}
    prob1.set_main_params(spec)
    pd = prob1.collect_main_params()
    assert list(pd.keys()) == ["main"]
    v1, g1 = prob1.value_and_grad(pd)

    prob2, _ = _build_prob(Ntimes=8)
    prob2.set_main_params(spec)
    sprob = ShardedLogProb(prob2, make_mesh({"data": 4}))
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)

    # compute='like' (no prior term)
    prob1.compute = "like"
    prob1._jit_cache = {}
    v3, g3 = prob1.value_and_grad(pd)
    sprob.prob.compute = "like"
    v4, g4 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v3), float(v4), rtol=1e-10)
    _grad_allclose(g3, g4)


def test_shard_map_multipol():
    """2x2 polarized visibilities (Npol=2) through the smap path under
    time+bl sharding."""
    T = setup_Telescope()
    freqs = np.linspace(1e8, 1.1e8, 4)
    arr = setup_Array(N=2, freqs=freqs)
    rng = np.random.default_rng(3)
    Nsource = 3
    ra0 = T.JD2RA(JD0)
    angs = np.stack([ra0 + rng.uniform(-20, 20, Nsource),
                     -30.7 + rng.uniform(-20, 20, Nsource)])
    # 4-pol coherency sky: (2, 2, Nfreqs, Nsource) via stokes I only
    params = np.zeros((1, 1, 2, Nsource))
    params[0, 0, 0] = rng.uniform(1, 10, Nsource)
    params[0, 0, 1] = -2.2
    from bayeslim_tpu.models.sky import PointSky, PointSkyResponse
    R = PointSkyResponse(freqs, freq_mode="powerlaw", f0=freqs[0])
    sky = PointSky(jnp.asarray(params), jnp.asarray(angs), R=R)
    # 2-pol (Npol=2) beam -> 4-pol visibilities
    beam = bl.PixelBeam(jnp.ones((2, 1, 1, len(freqs), 2)) * 0.5, freqs,
                        R=bl.beam_model.GaussResponse(), pol=None,
                        powerbeam=False, fov=180.0)
    bls = arr.get_bls(keep_autos=False)[:6]
    times = JD0 + np.arange(4) * 5e-4

    def build():
        rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                       time_mode="vmap")
        vd = rime.forward()
        assert vd.data.shape[:2] == (2, 2)
        tgt = vd.copy()
        tgt.setup_data(bls, times, freqs, pol=None, data=vd.data + 0.02)
        return LogProb(rime, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    sprob = ShardedLogProb(build(), make_mesh({"data": 2, "model": 2}),
                           bl_axis="model")
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)


def test_shard_map_cov_axis_time_bl_sharded():
    """Time-coupled covariance icov (P,P,B,F,T,T) under BASELINE
    sharding (times replicated): the per-baseline icov shards over
    'model' and the quadratic form matches single-device."""
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:6]
    times = JD0 + np.arange(3) * 5e-4
    nt, nf = len(times), len(freqs)
    rng = np.random.default_rng(5)
    A = rng.normal(size=(1, 1, len(bls), nf, nt, nt))
    icov = jnp.asarray(A @ np.swapaxes(A, -1, -2) + 2 * np.eye(nt))

    def build():
        rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                       time_mode="vmap")
        vd = rime.forward()
        tgt = vd.copy()
        tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data + 0.05,
                       cov=None, cov_axis="time", icov=icov)
        return LogProb(rime, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    sprob = ShardedLogProb(build(), make_mesh({"model": 2}),
                           time_axis=None, bl_axis="model")
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)


def test_shard_map_param_shardings_rejects_fwd_priors():
    """param_shardings + module-attached priors must fail loudly (local
    shard priors are not psummed); prior_dict is the supported route."""
    import pytest as _pt
    from jax.sharding import PartitionSpec as P
    from bayeslim_tpu.inference import LogGaussPrior
    from bayeslim_tpu.utils import Sequential
    from bayeslim_tpu.models.calibration import JonesModel, JonesResponse

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:6]
    Ntimes = 4
    times = JD0 + np.arange(Ntimes) * 5e-4
    ants = sorted(set(a for b in bls for a in b))
    g = jnp.asarray(np.ones((1, 1, len(ants), Ntimes, len(freqs))) + 0j)
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                   time_mode="vmap")
    J = JonesModel(g, ants, R=JonesResponse())
    J.set_priors(LogGaussPrior(jnp.zeros(1), jnp.ones(1)))
    seq = Sequential({"rime": rime, "cal": J})
    vd = seq.forward()
    tgt = vd.copy()
    tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data)
    prob = LogProb(seq, tgt)
    sprob = ShardedLogProb(
        prob, make_mesh({"data": 4}),
        param_shardings={"models.cal.params":
                         P(None, None, None, "data", None)})
    with _pt.raises(AssertionError):
        sprob.smap_value_and_grad(sprob.collect_main_params())


def test_shard_map_sufficient_statistics_path():
    """The hera100-stat production configuration through the smap path:
    solve against redundant-group sufficient statistics (sim baselines
    only, icov = group weights) sharded over time x sim-baselines;
    gradients match BOTH the single-device stat solve and the full
    per-baseline expansion solve."""
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)
    red_groups = [r for r in arr.reds if r[0][0] != r[0][1]]
    sim_bls = [r[0] for r in red_groups[:4]]   # divisible by model axis
    gids = {arr.bl2red[b] for b in sim_bls}
    data_bls = [b for b in bls if arr.bl2red[b] in gids]
    times = JD0 + np.arange(4) * 5e-4
    rng = np.random.default_rng(9)

    # full noisy per-baseline data
    rime_full = bl.RIME(sky, T, beam, arr, data_bls, times, freqs)
    vd = rime_full.forward()
    vd.setup_meta(T, arr.to_antpos())
    noisy = vd.data + jnp.asarray(
        0.05 * (rng.normal(size=vd.data.shape)
                + 1j * rng.normal(size=vd.data.shape)))
    vd.setup_data(data_bls, times, freqs, pol="ee", data=noisy,
                  icov=jnp.ones(vd.data.shape), cov_axis=None)

    # A: full expansion solve (single device)
    def build_exp():
        rime = bl.RIME(sky, T, beam, arr, sim_bls, times, freqs,
                       data_bls=data_bls)
        return LogProb(rime, vd)

    probA = build_exp()
    pd = probA.collect_main_params()
    vA, gA = probA.value_and_grad(pd)

    # B: sufficient-stats solve, single device
    red, const = vd.reduce_by_redundancy(redtol=0.5)

    def build_stat():
        rime = bl.RIME(sky, T, beam, arr, sim_bls, times, freqs,
                       time_mode="vmap")
        return LogProb(rime, red)

    probB = build_stat()
    vB, gB = probB.value_and_grad(pd)
    _grad_allclose(gA, gB, rtol=1e-6, atol=1e-10)

    # C: the same stat solve through the smap path on time x model
    sprob = ShardedLogProb(build_stat(), make_mesh({"data": 2,
                                                    "model": 2}),
                           bl_axis="model")
    vC, gC = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(vB), float(vC), rtol=1e-10)
    _grad_allclose(gB, gC)


def test_shard_map_coupling_chain():
    """A Sequential RIME -> VisCoupling (antenna cross-coupling E V E^H)
    chain through the smap path under time sharding — the coupling block
    mixes ALL baselines (incl. autos), which stays local per time
    shard."""
    from bayeslim_tpu.utils import Sequential
    from bayeslim_tpu.models.coupling import VisCoupling
    from bayeslim_tpu.utils import make_hex, AntposDict

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    ants, antvecs = make_hex(2, D=15.0)
    arr = setup_Array(N=2, freqs=freqs)
    antpos = AntposDict(ants, antvecs)
    # coupling needs the full pair set including autos
    bls = [(a1, a2) for i, a1 in enumerate(ants) for a2 in ants[i:]]
    times = JD0 + np.arange(4) * 5e-4
    rng = np.random.default_rng(11)
    nant = len(ants)
    X = (rng.normal(size=(nant, nant, 1, len(freqs)))
         + 1j * rng.normal(size=(nant, nant, 1, len(freqs)))) * 0.01

    def build():
        rime = bl.RIME(sky, T, setup_GaussBeam(freqs), arr, bls, times,
                       freqs, time_mode="vmap")
        vc = VisCoupling(jnp.asarray(X[None, None]), freqs, antpos, bls)
        seq = Sequential({"rime": rime, "coupling": vc})
        vd = seq.forward()
        tgt = vd.copy()
        tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data + 0.03)
        return LogProb(seq, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    assert "models.coupling.params" in pd
    v1, g1 = prob1.value_and_grad(pd)

    sprob = ShardedLogProb(build(), make_mesh({"data": 4}))
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)


def test_trainer_over_sharded_logprob():
    """The Trainer epoch loop drives a ShardedLogProb directly (same
    value_and_grad surface as a plain LogProb): loss decreases and the
    smap-backed closure is exercised every epoch."""
    from bayeslim_tpu.inference.trainer import Trainer
    import optax

    prob1, _ = _build_prob(Ntimes=4)
    pd0 = prob1.collect_main_params()

    # perturb the starting parameters so there is something to fit
    sprob = ShardedLogProb(prob1, make_mesh({"data": 4}))
    sprob.prob.model = sprob.prob.model.updated(
        {"sky.params": pd0["sky.params"] * 1.2})

    class SmapProb:
        """Trainer adapter pinning the shard_map execution path."""

        def __init__(self, sp):
            self.sp = sp

        def collect_main_params(self):
            return self.sp.collect_main_params()

        def value_and_grad(self, pdict=None):
            return self.sp.smap_value_and_grad(pdict)

        def update(self, pdict):
            self.sp.update(pdict)

    tr = Trainer(SmapProb(sprob), optimizer=optax.adam(5e-2),
                 track=True, verbose=False)
    tr.train(15)
    losses = np.asarray(tr.loss_history, dtype=float)
    assert len(losses) == 15 and np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5
    # chain tracked per epoch
    assert len(tr.chain["sky.params"]) == 15


def test_vismapper_freq_sharded():
    """Imaging shards over the frequency axis (each channel's dirty map
    is independent): maps from mesh-sharded inputs match single-device
    (config-#5 imaging stage on a mesh)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bayeslim_tpu.models.imaging import VisMapper
    from bayeslim_tpu.models.sky import PointSky, PointSkyResponse
    from tests.test_rime import setup_UniformBeam

    T = setup_Telescope()
    freqs = np.linspace(130e6, 150e6, 8)
    arr = setup_Array(N=2, freqs=freqs)
    ra0 = T.JD2RA(JD0)
    angs = np.asarray([[ra0], [-30.72]])
    sky = PointSky(jnp.ones((1, 1, 8, 1)) * 5.0, jnp.asarray(angs),
                   R=PointSkyResponse(freqs, freq_mode="channel"))
    beam = setup_UniformBeam(freqs)
    bls = arr.get_bls(keep_autos=False)
    rime = bl.RIME(sky, T, beam, arr, bls, np.asarray([JD0]), freqs)
    vd = rime.forward()
    vd.setup_meta(T, arr.to_antpos())

    dgrid = np.linspace(-5, 5, 9)
    rr, dd = np.meshgrid(ra0 + dgrid, -30.72 + dgrid)
    m0, P0 = VisMapper(vd, rr.ravel(), dd.ravel(),
                       fov=180.0).make_map(return_P=True)

    mesh = make_mesh({"data": 4})
    vd2 = vd.copy()
    vd2.data = jax.device_put(
        vd.data, NamedSharding(mesh, P(None, None, None, None, "data")))
    m1, P1 = VisMapper(vd2, rr.ravel(), dd.ravel(),
                       fov=180.0).make_map(return_P=True)
    assert np.allclose(np.asarray(m0), np.asarray(m1), rtol=1e-10)
    assert np.allclose(np.asarray(P0), np.asarray(P1), rtol=1e-10)


def test_shard_map_jones_chain_bl_sharded():
    """A Sequential RIME -> Jones chain under BASELINE sharding: the
    Jones block's baseline->antenna gain indices are pinned as device
    leaves (JonesModel.set_bls) and shard over the 'model' axis like the
    RIME's own baseline indices; gradients match single-device."""
    from bayeslim_tpu.utils import Sequential
    from bayeslim_tpu.models.calibration import JonesModel, JonesResponse

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:8]   # divisible by model axis
    times = JD0 + np.arange(4) * 5e-4
    ants = sorted(set(a for b in bls for a in b))
    rng = np.random.default_rng(21)
    g = jnp.asarray(rng.normal(1, 0.05, (1, 1, len(ants), 1, len(freqs)))
                    + 1j * rng.normal(0, 0.05,
                                      (1, 1, len(ants), 1, len(freqs))))

    def build():
        rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                       time_mode="vmap")
        J = JonesModel(g, ants, R=JonesResponse()).set_bls(bls)
        seq = Sequential({"rime": rime, "cal": J})
        vd = seq.forward()
        tgt = vd.copy()
        tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data + 0.02)
        return LogProb(seq, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)
    assert "models.cal.params" in g1

    sprob = ShardedLogProb(build(), make_mesh({"data": 2, "model": 2}),
                           bl_axis="model")
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)

    # without a manual set_bls the same chain AUTO-PINS to the target's
    # baselines at construction and matches the single-device gradients
    def build_plain():
        rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                       time_mode="vmap")
        J = JonesModel(g, ants, R=JonesResponse())
        seq = Sequential({"rime": rime, "cal": J})
        vd = seq.forward()
        tgt = vd.copy()
        tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data + 0.02)
        return LogProb(seq, tgt)
    plain = build_plain()
    Jwrapped = plain.model.models["cal"]
    sprob2 = ShardedLogProb(plain, make_mesh({"data": 2, "model": 2}),
                            bl_axis="model")
    v3, g3 = sprob2.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v3), rtol=1e-10)
    _grad_allclose(g1, g3)
    # non-destructive: the caller's model was not mutated by auto-pin
    assert getattr(Jwrapped, "_g1_idx", None) is None


def test_shard_map_redvismodel_chain_bl_sharded():
    """A Sequential RIME -> RedVisModel chain under baseline sharding:
    the per-group expansion index is pinned as a device leaf
    (RedVisModel.set_bls) and shards over 'model'; gradients match."""
    from bayeslim_tpu.utils import Sequential
    from bayeslim_tpu.models.calibration import RedVisModel

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:8]
    times = JD0 + np.arange(4) * 5e-4
    bl2red = {bl: arr.bl2red[bl] for bl in bls}
    ngrp = max(bl2red.values()) + 1
    rng = np.random.default_rng(23)
    rv = jnp.asarray(
        (rng.normal(size=(1, 1, ngrp, 1, len(freqs)))
         + 1j * rng.normal(size=(1, 1, ngrp, 1, len(freqs)))) * 0.1)

    def build():
        rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                       time_mode="vmap")
        rvm = RedVisModel(rv, bl2red).set_bls(bls)
        seq = Sequential({"rime": rime, "rv": rvm})
        vd = seq.forward()
        tgt = vd.copy()
        tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data + 0.02)
        return LogProb(seq, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)
    assert "models.rv.params" in g1

    sprob = ShardedLogProb(build(), make_mesh({"data": 2, "model": 2}),
                           bl_axis="model")
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)

    # auto-pin: the same chain with NO set_bls call, nested one level
    # deep in a Sequential — the construction walk pins _red_idx to the
    # target's baselines inside a copied nested chain (the caller's
    # model stays untouched)
    def build_nested_plain():
        rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                       time_mode="vmap")
        rvm = RedVisModel(rv, bl2red)
        inner = Sequential({"rv": rvm})
        seq = Sequential({"rime": rime, "post": inner})
        vd = seq.forward()
        tgt = vd.copy()
        tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data + 0.02)
        return LogProb(seq, tgt)
    plainp = build_nested_plain()
    rv_orig = plainp.model.models["post"].models["rv"]
    pd3 = plainp.collect_main_params()
    v1n, g1n = plainp.value_and_grad(pd3)
    sprob3 = ShardedLogProb(plainp, make_mesh({"data": 2, "model": 2}),
                            bl_axis="model")
    v3, g3 = sprob3.smap_value_and_grad(pd3)
    assert np.isclose(float(v1n), float(v3), rtol=1e-10)
    _grad_allclose(g1n, g3)
    assert getattr(rv_orig, "_red_idx", None) is None


def test_shard_map_expansion_chain_bl_sharded():
    """Redundancy expansion COMBINED with a Jones chain under baseline
    sharding (round-4 lift of the former exclusion): each device
    simulates its local sim baselines, the sim cube all-gathers and
    expands at the RIME's position in the chain, and the set_bls-pinned
    Jones block applies data-baseline gains to its local shard.
    Gradients match single-device."""
    from bayeslim_tpu.utils import Sequential
    from bayeslim_tpu.models.calibration import JonesModel, JonesResponse

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)
    red_groups = [r for r in arr.reds if r[0][0] != r[0][1]]
    chosen = None
    for k in range(2, len(red_groups) + 1, 2):
        gids_k = {arr.bl2red[r[0]] for r in red_groups[:k]}
        data_k = [b for b in bls if arr.bl2red[b] in gids_k]
        if len(data_k) % 2 == 0 and len(data_k) > k:
            chosen = (red_groups[:k], data_k)
            break
    assert chosen is not None
    sim_bls = [r[0] for r in chosen[0]]
    data_bls = chosen[1]
    times = JD0 + np.arange(4) * 5e-4
    ants = sorted(set(a for b in data_bls for a in b))
    rng = np.random.default_rng(29)
    g = jnp.asarray(rng.normal(1, 0.05, (1, 1, len(ants), 1, len(freqs)))
                    + 1j * rng.normal(0, 0.05,
                                      (1, 1, len(ants), 1, len(freqs))))

    def build():
        rime = bl.RIME(sky, T, beam, arr, sim_bls, times, freqs,
                       data_bls=data_bls, time_mode="vmap")
        J = JonesModel(g, ants, R=JonesResponse()).set_bls(data_bls)
        seq = Sequential({"rime": rime, "cal": J})
        vd = seq.forward()
        tgt = vd.copy()
        tgt.setup_data(data_bls, times, freqs, pol="ee",
                       data=vd.data + 0.02)
        return LogProb(seq, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)
    assert "models.cal.params" in g1

    sprob = ShardedLogProb(build(), make_mesh({"data": 2, "model": 2}),
                           bl_axis="model")
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)


def test_shard_map_nmp_bl_sharded():
    """Nmp > 1 (heterogeneous per-antenna beams) under BASELINE
    sharding (round-4 lift): shard_rime pins the baseline->model-pair
    map as a bl-sharded device leaf, and the kernel dispatch runs every
    pair on the local baselines with a mask-select (Nmp x triples).
    Gradients match single-device."""
    from bayeslim_tpu.models.beam import PixelBeam, GaussResponse

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    bls = arr.get_bls(keep_autos=False)[:8]   # divisible by model axis
    times = JD0 + np.arange(4) * 5e-4
    ants = sorted(set(a for b in bls for a in b))
    # two beam models: half the antennas get a wider Gaussian
    params = jnp.stack([jnp.ones((1, 1, len(freqs), 2)) * 0.5,
                        jnp.ones((1, 1, len(freqs), 2)) * 0.8], axis=2)
    ant2beam = {a: (0 if i < len(ants) // 2 else 1)
                for i, a in enumerate(ants)}
    beam = PixelBeam(params, freqs, R=GaussResponse(), pol="e",
                     ant2beam=ant2beam, powerbeam=True, fov=180.0)
    assert beam.modelpairs(bls)[2] is not None   # really Nmp > 1

    def build():
        rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                       time_mode="vmap")
        vd = rime.forward()
        tgt = vd.copy()
        tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data + 0.03)
        return LogProb(rime, tgt)

    prob1 = build()
    pd = prob1.collect_main_params()
    v1, g1 = prob1.value_and_grad(pd)

    sprob = ShardedLogProb(build(), make_mesh({"data": 2, "model": 2}),
                           bl_axis="model")
    v2, g2 = sprob.smap_value_and_grad(pd)
    assert np.isclose(float(v1), float(v2), rtol=1e-10)
    _grad_allclose(g1, g2)


def test_set_bls_validation_and_blnum_codes():
    """ShardedLogProb cross-checks pinned set_bls indices against the
    target's baselines (an order mismatch silently corrupts results
    otherwise), and set_bls accepts blnum codes / (N,2) arrays."""
    import pytest as _pt
    from bayeslim_tpu.utils import Sequential
    from bayeslim_tpu.models.calibration import JonesModel, JonesResponse

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:8]
    times = JD0 + np.arange(4) * 5e-4
    ants = sorted(set(a for b in bls for a in b))
    g = jnp.asarray(np.ones((1, 1, len(ants), 1, len(freqs))) + 0j)

    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs,
                   time_mode="vmap")
    vd = rime.forward()
    tgt = vd.copy()
    tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data)

    # blnum codes round-trip through set_bls identically to tuples
    J1 = JonesModel(g, ants, R=JonesResponse()).set_bls(bls)
    J2 = JonesModel(g, ants, R=JonesResponse()).set_bls(tgt.blnums)
    J3 = JonesModel(g, ants, R=JonesResponse()).set_bls(
        np.asarray(bls))
    assert np.array_equal(np.asarray(J1._g1_idx), np.asarray(J2._g1_idx))
    assert np.array_equal(np.asarray(J1._g1_idx), np.asarray(J3._g1_idx))

    # wrong-ORDER pinning is rejected at ShardedLogProb construction
    Jbad = JonesModel(g, ants, R=JonesResponse()).set_bls(bls[::-1])
    seq = Sequential({"rime": rime, "cal": Jbad})
    prob = LogProb(seq, tgt)
    with _pt.raises(AssertionError):
        ShardedLogProb(prob, make_mesh({"data": 2, "model": 2}),
                       bl_axis="model")


def test_smap_vs_single_device_fuzz():
    """Randomized sharding-closure fuzz (VERDICT r4 #6): the smap
    closure (parallel/sharding.py) is the largest hand-threaded surface
    in the package; this composes random chains (RIME +- Jones +-
    RedVisModel), random mesh splits (data / model / 2D), cov_axis
    (None / freq / time), Nbatch in {1, 2}, redundancy expansion,
    Nmp > 1 heterogeneous beams, priors, and per-time param_shardings,
    asserting loss+gradient parity vs the unsharded LogProb on the
    8-CPU mesh for every draw."""
    from jax.sharding import PartitionSpec as P
    from bayeslim_tpu.utils import Sequential
    from bayeslim_tpu.models.calibration import (JonesModel,
                                                 JonesResponse,
                                                 RedVisModel)
    from bayeslim_tpu.models.beam import PixelBeam, GaussResponse
    from bayeslim_tpu.inference import LogGaussPrior

    rng = np.random.default_rng(20260819)
    T = setup_Telescope()
    nfail = 0

    for trial in range(24):
        nf = int(rng.integers(3, 5))
        sky, freqs = setup_PointSky(T, Nsource=int(rng.integers(2, 5)),
                                    Nfreqs=nf, seed=int(rng.integers(99)))
        arr = setup_Array(N=2, freqs=freqs)
        all_bls = arr.get_bls(keep_autos=False)

        # --- mesh draw
        mesh_opts = [
            ({"data": 2}, "data", None),
            ({"data": 4}, "data", None),
            ({"model": 2}, None, "model"),
            ({"data": 2, "model": 2}, "data", "model"),
        ]
        mesh_shape, time_axis, bl_axis = mesh_opts[
            int(rng.integers(len(mesh_opts)))]
        nmdl = mesh_shape.get("model", 1) if bl_axis else 1
        ndata = mesh_shape.get("data", 1) if time_axis else 1

        # --- redundancy draw (sim+data counts must divide the bl shard)
        redundant = bool(rng.random() < 0.4)
        sim_bls = data_bls = None
        if redundant:
            red_groups = [r for r in arr.reds if r[0][0] != r[0][1]]
            chosen = None
            for k in range(nmdl, len(red_groups) + 1):
                gids_k = {arr.bl2red[r[0]] for r in red_groups[:k]}
                data_k = [b for b in all_bls if arr.bl2red[b] in gids_k]
                if k % nmdl == 0 and len(data_k) % nmdl == 0 \
                        and len(data_k) > k:
                    chosen = (red_groups[:k], data_k)
                    break
            if chosen is None:
                redundant = False
            else:
                sim_bls = [r[0] for r in chosen[0]]
                data_bls = chosen[1]
        if not redundant:
            nb = int(rng.integers(1, 3)) * 2 * nmdl
            data_bls = all_bls[:min(nb, (len(all_bls) // nmdl) * nmdl)]
            sim_bls = data_bls

        # --- beam draw: Nmp > 1 heterogeneous beams sometimes
        nmp = bool(rng.random() < 0.25)
        ants_used = sorted(set(a for b in data_bls for a in b))
        if nmp:
            bp = jnp.stack([jnp.ones((1, 1, nf, 2)) * 0.5,
                            jnp.ones((1, 1, nf, 2)) * 0.8], axis=2)
            ant2beam = {a: (0 if i < len(ants_used) // 2 else 1)
                        for i, a in enumerate(ants_used)}
            beam = PixelBeam(bp, freqs, R=GaussResponse(), pol="e",
                             ant2beam=ant2beam, powerbeam=True,
                             fov=180.0)
            if beam.modelpairs(data_bls)[2] is None:
                nmp = False
                beam = setup_GaussBeam(freqs)
        else:
            beam = setup_GaussBeam(freqs)

        # --- times / batching draw
        nbatch = int(rng.integers(1, 3))
        ntpb = max(ndata, 1) * int(rng.integers(1, 3))
        tgroups = [JD0 + b * 0.01 + np.arange(ntpb) * 5e-4
                   for b in range(nbatch)]
        times_arg = tgroups if nbatch > 1 else tgroups[0]

        # --- chain draw
        with_jones = bool(rng.random() < 0.5)
        with_rv = bool(rng.random() < 0.3)
        gains = jnp.asarray(
            rng.normal(1, 0.05, (1, 1, len(ants_used), 1, nf))
            + 1j * rng.normal(0, 0.05, (1, 1, len(ants_used), 1, nf)))
        bl2red = {b: arr.bl2red[b] for b in data_bls}
        ngrp = max(bl2red.values()) + 1
        rv_params = jnp.asarray(
            (rng.normal(size=(1, 1, ngrp, 1, nf))
             + 1j * rng.normal(size=(1, 1, ngrp, 1, nf))) * 0.1)

        # --- per-time gain param_shardings draw (time-sharded meshes,
        # Jones chain, no priors)
        ps_trial = bool(rng.random() < 0.2 and time_axis and with_jones
                        and nbatch == 1)
        if ps_trial:
            gains = jnp.asarray(
                rng.normal(1, 0.05, (1, 1, len(ants_used), ntpb, nf))
                + 1j * rng.normal(0, 0.05,
                                  (1, 1, len(ants_used), ntpb, nf)))

        # --- prior draw
        with_prior = bool(rng.random() < 0.3 and not ps_trial)

        # --- cov draw
        cov_axis = rng.choice([None, "freq"]
                              if time_axis else [None, "freq", "time"])
        cov_axis = None if cov_axis is None else str(cov_axis)

        tag = dict(trial=trial, mesh=dict(mesh_shape), red=redundant,
                   nmp=nmp, jones=with_jones, rv=with_rv,
                   nbatch=nbatch, cov=cov_axis, prior=with_prior,
                   ps=ps_trial, nbls=len(data_bls))

        if with_prior:
            sky.set_priors(LogGaussPrior(jnp.zeros(1),
                                         jnp.ones(1) * 50.0))
        else:
            sky.priors_inp_params = None

        def build():
            rime = bl.RIME(sky, T, beam, arr, sim_bls, times_arg, freqs,
                           data_bls=(data_bls if redundant else None),
                           time_mode="vmap")
            blocks = {"rime": rime}
            if with_jones:
                blocks["cal"] = JonesModel(gains, ants_used,
                                           R=JonesResponse())
            if with_rv:
                blocks["rv"] = RedVisModel(rv_params, bl2red)
            model = Sequential(blocks) if len(blocks) > 1 else rime
            tgts = []
            for i in range(rime.Nbatch):
                rime.batch_idx = i
                vd = model.forward()
                tgt = vd.copy()
                kw = {}
                if cov_axis == "freq":
                    A = rng.normal(size=(nf, nf))
                    icf = np.eye(nf) * 2.0 + 0.1 * (A @ A.T)
                    kw = dict(cov=None, cov_axis="freq", icov=jnp.asarray(
                        np.broadcast_to(icf, (1, 1, len(data_bls), ntpb,
                                              nf, nf))))
                elif cov_axis == "time":
                    A = rng.normal(size=(1, 1, len(data_bls), nf, ntpb,
                                         ntpb))
                    kw = dict(cov=None, cov_axis="time", icov=jnp.asarray(
                        A @ np.swapaxes(A, -1, -2) + 2 * np.eye(ntpb)))
                elif rng.random() < 0.5:
                    kw = dict(cov=None, cov_axis=None,
                              icov=jnp.ones(vd.data.shape))
                tgt.setup_data(data_bls, tgroups[i], freqs, pol="ee",
                               data=vd.data + 0.03, **kw)
                tgts.append(tgt)
            rime.batch_idx = 0
            return LogProb(model, tgts if nbatch > 1 else tgts[0])

        # cov matrices must be identical across the two builds
        state = rng.bit_generator.state
        prob1 = build()
        pd = prob1.collect_main_params()
        v1, g1 = prob1.value_and_grad(pd)
        rng.bit_generator.state = state
        prob2 = build()
        kw = {}
        if ps_trial:
            kw["param_shardings"] = {
                "models.cal.params": P(None, None, None, "data", None)}
        sprob = ShardedLogProb(prob2, make_mesh(mesh_shape),
                               time_axis=time_axis, bl_axis=bl_axis,
                               **kw)
        v2, g2 = sprob.smap_value_and_grad(pd)
        ok = np.isclose(float(v1), float(v2), rtol=1e-9)
        if not ok:
            nfail += 1
            print("LOSS MISMATCH", tag, float(v1), float(v2))
        for k in g1:
            a, b = np.asarray(g1[k]), np.asarray(g2[k])
            scale = np.abs(a).max() + 1e-30
            if np.abs(a - b).max() / scale > 1e-8:
                nfail += 1
                print("GRAD MISMATCH", tag, k,
                      np.abs(a - b).max() / scale)

        # GSPMD (NamedSharding) path on a subset of draws: same mesh,
        # skip combos it does not thread (param_shardings)
        if not ps_trial and trial % 3 == 0:
            rng.bit_generator.state = state
            prob3 = build()
            sprob3 = ShardedLogProb(prob3, make_mesh(mesh_shape),
                                    time_axis=time_axis, bl_axis=bl_axis)
            v3, g3 = sprob3.value_and_grad(pd)
            if not np.isclose(float(v1), float(v3), rtol=1e-9):
                nfail += 1
                print("GSPMD LOSS MISMATCH", tag, float(v1), float(v3))
            for k in g1:
                a, b = np.asarray(g1[k]), np.asarray(g3[k])
                scale = np.abs(a).max() + 1e-30
                if np.abs(a - b).max() / scale > 1e-8:
                    nfail += 1
                    print("GSPMD GRAD MISMATCH", tag, k)

    assert nfail == 0, f"{nfail} sharding-fuzz mismatches (see stdout)"


def test_sampler_over_sharded_logprob():
    """Samplers compose with ShardedLogProb: its _batch_fn exposes the
    PURE smap loss (psum'd chi^2 inside shard_map), so HMC/NUTS fused
    on-device trajectories AND the vectorized multi-chain runners
    execute over the mesh. Sequential HMC over the sharded posterior
    matches the unsharded sampler draw for draw (same seed, same
    leapfrog math — only the executables differ)."""
    from bayeslim_tpu.inference.sampler import HMC, NUTS, Potential

    prob, rime = _build_prob()
    prob.negate = True
    prob._jit_cache = {}
    mesh = make_mesh({"data": 4})
    sprob = ShardedLogProb(prob, mesh=mesh)

    x0 = sprob.collect_main_params()
    h_s = HMC(Potential(sprob), x0, eps=1e-4, Nstep=4, seed=11)
    h_u = HMC(Potential(prob), x0, eps=1e-4, Nstep=4, seed=11)
    assert h_s._traj is not None and h_u._traj is not None
    for _ in range(4):
        h_s.step()
        h_u.step()
    ch_s, ch_u = h_s.get_chain(), h_u.get_chain()
    for k in ch_s:
        assert np.allclose(ch_s[k], ch_u[k], rtol=1e-5, atol=1e-8), k
    assert np.allclose(h_s._acceptances, h_u._acceptances, atol=1e-6)

    # vectorized multi-chain over the mesh (vmap over shard_map)
    out = h_s.sample_chains(4, Nchain=2, seed=5)
    k = next(iter(out["chain"]))
    assert out["chain"][k].shape[:2] == (2, 4)
    assert np.isfinite(out["chain"][k]).all()

    n_s = NUTS(Potential(sprob), x0, eps=1e-4, max_treedepth=3, seed=1)
    outn = n_s.sample_chains(3, Nchain=2, seed=5)
    assert outn["chain"][k].shape[:2] == (2, 3)
    assert np.isfinite(outn["chain"][k]).all()
    assert (outn["tree_depth"] >= 1).all()
