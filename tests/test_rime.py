"""End-to-end RIME forward tests (reference tests/test_rime.py)."""
import numpy as np
import jax
import jax.numpy as jnp

import bayeslim_tpu as bl
from bayeslim_tpu.models import telescope as tm
from bayeslim_tpu.models.sky import PointSky, PointSkyResponse, PixelSky, PixelSkyResponse
from bayeslim_tpu.models.beam import PixelBeam, GaussResponse, UniformResponse, AiryResponse
from bayeslim_tpu.models.rime import RIME
from bayeslim_tpu.utils import make_hex, AntposDict, healpix as hp

HERA_LOC = (21.428305555, -30.72152777, 1073.0)
JD0 = 2458168.3


def setup_Telescope():
    return tm.TelescopeModel(HERA_LOC)


def setup_Array(N=2, freqs=None):
    ants, antvecs = make_hex(N, D=15.0)
    return tm.ArrayModel(AntposDict(ants, antvecs), freqs=freqs)


def setup_PointSky(telescope, Nsource=5, Nfreqs=8, seed=0):
    """Random bright point sources placed above the horizon at JD0."""
    rng = np.random.default_rng(seed)
    freqs = np.linspace(100e6, 120e6, Nfreqs)
    # scatter sources around zenith
    ra0 = telescope.JD2RA(JD0)
    ra = ra0 + rng.uniform(-20, 20, Nsource)
    dec = HERA_LOC[1] + rng.uniform(-20, 20, Nsource)
    angs = np.stack([ra, dec])
    amp = rng.uniform(1, 10, Nsource)
    params = np.zeros((1, 1, 2, Nsource))
    params[0, 0, 0] = amp
    params[0, 0, 1] = -2.2
    R = PointSkyResponse(freqs, freq_mode="powerlaw", f0=freqs[0])
    sky = PointSky(jnp.asarray(params), jnp.asarray(angs), R=R)
    return sky, freqs


def setup_GaussBeam(freqs):
    params = jnp.ones((1, 1, 1, len(freqs), 2)) * 0.5
    return PixelBeam(params, freqs, R=GaussResponse(), pol="e",
                     powerbeam=True, fov=180.0)


def setup_UniformBeam(freqs, fov=180.0):
    params = jnp.ones((1, 1, 1, 1, 1))
    return PixelBeam(params, freqs, R=UniformResponse(), pol="e",
                     powerbeam=True, fov=fov)


def test_rime_pointsky_analytic():
    """Uniform beam + point sources: V = sum_s S_s(f) exp(2pi i f b.s/c)."""
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_UniformBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:5]
    times = np.asarray([JD0, JD0 + 0.001])

    rime = RIME(sky, T, beam, arr, bls, times, freqs)
    vd = rime.forward()
    assert vd.data.shape == (1, 1, 5, 2, len(freqs))

    # analytic truth
    angs = np.asarray(sky.angs)
    S = np.asarray(sky.params[0, 0, 0])  # amplitudes
    spec = S[None, :] * (freqs[:, None] / freqs[0]) ** -2.2  # (Nf, Ns)
    blvecs = np.asarray(arr.get_blvecs(bls))
    truth = np.zeros((5, 2, len(freqs)), dtype=complex)
    for ti, t in enumerate(times):
        zen, az = T.eq2top(t, angs[0], angs[1])
        s = arr.s_vector(zen, az)  # (3, Ns)
        tau = blvecs @ s / 2.99792458e8  # (Nbl, Ns)
        fr = np.exp(2j * np.pi * freqs[None, :, None] * tau[:, None, :])
        truth[:, ti, :] = (fr * spec[None]).sum(-1)
    err = np.abs(np.asarray(vd.data[0, 0]) - truth).max() / np.abs(truth).max()
    assert err < 1e-10, f"RIME analytic mismatch {err:.2e}"


def test_rime_batched_equals_unbatched():
    """Minibatched (time and bl groups) forward == single batch
    (reference tests/test_rime.py:29-51, tolerance 1e-10)."""
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:6]
    times = np.asarray([JD0, JD0 + 5e-4, JD0 + 1e-3, JD0 + 1.5e-3])

    rime_full = RIME(sky, T, beam, arr, bls, times, freqs)
    vd_full = rime_full.forward()

    # batch: 2 bl groups x 2 time groups
    rime_b = RIME(sky, T, beam, arr, [bls[:3], bls[3:]],
                  [times[:2], times[2:]], freqs)
    assert rime_b.Nbatch == 4
    vd_b = rime_b.run_batches(concat=True)

    assert vd_b.data.shape == vd_full.data.shape
    assert np.allclose(np.asarray(vd_b.data), np.asarray(vd_full.data),
                       atol=1e-10)
    assert np.allclose(vd_b.times, vd_full.times)
    assert (vd_b.blnums == vd_full.blnums).all()


def test_rime_fov_cut_pixelsky():
    """PixelSky + FOV cut: pixels below fov/2 contribute, others don't."""
    T = setup_Telescope()
    nside = 8
    npix = hp.nside2npix(nside)
    freqs = np.linspace(100e6, 110e6, 4)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    ra = phi * 180 / np.pi
    dec = 90.0 - theta * 180 / np.pi
    angs = np.stack([ra, dec])
    rng = np.random.default_rng(1)
    params = jnp.asarray(rng.uniform(1, 2, (1, 1, len(freqs), npix)))
    px_area = hp.nside2pixarea(nside)
    R = PixelSkyResponse(freqs, spatial_mode="pixel", freq_mode="channel")
    sky = PixelSky(params, jnp.asarray(angs), px_area, R=R)

    arr = setup_Array(N=2, freqs=freqs)
    beam90 = setup_UniformBeam(freqs, fov=90.0)
    bls = [(0, 1), (0, 2)]
    rime = RIME(sky, T, beam90, arr, bls, np.asarray([JD0]), freqs)
    vd = rime.forward()

    # manual: only pixels with zen < 45
    zen, az = T.eq2top(JD0, ra, dec)
    cut = zen < 45.0
    s = arr.s_vector(zen[cut], az[cut])
    blvecs = np.asarray(arr.get_blvecs(bls))
    tau = blvecs @ s / 2.99792458e8
    fr = np.exp(2j * np.pi * freqs[None, :, None] * tau[:, None, :])
    truth = (fr * (np.asarray(params)[0, 0][None, :, cut] * px_area)).sum(-1)
    err = np.abs(np.asarray(vd.data[0, 0, :, 0]) - truth).max() / np.abs(truth).max()
    assert err < 1e-10


def test_rime_jit_and_grad():
    """The whole forward jits; gradients flow to sky params + beam params."""
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:4]
    rime = RIME(sky, T, beam, arr, bls, np.asarray([JD0]), freqs)

    from bayeslim_tpu import model2pdict

    pd = model2pdict(rime)
    assert "sky.params" in pd and "beam.params" in pd

    def loss(pdict):
        out = rime.updated(pdict).forward()
        return jnp.sum(jnp.abs(out.data) ** 2)

    g = jax.jit(jax.grad(loss))(pd)
    assert np.isfinite(np.asarray(g["sky.params"])).all()
    assert np.isfinite(np.asarray(g["beam.params"])).all()
    assert np.abs(np.asarray(g["sky.params"])).max() > 0
    assert np.abs(np.asarray(g["beam.params"])).max() > 0

    # finite-difference check one sky param
    eps = 1e-4
    pd2 = pd.copy()
    p = np.asarray(pd["sky.params"])
    p2 = p.copy()
    p2[0, 0, 0, 0] += eps
    pd2["sky.params"] = jnp.asarray(p2)
    num = (loss(pd2) - loss(pd)) / eps
    assert np.isclose(np.asarray(g["sky.params"])[0, 0, 0, 0], num, rtol=1e-4)


def test_rime_chunked_equals_unchunked():
    """Pixel-chunked reduction == direct reduction."""
    from bayeslim_tpu.ops.rime_kernel import rime_reduce, rime_reduce_ref
    rng = np.random.default_rng(0)
    psky = jnp.asarray(rng.normal(size=(1, 1, 3, 4, 256)))
    tau = jnp.asarray(rng.uniform(-1e-5, 1e-5, (3, 256)))
    freqs = np.linspace(100e6, 110e6, 4)
    a = rime_reduce_ref(psky, tau, freqs)
    b = rime_reduce(psky, tau, freqs, chunk=64)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_rime_indexed_batching():
    """Indexed (stacked-pre, traced group index) time batching matches
    per-group batching AND compiles a single executable for all
    non-prior batches (no per-batch_idx retrace)."""
    from bayeslim_tpu.inference import LogProb

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:6]
    times = np.asarray([JD0 + i * 5e-4 for i in range(4)])

    rime_ref = RIME(sky, T, beam, arr, bls, [times[:2], times[2:]], freqs)
    vd_ref = rime_ref.run_batches(concat=True)

    rime_ix = RIME(sky, T, beam, arr, bls, [times[:2], times[2:]], freqs)
    rime_ix.enable_indexed_batching()
    vd_ix = rime_ix.run_batches(concat=True)
    assert np.allclose(np.asarray(vd_ix.data), np.asarray(vd_ref.data),
                       atol=1e-10)
    assert np.allclose(vd_ix.times, vd_ref.times)

    # LogProb accumulate over batches: same loss/grads, single vg cache
    # entry for batches > 0
    tgt = bl.VisData()
    tgt.setup_meta(T, arr.to_antpos())
    tgt.setup_data(bls, times[:2], freqs, pol="ee",
                   data=jnp.zeros((1, 1, len(bls), 2, len(freqs)),
                                  dtype=jnp.complex128))
    prob_ref = LogProb(rime_ref, [tgt, tgt])
    prob_ix = LogProb(rime_ix, [tgt, tgt])
    v1, g1 = prob_ref.value_and_grad()
    v2, g2 = prob_ix.value_and_grad()
    assert np.allclose(float(v1), float(v2), rtol=1e-12)
    for k in g1:
        assert np.allclose(np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-10)
    vg_keys = [k for k in prob_ix._jit_cache if k[0] == "vg"]
    assert len(vg_keys) == 2, vg_keys  # batch-0 (with prior) + the rest
    vg_keys_ref = [k for k in prob_ref._jit_cache if k[0] == "vg"]
    assert len(vg_keys_ref) == 2  # one per batch_idx without indexing


def test_indexed_batching_nonuniform_targets():
    """With per-batch targets whose covariance metadata differs, indexed
    batching must NOT collapse the jit cache (the closure bakes
    cov_logdet/cov_ndim statics): values match per-batch probs."""
    from bayeslim_tpu.inference import LogProb

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=2)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:6]
    times = np.asarray([JD0 + i * 5e-4 for i in range(6)])

    rime = RIME(sky, T, beam, arr, bls,
                [times[:2], times[2:4], times[4:]], freqs)
    rime.enable_indexed_batching()
    vd = rime.run_batches(concat=True)

    tgts = []
    for i, cov_scale in enumerate([1.0, 4.0, 9.0]):  # differing cov_logdet
        t = bl.VisData()
        t.setup_meta(T, arr.to_antpos())
        d = vd.data[:, :, :, 2 * i:2 * i + 2, :]
        t.setup_data(bls, times[2 * i:2 * i + 2], freqs, pol="ee", data=d,
                     cov=jnp.ones(d.shape) * cov_scale, cov_axis=None,
                     icov=jnp.ones(d.shape) / cov_scale)
        tgts.append(t)
    prob = LogProb(rime, tgts)
    # batches 1 and 2 have different cov metadata -> cache must NOT
    # collapse (the closure bakes cov_logdet into the executable)
    assert not prob._batches_uniform()
    v, g = prob.value_and_grad()

    # ground truth: three independent single-batch probs
    want = 0.0
    for i in range(3):
        r1 = RIME(sky, T, beam, arr, bls, times[2 * i:2 * i + 2], freqs)
        p1 = LogProb(r1, tgts[i], compute="like" if i else "post")
        want += float(p1())
    assert np.allclose(float(v) * 3, want, rtol=1e-10)

    # uniform targets DO collapse the cache
    prob_u = LogProb(rime, [tgts[0]] * 3)
    assert prob_u._batches_uniform()
    v_u, _ = prob_u.value_and_grad()
    vg_keys = [k for k in prob_u._jit_cache if k[0] == "vg"]
    assert len(vg_keys) == 2


def test_redundant_sim_expansion_identity():
    """sim_bls (one per redundant group) + data_bls expansion produces
    bit-identical visibilities AND LogProb gradients to simulating every
    baseline (reference sim->data index, rime_model.py:148-226). This is
    the production configuration benchmarked by bench.py --size *-red."""
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse
    from bayeslim_tpu.models.beam import AiryResponse
    from bayeslim_tpu.inference import LogProb
    from bayeslim_tpu.utils import healpix as hp
    import bayeslim_tpu as bl

    T = setup_Telescope()
    ants, antvecs = make_hex(3, D=15.0)
    freqs = np.linspace(100e6, 120e6, 8)
    arr = tm.ArrayModel(AntposDict(ants, antvecs), freqs=freqs, redtol=0.5)
    nside = 8
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    angs = np.stack([phi * 180 / np.pi, 90 - theta * 180 / np.pi])
    rng = np.random.default_rng(0)
    params = np.zeros((1, 1, 2, npix))
    params[0, 0, 0] = rng.uniform(1, 10, npix)
    params[0, 0, 1] = -2.5

    def mksky():
        R = PixelSkyResponse(freqs, spatial_mode="pixel",
                             freq_mode="powerlaw", f0=float(freqs[0]))
        return PixelSky(jnp.asarray(params), jnp.asarray(angs),
                        hp.nside2pixarea(nside), R=R)

    beam = PixelBeam(jnp.ones((1, 1, 1, 1, 2)) * 14.0, freqs,
                     R=AiryResponse(), pol="e", powerbeam=True, fov=180.0)
    bls = arr.get_bls(keep_autos=False)
    sim_bls = [r[0] for r in arr.reds if r[0][0] != r[0][1]]
    assert len(sim_bls) < len(bls)
    times = JD0 + np.arange(2) * 5e-4

    r_full = RIME(mksky(), T, beam, arr, bls, times, freqs)
    r_red = RIME(mksky(), T, beam, arr, sim_bls, times, freqs,
                 data_bls=bls)
    vf = jax.jit(lambda m: m.forward().data)(r_full)
    vr = jax.jit(lambda m: m.forward().data)(r_red)
    assert float(jnp.abs(vf - vr).max()) < 1e-10

    tgt = bl.VisData()
    tgt.setup_meta(T, arr.to_antpos())
    tgt.setup_data(bls, times, freqs, pol="ee", data=vf + (0.1 + 0.05j))
    outs = []
    for rm in (r_full, r_red):
        prob = LogProb(rm, tgt)
        pd = prob.collect_main_params()
        outs.append(prob.value_and_grad(pd))
    (v0, g0), (v1, g1) = outs
    assert abs(float(v1) - float(v0)) < 1e-6 * abs(float(v0))
    gmax = max(float(jnp.abs(g0[k]).max()) for k in g0)
    assert max(float(jnp.abs(g1[k] - g0[k]).max()) for k in g0) < 1e-10 * gmax


def test_reduce_by_redundancy_sufficient_stats():
    """Solving against redundantly-reduced data (icov-weighted group
    means + summed icov) gives IDENTICAL posterior gradients to
    expanding the model onto every baseline, and the chi^2 differs by
    exactly the returned constant — the O(Nred) likelihood for a
    redundant array (VisData.reduce_by_redundancy)."""
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse
    from bayeslim_tpu.models.beam import AiryResponse
    from bayeslim_tpu.inference import LogProb
    from bayeslim_tpu.utils import healpix as hp
    import bayeslim_tpu as bl

    T = setup_Telescope()
    ants, antvecs = make_hex(3, D=15.0)
    freqs = np.linspace(100e6, 120e6, 4)
    arr = tm.ArrayModel(AntposDict(ants, antvecs), freqs=freqs, redtol=0.5)
    nside = 8
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    angs = np.stack([phi * 180 / np.pi, 90 - theta * 180 / np.pi])
    rng = np.random.default_rng(1)
    params = np.zeros((1, 1, 2, npix))
    params[0, 0, 0] = rng.uniform(1, 10, npix)
    params[0, 0, 1] = -2.5

    def mksky():
        return PixelSky(
            jnp.asarray(params), jnp.asarray(angs), hp.nside2pixarea(nside),
            R=PixelSkyResponse(freqs, spatial_mode="pixel",
                               freq_mode="powerlaw", f0=float(freqs[0])))

    beam = PixelBeam(jnp.ones((1, 1, 1, 1, 2)) * 14.0, freqs,
                     R=AiryResponse(), pol="e", powerbeam=True, fov=180.0,
                     parameter=False)
    bls = arr.get_bls(keep_autos=False)
    sim_bls = [r[0] for r in arr.reds if r[0][0] != r[0][1]]
    reds = [r for r in arr.reds if r[0][0] != r[0][1]]
    times = JD0 + np.arange(2) * 5e-4

    r0 = RIME(mksky(), T, beam, arr, bls, times, freqs)
    vd_true = jax.jit(lambda m: m.forward().data)(r0)
    noise = (rng.normal(size=vd_true.shape)
             + 1j * rng.normal(size=vd_true.shape)) * 0.1
    icov = jnp.asarray(rng.uniform(0.5, 2.0, vd_true.shape))
    tgt = bl.VisData()
    tgt.setup_meta(T, arr.to_antpos())
    tgt.setup_data(bls, times, freqs, pol="ee", data=vd_true + noise,
                   cov=1.0 / icov, cov_axis=None, icov=icov)

    r_exp = RIME(mksky(), T, beam, arr, sim_bls, times, freqs, data_bls=bls)
    vA, gA = LogProb(r_exp, tgt).value_and_grad(
        LogProb(r_exp, tgt).collect_main_params())

    tgt_red, const = tgt.reduce_by_redundancy(reds=reds)
    r_red = RIME(mksky(), T, beam, arr, sim_bls, times, freqs)
    pB = LogProb(r_red, tgt_red)
    vB, gB = pB.value_and_grad(pB.collect_main_params())

    gmax = max(float(jnp.abs(gA[k]).max()) for k in gA)
    assert max(float(jnp.abs(gA[k] - gB[k]).max()) for k in gA) < 1e-12 * gmax
    assert np.isclose(float(vA), float(vB) + const, rtol=1e-12)

    # unit weights (icov=None): group weight must be the baseline COUNT
    # (hex groups have unequal sizes) — identity still holds
    tgt_u = bl.VisData()
    tgt_u.setup_meta(T, arr.to_antpos())
    tgt_u.setup_data(bls, times, freqs, pol="ee", data=vd_true + noise)
    assert len({len(r) for r in reds}) > 1  # genuinely unequal groups
    vAu, gAu = LogProb(r_exp, tgt_u).value_and_grad(
        LogProb(r_exp, tgt_u).collect_main_params())
    tgt_ru, const_u = tgt_u.reduce_by_redundancy(reds=reds)
    pBu = LogProb(r_red, tgt_ru)
    vBu, gBu = pBu.value_and_grad(pBu.collect_main_params())
    gmax = max(float(jnp.abs(gAu[k]).max()) for k in gAu)
    assert max(float(jnp.abs(gAu[k] - gBu[k]).max())
               for k in gAu) < 1e-12 * gmax
    assert np.isclose(float(vAu), float(vBu) + const_u, rtol=1e-12)
