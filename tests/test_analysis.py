"""Analysis layer tests: FFT/delay, filters, imaging (reference
tests/test_filt.py, test_imaging.py; BASELINE config #5 components)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bayeslim_tpu as bl
from bayeslim_tpu.models.fft import FFT, PeakDelay, gen_window, vis_wedge
from bayeslim_tpu.models.filt import (
    MatFilter, GPFilter, LstSqFilter, WedgeFilter, rbf_cov, exp_cov,
    sinc_cov, gauss_sinc_cov, phasor_mat, gen_cov_modes,
)
from bayeslim_tpu.models.imaging import VisMapper, make_map, compute_P
from bayeslim_tpu.data.containers import VisData


def test_fft_tone():
    """FFT of a pure tone peaks at the right delay."""
    Nf = 128
    df = 1e6
    freqs = np.arange(Nf) * df + 100e6
    tau = 300e-9  # 300 ns delay (Nyquist is +-500 ns at 1 MHz channels)
    y = jnp.asarray(np.exp(2j * np.pi * freqs * tau))
    ft = FFT(dim=0, N=Nf, dx=df, fftshift=True)
    Y = ft(y)
    delays = ft.freqs
    peak = delays[int(np.argmax(np.abs(np.asarray(Y))))]
    assert abs(peak - tau) < 1.0 / (Nf * df)


def test_peak_delay_quinn():
    """Quinn estimator resolves sub-bin delays; vectorized over axes."""
    Nf = 64
    df = 1e6
    freqs = np.arange(Nf) * df
    taus = np.asarray([310e-9, -125e-9, 402.5e-9])
    y = np.exp(2j * np.pi * freqs[None, :] * taus[:, None])
    pd = PeakDelay(dim=1, N=Nf, dx=df, ndim=2, window="bh")
    est = np.asarray(pd(jnp.asarray(y)))
    # bin width is 15.6 ns; Quinn + BH window resolves to ~1/4 bin
    assert np.abs(est - taus).max() < 4e-9


def test_gen_window():
    for w in ["hann", "bh", "tukey", "bh7", "cs9", "boxcar"]:
        kwargs = {"alpha": 0.5} if w == "tukey" else {}
        win = gen_window(w, 32, **kwargs)
        assert win.shape == (32,)
    win = gen_window("hann", 32, edgecut=(4, 4))
    assert np.asarray(win[:4]).sum() == 0 and np.asarray(win[-4:]).sum() == 0


def test_mat_filter():
    rng = np.random.default_rng(0)
    G = jnp.asarray(rng.normal(size=(8, 8)))
    y = jnp.asarray(rng.normal(size=(3, 8)))
    f = MatFilter(G, dim=-1)
    out = np.asarray(f(y))
    assert np.allclose(out, np.asarray(y) @ np.asarray(G).T)
    fr = MatFilter(G, dim=-1, residual=True)
    assert np.allclose(np.asarray(fr(y)), np.asarray(y) - out)


def test_gp_filter_removes_smooth_component():
    """Wiener filter separates a smooth foreground from noise."""
    rng = np.random.default_rng(1)
    Nf = 64
    freqs = np.linspace(100e6, 120e6, Nf)
    # smooth signal + white noise
    smooth = 10 * np.sin(2 * np.pi * freqs / 40e6) + 20
    noise = rng.normal(0, 0.5, Nf)
    y = jnp.asarray(smooth + noise)

    Cs = rbf_cov(freqs, ls=10e6, amp=100.0)
    Cn = jnp.eye(Nf) * 0.25
    gp = GPFilter(Cs, Cn, dim=-1)
    est = np.asarray(gp(y))
    # MAP estimate should track the smooth part much better than raw
    assert np.abs(est - smooth).std() < 0.3
    # residual mode suppresses smooth component
    gpr = GPFilter(Cs, Cn, dim=-1, residual=True)
    res = np.asarray(gpr(y))
    assert np.abs(res).std() < 1.0
    # variance matrix is PSD-ish
    assert (np.diag(np.asarray(gp.V)) > -1e-8).all()


def test_lstsq_filter():
    """LstSq filter projects out polynomial modes."""
    from bayeslim_tpu.models.linear_model import gen_poly_A
    rng = np.random.default_rng(2)
    x = np.linspace(-1, 1, 32)
    A = gen_poly_A(x, 3)
    coeffs = rng.normal(size=3)
    poly = np.asarray(A) @ coeffs
    noise = rng.normal(0, 0.1, 32)
    y = jnp.asarray(poly + noise)
    f = LstSqFilter(A=A, dim=-1, residual=True)
    res = np.asarray(f(y))
    # polynomial removed, noise remains
    assert np.abs(res).max() < 0.5
    assert np.corrcoef(res, poly)[0, 1] ** 2 < 0.2


def test_wedge_filter():
    rng = np.random.default_rng(3)
    bls = [(0, 1), (0, 2), (1, 2)]
    data = jnp.asarray(rng.normal(size=(1, 1, 3, 2, 8)) + 0j)
    vd = VisData()
    vd.setup_data(bls, np.arange(2.0), np.linspace(100e6, 110e6, 8),
                  pol="ee", data=data)
    # filter 1 zeroes its bls, filter 2 passes through
    f0 = MatFilter(jnp.zeros((8, 8)), dim=-1)
    f1 = MatFilter(jnp.eye(8), dim=-1)
    wf = WedgeFilter([f0, f1], {0: [bls[0]], 1: [bls[1], bls[2]]})
    out = wf(vd)
    assert np.allclose(np.asarray(out.data[:, :, 0]), 0)
    assert np.allclose(np.asarray(out.data[:, :, 1:]), np.asarray(data[:, :, 1:]))


def test_cov_kernels():
    x = np.linspace(0, 10, 16)
    for fn in (lambda: rbf_cov(x, 2.0), lambda: exp_cov(x, 2.0),
               lambda: sinc_cov(x, 2.0), lambda: gauss_sinc_cov(x, 2.0, 3.0)):
        C = np.asarray(fn())
        assert C.shape == (16, 16)
        assert np.allclose(np.diag(C), C[0, 0])
        assert np.allclose(C, C.T)
    ph = np.asarray(phasor_mat(x, 0.5))
    assert np.allclose(np.abs(ph), 1.0)
    A, evals = gen_cov_modes(rbf_cov(x, 2.0), N=4)
    assert A.shape == (16, 4)
    assert (np.diff(np.asarray(evals)) <= 1e-12).all()


def test_imaging_point_source():
    """A single point source images back to its own location."""
    from tests.test_rime import (setup_Telescope, setup_Array,
                                 setup_UniformBeam, JD0)
    from bayeslim_tpu.models.sky import PointSky, PointSkyResponse
    T = setup_Telescope()
    freqs = np.linspace(130e6, 150e6, 8)
    arr = setup_Array(N=3, freqs=freqs)

    ra0 = T.JD2RA(JD0)
    dec0 = -30.72
    angs = np.asarray([[ra0], [dec0]])
    params = np.ones((1, 1, 8, 1)) * 5.0
    sky = PointSky(jnp.asarray(params), jnp.asarray(angs),
                   R=PointSkyResponse(freqs, freq_mode="channel"))
    beam = setup_UniformBeam(freqs)
    bls = arr.get_bls(keep_autos=False)
    rime = bl.RIME(sky, T, beam, arr, bls, np.asarray([JD0]), freqs)
    vd = rime.forward()
    vd.setup_meta(T, arr.to_antpos())

    # image a grid around the source
    dgrid = np.linspace(-5, 5, 21)
    rr, dd = np.meshgrid(ra0 + dgrid, dec0 + dgrid)
    mapper = VisMapper(vd, rr.ravel(), dd.ravel(), fov=180.0)
    maps, P = mapper.make_map(return_P=True)
    m = np.asarray(maps).mean(0).reshape(21, 21)
    # peak at the center pixel
    peak = np.unravel_index(np.argmax(m), m.shape)
    assert peak == (10, 10), f"peak at {peak}"
    assert np.asarray(P).min() >= 0


def test_vis_wedge():
    rng = np.random.default_rng(4)
    bls = [(0, 1), (0, 2)]
    data = jnp.asarray(rng.normal(size=(1, 1, 2, 2, 16)) +
                       1j * rng.normal(size=(1, 1, 2, 2, 16)))
    vd = VisData()
    vd.setup_data(bls, np.arange(2.0), np.linspace(100e6, 115e6, 16),
                  pol="ee", data=data)
    # no antpos on this VisData: pass the (trivial) redundant groups
    # explicitly (vis_wedge always bl_averages, like the reference)
    wvd, FT = vis_wedge(vd, ravg_kwgs={"reds": [[(0, 1)], [(0, 2)]]},
                        window="bh", square=True)
    assert wvd.data.shape == vd.data.shape
    assert (np.asarray(wvd.data) >= 0).all()  # squared power
    assert FT.freqs is not None  # delay bins


def test_time_average_and_nn_interp():
    rng = np.random.default_rng(5)
    bls = [(0, 1), (0, 2)]
    freqs = np.linspace(100e6, 110e6, 4)
    times = 2458168.0 + np.arange(6) * 1e-4
    # constant-in-time data averages to itself
    base = rng.normal(size=(1, 1, 2, 1, 4)) + 1j * rng.normal(size=(1, 1, 2, 1, 4))
    data = jnp.asarray(np.tile(base, (1, 1, 1, 6, 1)))
    vd = VisData()
    vd.setup_data(bls, times, freqs, pol="ee", data=data,
                  cov=jnp.ones(data.shape), cov_axis=None,
                  icov=jnp.ones(data.shape))
    avg = vd.time_average(time_inds=[np.arange(3), np.arange(3, 6)])
    assert avg.Ntimes == 2
    assert np.allclose(np.asarray(avg.data), np.tile(base, (1, 1, 1, 2, 1)))
    assert np.allclose(np.asarray(avg.icov), 3.0)  # noise averaged down

    nn = vd.time_nn_interp(times=times[:2] + 2e-5, rephase=False,
                           inplace=False)
    assert nn.Ntimes == 2
    assert np.allclose(np.asarray(nn.data), np.asarray(data[:, :, :, :2]))


def test_average_data_function():
    from bayeslim_tpu.data.containers import average_data
    rng = np.random.default_rng(6)
    d = jnp.asarray(rng.normal(size=(3, 8)))
    index = np.asarray([0, 0, 1, 1, 2, 2, 3, 3])
    avg, wsum, acov = average_data(d, -1, index, 4)
    expected = np.asarray(d).reshape(3, 4, 2).mean(-1)
    assert np.allclose(np.asarray(avg), expected)
    assert np.allclose(np.asarray(wsum), 2.0)
    assert np.allclose(np.asarray(acov), 0.5)


def test_caldata_inflate_4pol():
    from bayeslim_tpu.data.containers import CalData
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.normal(size=(1, 1, 3, 1, 4)) + 0j)
    cd = CalData()
    cd.setup_data([0, 1, 2], np.asarray([0.0]), np.linspace(100e6, 110e6, 4),
                  pol="ee", data=g)
    cd4 = cd.inflate_to_4pol()
    assert cd4.data.shape == (2, 2, 3, 1, 4)
    assert np.allclose(np.asarray(cd4.data[0, 0]), np.asarray(g[0, 0]))
    assert np.allclose(np.asarray(cd4.data[0, 1]), 0)


def test_sfb_binning():
    from bayeslim_tpu.ops.sph_harm import sfb_binning
    k = np.asarray([0.1, 0.12, 0.3, 0.32, 0.5])
    p = jnp.asarray([[1.0, 3.0, 2.0, 4.0, 5.0]])
    out, vout = sfb_binning(p, k, np.asarray([0.1, 0.3, 0.5]))
    assert out.shape == (1, 3)
    assert np.allclose(np.asarray(out)[0], [2.0, 3.0, 5.0])


def test_lm_poly_compression():
    from bayeslim_tpu.models.beam_ylm import YlmResponse
    from bayeslim_tpu.ops.sph_harm import gen_lm
    l, m = gen_lm(5)
    freqs = np.linspace(100e6, 110e6, 2)
    R = YlmResponse(l, m, freqs, mode="interpolate", pixtype="healpix",
                    nside=8, Ylm_kwargs=dict(method="sphere",
                                             high_prec=False))
    R.lm_poly_setup({"Ndeg": 2})
    # params hold 2 poly weights per m group
    nw = R._lm_poly_ncoeff_in
    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.normal(size=(1, 1, 1, 2, nw)) + 0j)
    full = R.lm_poly_forward(w)
    assert full.shape == (1, 1, 1, 2, len(l))


def test_time_average_rephase_coherent():
    """Drift-scan rephased averaging preserves amplitude (a wrong sign
    would decohere worse than no rephasing — regression test for the
    verified sign convention)."""
    from tests.test_rime import (setup_Telescope, setup_PointSky,
                                 setup_Array, setup_UniformBeam, JD0)
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_UniformBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:6]
    times = JD0 + np.arange(8) * 20e-4
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs)
    vd = rime.forward()
    vd.setup_meta(T, arr.to_antpos())
    raw = float(jnp.abs(vd.data).mean())
    avg = float(jnp.abs(vd.time_average(time_inds=[np.arange(8)]).data).mean())
    rep = float(jnp.abs(vd.time_average(time_inds=[np.arange(8)],
                                        rephase=True).data).mean())
    assert rep > 0.99 * raw          # coherent
    assert rep > avg                  # better than naive averaging


def test_cosmology_background_accuracy():
    """Cosmology's comoving-distance table matches a direct
    high-accuracy quadrature of its own documented background (Dc(z) =
    c/H0 int dz/E), the 21 cm frequency<->redshift mapping is exact, and
    LoS conversions are self-consistent (reference cosmology.py; the
    reference delegates to astropy, absent here)."""
    from bayeslim_tpu.models.cosmology import Cosmology
    from scipy.integrate import quad
    cosmo = Cosmology()
    c_kms = 299792.458
    for z in (0.5, 1.0, 8.0, 20.0):
        dc_quad = c_kms / cosmo.H0 * quad(
            lambda zz: 1.0 / cosmo.Efunc(zz), 0.0, z, limit=400)[0]
        dc = float(np.asarray(cosmo.comoving_distance(z)))
        assert abs(dc - dc_quad) < 1e-3 * dc_quad, (z, dc, dc_quad)
    # flat universe: transverse == radial comoving
    assert np.allclose(float(np.asarray(
        cosmo.comoving_transverse_distance(2.0))),
        float(np.asarray(cosmo.comoving_distance(2.0))))
    # 21 cm line: z = f21/f - 1 exactly, and f2z/z2f invert
    f = 150e6
    z21 = cosmo.f2z(f)
    assert abs(z21 - (1420.405751768e6 / f - 1)) < 1e-6
    assert abs(cosmo.z2f(z21) - f) < 1e-3
    # r2f(f2r(f)) round trip through the distance table
    assert abs(float(np.asarray(cosmo.r2f(cosmo.f2r(f)))) - f) < 50.0
    # sanity: the standard LCDM benchmark scale (Dc(z=1) ~ 3.4 Gpc for
    # Planck-like parameters)
    dc1 = float(np.asarray(cosmo.comoving_distance(1.0)))
    assert 3.2e3 < dc1 < 3.5e3


def test_peakdelay_k_and_trainer_props():
    """PeakDelay.k public Quinn kappa (reference fft.py:154) and
    Trainer.loss/.times array properties (reference optim.py:1827)."""
    pd = PeakDelay(dim=1, N=16, dx=1e6, ndim=2)
    x = jnp.asarray([0.3, 0.7])
    expected = 0.25 * np.log(3 * np.asarray(x) ** 2 + 6 * np.asarray(x) + 1) \
        - np.sqrt(6) / 24 * np.log((np.asarray(x) + 1 - np.sqrt(2 / 3))
                                   / (np.asarray(x) + 1 + np.sqrt(2 / 3)))
    assert np.allclose(np.asarray(pd.k(x)), expected, atol=1e-12)

    from bayeslim_tpu.inference.trainer import Trainer
    tr = Trainer.__new__(Trainer)
    tr.loss_history = [3.0, 2.0, 1.5]
    tr.time_history = [0.1, 0.2, 0.3]
    assert np.allclose(tr.loss, [3.0, 2.0, 1.5])
    assert np.allclose(tr.times, [0.1, 0.2, 0.3])
