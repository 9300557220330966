"""Spherical-harmonic subsystem tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from bayeslim_tpu.ops import sph_harm as sh
from bayeslim_tpu.ops.special import Plm, Qlm, jl
from bayeslim_tpu.utils import healpix as hp
from bayeslim_tpu.models.cosmology import Cosmology


def test_gen_lm():
    l, m = sh.gen_lm(3)
    assert l.shape == m.shape
    assert (np.abs(m) <= l).all()
    assert len(l) == 10  # (lmax+1)(lmax+2)/2 for real field


def test_ylm_vs_scipy_sphere():
    """Full-sphere integer Ylm matches scipy.sph_harm_y."""
    from scipy.special import sph_harm_y
    nside = 8
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    l, m = sh.gen_lm(4)
    Y, norm, am = sh.gen_sph2pix(theta, phi, l, m, method="sphere",
                                 high_prec=True)
    Y = np.asarray(Y)
    for i in range(len(l)):
        ref = sph_harm_y(int(l[i]), int(m[i]), theta, phi)
        assert np.abs(Y[i] - ref).max() < 1e-10, f"l={l[i]}, m={m[i]}"
    # fast scipy path agrees
    Y2, _, _ = sh.gen_sph2pix(theta, phi, l, m, method="sphere",
                              high_prec=False)
    assert np.abs(np.asarray(Y2) - Y).max() < 1e-10


def test_alm_roundtrip():
    """Synthesize a map from random alm (full +/-m basis), invert by
    least squares exactly."""
    rng = np.random.default_rng(0)
    nside = 8
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    lmax = 5
    l, m = sh.gen_lm(lmax, real_field=False)
    alm_model = sh.AlmModel(l, m)
    alm_model.generate_Ylm(theta, phi, method="sphere", high_prec=False)

    # conjugate-symmetric alm -> real map
    alm = rng.normal(size=len(l)) + 1j * rng.normal(size=len(l))
    alm[m == 0] = alm[m == 0].real
    for i in range(len(l)):
        if m[i] <= 0:
            continue
        j = np.where((l == l[i]) & (m == -m[i]))[0][0]
        alm[j] = (-1.0) ** m[i] * np.conj(alm[i])
    alm = jnp.asarray(alm)

    mp = alm_model.forward_alm(alm)
    assert mp.shape == (npix,)
    assert np.abs(np.asarray(mp).imag).max() < 1e-12  # real map

    # least squares inversion recovers the alm exactly (well-conditioned)
    rec = alm_model.least_squares(mp)
    assert np.abs(np.asarray(rec) - np.asarray(alm)).max() < 1e-8

    # truncated real-field basis: forward with alm_mult=2 equals full basis
    l2, m2 = sh.gen_lm(lmax)
    model2 = sh.AlmModel(l2, m2, real_output=True)
    model2.generate_Ylm(theta, phi, method="sphere", high_prec=False)
    keep = np.asarray([np.where((l == la) & (m == ma))[0][0]
                       for la, ma in zip(l2, m2)])
    mp2 = model2.forward_alm(alm[keep], alm_mult=model2.alm_mult)
    assert np.abs(np.asarray(mp2) - np.asarray(mp).real).max() < 1e-10


def test_alm_separable_equals_full():
    rng = np.random.default_rng(1)
    theta_g = np.linspace(0.2, 1.2, 12)
    phi_g = np.linspace(0, 2 * np.pi, 24, endpoint=False)
    l, m = sh.gen_lm(3)
    th, ph = sh.AlmModel.setup_angs(theta_g, phi_g, separable=True)

    am_full = sh.AlmModel(l, m)
    am_full.generate_Ylm(th, ph, method="sphere", high_prec=False)
    am_sep = sh.AlmModel(l, m)
    am_sep.generate_Ylm(theta_g, phi_g, separable=True, method="sphere",
                        high_prec=False)

    alm = jnp.asarray(rng.normal(size=len(l)) + 1j * rng.normal(size=len(l)))
    f1 = np.asarray(am_full.forward_alm(alm))
    f2 = np.asarray(am_sep.forward_alm(alm))
    assert np.abs(f1 - f2).max() < 1e-10


def test_compute_lm_cap():
    """Cut-sky cap modes satisfy the Neumann boundary condition."""
    theta_max = np.radians(40.0)
    l, m = sh.compute_lm(2 * np.pi, 2, 0.0, theta_max, lmax=12, dl=0.2,
                         high_prec=True)
    assert len(l) > 3
    assert (m <= 2 + 1e-9).all()
    # check dP/dtheta ~ 0 at boundary for non-sectoral modes
    x = np.cos(np.asarray([theta_max]))
    for li, mi in zip(l, m):
        if np.isclose(li, mi) or li < 1e-3:
            continue  # sectoral/monopole added regardless of BC
        dP = float(Plm(li, mi, x, deriv=True, high_prec=True))
        P = float(Plm(li, mi, x, high_prec=True))
        assert abs(dP) < 1e-4 * max(abs(P), 1.0), (li, mi, dP)


def test_cutsky_ylm_forward():
    """Cap-mode Ylm synthesis through AlmModel works on the cut sky."""
    theta_max = np.radians(40.0)
    l, m = sh.compute_lm(2 * np.pi, 2, 0.0, theta_max, lmax=10, dl=0.25)
    nside = 16
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    cut = theta < theta_max
    Y, norm, am = sh.gen_sph2pix(theta[cut], phi[cut], l, m, method="cap",
                                 theta_crit=theta_max)
    assert np.isfinite(np.asarray(Y)).all()
    rng = np.random.default_rng(0)
    alm = jnp.asarray(rng.normal(size=len(l)) + 1j * rng.normal(size=len(l)))
    model = sh.AlmModel(l, m, real_output=True)
    model.setup_Ylm(Y, alm_mult=am)
    mp = model.forward_alm(alm)
    assert mp.shape == (int(cut.sum()),)
    assert np.isfinite(np.asarray(mp)).all()


def test_sph_bessel_kln_and_gln():
    cosmo = Cosmology()
    freqs = np.linspace(150e6, 160e6, 16)
    gln, kbins = sh.gen_bessel2freq([0.0, 1.0], freqs, cosmo=cosmo, kmax=0.06)
    assert 0.0 in gln and 1.0 in gln
    for ll, g in gln.items():
        assert g.shape[0] == 16
        assert g.shape[1] == len(kbins[ll])
        assert np.isfinite(np.asarray(g)).all()
    # k_ln satisfy the Neumann BC at r_max: d j_l(k r)/dr = 0
    r = cosmo.f2r(freqs)
    for k in kbins[0.0][:3]:
        d = float(jl(0.0, np.asarray([k * r.max()]), deriv=True))
        assert abs(d) < 1e-6


def test_sfb_model():
    cosmo = Cosmology()
    freqs = np.linspace(150e6, 160e6, 8)
    l = np.asarray([0.0, 0.0, 1.0])
    m = np.asarray([0.0, 0.0, 1.0])
    gln, kbins = sh.gen_bessel2freq([0.0, 1.0], freqs, cosmo=cosmo, kmax=0.06)
    nk = max(len(kbins[0.0]), len(kbins[1.0]))
    sfb = sh.SFBModel(l, m, gln, kbins)
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.normal(size=(1, 1, nk, 3)))
    out = sfb(params)
    assert out.shape == (1, 1, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_ylm_response_beam_in_rime():
    """YlmResponse beam (interpolate mode) runs inside the RIME."""
    import bayeslim_tpu as bl
    from bayeslim_tpu.models.beam_ylm import YlmResponse
    from tests.test_rime import (setup_Telescope, setup_PointSky,
                                 setup_Array, JD0)
    import jax

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)

    lmax = 3
    l, m = sh.gen_lm(lmax)
    R = YlmResponse(l, m, freqs, mode="interpolate", pixtype="healpix",
                    nside=8, powerbeam=True,
                    Ylm_kwargs=dict(method="sphere", high_prec=False))
    # smooth axisymmetric beam: power in l modes, m=0
    rng = np.random.default_rng(0)
    params = np.zeros((1, 1, 1, 4, len(l)), dtype=complex)
    params[..., (m == 0)] = [1.0, 0.5, 0.2, 0.05]
    beam = bl.PixelBeam(jnp.asarray(params), freqs, R=R, pol="e",
                        powerbeam=True, fov=180.0)
    bls = arr.get_bls(keep_autos=False)[:3]
    rime = bl.RIME(sky, T, beam, arr, bls, np.asarray([JD0]), freqs)
    vd = rime.forward()
    assert np.isfinite(np.asarray(vd.data)).all()
    assert np.abs(np.asarray(vd.data)).max() > 0

    # gradient flows to beam alm params
    pd = bl.model2pdict(rime)
    g = jax.grad(lambda p: jnp.sum(jnp.abs(rime.updated(p).forward().data) ** 2))(pd)
    assert np.abs(np.asarray(g["beam.params"])).max() > 0


def test_pixelsky_alm_mode():
    """PixelSkyResponse spatial_mode='alm' forwards a_lm skies."""
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse
    nside = 8
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    freqs = np.linspace(100e6, 110e6, 3)
    l, m = sh.gen_lm(4)
    spat = sh.AlmModel(l, m, real_output=True)
    spat.generate_Ylm(theta, phi, method="sphere", high_prec=False)
    R = PixelSkyResponse(freqs, spatial_mode="alm", freq_mode="channel",
                         spat_LM=spat)
    rng = np.random.default_rng(0)
    alm = rng.normal(size=(1, 1, 3, len(l))) + 1j * rng.normal(size=(1, 1, 3, len(l)))
    angs = np.stack([phi * 180 / np.pi, 90 - theta * 180 / np.pi])
    sky = PixelSky(jnp.asarray(alm), jnp.asarray(angs),
                   hp.nside2pixarea(nside), R=R)
    md = sky.forward()
    assert md.data.shape == (1, 1, 3, npix)
    assert np.isrealobj(np.asarray(md.data))


def test_write_ylm_extras_roundtrip(tmp_path):
    """write_Ylm stores reference extras (D/pxarea datasets, scalar
    attrs like history/theta_min — reference sph_harm.py:620-713)."""
    import h5py
    theta = np.linspace(0.1, 1.0, 12)
    phi = np.linspace(0.0, 2.0, 12)
    l, m = sh.gen_lm(3)
    Y, norm, am = sh.gen_sph2pix(theta, phi, l, m, method="sphere")
    fn = str(tmp_path / "ylm.h5")
    D = np.eye(len(l))
    sh.write_Ylm(fn, np.asarray(Y), np.stack([theta, phi]), l, m,
                 D=D, pxarea=0.01, history="test", theta_min=0.1)
    with h5py.File(fn, "r") as f:
        assert np.allclose(f["D"][()], D)
        assert f.attrs["pxarea"] == 0.01
        assert f.attrs["history"] == "test"
        assert f.attrs["theta_min"] == 0.1


def test_sph_bessel_kln_decimate_kzero():
    """decimate keeps alternate roots; add_kzero prepends k=0 for l=0
    (reference sph_harm.py:1171-1243)."""
    k_full = sh.sph_bessel_kln(0.0, 100.0, 200.0, 0.08)
    k_dec = sh.sph_bessel_kln(0.0, 100.0, 200.0, 0.08, decimate=True)
    assert np.allclose(k_dec, k_full[::2])
    k_z = sh.sph_bessel_kln(0.0, 100.0, 200.0, 0.08, add_kzero=True)
    assert k_z[0] == 0.0 and np.allclose(k_z[1:], k_full)
    k_z1 = sh.sph_bessel_kln(1.0, 100.0, 200.0, 0.08, add_kzero=True)
    assert k_z1[0] != 0.0  # only l == 0 gets the k=0 mode


def test_gen_bessel2freq_r_and_kbins():
    """Reference-compat r= (skip cosmology) and kbins= (skip root
    solve) paths of gen_bessel2freq (reference sph_harm.py:955-1086)."""
    cosmo = Cosmology()
    freqs = np.linspace(150e6, 160e6, 16)
    gln0, kb0 = sh.gen_bessel2freq([0.0], freqs, cosmo=cosmo, kmax=0.06)
    # r= path reproduces the cosmology mapping exactly
    r = cosmo.f2r(freqs)
    gln1, kb1 = sh.gen_bessel2freq([0.0], freqs, r=r, kmax=0.06)
    assert np.allclose(kb0[0.0], kb1[0.0])
    assert np.allclose(np.asarray(gln0[0.0]), np.asarray(gln1[0.0]))
    # kbins= path skips the solve and uses the provided wavevectors
    gln2, kb2 = sh.gen_bessel2freq([0.0], freqs, cosmo=cosmo,
                                   kbins={0.0: kb0[0.0]})
    assert np.allclose(kb2[0.0], kb0[0.0])
    assert np.allclose(np.asarray(gln2[0.0]), np.asarray(gln0[0.0]))


def test_setup_multigrid_forward():
    """setup_multigrid_forward concatenates per-grid outputs along Npix
    with optional reindex; clear_multigrid restores the single-grid
    path; the angle-hashed cache serves get_Ylm (reference sph_harm.py
    :1496-1745)."""
    rng = np.random.default_rng(5)
    lmax = 3
    l, m = sh.gen_lm(lmax, real_field=False)
    am = sh.AlmModel(l, m)

    # two small angle sets
    th1, ph1 = np.array([40.0, 60.0]), np.array([10.0, 100.0])
    th2, ph2 = np.array([80.0, 100.0, 120.0]), np.array([200.0, 300.0, 40.0])
    am.generate_Ylm(np.radians(th1), np.radians(ph1), method="sphere",
                    high_prec=False)
    Y1, am1 = am.Ylm, am.alm_mult
    am.generate_Ylm(np.radians(th2), np.radians(ph2), method="sphere",
                    high_prec=False)
    Y2, am2 = am.Ylm, am.alm_mult

    alm = jnp.asarray(rng.normal(size=len(l)) + 1j * rng.normal(size=len(l)))
    out1 = np.asarray(am.forward_alm(alm, Ylm=Y1, alm_mult=am1))
    out2 = np.asarray(am.forward_alm(alm, Ylm=Y2, alm_mult=am2))

    idx = np.array([4, 3, 2, 1, 0])
    am.setup_multigrid_forward([th1, th2], [ph1, ph2], [Y1, Y2],
                               [am1, am2], idx=idx)
    out = np.asarray(am.forward_alm(alm))
    assert np.allclose(out, np.concatenate([out1, out2], axis=-1)[..., idx])

    # grids landed in the angle-hashed cache
    Yc, amc = am.get_Ylm(th1, ph1)
    assert Yc is Y1
    am.clear_Ylm_cache()
    am.clear_multigrid()
    assert am.grids is None and am.grid_idx is None
    out_single = np.asarray(am.forward_alm(alm))
    assert np.allclose(out_single, out2)   # last generated Ylm remains
