"""Tests for the self-contained HEALPix ring-scheme implementation."""
import numpy as np
import jax.numpy as jnp

from bayeslim_tpu.utils import healpix as hp
from bayeslim_tpu.utils.interp import PixInterp, bipoly_interp_weights, interp_gather


def test_npix_roundtrip():
    for nside in [1, 2, 4, 8, 32]:
        assert hp.npix2nside(hp.nside2npix(nside)) == nside
    assert hp.nside2npix(8) == 768


def test_pix2ang_ang2pix_roundtrip():
    for nside in [1, 2, 4, 16, 64]:
        npix = hp.nside2npix(nside)
        p = np.arange(npix)
        theta, phi = hp.pix2ang(nside, p)
        assert (theta >= 0).all() and (theta <= np.pi).all()
        assert (phi >= 0).all() and (phi < 2 * np.pi + 1e-12).all()
        p2 = hp.ang2pix(nside, theta, phi)
        assert (p2 == p).all(), f"roundtrip failed at nside={nside}"


def test_pixel_area_consistency():
    # sum of pixel solid angles = 4 pi by construction; check z distribution
    nside = 16
    npix = hp.nside2npix(nside)
    theta, _ = hp.pix2ang(nside, np.arange(npix))
    z = np.cos(theta)
    # equal-area implies uniform z distribution: mean ~ 0, var ~ 1/3
    assert abs(z.mean()) < 1e-12
    assert np.isclose(z.var(), 1 / 3, atol=1e-3)


def test_ring_info_matches_pix2ang():
    nside = 8
    z, start, npr, shift = hp.ring_info(nside)
    assert npr.sum() == hp.nside2npix(nside)
    # first pixel of each ring matches pix2ang
    theta, phi = hp.pix2ang(nside, start)
    assert np.allclose(np.cos(theta), z, atol=1e-12)
    expected_phi = (shift) * 2 * np.pi / npr
    assert np.allclose(phi, expected_phi, atol=1e-12)


def test_interp_weights_exact_at_centers():
    nside = 8
    npix = hp.nside2npix(nside)
    p = np.arange(0, npix, 7)
    theta, phi = hp.pix2ang(nside, p)
    inds, wgts = hp.get_interp_weights(nside, theta, phi)
    assert np.allclose(wgts.sum(0), 1.0)
    # at pixel centers one neighbor should carry ~all weight and be correct
    best = inds[np.argmax(wgts, axis=0), np.arange(len(p))]
    w = np.max(wgts, axis=0)
    assert (best[w > 0.99] == p[w > 0.99]).mean() > 0.95


def test_healpix_interp_smooth_function():
    # interpolating a smooth function should be accurate to O(pixel^2)
    nside = 32
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    f = np.cos(theta) ** 2 + 0.3 * np.sin(theta) * np.cos(phi)

    rng = np.random.default_rng(0)
    t = rng.uniform(0.2, np.pi - 0.2, 500)
    p = rng.uniform(0, 2 * np.pi, 500)
    truth = np.cos(t) ** 2 + 0.3 * np.sin(t) * np.cos(p)

    interp = PixInterp("healpix", nside=nside)
    inds, wgts = interp.precompute(t / np.pi * 180, p / np.pi * 180)
    est = np.asarray(interp_gather(jnp.asarray(f), inds, wgts))
    assert np.abs(est - truth).max() < 5e-3


def test_rect_bipoly_interp():
    # 2D polynomial should be captured exactly by matching-degree interp
    tg = np.linspace(0, 90, 31)  # theta grid [deg]
    pg = np.linspace(0, 360, 73)[:-1]  # phi grid [deg], wraps
    P, T = np.meshgrid(pg, tg)
    f = (0.1 * T ** 2 + 3 * T + 5).ravel()  # quadratic in theta only

    rng = np.random.default_rng(1)
    tnew = rng.uniform(5, 85, 200)
    pnew = rng.uniform(0, 360, 200)
    truth = 0.1 * tnew ** 2 + 3 * tnew + 5

    interp = PixInterp("rect", interp_mode="linear,quadratic",
                       theta_grid=tg, phi_grid=pg)
    inds, wgts = interp.precompute(tnew, pnew)
    est = np.asarray(interp_gather(jnp.asarray(f), inds, wgts))
    assert np.allclose(est, truth, rtol=1e-10, atol=1e-8)


def test_rect_phi_wrap():
    tg = np.linspace(0, 90, 10)
    pg = np.arange(0, 360, 5.0)
    P, T = np.meshgrid(pg, tg)
    f = np.cos(P * np.pi / 180).ravel()
    interp = PixInterp("rect", interp_mode="linear", theta_grid=tg, phi_grid=pg)
    # point just below 360 should interpolate between last and first columns
    inds, wgts = interp.precompute(np.asarray([45.0]), np.asarray([357.5]))
    est = float(interp_gather(jnp.asarray(f), inds, wgts)[0])
    truth = 0.5 * (np.cos(355 * np.pi / 180) + np.cos(0.0))
    assert np.isclose(est, truth, atol=1e-12)


def test_interp_weights_polar_cap():
    """Exact port of HEALPix get_interpol polar-cap scheme (what
    healpy.get_interp_weights does; healpix_base get_interpol)."""
    nside = 16
    npix = hp.nside2npix(nside)
    rng = np.random.default_rng(1)
    f = rng.normal(size=npix)

    # at the poles: the value is the mean of the 4 polar-ring pixels
    pix, w = hp.get_interp_weights(nside, np.asarray([0.0, np.pi]),
                                   np.asarray([0.3, 1.1]))
    assert np.allclose(w.sum(0), 1.0, atol=1e-14)
    val = (f[pix] * w).sum(0)
    assert np.isclose(val[0], f[:4].mean(), atol=1e-13)
    assert np.isclose(val[1], f[-4:].mean(), atol=1e-13)

    # continuity across the first-ring boundary
    tb = np.arccos(1.0 - 1.0 / (3.0 * nside ** 2))
    for ph in (0.0, 0.7, 3.0, 5.5):
        v = []
        for t in (tb - 1e-10, tb + 1e-10):
            ip, wp = hp.get_interp_weights(nside, np.asarray([t]),
                                           np.asarray([ph]))
            v.append(float((f[ip] * wp).sum()))
        assert abs(v[0] - v[1]) < 1e-7, (ph, v)

    # vertical blend is linear in THETA (healpix convention, not z):
    # a function linear in theta is reproduced exactly between two rings
    # at a shifted-ring-aligned phi
    zr, start, npr, shift = hp.ring_info(nside)
    theta_r = np.arccos(zr)
    g = theta_r.repeat(npr)  # g(pix) = theta of its ring
    k = 2 * nside  # equatorial ring pair with aligned centers
    t_mid = 0.5 * (theta_r[k - 1] + theta_r[k])
    # phi aligned with a pixel center on both rings (same parity trick:
    # use a center of ring k, which lies midway between ring k-1 centers)
    ph = (0 + shift[k - 1]) * 2 * np.pi / npr[k - 1]
    ip, wp = hp.get_interp_weights(nside, np.asarray([t_mid]),
                                   np.asarray([ph]))
    est = float((g[ip] * wp).sum())
    assert np.isclose(est, t_mid, atol=1e-12)
