"""Sky and beam model tests (reference tests/test_sky.py, test_beam.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from bayeslim_tpu.models.sky import (
    PointSky, PointSkyResponse, PixelSky, PixelSkyResponse, CompositeModel,
    Stokes2Coherency, stokes2coherency, read_catalogue, write_catalogue,
)
from bayeslim_tpu.models.beam import (
    PixelBeam, GaussResponse, AiryResponse, UniformResponse, PixelResponse,
    airy_disk, beam_edge_taper,
)
from bayeslim_tpu.models.bessel import j0, j1
from bayeslim_tpu.utils import healpix as hp


def test_powerlaw_pointsky():
    # data == amp * (f/f0)^-2.2 (reference test_sky.py:42-48)
    Nfreqs, Nsource = 8, 4
    freqs = np.linspace(100e6, 120e6, Nfreqs)
    rng = np.random.default_rng(0)
    amp = rng.uniform(1, 5, Nsource)
    params = np.zeros((1, 1, 2, Nsource))
    params[0, 0, 0] = amp
    params[0, 0, 1] = -2.2
    angs = np.stack([rng.uniform(0, 360, Nsource), rng.uniform(-90, 90, Nsource)])
    R = PointSkyResponse(freqs, freq_mode="powerlaw", f0=freqs[0])
    sky = PointSky(jnp.asarray(params), jnp.asarray(angs), R=R)
    md = sky.forward()
    assert md.data.shape == (1, 1, Nfreqs, Nsource)
    truth = amp[None] * (freqs[:, None] / freqs[0]) ** -2.2
    assert np.allclose(np.asarray(md.data[0, 0]), truth, rtol=1e-12)


def test_pointsky_linear_mode():
    from bayeslim_tpu.models.linear_model import LinearModel
    Nfreqs, Nsource, Ndeg = 16, 3, 4
    freqs = np.linspace(100e6, 120e6, Nfreqs)
    LM = LinearModel("poly", dim=2, x=freqs, Ndeg=Ndeg, basis="legendre",
                     whiten=True)
    rng = np.random.default_rng(1)
    params = jnp.asarray(rng.normal(size=(1, 1, Ndeg, Nsource)))
    R = PointSkyResponse(freqs, freq_mode="linear", freq_LM=LM)
    angs = np.stack([rng.uniform(0, 360, Nsource), rng.uniform(-90, 90, Nsource)])
    sky = PointSky(params, jnp.asarray(angs), R=R)
    md = sky.forward()
    assert md.data.shape == (1, 1, Nfreqs, Nsource)
    truth = np.einsum("fd,sodn->sofn", np.asarray(LM.A), np.asarray(params))
    assert np.allclose(np.asarray(md.data), truth, atol=1e-12)


def test_pixelsky_solid_angle():
    nside = 4
    npix = hp.nside2npix(nside)
    freqs = np.linspace(100e6, 110e6, 3)
    params = jnp.ones((1, 1, 3, npix))
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    angs = np.stack([phi * 180 / np.pi, 90 - theta * 180 / np.pi])
    px = hp.nside2pixarea(nside)
    sky = PixelSky(params, jnp.asarray(angs), px,
                   R=PixelSkyResponse(freqs))
    md = sky.forward()
    assert np.allclose(np.asarray(md.data), px)
    # full-sky integral of unity brightness = 4 pi
    assert np.isclose(float(md.data[0, 0, 0].sum()), 4 * np.pi, rtol=1e-12)


def test_composite_sum():
    freqs = np.linspace(100e6, 110e6, 3)
    angs = np.stack([np.asarray([10.0]), np.asarray([-30.0])])
    p1 = jnp.ones((1, 1, 3, 1))
    p2 = 2 * jnp.ones((1, 1, 3, 1))
    s1 = PointSky(p1, jnp.asarray(angs), R=PointSkyResponse(freqs), name="a")
    s2 = PointSky(p2, jnp.asarray(angs), R=PointSkyResponse(freqs), name="b")
    comp = CompositeModel([s1, s2], sum_output=True)
    md = comp.forward()
    assert np.allclose(np.asarray(md.data), 3.0)
    comp2 = CompositeModel([s1, s2], sum_output=False)
    out = comp2.forward()
    assert isinstance(out, list) and len(out) == 2


def test_stokes2coherency():
    # reference conventions (sky_model.py:1160-1330): [I, f_Q, f_U, f_V]
    # fractional, B = [[I+Q, U-iV], [U+iV, I-Q]], no 1/2
    S = jnp.asarray(np.array([2.0, 0.2, 0.1, 0.05]).reshape(4, 1, 1, 1))
    B = stokes2coherency(S)
    assert B.shape == (2, 2, 1, 1)
    B = np.asarray(B).ravel().reshape(2, 2)
    assert np.isclose(B[0, 0].real, 2.0 * 1.2)
    assert np.isclose(B[1, 1].real, 2.0 * 0.8)
    assert np.isclose(B[0, 1], 2.0 * (0.1 - 0.05j))
    assert np.isclose(B[1, 0], 2.0 * (0.1 + 0.05j))
    # trace recovers 2I
    assert np.isclose((B[0, 0] + B[1, 1]).real, 4.0)
    # (2, 2) fractional ordering [[I, fQ], [fU, fV]] agrees
    S22 = jnp.asarray(np.array([[2.0, 0.2], [0.1, 0.05]]
                               ).reshape(2, 2, 1, 1))
    assert np.allclose(np.asarray(stokes2coherency(S22)), np.asarray(B
                       ).reshape(2, 2, 1, 1))
    # Stokes-I-only passes through as the (1, 1, ...) power sky
    SI = jnp.ones((1, 1, 3))
    assert stokes2coherency(SI).shape == (1, 1, 3)


def test_catalogue_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 5
    params = np.zeros((1, 1, 2, n))
    params[0, 0, 0] = rng.uniform(1, 10, n)
    params[0, 0, 1] = -2.2
    angs = np.stack([rng.uniform(0, 360, n), rng.uniform(-90, 90, n)])
    f = str(tmp_path / "cat.yaml")
    write_catalogue(f, params, angs, f0=150e6)
    p2, a2, meta = read_catalogue(f)
    assert meta["f0"] == 150e6
    assert np.allclose(np.asarray(p2), params)
    assert np.allclose(np.asarray(a2), angs)


def test_bessel_accuracy():
    from scipy.special import j0 as sj0, j1 as sj1
    x = np.linspace(-30, 30, 1001)
    assert np.abs(np.asarray(j0(jnp.asarray(x))) - sj0(x)).max() < 1e-6
    assert np.abs(np.asarray(j1(jnp.asarray(x))) - sj1(x)).max() < 1e-6


def test_airy_beam_peak_and_width():
    freqs = np.asarray([150e6])
    params = jnp.ones((1, 1, 1, 1, 1)) * 14.0  # 14 m dish
    R = AiryResponse()
    beam = PixelBeam(params, freqs, R=R, pol="e", powerbeam=True)
    zen = np.linspace(0, 40, 100)
    az = np.zeros(100)
    b = beam.gen_beam(jnp.asarray(zen), jnp.asarray(az))
    b = np.asarray(b)[0, 0, 0, 0]
    assert np.isclose(b[0], 1.0, atol=1e-6)   # unity at boresight
    assert (np.diff(b[:10]) < 0).all()         # decreasing near peak
    # first null of J1 at x=3.8317 -> zen = asin(3.8317 c/(2 pi f a))
    a = 7.0
    x0 = 3.8317
    zen_null = np.arcsin(x0 * 2.99792458e8 / (2 * np.pi * 150e6 * a)) * 180 / np.pi
    null_idx = np.argmin(b[:35])  # search below zen ~ 14 deg (first null)
    assert abs(zen[null_idx] - zen_null) < 1.0


def test_gauss_beam_values():
    freqs = np.linspace(100e6, 110e6, 2)
    sig = 0.4
    params = jnp.ones((1, 1, 1, 2, 2)) * sig
    beam = PixelBeam(params, freqs, R=GaussResponse(), pol="e")
    zen = np.asarray([0.0, 30.0])
    az = np.asarray([0.0, 90.0])
    b = np.asarray(beam.gen_beam(jnp.asarray(zen), jnp.asarray(az)))
    l = np.sin(np.radians(30.0))
    expected = np.exp(-0.5 * (l / sig) ** 2)
    assert np.isclose(b[0, 0, 0, 0, 0], 1.0)
    assert np.isclose(b[0, 0, 0, 0, 1], expected, rtol=1e-12)


def test_pixel_response_beam():
    """Beam params on a healpix grid, interpolated to arbitrary angles."""
    nside = 16
    npix = hp.nside2npix(nside)
    freqs = np.linspace(100e6, 110e6, 2)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    gridbeam = np.exp(-0.5 * (theta / 0.5) ** 2)  # smooth beam
    params = jnp.asarray(np.tile(gridbeam, (1, 1, 1, 2, 1)))
    R = PixelResponse(freqs, "healpix", nside=nside)
    beam = PixelBeam(params, freqs, R=R, pol="e")
    zen = np.asarray([0.0, 10.0, 20.0, 45.0])
    az = np.asarray([0.0, 100.0, 200.0, 300.0])
    ctx = R.precompute(zen, az)
    b = np.asarray(beam.gen_beam(jnp.asarray(zen), jnp.asarray(az), ctx=ctx))
    truth = np.exp(-0.5 * (np.radians(zen) / 0.5) ** 2)
    # bilinear truncation: at the exact pole the interpolant equals the
    # first-ring average (same as healpy), error ~ (theta_1/sigma)^2/2
    assert np.abs(b[0, 0, 0, 0] - truth).max() < 6e-3
    assert np.abs(b[0, 0, 0, 0, 1:] - truth[1:]).max() < 2e-3


def test_apply_beam_4pol():
    """4-pol einsum: psky = J B J^H for random Jones."""
    rng = np.random.default_rng(0)
    Nf, Np = 2, 3
    beam = rng.normal(size=(2, 2, 1, Nf, Np)) + 1j * rng.normal(size=(2, 2, 1, Nf, Np))
    sky = rng.normal(size=(2, 2, Nf, Np)) + 1j * rng.normal(size=(2, 2, Nf, Np))
    freqs = np.linspace(100e6, 110e6, Nf)
    pb = PixelBeam(jnp.asarray(beam), freqs, R=UniformResponse(),
                   powerbeam=False, parameter=False)
    m1 = np.zeros(2, dtype=np.int32)
    m2 = np.zeros(2, dtype=np.int32)
    psky = np.asarray(pb.apply_beam(jnp.asarray(beam), m1, m2, jnp.asarray(sky)))
    # manual per pixel/freq
    for f in range(Nf):
        for p in range(Np):
            J = beam[:, :, 0, f, p]
            B = sky[:, :, f, p]
            expected = J @ B @ J.conj().T
            assert np.allclose(psky[:, :, 0, f, p], expected, atol=1e-12)


def test_beam_edge_taper():
    zen = jnp.asarray([0.0, 80.0, 85.0, 90.0])
    t = np.asarray(beam_edge_taper(zen, zen_start=80.0, sigma=5.0))
    assert t[0] == 1.0 and t[1] == 1.0
    assert np.isclose(t[2], np.exp(-0.5))
    assert np.isclose(t[3], np.exp(-2.0))


def test_airy_brute_force_ntau():
    """AiryResponse brute_force/Ntau path (reference beam_model.py:928-988
    numeric aperture integral) matches the analytic-J1 path and is
    differentiable."""
    import jax
    from bayeslim_tpu.models.beam import AiryResponse

    freqs = np.linspace(1e8, 1.5e8, 4)
    zen = np.linspace(0, 85, 40)
    az = np.linspace(0, 350, 40)
    params = jnp.ones((1, 1, 1, 1, 2)) * 14.0

    R_a = AiryResponse()
    R_b = AiryResponse(brute_force=True, Ntau=300)
    ba = np.asarray(R_a.forward(params, zen, az, freqs))
    bb = np.asarray(R_b.forward(params, zen, az, freqs))
    assert np.abs(ba - bb).max() < 1e-6

    g = jax.grad(lambda p: jnp.sum(
        R_b.forward(p, zen, az, freqs)))(params)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_composite_cross_resolution():
    """CompositeModel index maps sum components of different resolution/
    extent into the first map (reference sky_model.py:805-830)."""
    from bayeslim_tpu.models.sky import CompositeModel, PixelSky, PixelSkyResponse
    from bayeslim_tpu.utils import healpix as hp

    freqs = np.linspace(1e8, 1.1e8, 3)
    nside_hi, nside_lo = 8, 4
    np_hi, np_lo = hp.nside2npix(nside_hi), hp.nside2npix(nside_lo)

    def mk(nside, npix, amp):
        th, ph = hp.pix2ang(nside, np.arange(npix))
        angs = np.stack([ph * 180 / np.pi, 90 - th * 180 / np.pi])
        R = PixelSkyResponse(freqs, spatial_mode="pixel",
                             freq_mode="channel")
        p = jnp.full((1, 1, len(freqs), npix), amp, dtype=jnp.float64)
        return PixelSky(p, jnp.asarray(angs), 1.0, R=R)

    hi = mk(nside_hi, np_hi, 1.0)
    lo = mk(nside_lo, np_lo, 10.0)
    # NESTED-style expansion: each lo pixel covers 4 hi pixels. Here we
    # use RING indexing so just test the mechanism with an explicit map:
    ti = np.repeat(np.arange(np_lo), np_hi // np_lo)   # (np_hi,)
    comp = CompositeModel({"hi": hi, "lo": lo}, sum_output=True,
                          index={"lo": (None, ti)})
    out = comp.forward()
    assert out.data.shape[-1] == np_hi
    assert np.allclose(np.asarray(out.data), 11.0)

    # truncated-extent component: add only to selected pixels
    sub = mk(nside_hi, 16, 5.0)
    pi = np.arange(16) + 32
    comp2 = CompositeModel({"hi": mk(nside_hi, np_hi, 1.0), "sub": sub},
                           sum_output=True, index={"sub": (pi, None)})
    out2 = np.asarray(comp2.forward().data)
    assert np.allclose(out2[..., 32:48], 6.0)
    assert np.allclose(out2[..., :32], 1.0)

    # eval_models restriction
    comp.set_eval_models("hi")
    outs = comp.forward()
    assert np.allclose(np.asarray(outs.data), 1.0)
