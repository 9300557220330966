"""Calibration tests: Jones gains, apply_cal, redcal degeneracies,
end-to-end gain solve (reference tests/test_calibration.py +
BASELINE config #3)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bayeslim_tpu as bl
from bayeslim_tpu.models.calibration import (
    JonesModel, JonesResponse, VisModel, RedVisModel, VisModelResponse,
    apply_cal, params2complex, complex2params, compute_redcal_degen,
    redcal_degen_gains, remove_redcal_degen, rephase_to_refant,
)
from bayeslim_tpu.utils import make_hex, AntposDict, white_noise
from bayeslim_tpu.data.containers import VisData
from bayeslim_tpu.inference import LogProb, LBFGS


def _mock_vis(Nbls=6, Ntimes=2, Nfreqs=4, seed=0, Nants=5):
    rng = np.random.default_rng(seed)
    bls = [(i, j) for i in range(Nants) for j in range(i + 1, Nants)][:Nbls]
    data = jnp.asarray(rng.normal(size=(1, 1, len(bls), Ntimes, Nfreqs)) +
                       1j * rng.normal(size=(1, 1, len(bls), Ntimes, Nfreqs)))
    vd = VisData()
    vd.setup_data(bls, np.arange(Ntimes) * 1.0, np.linspace(100e6, 110e6, Nfreqs),
                  pol="ee", data=data)
    return vd, bls


def test_params2complex_roundtrip():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(1, 1, 3, 2, 4)) +
                    1j * rng.normal(size=(1, 1, 3, 2, 4)))
    for ptype in ["com", "amp", "phs", "amp_phs"]:
        p = complex2params(g, ptype)
        g2 = params2complex(p, ptype)
        if ptype == "com":
            assert np.allclose(np.asarray(g2), np.asarray(g))
        elif ptype == "amp":
            assert np.allclose(np.abs(np.asarray(g2)), np.abs(np.asarray(g)))
        elif ptype == "phs":
            assert np.allclose(np.angle(np.asarray(g2)), np.angle(np.asarray(g)))
        else:
            assert np.allclose(np.asarray(g2), np.asarray(g))
    # dly type
    freqs = np.linspace(100e6, 110e6, 4)
    tau = jnp.ones((1, 1, 3, 2, 1)) * 5.0  # ns
    g = params2complex(tau, "dly", freqs=freqs)
    expected = np.exp(2j * np.pi * freqs * 5e-9)
    assert np.allclose(np.asarray(g)[0, 0, 0, 0], expected)


def test_jones_apply_undo():
    vd, bls = _mock_vis()
    ants = sorted(set([a for bl in bls for a in bl]))
    rng = np.random.default_rng(1)
    gains = jnp.asarray(rng.normal(1, 0.1, (1, 1, len(ants), 2, 4)) +
                        1j * rng.normal(0, 0.1, (1, 1, len(ants), 2, 4)))
    J = JonesModel(gains, ants, R=JonesResponse())
    vcal = J(vd)
    # manual check
    g = np.asarray(gains)
    d = np.asarray(vd.data)
    for k, (a1, a2) in enumerate(bls):
        i1, i2 = ants.index(a1), ants.index(a2)
        expected = g[:, :, i1] * d[:, :, k] * g[:, :, i2].conj()
        assert np.allclose(np.asarray(vcal.data)[:, :, k], expected)
    # undo recovers
    vun = J(vcal, undo=True)
    assert np.allclose(np.asarray(vun.data), d, atol=1e-12)


def test_apply_cal_function():
    vd, bls = _mock_vis()
    ants = sorted(set([a for bl in bls for a in bl]))
    rng = np.random.default_rng(2)
    gains = jnp.asarray(rng.normal(1, 0.1, (1, 1, len(ants), 2, 4)) +
                        1j * 0.0)
    out, cov = apply_cal(vd.data, bls, gains, ants,
                         cov=jnp.ones(vd.data.shape))
    assert out.shape == vd.data.shape
    assert cov is not None and (np.asarray(cov) > 0).all()


def test_refant_phase():
    ants = [0, 1, 2, 3]
    rng = np.random.default_rng(3)
    gains = jnp.asarray(rng.normal(1, 0.2, (1, 1, 4, 1, 3)) +
                        1j * rng.normal(0, 0.2, (1, 1, 4, 1, 3)))
    J = JonesModel(gains, ants, refant=1)
    jones = J.get_jones()
    phs = np.angle(np.asarray(jones)[0, 0, 1])
    assert np.abs(phs).max() < 1e-10


def test_redcal_degen():
    ants, antvecs = make_hex(2)
    antpos = AntposDict(ants, antvecs)
    rng = np.random.default_rng(4)
    # gains with known degeneracy: amp = exp(eta), phase = r . Phi
    eta = 0.3
    Phi = np.asarray([0.01, -0.02])
    A = np.asarray(antvecs)[:, :2]
    g = np.exp(eta + 1j * (A @ Phi))[None, None, :, None, None]
    g = jnp.asarray(np.tile(g, (1, 1, 1, 2, 3)))
    aa, ps = compute_redcal_degen(g, ants, antpos)
    assert np.allclose(np.asarray(aa), eta, atol=1e-8)
    assert np.allclose(np.asarray(ps)[0, 0, :, 0, 0], Phi, atol=1e-8)
    # removing degens yields unity gains
    newg, _, dg = remove_redcal_degen(g, ants, antpos)
    assert np.allclose(np.asarray(newg), 1.0 + 0j, atol=1e-8)


def test_visperbl_and_redvis_models():
    vd, bls = _mock_vis()
    rng = np.random.default_rng(5)
    vis = jnp.asarray(rng.normal(size=vd.data.shape) +
                      1j * rng.normal(size=vd.data.shape))
    vm = VisModel(vis)
    out = vm(vd)
    assert np.allclose(np.asarray(out.data), np.asarray(vd.data + vis))
    back = vm(out, undo=True)
    assert np.allclose(np.asarray(back.data), np.asarray(vd.data))

    # redundant model: 2 groups
    bl2red = {bl: (0 if i < 3 else 1) for i, bl in enumerate(bls)}
    redvis = jnp.asarray(rng.normal(size=(1, 1, 2, 2, 4)) + 0j)
    rv = RedVisModel(redvis, bl2red)
    out = rv(vd)
    for i, bl in enumerate(bls):
        expected = np.asarray(vd.data)[:, :, i] + np.asarray(redvis)[:, :, bl2red[bl]]
        assert np.allclose(np.asarray(out.data)[:, :, i], expected)


def test_gain_solve_end_to_end():
    """BASELINE config #3: per-antenna complex gain solve on simulated
    vis with a refant and known truth."""
    vd, bls = _mock_vis(Nbls=10, Ntimes=1, Nfreqs=4, Nants=5)
    ants = sorted(set([a for bl in bls for a in bl]))
    rng = np.random.default_rng(6)
    true_g = jnp.asarray(
        1.0 + 0.1 * rng.normal(size=(1, 1, len(ants), 1, 4)) +
        1j * 0.1 * rng.normal(size=(1, 1, len(ants), 1, 4)))
    # refant phase zero in truth for identifiability
    i0 = 0
    true_g = true_g * jnp.exp(-1j * jnp.angle(true_g[:, :, i0:i0 + 1]))

    Jtrue = JonesModel(true_g, ants, parameter=False)
    vobs = Jtrue(vd)

    # model: Sequential(vis-model fixed at truth, jones to solve)
    from bayeslim_tpu.utils import Sequential

    class FixedVis(bl.Module):
        def __init__(self, vd):
            super().__init__(name="fixedvis")
            self.vd = vd

        def forward(self, inp=None, prior_cache=None, **kwargs):
            return self.vd

    # trainable complex params are stored as real pairs (..., 2) and
    # converted by the response (reference viewreal convention)
    g0 = bl.viewreal(jnp.ones_like(true_g))
    J = JonesModel(g0, ants, refant=ants[i0])
    model = Sequential({"vis": FixedVis(vd), "cal": J})

    tgt = vobs.copy()
    tgt.setup_data(bls, vd.times, vd.freqs, pol="ee", data=vobs.data,
                   cov=jnp.ones(vobs.data.shape), cov_axis=None,
                   icov=jnp.ones(vobs.data.shape))
    prob = LogProb(model, tgt, complex_circular=True)
    opt = LBFGS(prob)
    losses = opt.minimize(40)

    rec = np.asarray(J.R(opt.pdict["models.cal.params"]))
    rec = rec * np.exp(-1j * np.angle(rec[:, :, i0:i0 + 1]))
    err = np.abs(rec - np.asarray(true_g)).max()
    assert err < 1e-6, f"gain solve err {err:.2e} (loss {losses[-1]:.3e})"


def test_jones_response_modes():
    from bayeslim_tpu.models.linear_model import LinearModel
    freqs = np.linspace(100e6, 110e6, 8)
    # linear freq mode: gains = poly in freq
    LMf = LinearModel("poly", dim=4, x=freqs, Ndeg=3, basis="legendre",
                      whiten=True, dtype=jnp.complex128)
    R = JonesResponse(freq_mode="linear", freq_LM=LMf, param_type="com",
                      freqs=freqs)
    rng = np.random.default_rng(7)
    params = jnp.asarray(rng.normal(size=(1, 1, 3, 1, 3)) + 0j)
    g = R(params)
    assert g.shape == (1, 1, 3, 1, 8)
    # dly param type
    R2 = JonesResponse(param_type="dly", freqs=freqs)
    tau = jnp.asarray(rng.normal(size=(1, 1, 3, 1, 1)))
    g2 = R2(tau)
    assert g2.shape == (1, 1, 3, 1, 8)
    assert np.allclose(np.abs(np.asarray(g2)), 1.0)


def test_rime_4pol_jones_end_to_end():
    """Full 4-pol chain: coherency sky -> 2x2 Jones beam -> RIME forward
    (2, 2, Nbls, Nt, Nf) -> JonesModel 4-pol apply/undo round trip
    (reference beam_model.py:334-363 + calibration.py:416-743)."""
    import bayeslim_tpu as bl
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse, stokes2coherency
    from bayeslim_tpu.models.beam import PixelBeam, UniformResponse
    from bayeslim_tpu.models.calibration import JonesModel, JonesResponse
    from bayeslim_tpu.utils import make_hex, AntposDict, healpix as hp

    rng = np.random.default_rng(0)
    loc = (21.428, -30.721, 1073.0)
    T = bl.TelescopeModel(loc)
    ants, antvecs = make_hex(2, D=15.0)
    freqs = np.linspace(1e8, 1.1e8, 4)
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs)
    bls = arr.get_bls(keep_autos=False)[:8]
    nside = 8
    npix = hp.nside2npix(nside)
    th, ph = hp.pix2ang(nside, np.arange(npix))
    angs = np.stack([ph * 180 / np.pi, 90 - th * 180 / np.pi])

    # Stokes I + Q sky -> 2x2 coherency (2, 2, Nf, Npix)
    S = np.zeros((4, 1, len(freqs), npix))
    S[0, 0] = rng.uniform(1, 5, npix)
    S[1, 0] = 0.2 * S[0, 0]
    B = stokes2coherency(jnp.asarray(S))
    assert B.shape == (2, 2, len(freqs), npix)

    class CoherencySky(bl.utils.Module):
        def __init__(self, data, angs):
            super().__init__()
            self.data = jnp.asarray(data)
            self.angs = np.asarray(angs)

        def forward(self, *a, prior_cache=None, **k):
            from bayeslim_tpu.data.containers import MapData
            md = MapData()
            md.setup_data(freqs, data=self.data, angs=self.angs)
            return md

    sky = CoherencySky(B, angs)
    # 2x2 complex Jones beam on the same healpix grid, evaluated through
    # PixelResponse interpolation (realbeam=False keeps it complex)
    from bayeslim_tpu.models.beam import PixelResponse
    jb = rng.normal(size=(2, 2, 1, len(freqs), npix)) * 0.1
    jb = jb + np.tile(np.eye(2)[:, :, None, None, None],
                      (1, 1, 1, len(freqs), npix))
    R = PixelResponse(freqs, "healpix", nside=nside, powerbeam=False,
                      realbeam=False)
    beam = PixelBeam(jnp.asarray(jb + 0j), freqs, R=R, powerbeam=False,
                     parameter=False, fov=180.0)

    jd = 2458168.3
    rime = bl.RIME(sky, T, beam, arr, bls, np.asarray([jd]), freqs)
    vd = rime.forward()
    assert vd.data.shape == (2, 2, len(bls), 1, len(freqs))
    assert np.isfinite(np.asarray(vd.data)).all()
    assert float(jnp.abs(vd.data).sum()) > 0
    # hermiticity of the coherency propagates: V_xy = conj(V_yx) for
    # a zero-baseline... (general bls: no strict symmetry; just check
    # the diagonal pols are non-trivial)
    assert float(jnp.abs(vd.data[0, 0]).sum()) > 0
    assert float(jnp.abs(vd.data[1, 1]).sum()) > 0

    # 4-pol Jones calibration apply/undo round trip
    gains = (rng.normal(size=(2, 2, len(ants), 1, len(freqs))) * 0.05 +
             np.tile(np.eye(2)[:, :, None, None, None],
                     (1, 1, len(ants), 1, len(freqs))))
    jm = JonesModel(jnp.asarray(gains + 0j), ants=list(ants),
                    R=JonesResponse(param_type="com"), polmode="4pol",
                    parameter=False)
    vd_cal = jm.forward(vd)
    vd_back = jm.forward(vd_cal, undo=True)
    assert np.allclose(np.asarray(vd_back.data), np.asarray(vd.data),
                       atol=1e-10)


def test_rime_4pol_redundant_expansion():
    """Redundant sim->data expansion in 4-pol polmode: the gather runs on
    the baseline axis of (2, 2, Nbls, Nt, Nf) — identical to simulating
    every baseline (production redundant config for Jones-chain runs)."""
    import bayeslim_tpu as bl
    from bayeslim_tpu.models.sky import stokes2coherency
    from bayeslim_tpu.models.beam import PixelBeam, PixelResponse
    from bayeslim_tpu.utils import make_hex, AntposDict, healpix as hp

    rng = np.random.default_rng(3)
    T = bl.TelescopeModel((21.428, -30.721, 1073.0))
    ants, antvecs = make_hex(2, D=15.0)
    freqs = np.linspace(1e8, 1.1e8, 4)
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs, redtol=0.5)
    bls = arr.get_bls(keep_autos=False)
    sim_bls = [r[0] for r in arr.reds if r[0][0] != r[0][1]]
    assert len(sim_bls) < len(bls)
    nside = 8
    npix = hp.nside2npix(nside)
    th, ph = hp.pix2ang(nside, np.arange(npix))
    angs = np.stack([ph * 180 / np.pi, 90 - th * 180 / np.pi])

    S = np.zeros((4, 1, len(freqs), npix))
    S[0, 0] = rng.uniform(1, 5, npix)
    S[1, 0] = 0.2 * S[0, 0]
    B = stokes2coherency(jnp.asarray(S))

    class CoherencySky(bl.utils.Module):
        def __init__(self, data, angs):
            super().__init__()
            self.data = jnp.asarray(data)
            self.angs = np.asarray(angs)

        def forward(self, *a, prior_cache=None, **k):
            from bayeslim_tpu.data.containers import MapData
            md = MapData()
            md.setup_data(freqs, data=self.data, angs=self.angs)
            return md

    sky = CoherencySky(B, angs)
    jb = rng.normal(size=(2, 2, 1, len(freqs), npix)) * 0.1
    jb = jb + np.tile(np.eye(2)[:, :, None, None, None],
                      (1, 1, 1, len(freqs), npix))
    R = PixelResponse(freqs, "healpix", nside=nside, powerbeam=False,
                      realbeam=False)
    beam = PixelBeam(jnp.asarray(jb + 0j), freqs, R=R, powerbeam=False,
                     parameter=False, fov=180.0)

    jd = np.asarray([2458168.3])
    v_full = bl.RIME(sky, T, beam, arr, bls, jd, freqs).forward()
    v_red = bl.RIME(sky, T, beam, arr, sim_bls, jd, freqs,
                    data_bls=bls).forward()
    assert v_red.data.shape == v_full.data.shape == (2, 2, len(bls), 1,
                                                     len(freqs))
    assert np.allclose(np.asarray(v_red.data), np.asarray(v_full.data),
                       atol=1e-10)


def test_to_caldata_flags_cov():
    """to_CalData forwards flags/cov/icov into the CalData
    (reference calibration.py:688-743)."""
    vd, bls = _mock_vis()
    ants = sorted(set([a for bl in bls for a in bl]))
    rng = np.random.default_rng(2)
    gains = jnp.asarray(rng.normal(1, 0.1, (1, 1, len(ants), 2, 4)) +
                        1j * 0.0)
    J = JonesModel(gains, ants, R=JonesResponse())
    flags = np.zeros(gains.shape, bool)
    icov = jnp.ones(gains.shape[:2] + gains.shape[2:], dtype=gains.real.dtype)
    cd = J.to_CalData(freqs=vd.freqs, times=vd.times, pol="Jee",
                      flags=flags, icov=icov, history="h")
    assert cd.flags is flags
    assert cd.icov is icov
    assert cd.data.shape == gains.shape
    assert cd.history == "h"


def test_fix_refant_phs():
    """fix_refant_phs re-zeros the refant phase on current params
    (reference calibration.py:587-597)."""
    ants = [0, 1, 2, 3]
    rng = np.random.default_rng(11)
    gains = jnp.asarray(rng.normal(1, 0.2, (1, 1, 4, 1, 3)) +
                        1j * rng.normal(0, 0.2, (1, 1, 4, 1, 3)))
    J = JonesModel(gains, ants, refant=1)
    # drift the params (the forward path projects the refant phase out
    # regardless; fix_refant_phs re-zeros the stored PARAMS)
    J.params = J.params * jnp.exp(1j * 0.3)
    assert np.abs(np.angle(np.asarray(J.params)[0, 0, 1])).max() > 0.1
    J.fix_refant_phs()
    assert np.abs(np.angle(np.asarray(J.params)[0, 0, 1])).max() < 1e-10
    # forward output is unchanged by the re-fix (phase was projected)
    assert np.abs(np.angle(np.asarray(J.get_jones())[0, 0, 1])).max() < 1e-10


def test_vismodel_minibatch_index_cache():
    """VisModel time/bl minibatching via IndexCache (reference
    calibration.py:291-414, :1176-1181, mirrored from the reference's
    own test_VisModel): a vd carrying a subset of times or baselines
    gets the matching params rows, with host index maps cached by
    arr_hash in cache_tidx/cache_bidx."""
    from bayeslim_tpu.models.calibration import VisModel, VisModelResponse
    from bayeslim_tpu.utils.indexing import ants2blnum, arr_hash
    from bayeslim_tpu.data.containers import VisData

    rng = np.random.default_rng(3)
    bls = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    times = 2458168.1 + np.arange(4) * 1e-3
    freqs = np.linspace(120e6, 130e6, 6)
    shape = (1, 1, len(bls), len(times), len(freqs))
    params = jnp.asarray(rng.normal(size=shape) +
                         1j * rng.normal(size=shape))
    blnums = np.asarray([int(ants2blnum(b)) for b in bls])

    vd = VisData()
    vd.setup_data(bls, times, freqs, pol="ee",
                  data=jnp.zeros(shape, dtype=params.dtype))

    vm = VisModel(params, R=VisModelResponse(times=times),
                  parameter=False, blnums=blnums)
    # full pass: vout == params
    vout = vm.forward(vd)
    assert np.allclose(np.asarray(vout.data), np.asarray(params))

    # time minibatching
    vd2 = vd.select(time_inds=range(3), inplace=False)
    vm.clear_cache()
    vout = vm.forward(vd2)
    assert vout.data.shape[-2] == 3
    assert np.allclose(np.asarray(vout.data),
                       np.asarray(params)[..., :3, :])
    assert arr_hash(np.asarray(vd2.times)) in vm.cache_tidx

    # bl minibatching (a scrambled subset)
    sub = [3, 1, 4]
    vd3 = vd.select(bl=[bls[i] for i in sub], inplace=False)
    vm.clear_cache()
    vout = vm.forward(vd3)
    assert vout.data.shape[-3] == 3
    assert np.allclose(np.asarray(vout.data),
                       np.asarray(params)[:, :, sub])
    assert arr_hash(np.asarray(vd3.blnums)) in vm.cache_bidx

    # cache hit: second call reuses the same index object
    idx1 = vm.cache_bidx[arr_hash(np.asarray(vd3.blnums))]
    vm.forward(vd3)
    assert vm.cache_bidx[arr_hash(np.asarray(vd3.blnums))] is idx1


def test_redvismodel_time_minibatch():
    """RedVisModel time down-select (reference calibration.py:986) and
    red-expansion index caching."""
    from bayeslim_tpu.models.calibration import RedVisModel, \
        VisModelResponse
    from bayeslim_tpu.data.containers import VisData

    rng = np.random.default_rng(5)
    reds = [[(0, 1), (1, 2)], [(0, 2)]]
    bl2red = {bl: i for i, red in enumerate(reds) for bl in red}
    bls = [bl for red in reds for bl in red]
    times = 2458168.1 + np.arange(4) * 1e-3
    freqs = np.linspace(120e6, 130e6, 5)
    shape = (1, 1, len(reds), len(times), len(freqs))
    params = jnp.asarray(rng.normal(size=shape) +
                         1j * rng.normal(size=shape))

    vd = VisData()
    vd.setup_data(bls, times[:2], freqs, pol="ee",
                  data=jnp.zeros((1, 1, len(bls), 2, len(freqs)),
                                 dtype=params.dtype))
    rvm = RedVisModel(params, bl2red, R=VisModelResponse(times=times),
                      parameter=False)
    vout = rvm.forward(vd)
    exp = np.asarray(params)[:, :, [0, 0, 1], :2]
    assert np.allclose(np.asarray(vout.data), exp)
