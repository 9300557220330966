"""Cross-coupling tests: VisCoupling/RedVisCoupling validated against a
directly-constructed E V E^H matrix product (the reference validates
against a sympy-built coupling matrix to 1e-10,
tests/test_calibration.py:57-147)."""
import numpy as np
import jax.numpy as jnp
import pytest

from bayeslim_tpu.models.coupling import (
    VisCoupling, RedVisCoupling, CouplingInflate, gen_coupling_terms,
    cut_bl,
)
from bayeslim_tpu.models.telescope import build_reds
from bayeslim_tpu.utils import make_hex, AntposDict
from bayeslim_tpu.data.containers import VisData


def _setup(nside_hex=2, Nfreqs=4, Ntimes=1, seed=0):
    rng = np.random.default_rng(seed)
    ants, antvecs = make_hex(nside_hex)
    antpos = AntposDict(ants, antvecs)
    nant = len(ants)
    freqs = np.linspace(100e6, 110e6, Nfreqs)
    # full upper-tri bls including autos (coupling mixes autos in)
    bls = [(a1, a2) for i, a1 in enumerate(ants) for a2 in ants[i:]]
    # hermitian visibility matrix
    Vm = rng.normal(size=(nant, nant, Ntimes, Nfreqs)) + \
        1j * rng.normal(size=(nant, nant, Ntimes, Nfreqs))
    Vm = Vm + Vm.conj().transpose(1, 0, 2, 3)
    lut = {a: i for i, a in enumerate(ants)}
    data = np.stack([Vm[lut[b[0]], lut[b[1]]] for b in bls])[None, None]
    vd = VisData()
    vd.setup_data(bls, np.arange(Ntimes) * 1.0, freqs, pol="ee",
                  data=jnp.asarray(data))
    return ants, antpos, freqs, bls, Vm, vd, rng


def _manual_couple(Vm, X, dly, add_I=True, double=False):
    """E V E^H computed directly with numpy per (time, freq)."""
    nant = Vm.shape[0]
    nt, nf = Vm.shape[2], Vm.shape[3]
    out = np.zeros_like(Vm)
    for t in range(nt):
        for f in range(nf):
            E = X[:, :, t % X.shape[2], f] * dly[:, :, f]
            if double:
                E = E + E @ E
            if add_I:
                E = E + np.eye(nant)
            out[:, :, t, f] = E @ Vm[:, :, t, f] @ E.conj().T
    return out


def test_viscoupling_matches_matrix_product():
    ants, antpos, freqs, bls, Vm, vd, rng = _setup()
    nant = len(ants)
    X = (rng.normal(size=(nant, nant, 1, len(freqs))) +
         1j * rng.normal(size=(nant, nant, 1, len(freqs)))) * 0.01
    params = jnp.asarray(X[None, None])

    vc = VisCoupling(params, freqs, antpos, bls)
    out = vc(vd)

    # manual: delay phasor matrix
    av = np.asarray(antpos.antvecs)
    dist = np.linalg.norm(av[None] - av[:, None], axis=-1)
    dly = np.exp(2j * np.pi * (freqs - freqs[0]) / 2.99792458e8
                 * dist[..., None])
    truth_mat = _manual_couple(Vm, X, dly)
    lut = {a: i for i, a in enumerate(ants)}
    truth = np.stack([truth_mat[lut[b[0]], lut[b[1]]] for b in bls])
    err = np.abs(np.asarray(out.data[0, 0]) - truth).max()
    assert err < 1e-10, f"coupling mismatch {err:.2e}"


def test_viscoupling_double_path_and_identity():
    ants, antpos, freqs, bls, Vm, vd, rng = _setup(seed=1)
    nant = len(ants)
    X = (rng.normal(size=(nant, nant, 1, len(freqs))) +
         1j * rng.normal(size=(nant, nant, 1, len(freqs)))) * 0.01
    params = jnp.asarray(X[None, None])
    av = np.asarray(antpos.antvecs)
    dist = np.linalg.norm(av[None] - av[:, None], axis=-1)
    dly = np.exp(2j * np.pi * (freqs - freqs[0]) / 2.99792458e8
                 * dist[..., None])
    lut = {a: i for i, a in enumerate(ants)}

    vc2 = VisCoupling(params, freqs, antpos, bls, double=True)
    out2 = vc2(vd)
    truth2 = _manual_couple(Vm, X, dly, double=True)
    truth2 = np.stack([truth2[lut[b[0]], lut[b[1]]] for b in bls])
    assert np.abs(np.asarray(out2.data[0, 0]) - truth2).max() < 1e-10

    # zero coupling with identity = passthrough
    vc0 = VisCoupling(jnp.zeros_like(params), freqs, antpos, bls)
    out0 = vc0(vd)
    assert np.allclose(np.asarray(out0.data), np.asarray(vd.data), atol=1e-12)


def test_redviscoupling_matches_viscoupling():
    """RedVisCoupling on perfectly-redundant vis == VisCoupling on the
    inflated vis (reference tests/test_calibration.py:149+ export)."""
    ants, antpos, freqs, bls, _, _, rng = _setup(seed=2)
    nant = len(ants)
    reds, redvecs, bl2red, all_bls, _, _, _ = build_reds(antpos)
    Nred = len(reds)
    # redundant vis (one per group)
    rv = rng.normal(size=(1, 1, Nred, 1, len(freqs))) + \
        1j * rng.normal(size=(1, 1, Nred, 1, len(freqs)))
    red_bls = [r[0] for r in reds]
    vd_red = VisData()
    vd_red.setup_data(red_bls, np.asarray([0.0]), freqs, pol="ee",
                      data=jnp.asarray(rv))

    X = (rng.normal(size=(1, 1, nant, nant, 1, len(freqs))) +
         1j * rng.normal(size=(1, 1, nant, nant, 1, len(freqs)))) * 0.01

    out_bls = [bl for bl in all_bls]
    rvc = RedVisCoupling(jnp.asarray(X), freqs, antpos, red_bls, bl2red,
                         out_bls)
    out = rvc(vd_red)
    assert out.data.shape[2] == len(out_bls)

    # manual: inflate then VisCoupling on the full set
    full_bls = rvc.full_bls
    idx = [bl2red[bl] if bl in bl2red else bl2red[(bl[1], bl[0])]
           for bl in full_bls]
    vfull = VisData()
    vfull.setup_data(full_bls, np.asarray([0.0]), freqs, pol="ee",
                     data=jnp.asarray(rv[:, :, idx]))
    vc = VisCoupling(jnp.asarray(X), freqs, antpos, full_bls)
    expected = vc(vfull)
    lut = {b: i for i, b in enumerate(full_bls)}
    for k, bl in enumerate(out_bls):
        if bl in lut:
            e = np.asarray(expected.data[0, 0, lut[bl]])
        else:
            e = np.asarray(expected.data[0, 0, lut[(bl[1], bl[0])]]).conj()
        assert np.allclose(np.asarray(out.data[0, 0, k]), e, atol=1e-12)


def test_coupling_inflate():
    ants = [0, 1, 2]
    terms, idx = gen_coupling_terms(
        {0: np.asarray([0., 0, 0]), 1: np.asarray([15., 0, 0]),
         2: np.asarray([30., 0, 0])}, no_auto_coupling=True)
    ci = CouplingInflate(ants, terms, idx)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(1, 1, len(terms), 1, 4)) + 0j)
    out = ci(p)
    assert out.shape == (1, 1, 3, 3, 1, 4)
    # diagonal (auto-coupling) is zero
    assert np.allclose(np.asarray(out[0, 0, 0, 0]), 0)
    # off-diagonals hold their term values
    for (ai, aj), t in idx.items():
        assert np.allclose(np.asarray(out[0, 0, ai, aj]),
                           np.asarray(p[0, 0, t]))


def test_gen_coupling_terms_red_compression():
    ants, antvecs = make_hex(2)
    antpos = dict(zip(ants, antvecs))
    terms, idx = gen_coupling_terms(antpos, compress_to_red=True,
                                    max_len=16.0)
    # hex nearest-neighbor couplings compress to 6 directions
    assert len(terms) == 6
    assert max(idx.values()) == 5
    # cut_bl
    assert cut_bl((ants[0], ants[1]), antpos, max_len=1.0)
    assert not cut_bl((ants[0], ants[1]), antpos, max_len=100.0)


def test_redviscoupling_setup_coupling_cuts():
    """setup_coupling geometric cuts zero the cut coupling-matrix cells
    and second_max_* independently gate the second-order factors
    (reference calibration.py:1701-1900)."""
    ants, antpos, freqs, bls, _, _, rng = _setup(seed=4)
    nant = len(ants)
    reds, redvecs, bl2red, all_bls, _, _, _ = build_reds(antpos)
    red_bls = [r[0] for r in reds]
    rv = rng.normal(size=(1, 1, len(reds), 1, len(freqs))) + \
        1j * rng.normal(size=(1, 1, len(reds), 1, len(freqs)))
    vd_red = VisData()
    vd_red.setup_data(red_bls, np.asarray([0.0]), freqs, pol="ee",
                      data=jnp.asarray(rv))
    X = (rng.normal(size=(1, 1, nant, nant, 1, len(freqs))) +
         1j * rng.normal(size=(1, 1, nant, nant, 1, len(freqs)))) * 0.01

    rvc = RedVisCoupling(jnp.asarray(X), freqs, antpos, red_bls, bl2red,
                         list(all_bls))
    out_full = np.asarray(rvc(vd_red).data)

    # cutting BOTH orders at max_len (max_len + second_max_len) must
    # equal manually zeroing the cut cells of X (then the expansion is
    # the exact product of the masked matrix)
    rvc.setup_coupling(max_len=15.0, second_max_len=15.0)
    out_cut = np.asarray(rvc(vd_red).data)
    assert not np.allclose(out_cut, out_full)
    av = np.asarray(rvc.coupling.antpos.antvecs)
    dist = np.linalg.norm(av[None] - av[:, None], axis=-1)
    Xm = np.asarray(X).copy()
    Xm[0, 0, dist > 15.0] = 0.0
    rvc2 = RedVisCoupling(jnp.asarray(Xm), freqs, antpos, red_bls,
                          bl2red, list(all_bls))
    assert np.allclose(out_cut, np.asarray(rvc2(vd_red).data),
                       atol=1e-12)

    # the orders cut INDEPENDENTLY (reference :3212-3236): a first-order
    # max_len cut with uncut second order differs from cutting both
    rvc.setup_coupling(max_len=15.0, second_max_len=None)
    out_first_only = np.asarray(rvc(vd_red).data)
    assert not np.allclose(out_first_only, out_cut)

    # include_second_order=False drops the X V X^H term: on the uncut
    # model it equals V + X V + V X^H built by hand
    rvc.setup_coupling(include_second_order=False)
    rvc.coupling.term_mask = None
    rvc.coupling.term_mask2 = None
    out1 = np.asarray(rvc(vd_red).data)
    assert not rvc.coupling.double  # NOT the double-path flag
    vc = rvc.coupling
    vfull = vd_red.copy()
    vfull.data = rvc.inflate(vd_red.data)
    Xd = jnp.asarray(X) * vc.dly
    V = vc._to_matrix(vfull.data)
    lin = (V + jnp.einsum("...patf,...aqtf->...pqtf", Xd, V)
           + jnp.einsum("...patf,...qatf->...pqtf", V, Xd.conj()))
    exp = np.asarray(vc._from_matrix(lin, vfull.data.shape))
    lut = {b: i for i, b in enumerate(rvc.full_bls)}
    sel = [lut.get(bl, lut.get((bl[1], bl[0]))) for bl in all_bls]
    cj = np.asarray([bl not in lut for bl in all_bls])
    exp = exp[:, :, sel]
    exp[:, :, cj] = exp[:, :, cj].conj()
    assert np.allclose(out1, exp, atol=1e-12)

    # use_reds=False routes users to VisCoupling
    with pytest.raises(NotImplementedError):
        rvc.setup_coupling(use_reds=False)
