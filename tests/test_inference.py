"""Inference engine tests: priors, LogProb, BFGS/LBFGS, Trainer
(reference tests/test_bfgs.py, test_optim-style checks)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bayeslim_tpu as bl
from bayeslim_tpu.utils import Module, ParamDict
from bayeslim_tpu.inference import (
    LogProb, LogGaussPrior, LogUniformPrior, LogTaperedUniformPrior,
    LogLaplacePrior, BFGS, LBFGS, Trainer, apply_icov,
)
from bayeslim_tpu.data.containers import VisData


class GaussModel(Module):
    """Multivariate-Gaussian toy model: 'prediction' = params
    (reference tests/test_bfgs.py setup_NormalProb :23-46)."""

    def __init__(self, params):
        super().__init__(name="gauss")
        self.params = params
        self.set_param("params")

    def forward(self, inp=None, prior_cache=None, **kwargs):
        class _Out:
            pass
        out = _Out()
        out.data = self.params
        return self.params


def setup_NormalProb(N=50, seed=0, correlated=True):
    """LogProb whose MAP is a known mean with known covariance."""
    rng = np.random.default_rng(seed)
    mean = jnp.asarray(rng.normal(0, 1, N))
    if correlated:
        A = rng.normal(0, 1, (N, N)) / np.sqrt(N)
        cov = A @ A.T + np.eye(N) * 0.5
    else:
        cov = np.diag(rng.uniform(0.5, 2.0, N))
    icov = np.linalg.inv(cov)

    model = GaussModel(jnp.zeros(N))

    from bayeslim_tpu.data.containers import TensorData
    tgt = TensorData()
    tgt.setup_data(data=mean, cov=jnp.asarray(cov), cov_axis="full",
                   icov=jnp.asarray(icov))
    prob = LogProb(model, tgt, complex_circular=False)
    return prob, mean, cov


def test_logprob_gradient():
    prob, mean, cov = setup_NormalProb(N=10)
    pd = prob.collect_main_params()
    v, g = prob.value_and_grad(pd)
    # -dlogL/dx = icov (x - mean); at x=0: -icov mean... negate=True so
    # gradient of 0.5 (x-m)^T C^-1 (x-m) = C^-1 (x - m)
    icov = np.linalg.inv(cov)
    expected = icov @ (np.zeros(len(mean)) - np.asarray(mean))
    assert np.allclose(np.asarray(g["params"]), expected, atol=1e-8)


def test_bfgs_converges():
    """BFGS convergence on 50-dim correlated Gaussian
    (reference tests/test_bfgs.py:49-70: rms < 1e-7 after 40 iters,
    recovered inv Hessian diag within 2x of true cov)."""
    prob, mean, cov = setup_NormalProb(N=50)
    opt = BFGS(prob)
    opt.minimize(40)
    rms = float(np.sqrt(np.mean((np.asarray(opt.pdict["params"]) -
                                 np.asarray(mean)) ** 2)))
    assert rms < 1e-7, f"BFGS rms {rms:.2e}"
    # recovered inverse Hessian approximates covariance
    Hdiag = np.diag(np.asarray(opt.H))
    cdiag = np.diag(cov)
    ratio = Hdiag / cdiag
    assert (ratio > 0.5).all() and (ratio < 2.0).all()


def test_lbfgs_converges():
    prob, mean, cov = setup_NormalProb(N=50)
    opt = LBFGS(prob, history_size=20)
    opt.minimize(60)
    rms = float(np.sqrt(np.mean((np.asarray(opt.pdict["params"]) -
                                 np.asarray(mean)) ** 2)))
    assert rms < 1e-6, f"LBFGS rms {rms:.2e}"


def test_trainer_adam():
    import optax
    prob, mean, cov = setup_NormalProb(N=20, correlated=False)
    tr = Trainer(prob, optax.adam(0.1), track=True)
    losses = tr.train(200)
    assert losses[-1] < losses[0]
    err = np.abs(np.asarray(tr.pdict["params"]) - np.asarray(mean)).max()
    assert err < 0.05
    # chain rollback
    p_last = np.asarray(tr.pdict["params"]).copy()
    tr.revert_chain(10)
    assert len(tr.loss_history) == 190
    assert not np.allclose(np.asarray(tr.pdict["params"]), p_last)


def test_priors():
    x = jnp.asarray([0.5, 0.7])
    lu = LogUniformPrior(0.0, 1.0)
    assert np.isfinite(float(lu(x)))
    assert float(lu(jnp.asarray([1.5, 0.5]))) == -np.inf

    lg = LogGaussPrior(jnp.zeros(2), jnp.ones(2))
    # N(0,1): logpdf(0.5) per element
    expected = -0.5 * (0.25 + 0.49) - np.log(2 * np.pi)
    assert np.isclose(float(lg(x)), expected)

    lt = LogTaperedUniformPrior(0.0, 1.0, alpha=1000.0)
    assert float(lt(x)) > float(lt(jnp.asarray([1.2, 0.5])))

    # norm = sum(log(2*scale)) over the scale tensor (scalar here), matching
    # the reference (optim.py LogLaplacePrior)
    ll = LogLaplacePrior(0.0, 1.0)
    assert np.isclose(float(ll(x)), -(0.5 + 0.7) - np.log(2.0))
    ll2 = LogLaplacePrior(jnp.zeros(2), jnp.ones(2))
    assert np.isclose(float(ll2(x)), -(0.5 + 0.7) - 2 * np.log(2.0))


def test_prior_in_logprob():
    """Priors attached to modules affect the posterior."""
    prob, mean, cov = setup_NormalProb(N=5)
    pd = prob.collect_main_params()
    v0 = float(prob(pd))
    prob.model.set_priors([LogGaussPrior(jnp.zeros(5), jnp.ones(5) * 1e-4)])
    prob._jit_cache = {}
    v1 = float(prob(pd))
    assert v1 != v0  # prior contributes
    # prior_dict path supersedes
    prob2, _, _ = setup_NormalProb(N=5)
    prob2.prior_dict = {"params": LogGaussPrior(jnp.zeros(5), jnp.ones(5))}
    assert np.isfinite(float(prob2(prob2.collect_main_params())))


def test_apply_icov_axes():
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(1, 1, 3, 2, 4)) +
                    1j * rng.normal(size=(1, 1, 3, 2, 4)))
    # diagonal
    ic = jnp.asarray(rng.uniform(1, 2, d.shape))
    out = apply_icov(d, ic, None)
    assert np.allclose(np.asarray(out), np.abs(np.asarray(d)) ** 2 * np.asarray(ic))
    # full
    n = d.size
    icf = jnp.eye(n) * 2.0
    out = apply_icov(d, icf, "full")
    assert np.isclose(float(out.real), 2 * float(jnp.sum(jnp.abs(d) ** 2)))
    # freq axis
    icfreq = jnp.asarray(np.tile(np.eye(4) * 3.0, (1, 1, 3, 2, 1, 1)))
    out = apply_icov(d, icfreq, "freq")
    assert np.allclose(np.asarray(out), 3 * np.sum(np.abs(np.asarray(d)) ** 2, -1))


def test_rime_logprob_end_to_end():
    """Full pipeline: simulate vis, perturb sky params, recover by Adam."""
    import optax
    from tests.test_rime import (setup_Telescope, setup_PointSky,
                                 setup_Array, setup_UniformBeam, JD0)
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=2, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_UniformBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:8]
    rime = bl.RIME(sky, T, beam, arr, bls, np.asarray([JD0]), freqs)

    truth_vd = rime.forward()
    truth_params = np.asarray(sky.params).copy()

    tgt = truth_vd.copy()
    tgt.setup_data(bls, truth_vd.times, freqs, pol="ee", data=truth_vd.data,
                   cov=jnp.ones(truth_vd.data.shape), cov_axis=None,
                   icov=jnp.ones(truth_vd.data.shape))

    # perturb amplitudes
    p0 = truth_params.copy()
    p0[0, 0, 0] *= 1.3
    rime.sky.params = jnp.asarray(p0)
    # only fit the sky (fix beam)
    rime.beam.unset_param("params")

    prob = LogProb(rime, tgt)
    opt = LBFGS(prob)
    losses = opt.minimize(25)
    # at the MAP the loss equals the likelihood normalization n ln(pi)
    norm = tgt.cov_ndim * np.log(np.pi)
    assert losses[-1] - norm < 1e-8 * losses[0]
    rec = np.asarray(opt.pdict["sky.params"])
    assert np.allclose(rec, truth_params, atol=1e-8)


def test_main_params_subslice():
    """set_main_params solves a SUB-SLICE of a parameter tensor while
    freezing the rest (reference optim.py:485-911 index machinery)."""
    import optax
    from tests.test_rime import (setup_Telescope, setup_PointSky,
                                 setup_Array, setup_UniformBeam, JD0)
    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=4, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_UniformBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:8]
    rime = bl.RIME(sky, T, beam, arr, bls, np.asarray([JD0]), freqs)
    truth_vd = rime.forward()
    truth = np.asarray(sky.params).copy()

    tgt = truth_vd.copy()
    tgt.setup_data(bls, truth_vd.times, freqs, pol="ee", data=truth_vd.data,
                   cov=jnp.ones(truth_vd.data.shape), cov_axis=None,
                   icov=jnp.ones(truth_vd.data.shape))

    # perturb the amplitudes of sources 0 and 2 only; solve exactly those
    p0 = truth.copy()
    sel = np.zeros(truth.shape, dtype=bool)
    sel[0, 0, 0, 0] = sel[0, 0, 0, 2] = True
    p0[sel] *= 1.4
    rime.sky.params = jnp.asarray(p0)
    rime.beam.unset_param("params")

    prob = LogProb(rime, tgt)
    mp = prob.set_main_params({"sky.params": sel})
    assert mp.size == 2

    # gather/scatter round trip
    vec = prob.collect_main_params()
    assert vec["main"].shape == (2,)
    m2 = mp.scatter(vec["main"], prob.model)
    assert np.allclose(np.asarray(m2.sky.params), p0)

    # gradient of the master vector matches the full-parameter gradient
    # at the selected indices
    v_sub, g_sub = prob.value_and_grad(vec)
    prob_full = LogProb(rime, tgt)
    v_full, g_full = prob_full.value_and_grad()
    assert np.allclose(float(v_sub), float(v_full), rtol=1e-12)
    gf = np.asarray(g_full["sky.params"]).ravel()[sel.ravel()]
    assert np.allclose(np.asarray(g_sub["main"]), gf, rtol=1e-10)

    # optimize the 2 selected entries; everything else must stay frozen
    opt = optax.adam(0.2)
    state = opt.init(dict(vec))
    pd = dict(vec)
    for i in range(150):
        v, g = prob.value_and_grad(ParamDict(pd))
        up, state = opt.update(dict(g), state, pd)
        pd = jax.tree_util.tree_map(lambda a, b: a + b, pd, dict(up))
    final = np.asarray(mp.scatter(pd["main"], prob.model).sky.params)
    assert np.allclose(final[sel], truth[sel], atol=2e-2)
    assert np.allclose(final[~sel], p0[~sel], atol=0)


def test_apply_icov_time_axis_convention():
    """cov_axis='time' consumes the documented (P,P,B,F,T,T) layout
    (reference optim.py:1878 docstring; NOTE the reference's own einsum
    at optim.py:1905 contradicts its docstring by consuming a 5-dim
    freq-independent icov — we follow the documented 6-dim convention,
    consistent with 'bl' and 'freq')."""
    from bayeslim_tpu.inference.prob import apply_icov
    rng = np.random.default_rng(0)
    P, B, T, F = 1, 3, 4, 2
    d = jnp.asarray(rng.normal(size=(P, P, B, T, F))
                    + 1j * rng.normal(size=(P, P, B, T, F)))
    A = rng.normal(size=(P, P, B, F, T, T))
    icov = jnp.asarray(A @ np.swapaxes(A, -1, -2)
                       + 3 * np.eye(T))          # SPD per (b, f)
    out = np.asarray(apply_icov(d, icov, "time"))
    # brute force: per (b, f), x^H C^-1-style quadratic over times
    expect = np.zeros((P, P, B, F))
    dn = np.asarray(d)
    ic = np.asarray(icov)
    for b in range(B):
        for f in range(F):
            x = dn[0, 0, b, :, f]
            expect[0, 0, b, f] = (x.conj() @ ic[0, 0, b, f] @ x).real
    np.testing.assert_allclose(out.real, expect, rtol=1e-10)
    # diagonal icov reduces to the diagonal result
    icov_d = jnp.asarray(np.broadcast_to(np.eye(T) * 2.0,
                                         (P, P, B, F, T, T)))
    out2 = np.asarray(apply_icov(d, icov_d, "time")).real
    np.testing.assert_allclose(out2.sum(),
                               (2 * np.abs(dn) ** 2).sum(), rtol=1e-10)


def test_main_params_reference_kwargs():
    """Reference-name surfaces: forward_*(main_params=), forward_prior
    batch-0 guard, send_main_params(fill/main_p0), main_params_index
    prob form (reference optim.py:959-1131, 803-910, 2358)."""
    from bayeslim_tpu.inference.hessian import main_params_index
    prob, mean, cov = setup_NormalProb(N=6)
    pd = prob.collect_main_params()

    # main_params= alias on all three forward surfaces
    c0, _, _ = prob.forward_chisq(pd)
    c1, _, _ = prob.forward_chisq(main_params=pd)
    assert np.allclose(float(c0), float(c1))
    l0, _ = prob.forward_like(pdict=pd)
    l1, _ = prob.forward_like(main_params=pd)
    assert np.allclose(float(l0), float(l1))
    # prior only counts on batch 0 when idx is explicit
    p0 = prob.forward_prior(pd, idx=0)
    p1 = prob.forward_prior(main_params=pd, idx=1)
    assert float(p1) == 0.0
    assert np.isfinite(float(p0))

    # master-vector surfaces with a sub-slice spec
    sel = np.zeros(6, dtype=bool)
    sel[1] = sel[4] = True
    key = list(pd.keys())[0]
    mp = prob.set_main_params({key: sel.reshape(np.shape(pd[key]))})
    vec = prob.collect_main_params(inplace=True)["main"]
    assert vec.shape == (2,)
    # a bare flat vector is accepted as main_params
    c2, _, _ = prob.forward_chisq(main_params=vec)
    assert np.isfinite(float(c2))
    # fill overwrites the frozen entries; main_p0 offsets the vector
    m = prob.send_main_params(main_params=vec + 1.0, inplace=False,
                              main_p0=-jnp.ones(2), fill=0.0)
    out = np.asarray(m[key]).ravel()
    assert np.allclose(out[sel], np.asarray(vec))
    assert np.allclose(out[~sel], 0.0)
    # main_params_index on the prob returns the param's flat indices
    idx = main_params_index(prob, key)
    assert np.allclose(idx, [0, 1])
