"""Hessian toolkit + grad-mod tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from bayeslim_tpu.inference import (
    compute_hessian, invert_hessian, mask_hessian, unmask_hessian,
    main_params_index, FactoredInvHessian, implicit_to_dense, LBFGS,
)
from tests.test_inference import setup_NormalProb


def test_hessian_matches_icov():
    """Hessian of a Gaussian negative log posterior == icov."""
    prob, mean, cov = setup_NormalProb(N=12)
    H, index = compute_hessian(prob)
    icov = np.linalg.inv(cov)
    assert np.allclose(np.asarray(H), icov, atol=1e-8)
    assert index["params"] == slice(0, 12)
    # chunked evaluation agrees
    H2, _ = compute_hessian(prob, rows_chunk=5)
    assert np.allclose(np.asarray(H2), np.asarray(H), atol=1e-10)
    # inverse recovers the covariance
    C = invert_hessian(H)
    assert np.allclose(np.asarray(C), cov, atol=1e-6)


def test_mask_unmask():
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.normal(size=(6, 6)))
    mask = np.asarray([1, 0, 1, 1, 0, 1], bool)
    Hs, idx = mask_hessian(H, mask)
    assert Hs.shape == (4, 4)
    Hf = unmask_hessian(Hs, mask)
    assert Hf.shape == (6, 6)
    assert np.allclose(np.asarray(Hf)[np.ix_(idx, idx)], np.asarray(Hs))
    assert np.asarray(Hf)[1, 1] == 0


def test_factored_inv_hessian():
    """L-BFGS pair factored inverse Hessian approximates the covariance."""
    prob, mean, cov = setup_NormalProb(N=20)
    opt = LBFGS(prob, history_size=25)
    opt.minimize(40)
    fih = FactoredInvHessian.from_lbfgs(opt)
    H = np.asarray(fih.to_dense())
    # same result as operator matvec
    v = np.random.default_rng(1).normal(size=20)
    assert np.allclose(np.asarray(fih.matvec(jnp.asarray(v))), H @ v,
                       atol=1e-10)
    # diag within 3x of true covariance (reference test_bfgs tolerance 2x
    # on a direct BFGS H; the factored L-BFGS form is looser)
    ratio = np.diag(H) / np.diag(cov)
    assert (ratio > 0.3).all() and (ratio < 3.0).all()
    # cholesky action
    L = np.asarray(fih.chol())
    assert np.allclose(L @ L.T, H, atol=1e-8)


def test_grad_mods():
    prob, mean, cov = setup_NormalProb(N=6)
    pd = prob.collect_main_params()
    _, g0 = prob.value_and_grad(pd)
    gmax = float(np.abs(np.asarray(g0["params"])).max())

    prob.set_grad_mod({"params": ("clamp", gmax / 2)})
    _, g = prob.value_and_grad(pd)
    assert float(np.abs(np.asarray(g["params"])).max()) <= gmax / 2 + 1e-12

    prob.set_grad_mod({"params": ("mult", 0.0)})
    _, g = prob.value_and_grad(pd)
    assert np.allclose(np.asarray(g["params"]), 0.0)

    prob.set_grad_mod({"params": ("clip", 1.0)})
    _, g = prob.value_and_grad(pd)
    assert np.linalg.norm(np.asarray(g["params"])) <= 1.0 + 1e-9

    prob.set_grad_mod(None)
    _, g = prob.value_and_grad(pd)
    assert np.allclose(np.asarray(g["params"]), np.asarray(g0["params"]))


def test_compute_hessian_minibatch_and_multiprob():
    """Batched Hessian == single-batch Hessian on the same data; a list
    of probs sums (reference multi-prob compute_hessian,
    optim.py:2008-2181)."""
    from tests.test_rime import (setup_Telescope, setup_PointSky,
                                 setup_Array, setup_UniformBeam, JD0)
    import bayeslim_tpu as bl
    from bayeslim_tpu.inference import LogProb

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=2, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_UniformBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:6]
    times = np.asarray([JD0, JD0 + 5e-4])

    def mk(times_arg):
        rime = bl.RIME(sky, T, beam, arr, bls, times_arg, freqs)
        rime.beam.unset_param("params")
        vd = rime.forward() if not isinstance(times_arg, list) else None
        return rime

    rime_full = bl.RIME(sky, T, beam, arr, bls, times, freqs)
    rime_full.beam.unset_param("params")
    vd = rime_full.run_batches()
    tgt = vd.copy()
    tgt.setup_data(bls, vd.times, freqs, pol="ee", data=vd.data,
                   cov=jnp.ones(vd.data.shape), cov_axis=None,
                   icov=jnp.ones(vd.data.shape))
    prob_full = LogProb(rime_full, tgt, compute="like")
    H_full, idx = compute_hessian(prob_full)

    # two time batches, accumulate
    rime_b = bl.RIME(sky, T, beam, arr, bls, [times[:1], times[1:]], freqs)
    rime_b.beam.unset_param("params")
    tgts = []
    for i in range(2):
        t = vd.select(times=times[i:i+1], inplace=False)
        t.setup_data(bls, times[i:i+1], freqs, pol="ee", data=t.data,
                     cov=jnp.ones(t.data.shape), cov_axis=None,
                     icov=jnp.ones(t.data.shape))
        tgts.append(t)
    prob_b = LogProb(rime_b, tgts, compute="like")
    H_b, _ = compute_hessian(prob_b)
    assert np.allclose(np.asarray(H_b), np.asarray(H_full), rtol=1e-9)

    # list of probs sums
    H_2x, _ = compute_hessian([prob_full, prob_full])
    assert np.allclose(np.asarray(H_2x), 2 * np.asarray(H_full), rtol=1e-12)


def test_main_params_kron_inv_hess():
    """Kron-factored inverse Hessian: shapes and values match a direct
    numpy transcription of the reference algorithm (optim.py:2438)."""
    from bayeslim_tpu.inference import main_params_kron_inv_hess
    rng = np.random.default_rng(0)
    shape = (3, 4)
    n = 12
    A = rng.normal(size=(n, n))
    H = jnp.asarray(A @ A.T + n * np.eye(n))
    index = {"p": slice(0, n)}
    K = main_params_kron_inv_hess(H, index, "p", shape, method="chol")
    N = 4
    cov = np.linalg.pinv(np.asarray(H)[:N, :N])
    L = np.linalg.cholesky(cov)
    Lv = L.sum(1) / np.sqrt(L.shape[1])
    want = np.kron(np.eye(3), Lv).T
    assert K.shape == want.shape
    assert np.allclose(np.asarray(K), want, rtol=1e-8)
    K2 = main_params_kron_inv_hess(H, index, "p", shape, method="svd")
    assert K2.shape == want.shape
