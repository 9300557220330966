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
