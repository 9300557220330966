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
    """Reference contract (optim.py:2282,2308): mask by diagonal
    threshold, unmask with val on the masked diagonal."""
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.normal(size=(6, 6)) + np.diag([5., 0, 5, 5, 0, 5]))
    Hs, mask = mask_hessian(H, thresh=1.0)
    assert Hs.shape == (4, 4)
    assert list(mask) == [True, False, True, True, False, True]
    idx = np.where(mask)[0]
    Hf = unmask_hessian(Hs, mask, val=2.0)
    assert Hf.shape == (6, 6)
    assert np.allclose(np.asarray(Hf)[np.ix_(idx, idx)], np.asarray(Hs))
    assert np.asarray(Hf)[1, 1] == 2.0
    # maskleft: only rows are unmasked
    Hl = unmask_hessian(Hs, mask, maskleft=True)
    assert Hl.shape == (6, 4)
    assert np.allclose(np.asarray(Hl)[idx], np.asarray(Hs))


def test_invert_hessian_options():
    """invert_hessian diag/idx/rm_thresh/rm_fill surface
    (reference optim.py:2182-2281)."""
    from bayeslim_tpu.utils import ParamDict
    rng = np.random.default_rng(1)
    A = rng.normal(size=(5, 5))
    H = jnp.asarray(A @ A.T + 5 * np.eye(5))
    # diag mode: elementwise reciprocal with threshold fill
    d = jnp.asarray([2.0, 0.5, 4.0])
    C = invert_hessian(d, diag=True, rm_thresh=1.0, rm_fill=9.0)
    assert np.allclose(np.asarray(C), [0.5, 9.0, 0.25])
    # idx selection: inverted block + rm_fill elsewhere
    C = invert_hessian(H, idx=[0, 2, 4], rm_fill=7.0)
    sub = np.linalg.inv(np.asarray(H)[np.ix_([0, 2, 4], [0, 2, 4])])
    assert np.allclose(np.asarray(C)[np.ix_([0, 2, 4], [0, 2, 4])], sub,
                       atol=1e-6)
    assert np.asarray(C)[1, 1] == 7.0 and np.asarray(C)[1, 0] == 0.0
    # rm_thresh drops weak rows
    H2 = jnp.asarray(np.diag([3.0, 1e-8, 2.0]))
    C2 = invert_hessian(H2, rm_thresh=1e-3, rm_fill=0.0)
    assert np.allclose(np.diag(np.asarray(C2)), [1 / 3, 0.0, 0.5])
    # ParamDict recursion
    pd = ParamDict({"a": H})
    Cpd = invert_hessian(pd)
    assert np.allclose(np.asarray(Cpd["a"]),
                       np.linalg.inv(np.asarray(H)), atol=1e-6)


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


def test_compute_hessian_row_block():
    """Nstart/Nrows compute a contiguous row block; rm_offdiag and
    out_ftype post-process (reference optim.py:2008-2060)."""
    prob, mean, cov = setup_NormalProb(N=8)
    H, _ = compute_hessian(prob)
    Hb, _ = compute_hessian(prob, Nstart=2, Nrows=3)
    assert Hb.shape == (3, 8)
    assert np.allclose(np.asarray(Hb), np.asarray(H)[2:5], atol=1e-10)
    Hd, _ = compute_hessian(prob, rm_offdiag=True, out_ftype=np.float32)
    assert Hd.dtype == np.float32
    assert np.allclose(np.asarray(Hd), np.diag(np.diag(np.asarray(H))),
                       atol=1e-4)
    with pytest.raises(NotImplementedError):
        compute_hessian(prob, grad_real=False)
