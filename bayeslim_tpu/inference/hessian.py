"""
Hessian computation and manipulation for Laplace approximations and HMC
mass matrices.

Reference parity: bayeslim/optim.py (compute_hessian :2008-2181,
invert_hessian :2182, mask_hessian/unmask_hessian :2282,2308,
main_params_index :2358, main_params_kron_inv_hess :2438, compute_icov
:1974) and bayeslim/bfgs.py (implicit_to_dense :681, FactoredInvHessian
:726-1049).

TPU-first: the reference row-blocks double-backprop by hand; here rows
come from jax.jacfwd(jax.grad(...)) (forward-over-reverse), evaluated in
row chunks so memory stays bounded, jitted once per chunk shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import ParamDict
from ..ops.linalg import invert_matrix

__all__ = [
    "compute_hessian", "invert_hessian", "mask_hessian", "unmask_hessian",
    "main_params_index", "main_params_kron_inv_hess", "compute_icov",
    "implicit_to_dense",
    "FactoredInvHessian", "factor_pairs", "factored_hvp", "factored_lvp",
]


def main_params_index(pdict, param=None, sub_index=None, params=None):
    """Slice into the raveled vector for each ParamDict key
    (reference optim.py:2358).

    Reference form: pass a LogProb (with set_main_params active) as the
    first argument plus `param` to get that parameter's flat indices in
    the master vector; sub_index selects a further subset of the
    parameter's (selected) entries; params restricts/reorders the keys
    the layout iterates over."""
    if hasattr(pdict, "collect_main_params"):  # a LogProb
        prob = pdict
        mp = prob.main_params
        if mp is not None:
            keys = params if params is not None else mp.keys
            out, i = {}, 0
            for k in keys:
                out[k] = np.arange(i, i + mp.sizes[k])
                i += mp.sizes[k]
            if param is None:
                return out
            idx = out[param]
            if sub_index is not None:
                idx = idx.reshape(-1)[np.asarray(
                    np.arange(mp.sizes[param]).reshape(
                        mp.shapes[param] if mp.idx[param] is None
                        else (-1,))[sub_index]).ravel()]
            return idx
        pdict = prob.collect_main_params()
    out = {}
    i = 0
    keys = params if params is not None else list(pdict.keys())
    for k in keys:
        n = int(np.prod(np.shape(pdict[k]))) or 1
        out[k] = slice(i, i + n)
        i += n
    if param is not None:
        s = out[param]
        idx = np.arange(s.start, s.stop)
        if sub_index is not None:
            shape = np.shape(pdict[param])
            idx = idx.reshape(shape)[sub_index].ravel()
        return idx
    return out


def _hessian_one(prob, batch_idx, pdict, rows_chunk, keys, row0=0,
                 nrows=None):
    """Hessian of one batch of one LogProb (forward-over-reverse).
    row0/nrows restrict to a contiguous row block (reference
    Nstart/Nrows multi-process row blocking)."""
    if pdict is None:
        pdict = prob.collect_main_params()
    if keys is not None:
        pdict = ParamDict({k: pdict[k] for k in keys})
    template = pdict.copy()
    x0 = pdict.ravel()
    n = x0.size
    row1 = n if nrows is None else min(row0 + nrows, n)

    def f(x):
        return prob.forward(template.unravel(x), idx=batch_idx)

    grad_f = jax.grad(f)

    # second-order AD cannot cross the fused kernels' custom_vjp;
    # trace the Hessian through the fully-differentiable XLA path
    from ..ops.rime_kernel import force_xla
    with force_xla():
        if rows_chunk is None and row0 == 0 and row1 == n:
            H = jax.jacfwd(grad_f)(x0)
        else:
            rows = []
            eye = np.eye(n)
            step = rows_chunk if rows_chunk else (row1 - row0)
            jvp_grad = jax.jit(lambda x, v: jax.jvp(grad_f, (x,), (v,))[1])
            for i0 in range(row0, row1, step):
                block = [jvp_grad(x0, jnp.asarray(eye[i]))
                         for i in range(i0, min(i0 + step, row1))]
                rows.append(jnp.stack(block))
            H = jnp.concatenate(rows, axis=0)
    return H, main_params_index(pdict)


def compute_hessian(prob, pdict=None, rows_chunk=None, keys=None,
                    batches="all", Nstart=None, Nrows=None,
                    rm_offdiag=False, out_ftype=None, grad_real=True,
                    cast2real=False, vectorize=True):
    """Dense Hessian of the (negative log) posterior w.r.t. the raveled
    ParamDict (reference optim.py:2008-2181).

    prob may be a single LogProb, a ShardedLogProb, or a LIST of
    independent LogProbs (the reference's multi-prob/multi-device row
    blocking); Hessians sum across probs. Minibatch-aware: with
    batches='all' the per-batch Hessians accumulate over every (time x
    bl) group (the prior enters once, at batch 0, like the forward).

    rows_chunk bounds memory: forward-over-reverse is evaluated for
    `rows_chunk` tangent directions per pass. keys restricts to a subset
    of parameters (block of the full Hessian). Nstart/Nrows compute only
    a contiguous row block (the reference's multi-process row split);
    rm_offdiag keeps only the diagonal; out_ftype casts the result.
    grad_real/cast2real/vectorize are reference-API compat: complex
    trainables here are stored as real pairs (viewreal), so the Hessian
    is always the real-plane one and jacfwd is already vectorized
    (grad_real=False raises — there is no imaginary-gradient plane).

    Returns (H (n, n) or (Nrows, n), index dict key->slice).
    """
    if not grad_real:
        raise NotImplementedError(
            "complex trainables are stored as real pairs (viewreal); "
            "the imaginary-gradient Hessian plane does not exist here")
    probs = list(prob) if isinstance(prob, (list, tuple)) else [prob]
    # a ShardedLogProb wraps the real LogProb (which holds the sharded
    # model); unwrap so prob.forward exists
    probs = [getattr(p, "prob", p) if not hasattr(p, "forward") else p
             for p in probs]
    H, index = None, None
    for p in probs:
        nb = getattr(p, "Nbatch", 1) if batches == "all" else 1
        for i in range(nb):
            Hb, index = _hessian_one(p, i, pdict, rows_chunk, keys,
                                     row0=Nstart or 0, nrows=Nrows)
            H = Hb if H is None else H + Hb
    if rm_offdiag and H.shape[0] == H.shape[1]:
        H = jnp.diag(jnp.diagonal(H))
    if out_ftype is not None:
        H = H.astype(out_ftype)
    return H, index


def main_params_kron_inv_hess(hess, index, key, shape, method="chol",
                              **inv_kwargs):
    """Kronecker-factored inverse-Hessian preconditioner for one
    parameter block (reference main_params_kron_inv_hess,
    optim.py:2438-2485): select the key's sub-block of the master
    Hessian, invert/factor the leading (N, N) block (N = prod of the
    parameter's trailing axes), column-average the factor, and
    Kronecker-expand over the leading axis.

    hess : (n, n) master Hessian; index : key->slice from
    compute_hessian / main_params_index; shape : the parameter's shape.
    Returns the (shape[0]*N, shape[0]) preconditioner matrix.
    """
    hidx = index[key]
    Hs = hess[hidx, :][:, hidx]
    N = int(np.prod(shape[1:])) if len(shape) > 1 else 1

    if method == "chol":
        cov = invert_matrix(Hs[:N, :N], **inv_kwargs)
        L = jnp.linalg.cholesky(cov)
    elif method == "svd":
        u, s, _ = jnp.linalg.svd(Hs[:N, :N])
        L = u @ jnp.diag(1.0 / jnp.sqrt(s))
    else:
        raise ValueError(method)

    L = L.sum(axis=1) / L.shape[1] ** 0.5
    return jnp.kron(jnp.eye(shape[0], dtype=L.dtype), L).T


def invert_hessian(H, inv="pinv", diag=False, idx=None, rm_thresh=None,
                   rm_fill=1e-15, rm_offdiag=False, rcond=1e-15, eps=None,
                   hermitian=True):
    """Invert a Hessian into a covariance (reference optim.py:2182-2281).

    diag treats H as the diagonal (any shape); idx inverts only the
    selected rows/cols; rm_thresh truncates rows whose diagonal falls
    below it; truncated/unselected diagonals are filled with rm_fill.
    ParamDicts invert per-key."""
    from ..utils import ParamDict
    if isinstance(H, (dict, ParamDict)):
        return ParamDict({k: invert_hessian(
            H[k], inv=inv, diag=diag, idx=idx, rm_thresh=rm_thresh,
            rm_fill=rm_fill, rm_offdiag=rm_offdiag, rcond=rcond, eps=eps,
            hermitian=hermitian) for k in H})
    thresh = rm_thresh if rm_thresh is not None else -jnp.inf
    if diag:
        s = H > thresh
        return jnp.where(s, 1.0 / jnp.where(s, H, 1.0), rm_fill)
    if rm_offdiag:
        H = jnp.diag(jnp.diagonal(H))
    n = H.shape[0]
    if idx is None:
        sel = np.arange(n)
    elif isinstance(idx, slice):
        sel = np.arange(n)[idx]
    else:
        sel = np.atleast_1d(np.asarray(idx)).astype(int)
    if rm_thresh is not None:
        good = np.where(np.asarray(jnp.diagonal(H)) > rm_thresh)[0]
        sel = np.asarray([i for i in sel if i in set(good.tolist())],
                         dtype=int)
    sub = H[np.ix_(sel, sel)]
    if eps:
        sub = sub + jnp.eye(sub.shape[0], dtype=sub.dtype) * eps
    C = invert_matrix(sub, method=inv, rcond=rcond, hermitian=hermitian)
    if len(sel) == n:
        return C
    out = jnp.eye(n, dtype=H.dtype) * rm_fill
    return out.at[np.ix_(sel, sel)].set(C)


def mask_hessian(H, thresh=1e0):
    """Truncate rows/cols whose diagonal is below thresh (reference
    optim.py:2282): returns (masked H, boolean mask)."""
    mask = np.asarray(jnp.diagonal(H)) >= thresh
    idx = np.where(mask)[0]
    return H[np.ix_(idx, idx)], mask


def unmask_hessian(Hsub, mask, val=1e0, maskleft=False):
    """Scatter a masked Hessian back to full size with `val` on the
    masked diagonal (reference optim.py:2308). maskleft unmasks only
    the row axis (val unused)."""
    mask = np.asarray(mask).ravel()
    n = mask.size
    idx = np.where(mask)[0]
    if maskleft:
        H = jnp.zeros((n,) + tuple(Hsub.shape[1:]), dtype=Hsub.dtype)
        return H.at[idx].set(Hsub)
    H = jnp.eye(n, dtype=Hsub.dtype) * val
    return H.at[np.ix_(idx, idx)].set(Hsub)


def compute_icov(cov, cov_axis=None, inv="pinv", **kwargs):
    """Invert a data covariance (reference optim.py:1974-2007)."""
    if cov_axis is None:
        return 1.0 / cov
    return invert_matrix(cov, method=inv, **kwargs)


def implicit_to_dense(matvec, n=None, dtype=jnp.float64, s=None, y=None):
    """Materialize an implicit operator by applying it to identity
    columns, or — the reference form implicit_to_dense(H0, s, y)
    (bfgs.py:681-724) — run dense BFGS inverse-Hessian updates over a
    FULL (s, y) curvature history starting from H0."""
    if s is not None:
        H = jnp.asarray(matvec, dtype=dtype)  # first arg is H0
        for sk, yk in zip(s, y):
            sk = jnp.asarray(sk, dtype).ravel()
            yk = jnp.asarray(yk, dtype).ravel()
            rho = 1.0 / (yk @ sk)
            I = jnp.eye(H.shape[0], dtype=dtype)
            V = I - rho * jnp.outer(sk, yk)
            H = V @ H @ V.T + rho * jnp.outer(sk, sk)
        return H
    eye = jnp.eye(n, dtype=dtype)
    cols = [matvec(eye[:, i]) for i in range(n)]
    return jnp.stack(cols, axis=1)


def factor_pairs(s_k, y_k, g_k, alpha_k, Hy_k=None, pos=True, rank2=True):
    """Convert one quasi-Newton (s, y) pair to the (u, v) pair of the
    real-product factorization H_{k+1} = (I + u v^T) H_k (I + u v^T)^T
    (Brodlie et al. 1973; reference bfgs.py:861-939).

    rank2=True is the BFGS update, rank2=False the SR1 update (which
    requires Hy_k = H_k y_k). Returns (u, v, spd)."""
    s_k, y_k, g_k = jnp.asarray(s_k), jnp.asarray(y_k), jnp.asarray(g_k)
    sy_k = float(s_k @ y_k)
    # s_k = -alpha_k H_k g_k  =>  H_k^{-1} s_k = -alpha_k g_k
    Hs_k = -alpha_k * g_k
    sHs_k = float(s_k @ Hs_k)
    yHy_k = float(y_k @ Hy_k) if Hy_k is not None else None
    sign = 1.0 if pos else -1.0
    if rank2:
        spd = sy_k > 0
        if yHy_k is not None:
            spd = spd and ((sy_k - yHy_k) <= sy_k)
        u_k = s_k / sy_k
        v_k = sign * np.sqrt(sy_k / sHs_k) * Hs_k - y_k
    else:
        assert Hy_k is not None, "SR1 update needs Hy_k"
        spd = ((sHs_k - sy_k) / (sy_k - yHy_k)) >= 0
        numer = -1.0 + sign * np.sqrt((sHs_k - sy_k) / (sy_k - yHy_k))
        denom = sHs_k - 2 * sy_k + yHy_k
        u_k = numer / denom * (s_k - jnp.asarray(Hy_k))
        v_k = Hs_k - y_k
    return u_k, v_k, bool(spd)


def _apply_op(M, vec, is_vec):
    """None / 1-D diag / 2-D dense / hmat-BaseMat-callable operator."""
    if M is None:
        return vec
    if callable(M) and not isinstance(M, jnp.ndarray):
        return M(vec)
    M = jnp.asarray(M)
    if M.ndim < 2:
        return M * vec if is_vec else M[:, None] * vec
    return M @ vec


def factored_hvp(vec, H0, u, v):
    """Inverse-Hessian vector (or matrix) product of the implicitly
    factored H = [prod_k (I + u_k v_k^T)] H0 [prod_k (I + v_k u_k^T)]
    (reference bfgs.py:941-995)."""
    vec = jnp.asarray(vec)
    is_vec = vec.ndim == 1
    for u_k, v_k in zip(reversed(u), reversed(v)):
        vec = vec + (v_k * (u_k @ vec) if is_vec
                     else v_k[:, None] * (u_k @ vec))
    vec = _apply_op(H0, vec, is_vec)
    for u_k, v_k in zip(u, v):
        vec = vec + (u_k * (v_k @ vec) if is_vec
                     else u_k[:, None] * (v_k @ vec))
    return vec


def factored_lvp(vec, L0, u, v):
    """Cholesky-factor vector product L v with H = L L^T and
    L = [prod_k (I + u_k v_k^T)] L0 — no dense Cholesky ever formed
    (reference bfgs.py:998-1048)."""
    vec = jnp.asarray(vec)
    is_vec = vec.ndim == 1
    vec = _apply_op(L0, vec, is_vec)
    for u_k, v_k in zip(u, v):
        vec = vec + (u_k * (v_k @ vec) if is_vec
                     else u_k[:, None] * (v_k @ vec))
    return vec


class FactoredInvHessian:
    """Implicitly factored inverse Hessian from quasi-Newton pairs via
    Brodlie et al. 1973 rank-1/rank-2 corrections (reference
    bfgs.py:726-860).

    H = U H0 U^T with U = prod_k (I + u_k v_k^T); exposes hvp (H v) and
    lvp (L v with H = L L^T, L = U L0) WITHOUT materializing anything
    dense — the lvp is the on-device cov_L action for HMC momenta.
    Callable: __call__ = lvp (cov_L protocol)."""

    def __init__(self, s, y, g_end, alpha, Hy=None, H0=None, L0=None,
                 rank2=True):
        if H0 is not None and L0 is None:
            raise ValueError("If H0 is fed, L0 should be too")
        self.H0, self.L0, self.rank2 = H0, L0, rank2
        self.m = len(s)
        self.N = int(np.size(s[0]))
        assert len(s) == len(y) == len(alpha)
        # reconstruct the per-step gradients from g_end and the y chain
        g_end = jnp.asarray(g_end)
        g = []
        for i in range(self.m):
            g.append(g_end - jnp.asarray(y[self.m - i - 1]))
            g_end = g[-1]
        g = g[::-1]
        if Hy is None:
            Hy = [None for _ in s]
        self.u, self.v = [], []
        for _s, _y, _g, _a, _Hy in zip(s, y, g, alpha, Hy):
            _u, _v, spd = factor_pairs(_s, _y, _g, _a, _Hy, pos=True,
                                       rank2=rank2)
            if spd:
                self.u.append(_u)
                self.v.append(_v)

    @classmethod
    def from_lbfgs(cls, lbfgs, H0=None, L0=None, rank2=True):
        """Build from a converged LBFGS optimizer (uses its retained
        (s, y) pairs, the matching line-search steps, and the final
        gradient)."""
        return cls(lbfgs.s_hist, lbfgs.y_hist, lbfgs._g, lbfgs.t_hist,
                   H0=H0, L0=L0, rank2=rank2)

    def hvp(self, vec):
        """Inverse-Hessian vector product H v."""
        return factored_hvp(vec, self.H0, self.u, self.v)

    def lvp(self, vec):
        """Cholesky vector product L v (H = L L^T)."""
        return factored_lvp(vec, self.L0, self.u, self.v)

    # hmat BaseMat-compatible aliases
    matvec = hvp
    mat_vec_mul = hvp

    def to_dense(self, hess=True):
        """Dense H (hess=True) or dense L (hess=False)."""
        eye = jnp.eye(self.N)
        M = eye if (self.H0 if hess else self.L0) is None else \
            _to_dense_op(self.H0 if hess else self.L0, self.N)
        for u, v in zip(self.u, self.v):
            V = eye + jnp.outer(u, v)
            M = V @ M @ V.T if hess else V @ M
        return M

    def __call__(self, vec):
        """Cholesky vector product (cov_L protocol)."""
        return self.lvp(vec)

    def chol(self):
        """Dense L with H = L L^T (NOT triangular — the factored onion
        product; use lvp for the matrix-free action)."""
        return self.to_dense(hess=False)


def _to_dense_op(M, n):
    if hasattr(M, "to_dense"):
        return jnp.asarray(M.to_dense())
    M = jnp.asarray(M)
    return jnp.diag(M) if M.ndim < 2 else M
