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
    "FactoredInvHessian",
]


def main_params_index(pdict):
    """Slice into the raveled vector for each ParamDict key
    (reference optim.py:2358)."""
    out = {}
    i = 0
    for k in pdict.keys():
        n = int(np.prod(np.shape(pdict[k]))) or 1
        out[k] = slice(i, i + n)
        i += n
    return out


def _hessian_one(prob, batch_idx, pdict, rows_chunk, keys):
    """Hessian of one batch of one LogProb (forward-over-reverse)."""
    if pdict is None:
        pdict = prob.collect_main_params()
    if keys is not None:
        pdict = ParamDict({k: pdict[k] for k in keys})
    template = pdict.copy()
    x0 = pdict.ravel()
    n = x0.size

    def f(x):
        return prob.forward(template.unravel(x), idx=batch_idx)

    grad_f = jax.grad(f)

    # second-order AD cannot cross the fused kernels' custom_vjp;
    # trace the Hessian through the fully-differentiable XLA path
    from ..ops.rime_kernel import force_xla
    with force_xla():
        if rows_chunk is None or rows_chunk >= n:
            H = jax.jacfwd(grad_f)(x0)
        else:
            rows = []
            eye = np.eye(n)

            jvp_grad = jax.jit(lambda x, v: jax.jvp(grad_f, (x,), (v,))[1])
            for i0 in range(0, n, rows_chunk):
                block = [jvp_grad(x0, jnp.asarray(eye[i]))
                         for i in range(i0, min(i0 + rows_chunk, n))]
                rows.append(jnp.stack(block))
            H = jnp.concatenate(rows, axis=0)
    return H, main_params_index(pdict)


def compute_hessian(prob, pdict=None, rows_chunk=None, keys=None,
                    batches="all"):
    """Dense Hessian of the (negative log) posterior w.r.t. the raveled
    ParamDict (reference optim.py:2008-2181).

    prob may be a single LogProb, a ShardedLogProb, or a LIST of
    independent LogProbs (the reference's multi-prob/multi-device row
    blocking); Hessians sum across probs. Minibatch-aware: with
    batches='all' the per-batch Hessians accumulate over every (time x
    bl) group (the prior enters once, at batch 0, like the forward).

    rows_chunk bounds memory: forward-over-reverse is evaluated for
    `rows_chunk` tangent directions per pass. keys restricts to a subset
    of parameters (block of the full Hessian).

    Returns (H (n, n), index dict key->slice).
    """
    probs = list(prob) if isinstance(prob, (list, tuple)) else [prob]
    # a ShardedLogProb wraps the real LogProb (which holds the sharded
    # model); unwrap so prob.forward exists
    probs = [getattr(p, "prob", p) if not hasattr(p, "forward") else p
             for p in probs]
    H, index = None, None
    for p in probs:
        nb = getattr(p, "Nbatch", 1) if batches == "all" else 1
        for i in range(nb):
            Hb, index = _hessian_one(p, i, pdict, rows_chunk, keys)
            H = Hb if H is None else H + Hb
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


def invert_hessian(H, inv="pinv", rcond=1e-15, eps=None, hermitian=True,
                   rm_offdiag=False):
    """Invert a Hessian into a covariance (reference optim.py:2182-2281)."""
    if rm_offdiag:
        H = jnp.diag(jnp.diagonal(H))
    if eps:
        H = H + jnp.eye(H.shape[0], dtype=H.dtype) * eps
    return invert_matrix(H, method=inv, rcond=rcond, hermitian=hermitian)


def mask_hessian(H, mask):
    """Select the sub-Hessian of unmasked parameters
    (reference optim.py:2282)."""
    idx = np.where(np.asarray(mask).ravel())[0]
    return H[np.ix_(idx, idx)], idx


def unmask_hessian(Hsub, mask, fill=0.0):
    """Scatter a sub-Hessian back to full size (reference optim.py:2308)."""
    mask = np.asarray(mask).ravel()
    n = mask.size
    idx = np.where(mask)[0]
    H = jnp.full((n, n), fill, dtype=Hsub.dtype)
    return H.at[np.ix_(idx, idx)].set(Hsub)


def compute_icov(cov, cov_axis=None, inv="pinv", **kwargs):
    """Invert a data covariance (reference optim.py:1974-2007)."""
    if cov_axis is None:
        return 1.0 / cov
    return invert_matrix(cov, method=inv, **kwargs)


def implicit_to_dense(matvec, n, dtype=jnp.float64):
    """Materialize an implicit operator by applying it to identity columns
    (reference bfgs.py:681-724)."""
    eye = jnp.eye(n, dtype=dtype)
    cols = [matvec(eye[:, i]) for i in range(n)]
    return jnp.stack(cols, axis=1)


class FactoredInvHessian:
    """Factored inverse-Hessian from quasi-Newton (s, y) pairs
    (reference bfgs.py:726-1049).

    H = (prod_k V_k)^T H0 (prod_k V_k) + sum_k rho_k-weighted terms via
    the standard two-loop recursion; exposes matvec (H v), a dense
    materialization, and a Cholesky action for HMC mass matrices
    (cov_L with H = L L^T).
    """

    def __init__(self, s_hist, y_hist, H0_diag=1.0):
        self.s = [jnp.asarray(s) for s in s_hist]
        self.y = [jnp.asarray(y) for y in y_hist]
        self.rho = [1.0 / float(y @ s) for s, y in zip(self.s, self.y)]
        self.H0_diag = H0_diag
        self.n = int(self.s[0].size) if self.s else None
        self._L = None

    @classmethod
    def from_lbfgs(cls, lbfgs):
        return cls(lbfgs.s_hist, lbfgs.y_hist, lbfgs.H_diag)

    def matvec(self, v):
        """H v via two-loop recursion (factored_hvp, bfgs.py:880)."""
        q = v
        alphas = []
        for s, y, rho in zip(reversed(self.s), reversed(self.y),
                             reversed(self.rho)):
            a = rho * float(s @ q)
            alphas.append(a)
            q = q - a * y
        r = q * self.H0_diag
        for (s, y, rho), a in zip(zip(self.s, self.y, self.rho),
                                  reversed(alphas)):
            b = rho * float(y @ r)
            r = r + (a - b) * s
        return r

    def to_dense(self):
        assert self.n is not None
        return implicit_to_dense(self.matvec, self.n)

    def chol(self):
        """Lower Cholesky of the dense H (cov_L for HMC momenta)."""
        if self._L is None:
            self._L = jnp.linalg.cholesky(self.to_dense())
        return self._L

    def lvp(self, v):
        """L v with H = L L^T (factored_lvp, bfgs.py:990)."""
        return self.chol() @ v

    def mat_vec_mul(self, v):
        # hmat BaseMat-compatible interface (usable as invchol in HMC
        # is NOT correct — this is H itself; use .chol() for cov_L)
        return self.matvec(v)
