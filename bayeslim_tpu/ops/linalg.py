"""
Linear algebra helpers: weighted least squares, matrix inversion dispatch,
diagonal-matrix shortcuts.

Reference parity: bayeslim/linalg.py. The reference's complex-as-real-pair
helpers (cmult/cdiv/cconj/ceinsum, linalg.py:10-115) are unnecessary in JAX
(native complex support) and exist only as thin aliases.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "cmult", "cdiv", "cconj", "ceinsum", "cinv", "angle", "abs",
    "diag_matmul", "diag_inv", "invert_matrix", "cholesky_inverse",
    "least_squares",
]


# --- trivial complex aliases (reference linalg.py:10-115) -------------------
def cmult(a, b):
    return a * b


def angle(a):
    """Complex phase [rad] (reference linalg.py angle — the reference
    operates on 2-real-view tensors; JAX complex is native)."""
    return jnp.angle(a)


def abs(a):
    """Complex magnitude (reference linalg.py abs)."""
    return jnp.abs(a)


def cdiv(a, b):
    return a / b


def cconj(a):
    return jnp.conj(a)


def ceinsum(eq, *ops):
    return jnp.einsum(eq, *ops)


def cinv(a):
    return jnp.linalg.inv(a)


def diag_matmul(a, b):
    """Multiply stacks of diagonal 1x1 or 2x2 (pol) matrices on the two
    LEADING axes, dropping off-diagonal terms (reference
    linalg.py:116-149 — it specifically ignores the off-diagonals)."""
    if a.shape[0] == 1:
        return a * b
    if a.shape[0] == 2:
        c = jnp.zeros_like(a * b)
        c = c.at[0, 0].set(a[0, 0] * b[0, 0])
        return c.at[1, 1].set(a[1, 1] * b[1, 1])
    raise ValueError("only 1x1 or 2x2 tensors")


def diag_inv(a):
    """Invert stacks of diagonal 1x1 or 2x2 (pol) matrices on the two
    LEADING axes, dropping off-diagonals (reference linalg.py:151-178)."""
    if a.shape[0] == 1:
        return 1.0 / a
    if a.shape[0] == 2:
        c = jnp.zeros_like(a)
        c = c.at[0, 0].set(1.0 / a[0, 0])
        return c.at[1, 1].set(1.0 / a[1, 1])
    raise ValueError("only 1x1 or 2x2 tensors")


def cholesky_inverse(A, check_errors=True):
    """Inverse of a positive-definite A via its Cholesky factorization
    (reference linalg.py:365-402): returns (Ainv, L). 1-D input inverts
    elementwise with L = sqrt(A). check_errors validates positive
    definiteness (the factor is finite; jax.linalg.cholesky returns NaN
    rather than raising). NOTE: the reference combines Linv with a
    plain transpose (Linv.T @ Linv), wrong for complex inputs — here
    the conjugate transpose recovers the true inverse (pinned in
    tests/test_reference_parity.py)."""
    A = jnp.asarray(A)
    if A.ndim == 1:
        return 1.0 / A, jnp.sqrt(A)
    L = jnp.linalg.cholesky(A)
    if check_errors and not isinstance(L, jax.core.Tracer) \
            and not bool(jnp.all(jnp.isfinite(L))):
        raise np.linalg.LinAlgError("matrix is not positive definite")
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return Linv.conj().T @ Linv, L


def invert_matrix(A, method="pinv", rcond=1e-15, eps=0.0, hermitian=False,
                  inv=None, driver=None):
    """Matrix inversion dispatch (reference linalg.py:404).

    method : 'pinv' | 'chol' | 'lstsq' | 'diag' | 'inv'
    (`inv=` is accepted as the reference's name for `method`; `driver`
    is accepted for signature compatibility. As in the reference, eps
    regularizes only the inv/pinv/chol/lstsq branches, 1-D input
    returns 1/A, and 'diag' inverts the diagonal.)
    """
    if inv is not None:
        method = inv
    if A.ndim == 1:
        return 1.0 / A
    if method == "diag":
        d = jnp.diagonal(A, axis1=-2, axis2=-1)
        out = jnp.zeros_like(A)
        idx = jnp.arange(A.shape[-1])
        return out.at[..., idx, idx].set(1.0 / d)
    if eps:
        A = A + eps * jnp.eye(A.shape[-1], dtype=A.dtype)
    if method == "pinv":
        return jnp.linalg.pinv(A, rcond=rcond, hermitian=hermitian)
    if method == "chol":
        return cholesky_inverse(A, check_errors=False)[0]
    if method == "lstsq":
        eye = jnp.eye(A.shape[-1], dtype=A.dtype)
        return jnp.linalg.lstsq(A, eye, rcond=rcond)[0]
    if method == "inv":
        return jnp.linalg.inv(A)
    raise ValueError(f"unknown inversion method {method}")


def _moveaxis_for_dim(y, dim):
    """Move `dim` of y to the last axis; return moved array + inverse fn."""
    y2 = jnp.moveaxis(y, dim, -1)
    return y2, lambda x: jnp.moveaxis(x, -1, dim)


def least_squares(A, y, dim=-1, Ninv=None, D=None, pinv=True, rcond=1e-15,
                  eps=0.0, hermitian=True, return_D=True, mode="matrix",
                  norm="inv", preconj=False, pretran=False, Ndiag=None,
                  driver=None):
    """Generalized weighted least squares: x = D A^H Ninv y.

    Reference parity: bayeslim/linalg.py:481-820. Solves y = A x along
    dimension `dim` of y with optional inverse noise covariance Ninv.

    Parameters
    ----------
    A : (Nsamples, Nfeatures) design matrix
    y : data with y.shape[dim] == Nsamples
    dim : dimension of y that A acts upon
    Ninv : optional inverse covariance. Either a vector broadcastable
        against y (diagonal) or an (Nsamples, Nsamples) matrix.
    D : optional precomputed normalization (A^H Ninv A)^(-1)
    pinv : use pseudo-inverse for D (else direct inverse)
    hermitian : passed to pinv
    mode : 'matrix' (normal equations, good for small Nfeatures) or
        'lstsq' (QR-based jnp.linalg.lstsq, good for large Nfeatures)
    norm : None (D = identity, unnormalized A^H Ninv y), 'inv'/'pinv'/
        'chol' (invert A^H Ninv A), or 'diag' (invert its diagonal only)
    preconj/pretran : A arrives already conjugated / transposed
        (reference's large-GPU-transfer conveniences)
    Ndiag : force the diagonal (True) or matrix (False) interpretation
        of Ninv; default infers from its shape
    driver : accepted for API compat (jnp.linalg.lstsq has one driver)

    Returns
    -------
    x : solution with x.shape[dim] == Nfeatures
    D : the normalization matrix (if return_D; None for norm=None/lstsq)
    """
    A = jnp.asarray(A)
    y = jnp.asarray(y)
    if pretran:
        A = A.T
    if preconj:
        A = A.conj()
    if jnp.iscomplexobj(A) and not jnp.iscomplexobj(y):
        y = y.astype(A.dtype)

    y2, undo = _moveaxis_for_dim(y, dim)  # (..., Nsamples)
    if Ndiag is None:
        Ndiag = Ninv is None or Ninv.ndim == 1 or Ninv.shape == y.shape

    if mode == "lstsq":
        Aw, yw = A, y2
        if Ninv is not None:
            if Ndiag:
                w = jnp.sqrt(Ninv if Ninv.ndim == 1
                             else _moveaxis_for_dim(Ninv, dim)[0])
                Aw = A * (w[:, None] if w.ndim == 1 else 1.0)
                yw = y2 * w
            else:
                L = jnp.linalg.cholesky(Ninv)
                Aw = L.conj().T @ A
                yw = jnp.einsum("sk,...k->...s", L.conj().T, y2)
        x = jnp.linalg.lstsq(Aw, yw.reshape(-1, yw.shape[-1]).T,
                             rcond=rcond)[0].T
        x = x.reshape(y2.shape[:-1] + (A.shape[-1],))
        x = undo(x)
        return (x, None) if return_D else x

    assert mode == "matrix"
    if Ninv is None:
        AhN = A.conj().T                        # (Nfeat, Nsamp)
        AhNA = A.conj().T @ A                   # (Nfeat, Nfeat)
    elif Ndiag:
        if Ninv.ndim == 1:
            AhN = A.conj().T * Ninv                 # (Nfeat, Nsamp)
        else:
            w, _ = _moveaxis_for_dim(Ninv, dim)
            AhN = A.conj().T[..., None, :, :] * w[..., None, :]
        AhNA = jnp.einsum("...fs,sg->...fg", AhN, A)
        x = jnp.einsum("...fs,...s->...f", AhN, y2)
        if norm is None:
            return (undo(x), None) if return_D else undo(x)
        if D is None:
            D = _lsq_norm(AhNA, norm, pinv, rcond, eps, hermitian)
        x = _apply_D(D, x, norm)
        x = undo(x)
        return (x, D) if return_D else x
    else:
        AhN = A.conj().T @ Ninv
        AhNA = AhN @ A

    x = jnp.einsum("fs,...s->...f", AhN, y2)
    if norm is None:
        return (undo(x), None) if return_D else undo(x)
    if D is None:
        D = _lsq_norm(AhNA, norm, pinv, rcond, eps, hermitian)
    x = _apply_D(D, x, norm)
    x = undo(x)
    return (x, D) if return_D else x


def _lsq_norm(AhNA, norm, pinv, rcond, eps, hermitian):
    """Normalization matrix for least_squares given `norm`."""
    if norm == "diag":
        d = jnp.diagonal(AhNA, axis1=-2, axis2=-1)
        return 1.0 / (d + eps if eps else d)
    method = norm if norm in ("pinv", "chol") else \
        ("pinv" if pinv else "inv")
    return invert_matrix(AhNA, method, rcond=rcond, eps=eps,
                         hermitian=hermitian)


def _apply_D(D, x, norm):
    if norm == "diag":
        return D * x
    return jnp.einsum("...fg,...g->...f", D, x)


def apply_phasor(z, phi):
    """Apply a complex phasor exp(i phi) to z (reference linalg.py:220).
    Works on native complex or 2-real-pair (trailing dim 2) tensors."""
    if jnp.iscomplexobj(z):
        return z * jnp.exp(1j * jnp.asarray(phi))
    from ..utils.dtypes import viewcomp, viewreal
    return viewreal(viewcomp(z) * jnp.exp(1j * jnp.asarray(phi)))


def project_out_phase(z, avg_axis=None, select=None):
    """Compute and project out the phase of z (reference linalg.py:239):
    optionally average along avg_axis and/or index with `select` before
    taking the angle, then rotate z by its negative."""
    from ..utils.dtypes import viewcomp
    zc = z if jnp.iscomplexobj(z) else viewcomp(z)
    za = jnp.mean(zc, axis=avg_axis, keepdims=True) \
        if avg_axis is not None else zc
    if select is not None:
        za = za[tuple(select)]
    return apply_phasor(z, -jnp.angle(za))


def cmatmul(a, b):
    """1x1 or 2x2 complex matrix multiply along the leading two axes
    (reference linalg.py:296 hand-rolls this on 2-real pairs; JAX complex
    is native, so it is one einsum)."""
    assert a.shape[0] == a.shape[1] == b.shape[0] == b.shape[1]
    assert a.shape[0] in (1, 2)
    return jnp.einsum("ab...,bc...->ac...", a, b)


def cov_get_diag(cov, cov_axis, mode="vis", shape=None):
    """Diagonal of a structured covariance reshaped to the data shape
    (reference optim.py:1918-1973). cov_axis conventions match
    inference.prob.apply_icov."""
    if cov_axis is None:
        return cov
    diag = jnp.diagonal(cov, axis1=-2, axis2=-1)
    if cov_axis == "full":
        assert shape is not None
        return diag.reshape(shape)
    if cov_axis == "bl":        # (Np,Np,Nt,Nf,Nbl) -> (Np,Np,Nbl,Nt,Nf)
        return jnp.moveaxis(diag, -1, 2)
    if cov_axis == "time":      # (Np,Np,Nbl,Nf,Nt) -> (Np,Np,Nbl,Nt,Nf)
        return jnp.moveaxis(diag, -1, 3)
    if cov_axis == "freq":
        if mode == "vis":       # (Np,Np,Nbl,Nt,Nf) already trailing
            return diag
        return jnp.moveaxis(diag, -1, -2)   # map: (Np,1,Npix,Nf)->(..,Nf,Npix)
    if cov_axis == "pix":
        return diag
    raise ValueError(cov_axis)
