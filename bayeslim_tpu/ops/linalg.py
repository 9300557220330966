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
    "cmult", "cdiv", "cconj", "ceinsum", "cinv",
    "diag_matmul", "diag_inv", "invert_matrix", "cholesky_inverse",
    "least_squares",
]


# --- trivial complex aliases (reference linalg.py:10-115) -------------------
def cmult(a, b):
    return a * b


def cdiv(a, b):
    return a / b


def cconj(a):
    return jnp.conj(a)


def ceinsum(eq, *ops):
    return jnp.einsum(eq, *ops)


def cinv(a):
    return jnp.linalg.inv(a)


def diag_matmul(d, m, dim=-2):
    """Multiply diagonal (given as vector d) with matrix m along dim."""
    shape = [1] * m.ndim
    shape[dim] = -1
    return d.reshape(shape) * m


def diag_inv(d, eps=0.0):
    return 1.0 / (d + eps)


def cholesky_inverse(L):
    """Inverse of A given its lower Cholesky factor L (linalg.py:365)."""
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return Linv.conj().T @ Linv


def invert_matrix(A, method="pinv", rcond=1e-15, eps=0.0, hermitian=False):
    """Matrix inversion dispatch (reference linalg.py:404).

    method : 'pinv' | 'chol' | 'lstsq' | 'diag' | 'inv'
    """
    if method == "diag":
        d = jnp.diagonal(A, axis1=-2, axis2=-1)
        out = jnp.zeros_like(A)
        idx = jnp.arange(A.shape[-1])
        return out.at[..., idx, idx].set(1.0 / (d + eps))
    if eps:
        A = A + eps * jnp.eye(A.shape[-1], dtype=A.dtype)
    if method == "pinv":
        return jnp.linalg.pinv(A, rcond=rcond, hermitian=hermitian)
    if method == "chol":
        L = jnp.linalg.cholesky(A)
        return cholesky_inverse(L)
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
                  eps=0.0, hermitian=True, return_D=True):
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

    Returns
    -------
    x : solution with x.shape[dim] == Nfeatures
    D : the normalization matrix (if return_D)
    """
    A = jnp.asarray(A)
    y = jnp.asarray(y)
    if jnp.iscomplexobj(A) and not jnp.iscomplexobj(y):
        y = y.astype(A.dtype)

    y2, undo = _moveaxis_for_dim(y, dim)  # (..., Nsamples)

    if Ninv is None:
        AhN = A.conj().T                        # (Nfeat, Nsamp)
        AhNA = A.conj().T @ A                   # (Nfeat, Nfeat)
    elif Ninv.ndim == 1 or (Ninv.shape == y.shape):
        if Ninv.shape == y.shape:
            w, _ = _moveaxis_for_dim(Ninv, dim)
        else:
            w = Ninv
        AhN = A.conj().T[..., None, :, :] * w[..., None, :]  # broadcast diag
        AhNA = jnp.einsum("...fs,sg->...fg", AhN, A)
        x = jnp.einsum("...fs,...s->...f", AhN, y2)
        if D is None:
            D = invert_matrix(AhNA, "pinv" if pinv else "inv",
                              rcond=rcond, eps=eps, hermitian=hermitian)
        x = jnp.einsum("...fg,...g->...f", D, x)
        x = undo(x)
        return (x, D) if return_D else x
    else:
        AhN = A.conj().T @ Ninv
        AhNA = AhN @ A

    if D is None:
        D = invert_matrix(AhNA, "pinv" if pinv else "inv",
                          rcond=rcond, eps=eps, hermitian=hermitian)

    x = jnp.einsum("fg,gs,...s->...f", D, AhN, y2)
    x = undo(x)
    return (x, D) if return_D else x
