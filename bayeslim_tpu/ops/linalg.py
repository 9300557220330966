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


def cholesky_inverse(L):
    """Inverse of A given its lower Cholesky factor L (linalg.py:365)."""
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return Linv.conj().T @ Linv


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
