"""
Filtering blocks: matrix filters, Gaussian-process (Wiener) filters,
least-squares filters, baseline-dependent wedge filters + covariance
kernels.

Reference parity: bayeslim/filt.py (BaseFilter :11, MatFilter :37,
GPFilter :191, LstSqFilter :317, WedgeFilter :352, rbf/exp/sinc/
gauss_sinc covs + phasor_mat :404-609, gen_cov_modes :610).

All filters are insertable in forward chains (they are Modules acting on
tensors or data containers); the G-matrix product is one einsum -> MXU
matmul.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import Module
from ..ops import linalg
from ..data.containers import TensorData, VisData

__all__ = [
    "BaseFilter", "MatFilter", "GPFilter", "LstSqFilter", "WedgeFilter",
    "rbf_cov", "exp_cov", "sinc_cov", "gauss_sinc_cov", "phasor_mat",
    "gen_cov_modes",
]

_EIN = "abcdefgh"


class BaseFilter(Module):
    """Base 1D filter over dimension `dim` (reference filt.py:11-35)."""

    def __init__(self, dim=0, name=None):
        super().__init__(name=name)
        self.dim = dim


class MatFilter(BaseFilter):
    """y_filt = G @ y along dim; residual=True returns y - G y
    (reference filt.py:37-190)."""

    def __init__(self, G=None, dim=-1, residual=False, input_idx=None,
                 name=None):
        super().__init__(dim=dim, name=name)
        self.G = None if G is None else jnp.asarray(G)
        self.residual = residual
        self.input_idx = None if input_idx is None else np.asarray(input_idx)
        self._idx = None
        self._rowidx = None

    def setup_filter(self, G=None):
        if G is not None:
            self.G = jnp.asarray(G)

    def set_G_idx(self, idx=None, rowidx=None):
        """Sub-index G's columns (idx) and rows (rowidx) before applying
        (reference :160-190)."""
        self._idx = idx
        self._rowidx = rowidx if rowidx is not None else idx

    def predict(self, y, **kwargs):
        if isinstance(y, TensorData):
            out = y.copy()
            out.data = self.predict(out.data)
            return out
        G = self.G
        if self._idx is not None:
            G = G[np.asarray(self._rowidx)[:, None], np.asarray(self._idx)]
        ein = list(_EIN[:y.ndim])
        ein[self.dim] = "j"
        ein = "".join(ein)
        Gc = G.astype(y.dtype) if jnp.iscomplexobj(y) else G
        return jnp.einsum(f"ij,{ein}->{ein.replace('j', 'i')}", Gc, y)

    def forward(self, y, **kwargs):
        if isinstance(y, TensorData):
            out = y.copy()
            out.data = self.forward(y.data, **kwargs)
            return out
        y = jnp.asarray(y)
        y_filt = self.predict(y, **kwargs)
        if self.input_idx is not None:
            idx = [slice(None)] * y.ndim
            idx[self.dim] = jnp.asarray(self.input_idx)
            if self.residual:
                return y.at[tuple(idx)].add(-y_filt)
            return y.at[tuple(idx)].set(y_filt)
        return y - y_filt if self.residual else y_filt


class GPFilter(MatFilter):
    """Gaussian-process (Wiener) filter G = Cs [Cs + Cn]^-1 with
    prediction variance V (reference filt.py:191-316)."""

    def __init__(self, Cs, Cn, Cs_cross=None, Cs_pred=None, dim=-1,
                 residual=False, input_idx=None, name=None, inv="pinv",
                 hermitian=True, rcond=1e-15, eps=0.0):
        super().__init__(dim=dim, residual=residual, input_idx=input_idx,
                         name=name)
        self.Cs = jnp.asarray(Cs)
        self.Cn = jnp.asarray(Cn)
        self.Cs_cross = None if Cs_cross is None else jnp.asarray(Cs_cross)
        self.Cs_pred = None if Cs_pred is None else jnp.asarray(Cs_pred)
        self.inv = inv
        self.hermitian = hermitian
        self.rcond = rcond
        self.eps = eps
        self.setup_filter()

    def setup_filter(self, Cs=None, Cn=None, Cs_pred=None, Cs_cross=None,
                     **kwargs):
        if Cs is not None:
            self.Cs = jnp.asarray(Cs)
        if Cn is not None:
            self.Cn = jnp.asarray(Cn)
        if Cs_pred is not None:
            self.Cs_pred = jnp.asarray(Cs_pred)
        if Cs_cross is not None:
            self.Cs_cross = jnp.asarray(Cs_cross)
        # the Wiener inversion is a one-time host precompute: do it in
        # float64 numpy (an f32 pinv with the default rcond amplifies
        # instead of filtering) and cast the filter back to the working
        # dtype
        dt = self.Cs.dtype
        Cs64 = np.asarray(self.Cs, dtype=np.complex128
                          if jnp.iscomplexobj(self.Cs) else np.float64)
        Cn64 = np.asarray(self.Cn, dtype=Cs64.dtype)
        C64 = Cs64 + Cn64
        if self.eps:
            C64 = C64 + np.eye(C64.shape[-1], dtype=C64.dtype) * self.eps
        self.C = jnp.asarray(C64, dtype=dt)
        if self.inv == "chol":
            C_inv64 = np.linalg.inv(C64)
        elif self.inv == "diag":
            C_inv64 = np.diag(1.0 / np.diagonal(C64))
        else:
            C_inv64 = np.linalg.pinv(C64, rcond=self.rcond,
                                     hermitian=self.hermitian)
        self.C_inv = jnp.asarray(C_inv64, dtype=dt)
        cross = Cs64 if self.Cs_cross is None else \
            np.asarray(self.Cs_cross, dtype=Cs64.dtype)
        pred = Cs64 if self.Cs_pred is None else \
            np.asarray(self.Cs_pred, dtype=Cs64.dtype)
        self.G = jnp.asarray(cross @ C_inv64, dtype=dt)
        self.V = jnp.asarray(pred - cross @ C_inv64 @ cross.conj().T,
                             dtype=dt)

    def set_GV(self):
        """Recompute the filter matrix G and variance V from the current
        Cs / Cn / Cs_cross / Cs_pred (reference filt.py:306-314)."""
        self.setup_filter()


class LstSqFilter(MatFilter):
    """Least-squares filter with precomputed G = A D A^H Ninv
    (reference filt.py:317-351); residual=True by default."""

    def __init__(self, G=None, A=None, Ninv=None, dim=-1, residual=True,
                 name=None, **lsq_kwargs):
        if G is None:
            assert A is not None
            A = jnp.asarray(A)
            if Ninv is None:
                D = jnp.linalg.pinv(A.conj().T @ A)
                G = A @ D @ A.conj().T
            else:
                Ninv = jnp.asarray(Ninv)
                D = jnp.linalg.pinv(A.conj().T @ Ninv @ A)
                G = A @ D @ A.conj().T @ Ninv
        super().__init__(G=G, dim=dim, residual=residual, name=name)


class WedgeFilter(Module):
    """Per-baseline-group filters (e.g. baseline-dependent delay filters
    forming a wedge cut) (reference filt.py:352-403)."""

    def __init__(self, filters, filt2bls, bls=None, name=None):
        super().__init__(name=name)
        self.filters = list(filters)
        self.filt2bls = dict(filt2bls)
        self._bls2idx = {}
        if bls is not None:
            for i, _bls in self.filt2bls.items():
                self._bls2idx[i] = np.asarray([bls.index(bl) for bl in _bls])

    def forward(self, vd, **kwargs):
        if isinstance(vd, VisData):
            out = vd.copy()
            data = vd.data
            for i, bls in self.filt2bls.items():
                idx = vd._bl2ind(bls)
                block = jnp.take(data, jnp.asarray(idx), axis=2)
                filt = self.filters[i](block)
                data = data.at[:, :, jnp.asarray(idx)].set(filt)
            out.data = data
            return out
        data = jnp.asarray(vd)
        for i in self.filt2bls:
            idx = jnp.asarray(self._bls2idx[i])
            block = jnp.take(data, idx, axis=-3)
            data = data.at[..., idx, :, :].set(self.filters[i](block))
        return data


# ---------------------------------------------------------------------------
# covariance kernels (reference filt.py:404-609)
# ---------------------------------------------------------------------------

def _pairwise(x, x2):
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    x2 = x if x2 is None else np.atleast_1d(np.asarray(x2, dtype=np.float64))
    return x2[:, None] - x[None, :]


def rbf_cov(x, ls, amp=1.0, x2=None):
    """Gaussian (RBF) covariance amp * exp(-dx^2 / 2 ls^2)."""
    dx = _pairwise(x, x2)
    return jnp.asarray(amp * np.exp(-0.5 * dx ** 2 / ls ** 2))


def exp_cov(x, ls, amp=1.0, x2=None):
    """Exponential covariance amp * exp(-|dx| / ls)."""
    dx = _pairwise(x, x2)
    return jnp.asarray(amp * np.exp(-np.abs(dx) / ls))


def sinc_cov(x, ls, amp=1.0, x2=None):
    """Sinc covariance amp * sinc(dx / ls) (numpy normalized sinc)."""
    dx = _pairwise(x, x2)
    return jnp.asarray(amp * np.sinc(dx / ls))


def gauss_sinc_cov(x, gauss_ls, sinc_ls, amp=1.0, x2=None):
    """Product of Gaussian and sinc kernels (reference :523-560)."""
    dx = _pairwise(x, x2)
    return jnp.asarray(amp * np.exp(-0.5 * dx ** 2 / gauss_ls ** 2)
                       * np.sinc(dx / sinc_ls))


def phasor_mat(x, shift, neg=True, x2=None):
    """Complex phasor matrix exp(-+2j pi dx shift) to translate a kernel
    in Fourier space (reference :561-609)."""
    dx = _pairwise(x, x2)
    s = -2j if neg else 2j
    return jnp.asarray(np.exp(s * np.pi * dx * shift))


def gen_cov_modes(C, N=None, rcond=None):
    """Eigen-truncate a covariance into its top modes
    (reference filt.py:610-652). Returns (A (Nsamples, Nmodes), evals)."""
    C = jnp.asarray(C)
    evals, evecs = jnp.linalg.eigh(C)
    evals = evals[::-1]
    evecs = evecs[:, ::-1]
    if N is not None:
        evecs, evals = evecs[:, :N], evals[:N]
    elif rcond is not None:
        keep = evals > evals[0] * rcond
        evecs, evals = evecs[:, keep], evals[keep]
    return evecs, evals
