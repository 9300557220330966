"""
Generic linear blocks y = A x along an arbitrary dimension.

Reference parity: bayeslim/linear_model.py (LinearModel :15-259, MultiLM
:262, DictLM :300, gen_linear_A :347, gen_fourier_A :414, gen_poly_A :450).

TPU-first: design matrices are generated on host (numpy/scipy) as
constants; forward passes are einsum contractions that XLA fuses and maps
onto the MXU. The reference's per-case matmul dispatch collapses to one
einsum with a computed signature.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import special as scispc

from ..utils import Module
from ..utils.dtypes import _float
from ..ops import linalg

__all__ = [
    "LinearModel", "MultiLM", "DictLM",
    "gen_linear_A", "gen_poly_A", "gen_fourier_A", "prep_xarr",
]

_LETTERS = "ijklmnop"


def whiten_xarr(x, x0=None, dx=None):
    """Whiten a monotonically increasing array to ~[-1, 1] (reference
    utils.whiten_xarr, utils.py:244-279). Returns (xw, x0, dx)."""
    x = np.asarray(x, dtype=np.float64)
    x0 = float(x.mean()) if x0 is None else float(x0)
    xc = x - x0
    if dx is None:
        # range [-1+step/2, 1-step/2] for uniform sampling
        step = (x[-1] - x[0]) / max(len(x) - 1, 1)
        dx = float(xc.max() + step / 2)
    if dx == 0:
        dx = 1.0
    return xc / dx, x0, dx


def prep_xarr(x, d0=None, logx=False, whiten=False, x0=None, dx=None):
    """Prepare an independent-variable array (reference utils.prep_xarr,
    utils.py:200-241 — whiten defaults OFF here; gen_poly_A turns it on).

    Returns (x_prepped, x0, dx) where whitening maps x -> (x - x0)/dx.
    """
    x = np.asarray(x, dtype=np.float64)
    if d0:
        x = x / d0
    if logx:
        x = np.log(x)
    if whiten:
        x, x0, dx = whiten_xarr(x, x0, dx)
    return x, x0, dx


def gen_poly_A(x, Ndeg, basis="direct", d0=None, logx=False, whiten=True,
               x0=None, dx=None, qr=False):
    """Polynomial design matrix (Nx, Ndeg) (reference :450-520)."""
    x, _, _ = prep_xarr(x, d0=d0, logx=logx, whiten=whiten, x0=x0, dx=dx)
    if basis == "direct":
        A = np.vstack([x ** i for i in range(Ndeg)]).T
    elif basis == "legendre":
        A = np.vstack([scispc.eval_legendre(i, x) for i in range(Ndeg)]).T
    elif basis == "chebyshevt":
        A = np.vstack([scispc.eval_chebyt(i, x) for i in range(Ndeg)]).T
    elif basis == "chebyshevu":
        A = np.vstack([scispc.eval_chebyu(i, x) for i in range(Ndeg)]).T
    elif basis == "laguerre":
        A = np.vstack([scispc.eval_laguerre(i, x) for i in range(Ndeg)]).T
    else:
        raise NameError(f"unrecognized poly basis {basis}")
    if qr:
        A = np.linalg.qr(A)[0]
    return jnp.asarray(A, dtype=_float())


def gen_fourier_A(x, Ndeg=None, fft_norm="ortho"):
    """Complex Fourier design matrix (Nx, Ndeg) + mode freqs (reference :414)."""
    x = np.asarray(x, dtype=np.float64)
    N = len(x)
    A = np.fft.fftshift(np.fft.fft(np.eye(N), axis=-1, norm=fft_norm), axes=-1)
    freqs = np.fft.fftshift(np.fft.fftfreq(N, x[1] - x[0]))
    if Ndeg is not None:
        n0 = N // 2 - Ndeg // 2
        A = A[:, n0:n0 + Ndeg]
        freqs = freqs[n0:n0 + Ndeg]
    return jnp.asarray(A), jnp.asarray(freqs)


def gen_linear_A(linear_mode, A=None, x=None, d0=None, logx=False,
                 whiten=True, x0=None, dx=None, Ndeg=None, basis="direct",
                 qr=False, dtype=None, fft_norm="ortho", **kwargs):
    """Generate a design matrix (Nsamples, Nfeatures) (reference :347-412)."""
    if linear_mode == "poly":
        A = gen_poly_A(x, Ndeg, basis=basis, d0=d0, logx=logx,
                       whiten=whiten, x0=x0, dx=dx, qr=qr)
    elif linear_mode == "custom":
        assert A is not None
        A = jnp.asarray(A)
    elif linear_mode == "fourier":
        A, _ = gen_fourier_A(x, Ndeg=Ndeg, fft_norm=fft_norm)
    else:
        raise NameError(f"linear_mode {linear_mode} not recognized")
    if dtype is not None:
        A = A.astype(dtype)
    # DELIBERATE divergence: with no explicit dtype the reference casts
    # the COMPLEX fourier A to its default float dtype (reference
    # :393-412), silently discarding the imaginary half of every mode;
    # we keep the complex matrix (pass dtype= explicitly to cast).
    return jnp.atleast_1d(A)


class LinearModel(Module):
    """y = A x along dimension `dim` of the input (reference :15-259)."""

    def __init__(self, linear_mode, dim=0, coeff=None, diag=False, idx=None,
                 out_dtype=None, out_reshape=None, out_shape=None,
                 out_real=False, meta=None, name=None, **kwargs):
        super().__init__(name=name)
        self.linear_mode = linear_mode
        self.dim = dim
        self.coeff = None if coeff is None else jnp.asarray(coeff)
        self.diag = diag
        self.idx = None if idx is None else np.asarray(idx)
        self.out_dtype = out_dtype
        self.out_reshape = out_reshape
        self.out_shape = out_shape
        self.out_real = out_real
        self.meta = meta if meta is not None else {}
        self.kwargs = dict(kwargs)

        if linear_mode == "poly" and kwargs.get("whiten", False):
            _, x0, dx = prep_xarr(kwargs.get("x"), d0=kwargs.get("d0"),
                                  logx=kwargs.get("logx", False), whiten=True,
                                  x0=kwargs.get("x0"), dx=kwargs.get("dx"))
            self.kwargs.setdefault("x0", x0)
            self.kwargs.setdefault("dx", dx)

        self.A = gen_linear_A(linear_mode, **kwargs)
        self.freqs = None
        if linear_mode == "fourier":
            _, self.freqs = gen_fourier_A(kwargs.get("x"),
                                          Ndeg=kwargs.get("Ndeg"),
                                          fft_norm=kwargs.get("fft_norm", "ortho"))
        self._A_ndim = self.A.ndim
        self._D = None

    def forward(self, params, A=None, coeff=None, **kwargs):
        A = self.A if A is None else A
        coeff = self.coeff if coeff is None else coeff
        if coeff is not None:
            params = params * coeff
        if self.idx is not None:
            params = jnp.take(params, jnp.asarray(self.idx), axis=self.dim)

        ndim = params.ndim
        dim = self.dim % ndim
        if self.diag:
            shape = [1] * ndim
            shape[dim] = -1
            out = A.reshape(shape) * params
        else:
            # one einsum covers every dim/batch case the reference dispatches
            t2 = list(_LETTERS[:ndim])
            t2[dim] = "b"
            t2 = "".join(t2)
            if A.ndim == 2:
                t1 = "ab"
            else:
                t1 = t2[dim - A.ndim + 2:dim] + "ab"
            tout = t2.replace("b", "a")
            if jnp.iscomplexobj(A) and not jnp.iscomplexobj(params):
                params = params.astype(A.dtype)
            out = jnp.einsum(f"{t1},{t2}->{tout}", A, params)

        if self.out_dtype is not None:
            out = out.astype(self.out_dtype)
        if self.out_real:
            out = out.real
        if self.out_reshape is not None:
            out = out.reshape(self.out_reshape)
        return out

    def least_squares(self, y, out_shape=None, Ninv=None, cache_D=False,
                      **kwargs):
        """Invert y = A x for x (reference :174-214)."""
        A = self.A
        if self.diag:
            n = y.shape[self.dim]
            d = A if A.shape[0] == n else jnp.broadcast_to(A, (n,))
            A = jnp.diag(d)
        out_shape = out_shape if out_shape is not None else self.out_shape
        if out_shape is not None:
            y = y.reshape(out_shape)
        params, D = linalg.least_squares(A, y, dim=self.dim, Ninv=Ninv,
                                         D=self._D, **kwargs)
        if cache_D:
            self._D = D
        return params

    def generate_A(self, x, **interp_kwargs):
        """Regenerate A at new sample values (reference :216-246)."""
        if self.linear_mode == "custom":
            from scipy.interpolate import interp1d
            f = interp1d(np.asarray(self.kwargs["x"]), np.asarray(self.A),
                         axis=0, **interp_kwargs)
            return jnp.asarray(f(np.asarray(x)))
        kw = dict(self.kwargs)
        kw["x"] = x
        return gen_linear_A(self.linear_mode, **kw)


class MultiLM(Module):
    """Chain LinearModels on ONE tensor: params -> LM_n(...LM_1(params))
    (reference :262-298 — each LM typically acts along a different dim;
    least_squares inverts the chain the same way)."""

    def __init__(self, LMs, name=None):
        super().__init__(name=name)
        self.LMs = list(LMs)

    def forward(self, params, **kwargs):
        for lm in self.LMs:
            params = lm(params, **kwargs)
        return params

    def least_squares(self, y, **kwargs):
        for lm in self.LMs:
            y = lm.least_squares(y, **kwargs)
        return y


class DictLM(Module):
    """Per-parameter-name LinearModel dict (reference :300).

    Used as a main_params preconditioner: forward(name, params).
    """

    def __init__(self, LMs, name=None):
        super().__init__(name=name)
        self.LMs = dict(LMs)

    def forward(self, name, params, **kwargs):
        if name in self.LMs:
            return self.LMs[name](params, **kwargs)
        return params

    def least_squares(self, name, y, **kwargs):
        return self.LMs[name].least_squares(y, **kwargs)
