"""
Matrix-free structured-operator algebra for HMC mass matrices and
Hessian approximations.

Reference parity: bayeslim/hmat.py (BaseMat :13, DenseMat :71, DiagMat
:218, HadamardMat :349, TriangMat :461, SparseMat :593, ZeroMat :865,
OneMat :945, TransposedMat :1038, PartitionedMat :1129, SolveMat :1391,
MatDict :1575-1924, HierMat/HODLR :1925-2354).

All operators act on jnp arrays and are jit-compatible (methods are pure).
The HODLR hierarchy (HierMat) is implemented as a recursive 2x2 block
structure with low-rank off-diagonal blocks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BaseMat", "DenseMat", "DiagMat", "HadamardMat", "TriangMat",
    "SparseMat", "ZeroMat", "OneMat", "TransposedMat", "PartitionedMat",
    "SolveMat", "MatDict", "MatColumn", "MatRow", "MatSum",
    "HierMat", "SolveHierMat", "make_hodlr",
]


def _wrap_ref_kwargs(name, f):
    """Give an operator method the reference's (transpose=, out=)
    surface (reference hmat.py passes them through every class).

    transpose applies the CONJUGATE transpose (the reference's
    `self.H.T.conj()`); out, a torch preallocated-accumulator
    (`out[:] += result`), is functional here: the result is ADDED to
    out and returned (jax arrays are immutable, no aliasing). Methods
    that already take a transpose parameter keep their own handling."""
    import functools
    import inspect

    if "transpose" in inspect.signature(f).parameters:
        @functools.wraps(f)
        def method(self, *args, out=None, **kwargs):
            res = f(self, *args, **kwargs)
            if out is not None:
                res = out + res
            return res

        method._ref_kwargs = True
        return method

    @functools.wraps(f)
    def method(self, *args, transpose=False, out=None, **kwargs):
        if transpose:
            if name == "to_dense":
                res = f(self, *args, **kwargs).conj().T
            elif name == "mat_vec_mul":
                res = self.h_mat_vec_mul(args[0])
            else:  # mat_mat_mul
                res = jax.vmap(self.h_mat_vec_mul, in_axes=1,
                               out_axes=1)(args[0])
        else:
            res = f(self, *args, **kwargs)
        if out is not None:
            res = out + res
        return res

    method._ref_kwargs = True
    return method


class BaseMat:
    """Operator interface (reference hmat.py:13-68)."""

    shape = None

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        for name in ("mat_vec_mul", "mat_mat_mul", "to_dense"):
            f = cls.__dict__.get(name)
            if f is not None and not getattr(f, "_ref_kwargs", False):
                setattr(cls, name, _wrap_ref_kwargs(name, f))

    def h_mat_vec_mul(self, v):
        """A^H v (conjugate transpose; the reference's transpose=True)."""
        t = self.t_mat_vec_mul(jnp.conj(v))
        return jnp.conj(t)

    def mat_vec_mul(self, v):
        raise NotImplementedError

    def t_mat_vec_mul(self, v):
        """A^T v without densifying: mat_vec_mul is a pure linear jax
        function, so its algebraic transpose is available for free."""
        primal = jax.ShapeDtypeStruct((self.shape[1],), v.dtype)
        (out,) = jax.linear_transpose(self.mat_vec_mul, primal)(v)
        return out

    def mat_mat_mul(self, M):
        return jax.vmap(self.mat_vec_mul, in_axes=1, out_axes=1)(M)

    def to_dense(self):
        n = self.shape[1]
        return self.mat_mat_mul(jnp.eye(n))

    def diagonal(self):
        return jnp.diagonal(self.to_dense())

    def scalar_mul(self, a):
        raise NotImplementedError

    def least_squares(self, y, Ninv=None, tol=1e-10, maxiter=None):
        """Matrix-free weighted least squares: argmin_x ||A x - y||_Ninv
        via conjugate gradients on the normal equations
        (A^T Ninv A) x = A^T Ninv y (reference hmat.py BaseMat
        least_squares :13-68 inverts densely; CG keeps every step an
        operator application -- TPU-friendly and O(n) memory).

        Ninv: None, a vector (diagonal weights), or a BaseMat.
        """
        def wmul(r):
            if Ninv is None:
                return r
            if isinstance(Ninv, BaseMat):
                return Ninv.mat_vec_mul(r)
            return jnp.asarray(Ninv) * r

        def normal_op(x):
            return self.t_mat_vec_mul(wmul(self.mat_vec_mul(x)))

        b = self.t_mat_vec_mul(wmul(y))
        x, _ = jax.scipy.sparse.linalg.cg(normal_op, b, tol=tol,
                                          maxiter=maxiter)
        return x

    def to_transpose(self):
        """Return the lazy transposed operator (reference hmat.py
        to_transpose on every operator class): no densification."""
        return TransposedMat(self)

    # reference hmat.py's (misspelled) alias, kept for drop-in compat
    def mat_vec_mult(self, v):
        return self.mat_vec_mul(v)

    def __call__(self, v):
        return self.mat_vec_mul(v) if v.ndim == 1 else self.mat_mat_mul(v)

    def __matmul__(self, v):
        return self(v)


# BaseMat's own defaults get the reference kwargs too (subclasses are
# wrapped by __init_subclass__; inherited methods resolve to these)
for _n in ("mat_vec_mul", "mat_mat_mul", "to_dense"):
    setattr(BaseMat, _n, _wrap_ref_kwargs(_n, BaseMat.__dict__[_n]))
del _n


class DenseMat(BaseMat):
    """Dense matrix operator (reference :71)."""

    def __init__(self, A):
        self.A = jnp.asarray(A)
        self.shape = self.A.shape

    def mat_vec_mul(self, v):
        return self.A @ v

    def t_mat_vec_mul(self, v):
        return self.A.T @ v

    def mat_mat_mul(self, M):
        return self.A @ M

    def to_dense(self):
        return self.A

    def diagonal(self):
        return jnp.diagonal(self.A)

    def scalar_mul(self, a):
        return DenseMat(self.A * a)


class DiagMat(BaseMat):
    """Diagonal (or scalar) operator stored as a vector (reference
    :218-244: `diag` attr; a scalar matrix via len-1 diag + size)."""

    def __init__(self, d, size=None):
        d = jnp.atleast_1d(jnp.asarray(d))
        if size is not None and d.size == 1:
            d = jnp.full((int(size),), d[0])
        self.d = d
        self.shape = (len(self.d), len(self.d))

    @property
    def diag(self):
        return self.d

    def mat_vec_mul(self, v):
        return self.d * v

    def t_mat_vec_mul(self, v):
        return self.d * v

    def mat_mat_mul(self, M):
        return self.d[:, None] * M

    def to_dense(self):
        return jnp.diag(self.d)

    def diagonal(self):
        return self.d

    def scalar_mul(self, a):
        return DiagMat(self.d * a)


class HadamardMat(BaseMat):
    """Elementwise (Hadamard) multiply operator (reference :349): acts on
    a matrix-shaped state by elementwise product with H."""

    def __init__(self, H):
        self.H = jnp.asarray(H)
        self.shape = self.H.shape

    def mat_vec_mul(self, v, transpose=False):
        return self.mat_mat_mul(v, transpose=transpose)

    def mat_mat_mul(self, M, transpose=False, square=False):
        """Hadamard product; transpose applies H^H, square multiplies
        by H**2 (reference hmat.py:378)."""
        H = self.H.conj().T if transpose else self.H
        if square:
            H = H ** 2
        return H * M

    def to_dense(self, transpose=False):
        return self.H.conj().T if transpose else self.H

    def scalar_mul(self, a):
        return HadamardMat(self.H * a)


class TriangMat(BaseMat):
    """Triangular matrix operator (reference :461). Only the lower
    (upper) triangle of a 2D input is KEPT — the reference stores
    `L[tril_indices]` and densifies into zeros, so a full matrix is
    silently masked to its triangle; we mirror that. A 1D input is the
    raveled triangle (reference :478-487 documents this form but its
    size recovery reads an undefined name `b` — a NameError in the
    reference; ours implements it)."""

    def __init__(self, L, lower=True):
        L = jnp.asarray(L)
        if L.ndim == 1:
            n = int(round((np.sqrt(8 * L.shape[0] + 1) - 1) / 2))
            idx = np.tril_indices(n) if lower else np.triu_indices(n)
            L = jnp.zeros((n, n), dtype=L.dtype).at[idx].set(L)
        else:
            L = jnp.tril(L) if lower else jnp.triu(L)
        self.L = L
        self.lower = lower
        self.shape = self.L.shape

    def mat_vec_mul(self, v):
        return self.L @ v

    def t_mat_vec_mul(self, v):
        return self.L.T @ v

    def mat_mat_mul(self, M):
        return self.L @ M

    def to_dense(self):
        return self.L

    def scalar_mul(self, a):
        return TriangMat(self.L * a, lower=self.lower)


class SparseMat(BaseMat):
    """Low-rank + diagonal: A = U V^T + diag(d) (reference :593).

    Two constructor forms:

    - ``SparseMat(U, V=None, d=None)``: A = U V^T + diag(d) with
      U (Nrows, Nmodes), V (Ncols, Nmodes); V=U when omitted.
    - ``SparseMat(shape, U, V=None, Hdiag=None, hermitian=False)``:
      the reference's drop-in form (hmat.py:600-628) — A = U V + a
      (possibly PARTIAL) diagonal: only the first ``len(Hdiag)``
      rows get ``Hdiag * vec`` added (reference mat_vec_mul does
      ``result[:N] += Hdiag * vec[:N]``). Here V has row-modes
      (Nmodes, Ncols); ``hermitian`` stores U only and uses
      V = U^H.
    """

    def __init__(self, U, V=None, d=None, Hdiag=None, hermitian=False):
        if isinstance(U, (tuple, list)) and len(U) == 2 \
                and all(isinstance(s, (int, np.integer)) for s in U):
            # reference positional order: (shape, U, V, Hdiag, hermitian)
            U, refV = jnp.asarray(V), d
            if hermitian:
                self.V = jnp.conj(U)
            else:
                assert refV is not None, \
                    "reference-form SparseMat needs V or hermitian=True"
                self.V = jnp.asarray(refV).T
            d = Hdiag
        else:
            U = jnp.asarray(U)
            self.V = U if V is None else jnp.asarray(V)
            if d is None:
                d = Hdiag
        self.U = U
        self.d = d if d is None else jnp.asarray(d)
        self.shape = (self.U.shape[0], self.V.shape[0])

    def _add_diag(self, out, v):
        if self.d is None:
            return out
        n = self.d.shape[0]
        if n == out.shape[0] == v.shape[0]:
            return out + self.d * v
        return out.at[:n].add(self.d * v[:n])

    def mat_vec_mul(self, v):
        return self._add_diag(self.U @ (self.V.T @ v), v)

    def t_mat_vec_mul(self, v):
        return self._add_diag(self.V @ (self.U.T @ v), v)

    def to_dense(self):
        out = self.U @ self.V.T
        if self.d is not None:
            n = self.d.shape[0]
            idx = (np.arange(n), np.arange(n))
            out = out.at[idx].add(self.d)
        return out

    def diagonal(self):
        out = jnp.sum(self.U * self.V, axis=1)
        if self.d is not None:
            out = out.at[:self.d.shape[0]].add(self.d)
        return out

    def scalar_mul(self, a):
        return SparseMat(self.U * a, self.V,
                         None if self.d is None else self.d * a)


class ZeroMat(BaseMat):
    """Zero operator (reference :865; dtype/device accepted for
    drop-in compat, unused — jax output dtype follows the operand)."""

    def __init__(self, shape, dtype=None, device=None):
        self.shape = tuple(shape)

    def mat_vec_mul(self, v):
        return jnp.zeros(self.shape[0], dtype=v.dtype)

    def mat_mat_mul(self, M):
        return jnp.zeros((self.shape[0], M.shape[1]), dtype=M.dtype)

    def to_dense(self):
        return jnp.zeros(self.shape)

    def scalar_mul(self, a):
        return self


class OneMat(BaseMat):
    """Constant (rank-1 ones * value) operator (reference :945; the
    reference names the value ``scalar`` — both spellings accepted)."""

    def __init__(self, shape, value=1.0, scalar=None, dtype=None,
                 device=None):
        self.shape = tuple(shape)
        self.value = value if scalar is None else scalar

    @property
    def scalar(self):
        return self.value

    def mat_vec_mul(self, v):
        return jnp.full(self.shape[0], jnp.sum(v) * self.value,
                        dtype=v.dtype)

    def to_dense(self):
        return jnp.full(self.shape, self.value)

    def scalar_mul(self, a):
        return OneMat(self.shape, self.value * a)


class TransposedMat(BaseMat):
    """Lazy transpose of another operator (reference :1038). The matvec
    is the algebraic transpose of the wrapped operator's matvec -- no
    densification (the reference's and round-1's to_dense().T paid
    O(n^2) memory here)."""

    def __init__(self, mat):
        self.mat = mat
        self.shape = (mat.shape[1], mat.shape[0])

    def mat_vec_mul(self, v):
        return self.mat.t_mat_vec_mul(v)

    def t_mat_vec_mul(self, v):
        return self.mat.mat_vec_mul(v)

    def to_dense(self):
        return self.mat.to_dense().T

    def diagonal(self):
        return self.mat.diagonal()

    def scalar_mul(self, a):
        return TransposedMat(self.mat.scalar_mul(a))

    def to_transpose(self):
        return self.mat


class SolveMat(BaseMat):
    """Inverse-as-solve operator: A^-1 v via triangular/Cholesky solves
    (reference :1391-1470)."""

    def __init__(self, A=None, chol=None, lower=True):
        if chol is None:
            assert A is not None
            chol = jnp.linalg.cholesky(jnp.asarray(A))
        self.L = jnp.asarray(chol)
        self.lower = lower
        self.shape = self.L.shape

    def mat_vec_mul(self, v):
        y = jax.scipy.linalg.solve_triangular(self.L, v, lower=self.lower)
        return jax.scipy.linalg.solve_triangular(
            self.L.conj().T, y, lower=not self.lower)

    def forward_sub(self, v):
        """L^-1 v (forward substitution)."""
        return jax.scipy.linalg.solve_triangular(self.L, v, lower=self.lower)

    def back_sub(self, v):
        """L^-T v (back substitution)."""
        return jax.scipy.linalg.solve_triangular(self.L.conj().T, v,
                                                 lower=not self.lower)

    def to_dense(self):
        return self.mat_mat_mul(jnp.eye(self.shape[0], dtype=self.L.dtype))

    def scalar_mul(self, a):
        return SolveMat(chol=self.L / jnp.sqrt(a), lower=self.lower)


class PartitionedMat(BaseMat):
    """Block-partitioned operator (reference :1129-1250): blocks[i][j]
    are BaseMats; matvec evaluates column sums."""

    def __init__(self, blocks):
        self.blocks = blocks
        rows = sum(b[0].shape[0] for b in blocks)
        cols = sum(blocks[0][j].shape[1] for j in range(len(blocks[0])))
        self.shape = (rows, cols)
        self._col_sizes = [blocks[0][j].shape[1] for j in range(len(blocks[0]))]

    def mat_vec_mul(self, v):
        splits = np.cumsum(self._col_sizes)[:-1]
        vs = jnp.split(v, splits)
        out = []
        for i, row in enumerate(self.blocks):
            acc = None
            for j, blk in enumerate(row):
                y = blk.mat_vec_mul(vs[j])
                acc = y if acc is None else acc + y
            out.append(acc)
        return jnp.concatenate(out)

    def to_dense(self):
        return jnp.concatenate(
            [jnp.concatenate([b.to_dense() for b in row], axis=1)
             for row in self.blocks], axis=0)

    def scalar_mul(self, a):
        return PartitionedMat([[b.scalar_mul(a) for b in row]
                               for row in self.blocks])


class MatDict:
    """Dict of operators keyed by parameter name, acting on ParamDicts
    (reference MatDict :1836-1924)."""

    def __init__(self, mats):
        self.mats = dict(mats)

    def __getitem__(self, k):
        return self.mats[k]

    def __contains__(self, k):
        return k in self.mats

    def mat_vec_mul(self, pdict):
        from ..utils import ParamDict
        out = {}
        for k, v in pdict.items():
            if k in self.mats:
                out[k] = self.mats[k].mat_vec_mul(v.ravel()).reshape(v.shape)
            else:
                out[k] = v
        return ParamDict(out)

    def __call__(self, pdict):
        return self.mat_vec_mul(pdict)


class HierMat(BaseMat):
    """Recursive 2x2 HODLR block operator (reference :1925-2210):
    diagonal blocks are HierMat/DenseMat, off-diagonals low-rank
    SparseMat."""

    def __init__(self, A00, A11, A01=None, A10=None, sym=False,
                 scalar=None):
        """Block naming follows the reference (hmat.py:1925): A00 upper
        diagonal, A11 lower diagonal, A01/A10 off-diagonals. Raw arrays
        are wrapped as DenseMat; sym=True mirrors a single off-diagonal
        through a lazy transpose; scalar multiplies the output."""
        def wrap(x):
            return DenseMat(jnp.asarray(x)) \
                if x is not None and not isinstance(x, BaseMat) else x
        A00, A11, A01, A10 = wrap(A00), wrap(A11), wrap(A01), wrap(A10)
        if sym:
            # mirror SparseMat off-diagonals CONCRETELY ((U V^T)^T =
            # V U^T) so SolveHierMat's low-rank factorization still sees
            # a SparseMat; other operator types mirror lazily
            def mirror(x):
                return SparseMat(x.V, x.U) if isinstance(x, SparseMat) \
                    and x.d is None else TransposedMat(x)
            if A01 is None and A10 is not None:
                A01 = mirror(A10)
            if A10 is None and A01 is not None:
                A10 = mirror(A01)
        self.A00 = A00
        self.A11 = A11
        self.A01 = A01
        self.A10 = A10
        self.sym = sym
        self.scalar = scalar
        self.shape = (A00.shape[0] + A11.shape[0],
                      A00.shape[1] + A11.shape[1])

    def mat_vec_mul(self, v):
        n1 = self.A00.shape[1]
        v1, v2 = v[:n1], v[n1:]
        o1 = self.A00.mat_vec_mul(v1)
        o2 = self.A11.mat_vec_mul(v2)
        if self.A01 is not None:
            o1 = o1 + self.A01.mat_vec_mul(v2)
        if self.A10 is not None:
            o2 = o2 + self.A10.mat_vec_mul(v1)
        out = jnp.concatenate([o1, o2])
        if self.scalar is not None:
            out = out * self.scalar
        return out

    def t_mat_vec_mul(self, v):
        n1 = self.A00.shape[0]
        v1, v2 = v[:n1], v[n1:]
        o1 = self.A00.t_mat_vec_mul(v1)
        o2 = self.A11.t_mat_vec_mul(v2)
        if self.A10 is not None:
            o1 = o1 + self.A10.t_mat_vec_mul(v2)
        if self.A01 is not None:
            o2 = o2 + self.A01.t_mat_vec_mul(v1)
        out = jnp.concatenate([o1, o2])
        if self.scalar is not None:
            out = out * self.scalar
        return out

    def to_dense(self):
        n1, n2 = self.A00.shape[0], self.A11.shape[0]
        top = jnp.concatenate([
            self.A00.to_dense(),
            self.A01.to_dense() if self.A01 is not None
            else jnp.zeros((n1, self.A11.shape[1]))], axis=1)
        bot = jnp.concatenate([
            self.A10.to_dense() if self.A10 is not None
            else jnp.zeros((n2, self.A00.shape[1])),
            self.A11.to_dense()], axis=1)
        out = jnp.concatenate([top, bot], axis=0)
        if self.scalar is not None:
            out = out * self.scalar
        return out

    def diagonal(self, return_tensor=True):
        """Diagonal of the block hierarchy (reference hmat.py:2002):
        concatenated vector, or the per-block list with
        return_tensor=False."""
        diag = []
        for blk in (self.A00, self.A11):
            if isinstance(blk, HierMat):
                diag.extend(blk.diagonal(return_tensor=False))
            else:
                diag.append(blk.diagonal())
        if self.scalar is not None:
            diag = [d * self.scalar for d in diag]
        return jnp.concatenate(diag) if return_tensor else diag

    def scalar_mul(self, a):
        # accumulate into the existing scalar (reference hmat.py
        # scalar_mul semantics) and keep the sym flag
        sc = a if self.scalar is None else self.scalar * a
        return HierMat(self.A00, self.A11, self.A01, self.A10,
                       sym=self.sym, scalar=sc)

    def to_SolveHierMat(self, lower=True, trans_solve=True):
        """Hierarchically Cholesky-factor this (SPD) HODLR operator into
        its inverse action (reference hmat.py HierMat.to_SolveHierMat,
        :2180-2210). A scalar s on this operator becomes a 1/s on the
        solve and +n log(s) on the logdet (reference :2155-2165).

        Contract note (documented divergence): the reference's input is
        an already-Cholesky HierMat L and its default trans_solve=False
        returns the L^{-1} action; here the input is the SPD operator A
        itself (the factorization is internal), so trans_solve=True
        (the default) returns A^{-1} v and trans_solve=False the
        forward substitution chol(A)^{-1} v. Only lower=True is
        supported."""
        assert lower, "only lower-triangular factors are supported"
        return SolveHierMat(self, trans_solve=trans_solve)


class MatColumn(BaseMat):
    """Vertical stack of operators sharing Ncols (reference :1575):
    A = [M1; M2; ...]."""

    def __init__(self, mats):
        self.mats = list(mats)
        ncol = self.mats[0].shape[1]
        assert all(m.shape[1] == ncol for m in self.mats)
        self.shape = (sum(m.shape[0] for m in self.mats), ncol)

    def mat_vec_mul(self, v):
        return jnp.concatenate([m.mat_vec_mul(v) for m in self.mats])

    def t_mat_vec_mul(self, v):
        out, i = None, 0
        for m in self.mats:
            y = m.t_mat_vec_mul(v[i:i + m.shape[0]])
            out = y if out is None else out + y
            i += m.shape[0]
        return out

    def to_dense(self):
        return jnp.concatenate([m.to_dense() for m in self.mats], axis=0)

    def scalar_mul(self, a):
        return MatColumn([m.scalar_mul(a) for m in self.mats])


class MatRow(BaseMat):
    """Horizontal stack of operators sharing Nrows (reference :1655):
    A = [M1, M2, ...]."""

    def __init__(self, mats):
        self.mats = list(mats)
        nrow = self.mats[0].shape[0]
        assert all(m.shape[0] == nrow for m in self.mats)
        self.shape = (nrow, sum(m.shape[1] for m in self.mats))

    def mat_vec_mul(self, v):
        out, i = None, 0
        for m in self.mats:
            y = m.mat_vec_mul(v[i:i + m.shape[1]])
            out = y if out is None else out + y
            i += m.shape[1]
        return out

    def t_mat_vec_mul(self, v):
        return jnp.concatenate([m.t_mat_vec_mul(v) for m in self.mats])

    def to_dense(self):
        return jnp.concatenate([m.to_dense() for m in self.mats], axis=1)

    def scalar_mul(self, a):
        return MatRow([m.scalar_mul(a) for m in self.mats])


class MatSum(BaseMat):
    """Lazy sum of same-shape operators (reference :1737)."""

    def __init__(self, mats):
        self.mats = list(mats)
        self.shape = self.mats[0].shape
        assert all(m.shape == self.shape for m in self.mats)

    def mat_vec_mul(self, v):
        out = None
        for m in self.mats:
            y = m.mat_vec_mul(v)
            out = y if out is None else out + y
        return out

    def t_mat_vec_mul(self, v):
        out = None
        for m in self.mats:
            y = m.t_mat_vec_mul(v)
            out = y if out is None else out + y
        return out

    def diagonal(self):
        out = None
        for m in self.mats:
            d = m.diagonal()
            out = d if out is None else out + d
        return out

    def to_dense(self):
        out = None
        for m in self.mats:
            d = m.to_dense()
            out = d if out is None else out + d
        return out

    def scalar_mul(self, a):
        return MatSum([m.scalar_mul(a) for m in self.mats])



class SolveHierMat(BaseMat):
    """Hierarchical Cholesky solve of a symmetric positive-definite
    HODLR operator (reference SolveHierMat, hmat.py:2211-2354).

    Factors A = L L^T where L is itself hierarchical:
        A = [[A00, U V^T], [V U^T, A11]]
        L = [[L11, 0], [W, L22]],  W = V (L11^{-1} U)^T   (low rank)
        L22 = chol(A11 - W W^T)
    The rank-r Schur downdate propagates recursively as a pending
    (C, M) pair with A_eff = A - C M C^T, so only leaf-sized dense
    blocks and (n x rank) factors are ever materialized -- never a
    dense n x n. Provides the full HMC mass-matrix contract
    (inference/sampler.py _Mass): chol_mul (L v, momentum draws),
    forward_sub (L^{-1} v), back_sub (L^{-T} v), mat_vec_mul (A^{-1} v,
    the SolveMat convention) and logdet (for mass-matrix learning).

    Symmetry: uses the upper off-diagonal (A01) of each HierMat node and
    mirrors it; A10 is ignored.
    """

    def __init__(self, hier, trans_solve=True):
        self.shape = hier.shape
        # a positive scalar s on the HierMat factors as sqrt(s) on each
        # Cholesky action: (sA)^{-1} = A^{-1}/s, logdet(sA) = n log s +
        # logdet(A) (reference hmat.py:2155-2165)
        self._scalar = getattr(hier, "scalar", None)
        if self._scalar is not None:
            assert float(self._scalar) > 0, \
                "SolveHierMat needs a positive scalar (SPD operator)"
        self.trans_solve = trans_solve
        self._root = self._factor(hier, None, None)

    # ---------------------------------------------------------- factor
    def _factor(self, A, C, M):
        if not isinstance(A, HierMat):
            D = A.to_dense()                        # leaf-sized only
            if C is not None:
                D = D - C @ (M @ C.T)
            return {"leaf": True, "L": jnp.linalg.cholesky(D),
                    "n": D.shape[0]}
        n1 = A.A00.shape[0]
        C1 = None if C is None else C[:n1]
        C2 = None if C is None else C[n1:]
        node1 = self._factor(A.A00, C1, M)

        if A.A01 is not None:
            assert isinstance(A.A01, SparseMat), \
                "SolveHierMat needs low-rank (SparseMat) off-diagonals"
            U, V = A.A01.U, A.A01.V
        else:
            U = jnp.zeros((n1, 0))
            V = jnp.zeros((A.A11.shape[0], 0))
        if C is not None:
            # fold the pending downdate's off-diagonal part -C1 M C2^T
            # into the low-rank block: [U, C1] [V, -C2 M^T]^T
            U = jnp.concatenate([U, C1], axis=1)
            V = jnp.concatenate([V, -C2 @ M.T], axis=1)

        Ut = self._fsub(node1, U)                   # L11^{-1} U  (n1, r)
        Ms = Ut.T @ Ut                              # r x r
        if C is None:
            Cp, Mp = V, Ms
        else:
            Cp = jnp.concatenate([C2, V], axis=1)
            Mp = jax.scipy.linalg.block_diag(M, Ms)
        node2 = self._factor(A.A11, Cp, Mp)
        return {"leaf": False, "L1": node1, "L2": node2, "V": V,
                "Ut": Ut, "n1": n1, "n": A.shape[0]}

    # ---------------------------------------------------------- actions
    def _fsub(self, node, v):
        """L^{-1} v for a factor node; v may be (n,) or (n, k)."""
        if node["leaf"]:
            return jax.scipy.linalg.solve_triangular(node["L"], v,
                                                     lower=True)
        n1 = node["n1"]
        y1 = self._fsub(node["L1"], v[:n1])
        w = v[n1:] - node["V"] @ (node["Ut"].T @ y1)
        y2 = self._fsub(node["L2"], w)
        return jnp.concatenate([y1, y2], axis=0)

    def _bsub(self, node, v):
        """L^{-T} v."""
        if node["leaf"]:
            return jax.scipy.linalg.solve_triangular(node["L"].T, v,
                                                     lower=False)
        n1 = node["n1"]
        x2 = self._bsub(node["L2"], v[n1:])
        w = v[:n1] - node["Ut"] @ (node["V"].T @ x2)
        x1 = self._bsub(node["L1"], w)
        return jnp.concatenate([x1, x2], axis=0)

    def _lmul(self, node, v):
        """L v."""
        if node["leaf"]:
            return node["L"] @ v
        n1 = node["n1"]
        y1 = self._lmul(node["L1"], v[:n1])
        y2 = node["V"] @ (node["Ut"].T @ v[:n1]) \
            + self._lmul(node["L2"], v[n1:])
        return jnp.concatenate([y1, y2], axis=0)

    def forward_sub(self, v):
        out = self._fsub(self._root, v)
        if self._scalar is not None:
            out = out / jnp.sqrt(self._scalar)
        return out

    def back_sub(self, v):
        out = self._bsub(self._root, v)
        if self._scalar is not None:
            out = out / jnp.sqrt(self._scalar)
        return out

    def chol_mul(self, v):
        """L v (draws p ~ N(0, A) from white noise)."""
        out = self._lmul(self._root, v)
        if self._scalar is not None:
            out = out * jnp.sqrt(self._scalar)
        return out

    def mat_vec_mul(self, v):
        """A^{-1} v (the SolveMat convention, reference :1391/:2211);
        with trans_solve=False, only the forward substitution L^{-1} v
        (see HierMat.to_SolveHierMat)."""
        if not self.trans_solve:
            return self.forward_sub(v)
        return self.back_sub(self.forward_sub(v))

    def t_mat_vec_mul(self, v):
        return self.mat_vec_mul(v)  # symmetric

    def logdet(self):
        """log det A = 2 sum log diag(L)."""
        def rec(node):
            if node["leaf"]:
                return 2.0 * jnp.sum(jnp.log(jnp.diagonal(node["L"])))
            return rec(node["L1"]) + rec(node["L2"])
        out = rec(self._root)
        if self._scalar is not None:
            out = out + self.shape[0] * jnp.log(self._scalar)
        return out

    def scalar_mul(self, a):
        raise NotImplementedError("rescale the HierMat, then refactor")


def make_hodlr(A, indices=None, min_size=64, rank=8, depth=None,
               trisolve=False, lower=True, Nrank=None, rcond=None,
               sparse_tol=None):
    """Compress a dense matrix into a HODLR HierMat via truncated SVD of
    the off-diagonal blocks. The reference's make_hodlr (hmat.py:2355-
    2377) raises NotImplementedError; this is the working version with
    its documented signature: indices lists leaf slices (block
    boundaries; default halves recursively), Nrank caps the off-diagonal
    rank (alias of rank), rcond drops singular values below
    rcond * s_max, sparse_tol drops absolute singular values, and
    trisolve returns the SolveHierMat of the (SPD) result."""
    A = jnp.asarray(A)
    n = A.shape[0]
    if Nrank is not None:
        rank = Nrank

    def starts(idx):
        out = []
        for s in idx:
            out.append(s.start if isinstance(s, slice)
                       else int(np.atleast_1d(np.asarray(s))[0]))
        return out

    def build(A, idx, depth):
        n = A.shape[0]
        if (idx is not None and len(idx) <= 1) or \
                (idx is None and n <= min_size) or \
                (depth is not None and depth <= 0):
            return DenseMat(A)
        if idx is not None:
            half = len(idx) // 2
            base = starts(idx[:1])[0]
            off = starts(idx[half:])[0]
            h = off - base

            def shift(blocks, o):
                return [slice((s.start or 0) - o, s.stop - o)
                        if isinstance(s, slice)
                        else np.asarray(s) - o for s in blocks]

            i1 = shift(idx[:half], base)
            i2 = shift(idx[half:], off)
        else:
            h = n // 2
            i1 = i2 = None
        d1 = None if depth is None else depth - 1
        A00 = build(A[:h, :h], i1, d1)
        A11 = build(A[h:, h:], i2, d1)

        def lowrank(B):
            U, s, Vt = jnp.linalg.svd(B, full_matrices=False)
            r = min(rank, len(s))
            keep = np.asarray(s[:r])
            if rcond is not None:
                r = max(1, int(np.sum(keep > rcond * float(s[0]))))
            if sparse_tol is not None:
                r = max(1, int(np.sum(keep[:r] > sparse_tol)))
            return SparseMat(U[:, :r] * s[:r], Vt[:r].T)

        return HierMat(A00, A11, lowrank(A[:h, h:]), lowrank(A[h:, :h]))

    H = build(A, list(indices) if indices is not None else None, depth)
    if trisolve:
        return H.to_SolveHierMat(lower=lower) \
            if isinstance(H, HierMat) else SolveMat(H.to_dense())
    return H
