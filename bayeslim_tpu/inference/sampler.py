"""
MCMC samplers: HMC, NUTS, RecycledHMC with mass-matrix support and
chain checkpointing.

Reference parity: bayeslim/sampler.py (SamplerBase :16-178, HMC :181-757,
RecycledHMC :759, NUTS :956-1337, Potential :1338, leapfrog :1433,
StepSize/DynamicStepSize :1586-1863).

TPU-first: positions/momenta are ParamDict pytrees. Whole HMC
trajectories (make_leapfrog_traj, lax.scan) and NUTS tree doublings
(make_nuts_subtree, lax.while_loop with the O(log N) checkpoint u-turn
scheme) run as SINGLE device dispatches for single-batch LogProbs; the
host per-step integrators remain as fallbacks. Mass matrices are
diagonal ParamDicts or hmat operators (Cholesky factors), including
implicit solves (SolveMat) and hierarchical HODLR (SolveHierMat).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import ParamDict
from .hmat import MatDict

__all__ = ["SamplerBase", "Potential", "leapfrog", "make_leapfrog_traj",
           "HMC", "NUTS", "RecycledHMC", "StepSize", "RelativeStepSize",
           "DynamicStepSize", "multiply_eps"]


def multiply_eps(x, eps):
    """Multiply a tensor by an HMC leapfrog step size (reference
    sampler.py:1864-1889): a complex eps scales the real and imaginary
    planes independently. (This package stores complex trainables as
    real pairs, so per-plane step sizes usually arrive as real
    ParamDicts already — this is the reference-compatible tensor-level
    form.)"""
    x = jnp.asarray(x)
    eps_c = jnp.iscomplexobj(eps)
    if eps_c and jnp.iscomplexobj(x):
        eps = jnp.asarray(eps)
        return jax.lax.complex(x.real * eps.real, x.imag * eps.imag)
    return x * (jnp.real(eps) if eps_c else eps)


class Potential:
    """U(x) = -log p(x) and its gradient, wrapping a LogProb
    (reference sampler.py:1338-1432). The wrapped prob must have
    negate=True so closure returns -log posterior."""

    def __init__(self, prob):
        self.prob = prob

    def __call__(self, x):
        """Returns (U, gradU) with gradU a ParamDict."""
        U, g = self.prob.value_and_grad(x)
        return U, g

    def value(self, x):
        return self.prob(x)


def leapfrog(q, p, dUdq, eps, N, Minv=None, cov_L=None, diag_mass=True,
             dUdq0=None, states=None):
    """Leapfrog integrator (reference sampler.py:1433-1585).

    q, p : ParamDicts; dUdq(q) -> (U, grad ParamDict); eps : step size
    (float or ParamDict); Minv : callable(ParamDict)->ParamDict applying
    the inverse mass matrix (None = identity).

    Reference-form mass: cov_L is the (lower) Cholesky of the
    COVARIANCE (inverse mass) — a scalar/ParamDict of diagonals
    (diag_mass=True), a dict of dense per-key factors
    (diag_mass=False), or an hmat operator applying the solve
    implicitly. (The reference's cov_L=1.0 default crashes on ParamDict
    q — a reference bug; here identity is Minv=None/cov_L=None.)
    dUdq0 is a precomputed gradient at the input q (saves one
    evaluation); states, if a list, collects (q, p) after every step.

    Returns (q_new, p_new, U_new, gradU_new, n_grad_evals).
    """
    if Minv is None and cov_L is not None:
        from .hmat import BaseMat

        def Minv(x, _L=cov_L):
            if isinstance(_L, BaseMat):
                return _L(x)
            if diag_mass:
                return x * (_L * _L)
            if isinstance(x, ParamDict):
                return ParamDict({k: _L[k] @ (_L[k].conj().T @ x[k])
                                  for k in x.keys()})
            return _L @ (_L.conj().T @ x)
    Minv = Minv if Minv is not None else (lambda x: x)
    if dUdq0 is not None:
        U, grad, nev = None, dUdq0, 0
    else:
        U, grad = dUdq(q)
        nev = 1
    # half step momentum
    p = p - grad * (eps / 2)
    for i in range(N):
        q = q + Minv(p) * eps
        U, grad = dUdq(q)
        nev += 1
        if i < N - 1:
            p = p - grad * eps
        if states is not None:
            states.append((q, p))
    p = p - grad * (eps / 2)
    return q, p, U, grad, nev


def make_nuts_subtree(vg_fn, Minv=None, max_depth=10):
    """On-device NUTS subtree expansion: the 2^depth leapfrog steps of
    one tree doubling run inside a single lax.while_loop (SURVEY §7.6;
    the reference's recursive Python tree pays one host round-trip per
    leapfrog, sampler.py:956-1337).

    Iterative formulation with the O(log N) checkpoint scheme: leaf n
    (0-based) is stored at checkpoint slot popcount(n >> 1) when n is
    even; when n is odd, u-turn checks run against slots
    [idx_max - trailing_ones(n) + 1, idx_max], which are exactly the
    complete subtrees ending at leaf n.

    Returns subtree(q, p, key, logu, H0, direction, eps, model, data,
    icov, depth) -> dict(q_end, p_end, q_prop, n_valid, ok, alpha, na);
    depth may be traced (one executable serves all tree depths).
    Progressive sampling is uniform over valid leaves
    within the subtree (combined with the usual biased outer doubling).
    """
    Minv = Minv if Minv is not None else (lambda x: x)

    def kinetic(p):
        mp = Minv(p)
        return 0.5 * sum(jnp.sum((p[k].conj() * mp[k]).real)
                         for k in p.keys())

    def pdot(a, b):
        return sum(jnp.sum((a[k].conj() * b[k]).real) for k in a.keys())

    def subtree(q, p, key, logu, H0, direction, eps, model, data, icov,
                depth, dHmax):
        # depth may be traced: the while_loop bound is dynamic, so ONE
        # executable serves every tree depth (no per-depth recompiles)
        nleaf = 2 ** jnp.asarray(depth, jnp.int32)
        dirf = jnp.asarray(direction, jnp.float32)

        ck_q = jax.tree_util.tree_map(
            lambda x: jnp.zeros((max_depth + 1,) + x.shape, x.dtype), q)
        ck_p = jax.tree_util.tree_map(
            lambda x: jnp.zeros((max_depth + 1,) + x.shape, x.dtype), p)

        def one_leap(q, p, g):
            p1 = p - g * (eps * dirf * 0.5)
            q1 = q + Minv(p1) * (eps * dirf)
            U, g1 = vg_fn(q1, model, data, icov)
            p2 = p1 - g1 * (eps * dirf * 0.5)
            return q1, p2, g1, U

        def uturn(qa, pa, qb, pb):
            dq = (qb - qa) * dirf
            return (pdot(dq, Minv(pa)) < 0) | (pdot(dq, Minv(pb)) < 0)

        def body(st):
            (i, q, p, g, ck_q, ck_p, qprop, n, ok, alpha, na, key) = st
            q1, p1, g1, U1 = one_leap(q, p, g)
            H1 = U1 + kinetic(p1)
            valid = logu <= -H1
            diverged = logu >= dHmax - H1
            a1 = jnp.minimum(1.0, jnp.exp(H0 - H1))

            # progressive (uniform within-subtree) candidate update
            n1 = n + valid.astype(jnp.int32)
            key, ku = jax.random.split(key)
            take = valid & (jax.random.uniform(ku) < 1.0 /
                            jnp.maximum(n1, 1).astype(jnp.float32))
            qprop = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, b, a), qprop, q1)

            # even leaf: store checkpoint at slot popcount(i >> 1)
            slot = jax.lax.population_count(i >> 1)
            is_even = (i % 2) == 0

            def store(ckq, ckp):
                cq = jax.tree_util.tree_map(
                    lambda c, x: jax.lax.cond(
                        is_even,
                        lambda: jax.lax.dynamic_update_index_in_dim(
                            c, x.astype(c.dtype), slot, 0),
                        lambda: c), ckq, q1)
                cp = jax.tree_util.tree_map(
                    lambda c, x: jax.lax.cond(
                        is_even,
                        lambda: jax.lax.dynamic_update_index_in_dim(
                            c, x.astype(c.dtype), slot, 0),
                        lambda: c), ckp, p1)
                return cq, cp

            ck_q, ck_p = store(ck_q, ck_p)

            # odd leaf: u-turn checks against completed subtrees
            ip1 = i + 1
            tzeros = jax.lax.population_count((ip1 & -ip1) - 1)
            idx_max = jax.lax.population_count(i >> 1)
            idx_min = idx_max - tzeros + 1

            def check(j, t):
                qa = jax.tree_util.tree_map(
                    lambda c: jax.lax.dynamic_index_in_dim(
                        c, j, 0, keepdims=False), ck_q)
                pa = jax.tree_util.tree_map(
                    lambda c: jax.lax.dynamic_index_in_dim(
                        c, j, 0, keepdims=False), ck_p)
                hit = (j >= idx_min) & (j <= idx_max) & ((i % 2) == 1)
                return t | (hit & uturn(qa, pa, q1, p1))

            turning = jax.lax.fori_loop(0, max_depth + 1, check,
                                        jnp.asarray(False))
            ok = ok & ~turning & ~diverged
            return (i + 1, q1, p1, g1, ck_q, ck_p, qprop, n1, ok,
                    alpha + a1, na + 1, key)

        def cond(st):
            i, ok = st[0], st[8]
            return (i < nleaf) & ok

        _, g0 = vg_fn(q, model, data, icov)
        st0 = (jnp.asarray(0, jnp.int32), q, p, g0, ck_q, ck_p, q,
               jnp.asarray(0, jnp.int32), jnp.asarray(True),
               jnp.asarray(0.0), jnp.asarray(0, jnp.int32), key)
        (i, q1, p1, _, _, _, qprop, n, ok, alpha, na, key) = \
            jax.lax.while_loop(cond, body, st0)
        return dict(q_end=q1, p_end=p1, q_prop=qprop, n=n, ok=ok,
                    alpha=alpha, na=na, key=key)

    return subtree


def make_leapfrog_traj(vg_fn, Minv=None):
    """Whole-trajectory leapfrog as ONE traced computation (SURVEY §7.6):
    a lax.scan over steps, so an N-step trajectory is a single device
    dispatch instead of N host round-trips (each ~30 ms on the remote
    backend; the reference pays a full Python fwd+bwd per step,
    sampler.py:1433-1585).

    vg_fn(q, model, data, icov) -> (U, grad) must be pure (e.g.
    jax.value_and_grad of LogProb._batch_fn(0)).

    Returns traj(q, p, model, data, icov, eps, nstep) ->
    (q', p', U', grad') with nstep static; wrap in jax.jit with
    static_argnums for nstep.
    """
    Minv = Minv if Minv is not None else (lambda x: x)

    def traj(q, p, model, data, icov, eps, nstep):
        U0, g0 = vg_fn(q, model, data, icov)

        def body(carry, _):
            q, p, g = carry
            p1 = p - g * (eps * 0.5)
            q1 = q + Minv(p1) * eps
            U, g1 = vg_fn(q1, model, data, icov)
            p2 = p1 - g1 * (eps * 0.5)
            return (q1, p2, g1), U

        (q1, p2, g1), Us = jax.lax.scan(body, (q, p, g0), None,
                                        length=nstep)
        return q1, p2, Us[-1], g1

    return traj


class SamplerBase:
    """Chain bookkeeping, sampling loop, npz checkpoints
    (reference sampler.py:16-178)."""

    def __init__(self, x0):
        self.x = x0.copy()
        self.chain = {k: [] for k in x0.keys()}
        self._acceptances = []
        self._divergences = []
        self.Usteps = []
        self.Uchain = []  # per-sample potential energies (reference :30)

    @property
    def Nsamples(self):
        k = next(iter(self.chain))
        return len(self.chain[k])

    @property
    def acceptance_rate(self):
        if not self._acceptances:
            return 0.0
        return float(np.mean(self._acceptances))

    def append_chain(self, x, U=None):
        """Append a position (and optional potential energy U) to the
        chain (reference :44-57)."""
        for k in self.chain:
            self.chain[k].append(np.asarray(x[k]))
        self.Uchain.append(U)

    def clear_chain(self, N=None):
        """Drop the oldest N chain entries — all of them by default
        (reference :163-178); the current state x is kept."""
        if N is None:
            self.chain = {k: [] for k in self.chain}
            self._acceptances = []
            self._divergences = []
            self.Usteps = []
            self.Uchain = []
            return
        for k in self.chain:
            self.chain[k] = self.chain[k][N:]
        self.Uchain = self.Uchain[N:]
        # divergence records are int sample indices (the reference keeps
        # (Nchain, q, p) tuples and its clear_chain silently truncates
        # them to 2 elements, sampler.py:178)
        self._divergences = [d - N for d in self._divergences if d >= N]

    def step(self):
        raise NotImplementedError

    def sample(self, Nsample, Ncheck=None, outfile=None, verbose=False,
               description=""):
        """Run the sampler, checkpointing every Ncheck samples
        (reference :59-142)."""
        for i in range(Nsample):
            self.step()
            if verbose and (i + 1) % max(Nsample // 10, 1) == 0:
                print(f"sample {i+1}/{Nsample} "
                      f"accept={self.acceptance_rate:.2f}")
            if Ncheck and outfile and (i + 1) % Ncheck == 0:
                self.write_chain(outfile, overwrite=True,
                                 description=description)
        if outfile:
            self.write_chain(outfile, overwrite=True,
                             description=description)

    def get_chain(self, keys=None, burn=0):
        """Stacked chain history (reference :88-94): all params, one
        (str) or several (list) by name; burn drops early samples."""
        if keys is None:
            keys = list(self.chain.keys())
        elif isinstance(keys, str):
            keys = [keys]
        return {k: np.stack(self.chain[k][burn:]) for k in keys}

    def write_chain(self, fname, overwrite=False, attrs=None,
                    description=""):
        """Checkpoint the chain to .npz (reference :82-142)."""
        if os.path.exists(fname) and not overwrite:
            raise FileExistsError(fname)
        payload = {f"chain__{k}": np.stack(v) if len(v) else np.zeros(0)
                   for k, v in self.chain.items()}
        payload["acceptances"] = np.asarray(self._acceptances)
        payload["divergences"] = np.asarray(self._divergences, dtype=float)
        if any(u is not None for u in self.Uchain):
            payload["Uchain"] = np.asarray(
                [np.nan if u is None else float(u) for u in self.Uchain])
        if description:
            payload["description"] = description
        for k, v in (attrs or {}).items():
            payload[f"attr__{k}"] = v
        np.savez(fname, **payload)

    def load_chain(self, fname):
        """Resume from a checkpoint (reference :144-178)."""
        f = np.load(fname, allow_pickle=True)
        for key in f.files:
            if key.startswith("chain__"):
                k = key[len("chain__"):]
                self.chain[k] = list(f[key])
        self._acceptances = list(f["acceptances"])
        self._divergences = list(f["divergences"])
        # restart position = last sample
        if self.Nsamples:
            self.x = ParamDict({k: jnp.asarray(v[-1])
                                for k, v in self.get_chain().items()})


class _Mass:
    """Mass-matrix plumbing: identity, diagonal ParamDict, or hmat
    Cholesky factors per parameter (MatDict)."""

    def __init__(self, mass=None, chol=None, invchol=None):
        """mass: ParamDict of diagonal M entries; chol: MatDict of L with
        M = L L^T; invchol: MatDict of L' with M^-1 = L' L'^T."""
        self.mass = mass
        self.chol = chol
        self.invchol = invchol

    def sample_momentum(self, key, template):
        """p ~ N(0, M)."""
        keys = jax.random.split(key, len(template.keys()))
        xi = ParamDict({k: jax.random.normal(kk, template[k].shape,
                                             template[k].dtype)
                        for k, kk in zip(template.keys(), keys)})
        if self.mass is not None:
            return xi * self.mass.operator(jnp.sqrt)
        if self.chol is not None:
            out = {}
            for k in xi:
                if k in self.chol:
                    op = self.chol[k]
                    # SolveHierMat's mat_vec_mul is A^-1 v; its Cholesky
                    # action is chol_mul
                    f = getattr(op, "chol_mul", op.mat_vec_mul)
                    out[k] = f(xi[k].ravel()).reshape(xi[k].shape)
                else:
                    out[k] = xi[k]
            return ParamDict(out)
        if self.invchol is not None:
            # M^{1/2} xi = L'^-T xi for M^-1 = L' L'^T
            out = {}
            for k in xi:
                if k in self.invchol:
                    op = self.invchol[k]
                    if hasattr(op, "back_sub"):
                        out[k] = op.back_sub(xi[k].ravel()).reshape(xi[k].shape)
                    else:
                        L = op.to_dense()
                        out[k] = jnp.linalg.solve(L.T, xi[k].ravel()).reshape(xi[k].shape)
                else:
                    out[k] = xi[k]
            return ParamDict(out)
        return xi

    def minv(self, p):
        """M^-1 p."""
        if self.mass is not None:
            return p / self.mass
        if self.invchol is not None:
            # M^-1 = L' L'^T
            out = {}
            for k in p:
                if k in self.invchol:
                    op = self.invchol[k]
                    y = _t_matvec(op, p[k].ravel())
                    out[k] = op.mat_vec_mul(y).reshape(p[k].shape)
                else:
                    out[k] = p[k]
            return ParamDict(out)
        if self.chol is not None:
            out = {}
            for k in p:
                if k in self.chol:
                    op = self.chol[k]
                    if hasattr(op, "forward_sub"):
                        y = op.forward_sub(p[k].ravel())
                        out[k] = op.back_sub(y).reshape(p[k].shape)
                    else:
                        L = op.to_dense()
                        y = jax.scipy.linalg.solve_triangular(L, p[k].ravel(),
                                                              lower=True)
                        out[k] = jax.scipy.linalg.solve_triangular(
                            L.T, y, lower=False).reshape(p[k].shape)
                else:
                    out[k] = p[k]
            return ParamDict(out)
        return p

    def kinetic(self, p, with_logdet=False):
        """K = 0.5 p^T M^-1 p (+ 0.5 log det M when with_logdet: needed
        if the mass matrix is re-estimated mid-run, otherwise the
        constant cancels in Metropolis-Hastings)."""
        minv_p = self.minv(p)
        K = 0.5 * sum(float(jnp.sum((p[k].conj() * minv_p[k]).real))
                      for k in p)
        if with_logdet:
            K += 0.5 * self.logdet()
        return K

    def logdet(self):
        """log det M across all parameters (0 for identity blocks)."""
        ld = 0.0
        if self.mass is not None:
            for k in self.mass.keys():
                ld += float(jnp.sum(jnp.log(self.mass[k])))
            return ld

        def op_logdet(op):
            if hasattr(op, "logdet"):
                return float(op.logdet())
            if hasattr(op, "L"):  # TriangMat / SolveMat factors
                return 2.0 * float(jnp.sum(jnp.log(jnp.abs(
                    jnp.diagonal(op.L)))))
            return 2.0 * float(jnp.sum(jnp.log(jnp.abs(
                jnp.diagonal(op.to_dense())))))

        if self.chol is not None:
            return sum(op_logdet(self.chol[k]) for k in self.chol.mats)
        if self.invchol is not None:
            return -sum(op_logdet(self.invchol[k])
                        for k in self.invchol.mats)
        return ld


def _t_matvec(op, v):
    """op^T @ v for hmat operators -- lazy algebraic transpose (never
    densifies; round 1 paid to_dense().T here)."""
    return op.t_mat_vec_mul(v)


@jax.tree_util.register_pytree_node_class
class StepSize(ParamDict):
    """Per-parameter leapfrog step size (reference StepSize,
    sampler.py:1586-1755): a ParamDict of eps arrays whose product with
    a position/momentum ParamDict applies per-element step sizes.

    Complex leaves multiply re/im parts separately (the reference's
    multiply_eps convention) -- note that this framework stores complex
    trainables as real pairs (viewreal), where plain elementwise
    multiplication already does the right thing.
    """

    def _eps_mul(self, x, eps):
        if jnp.iscomplexobj(x) and jnp.iscomplexobj(eps):
            return jax.lax.complex(x.real * eps.real, x.imag * eps.imag)
        if jnp.iscomplexobj(x):
            return jax.lax.complex(x.real * eps, x.imag * eps)
        return x * eps

    def __mul__(self, other):
        if isinstance(other, ParamDict):
            return ParamDict({k: self._eps_mul(other[k], self[k])
                              for k in self.keys()})
        return StepSize({k: self[k] * other for k in self.keys()})

    def __rmul__(self, other):
        return self.__mul__(other)


class RelativeStepSize(StepSize):
    """Acceptance-driven multiplicative per-param step-size schedule
    (reference DynamicStepSize, sampler.py:1756-1863): when a
    trajectory's acceptance probability falls below min_prob the eps
    multiplier shrinks by gamma, otherwise it grows by alpha; `index`
    optionally restricts adjustment to a subset of each parameter.
    """

    def __init__(self, params, eps_mul=None, gamma=0.8, min_prob=0.2,
                 alpha=1.25, index=None, track=False):
        super().__init__(dict(params.items()) if hasattr(params, "items")
                         else params)
        self.eps_mul = {k: 1.0 for k in self.keys()} if eps_mul is None \
            else dict(eps_mul)
        self.gamma = gamma
        self.min_prob = min_prob
        self.alpha = alpha
        self.index = index
        self.track = track
        self.chain = [] if track else None

    def effective(self):
        """StepSize of params * eps_mul (index-restricted)."""
        out = {}
        for k in self.keys():
            eps = self[k]
            if self.index is not None and k in self.index:
                eps = jnp.asarray(eps)
                out[k] = eps.at[self.index[k]].multiply(self.eps_mul[k])
            else:
                out[k] = eps * self.eps_mul[k]
        return StepSize(out)

    def update(self, accept_prob):
        # the reference records the PRE-update multiplier
        # (sampler.py:1840) and caps the grow branch at 1.0
        if self.track:
            self.chain.append(dict(self.eps_mul))
        if accept_prob < self.min_prob:
            self.eps_mul = {k: v * self.gamma
                            for k, v in self.eps_mul.items()}
        else:
            self.eps_mul = {k: np.clip(v * self.alpha, None, 1.0)
                            for k, v in self.eps_mul.items()}
        return self.effective()


class DynamicStepSize:
    """Dual-averaging step-size adaptation (Hoffman & Gelman 2014,
    reference sampler.py:1586-1863).

    eps0 may be a float OR a per-parameter StepSize/ParamDict base: the
    dual-averaged scalar then multiplies the per-param base, so relative
    per-element step sizes are preserved while the overall scale adapts.
    """

    def __init__(self, eps0=0.1, target=0.8, gamma=0.05, t0=10, kappa=0.75,
                 Nadapt=None):
        self.base = None
        if hasattr(eps0, "keys"):
            self.base = eps0 if isinstance(eps0, StepSize) \
                else StepSize(dict(eps0.items()))
            scale0 = 1.0
        else:
            scale0 = float(eps0)
        self.eps = self._eff(scale0)
        self.mu = np.log(10 * scale0)
        self.target = target
        self.gamma = gamma
        self.t0 = t0
        self.kappa = kappa
        self.t = 0
        self.Hbar = 0.0
        self.log_eps_bar = np.log(scale0)
        self.Nadapt = Nadapt
        self.frozen = False

    def _eff(self, scale):
        return self.base * scale if self.base is not None else scale

    def update(self, accept_prob):
        if self.frozen:
            return self.eps
        self.t += 1
        if self.Nadapt is not None and self.t > self.Nadapt:
            self.frozen = True
            self.eps = self._eff(float(np.exp(self.log_eps_bar)))
            return self.eps
        eta = 1.0 / (self.t + self.t0)
        self.Hbar = (1 - eta) * self.Hbar + eta * (self.target - accept_prob)
        log_eps = self.mu - np.sqrt(self.t) / self.gamma * self.Hbar
        w = self.t ** (-self.kappa)
        self.log_eps_bar = w * log_eps + (1 - w) * self.log_eps_bar
        self.eps = self._eff(float(np.exp(log_eps)))
        return self.eps


class HMC(SamplerBase):
    """Hamiltonian Monte Carlo (reference sampler.py:181-757)."""

    def __init__(self, potential, x0, eps=0.1, Nstep=10, mass=None,
                 chol=None, invchol=None, dHmax=1000.0, seed=0,
                 adapt_eps=False, adapt_kwargs=None, jitter_Nstep=False,
                 pmask=None, on_device="auto"):
        """on_device: run whole leapfrog trajectories as one fused
        device computation (lax.scan) when the wrapped LogProb is
        single-batch; 'auto' enables it when possible, False forces the
        host (per-step) integrator."""
        super().__init__(x0)
        self.potential = potential
        self.eps = eps
        self.Nstep = Nstep
        self.mass = _Mass(mass, chol, invchol)
        self.dHmax = dHmax
        self.key = jax.random.PRNGKey(seed)
        self.fn_evals = 0
        self.jitter_Nstep = jitter_Nstep
        # pmask: optional [0,1] ParamDict multiplying drawn momenta —
        # zeros freeze parameters for the trajectory (reference :732)
        self.pmask = pmask
        # adapt_eps: True/'dual' = dual-averaging of the (scalar or
        # per-param-base) step size; 'relative' = reference-style
        # acceptance-driven multiplicative per-param schedule
        if adapt_eps == "relative":
            assert hasattr(eps, "keys"), \
                "adapt_eps='relative' needs a per-param eps ParamDict"
            self.stepsize = RelativeStepSize(eps, **(adapt_kwargs or {}))
            self.eps = self.stepsize.effective()
        elif adapt_eps:
            self.stepsize = DynamicStepSize(eps, **(adapt_kwargs or {}))
        else:
            self.stepsize = None
        self._U = None
        self._grad = None
        self._on_device = on_device
        self._traj_cache = {}
        self._chains_runners = {}
        self._prob = getattr(potential, "prob", None)

    def _traj_eligible(self):
        """On-device trajectories need a plain single-batch LogProb with
        no gradient modifications (grad mods apply in value_and_grad,
        which the fused path bypasses)."""
        p = self._prob
        return (self._on_device and p is not None
                and hasattr(p, "_batch_fn")
                and getattr(p, "Nbatch", 1) == 1
                and not getattr(p, "grad_mods", None))

    @property
    def _traj(self):
        """Lazily-built fused trajectory, rebuilt if the prob's
        main_params sub-slicing changed after sampler construction."""
        if not self._traj_eligible():
            return None
        key = id(getattr(self._prob, "main_params", None))
        if key not in self._traj_cache:
            fn = self._prob._batch_fn(0)
            vg = jax.value_and_grad(fn)
            self._traj_cache[key] = jax.jit(
                make_leapfrog_traj(vg, self.mass.minv),
                static_argnums=(6,))
        return self._traj_cache[key]

    def dUdx(self, x, Ucache=None, **kwargs):
        """Potential and gradient at x; Ucache, if a list, collects the
        potential value (reference sampler.py:471-485)."""
        self.fn_evals += 1
        out = self.potential(x)
        if Ucache is not None:
            Ucache.append(out[0])
        return out

    def _energy(self, U, p):
        return float(U) + self.mass.kinetic(p)

    def K(self, p):
        """Kinetic energy 0.5 p^T M^-1 p under the current mass matrix
        (reference sampler.py:391-450)."""
        return self.mass.kinetic(p)

    def is_divergent(self, H_start, H_end):
        """Trajectory divergence test against self.dHmax
        (reference :452-469)."""
        return (H_end - H_start) > self.dHmax

    def apply_pmask(self, momentum, pmask=None):
        """Multiply a momentum ParamDict by a [0,1] mask — zeros freeze
        those parameters for the trajectory (reference :732-757)."""
        pmask = pmask if pmask is not None else self.pmask
        if pmask is None:
            return momentum
        return ParamDict({k: momentum[k] * pmask[k] if k in pmask
                          else momentum[k] for k in momentum.keys()})

    def draw_momentum(self):
        """p ~ N(0, M), pmask applied (reference :489-530). Advances
        self.key."""
        self.key, kp = jax.random.split(self.key)
        return self.apply_pmask(self.mass.sample_momentum(kp, self.x))

    def set_chol(self, cov_L=None, hess_L=None, diag_mass=True):
        """Reset the mass matrix from Cholesky factors (reference
        :260-333): mass M = Hessian, covariance C = M^-1. diag_mass:
        the factors are DIAGONAL (scalar or ParamDict), M = hess_L^2 =
        cov_L^-2; otherwise per-key operator/matrix factors with
        M = Lm Lm^T (hess_L) or M^-1 = Lc Lc^T (cov_L)."""
        if diag_mass:
            mass = None
            L = hess_L if hess_L is not None else cov_L
            if L is not None:
                if not hasattr(L, "keys"):
                    L = ParamDict({k: jnp.asarray(
                        L, jnp.asarray(self.x[k]).real.dtype)
                        for k in self.x.keys()})
                mass = L * L
                if hess_L is None:
                    mass = mass.operator(lambda x: 1.0 / x)
            self.mass = _Mass(mass=mass)
        else:
            self.mass = _Mass(chol=hess_L, invchol=cov_L)

    def dual_averaging(self, Nadapt, target=0.8, gamma=0.05, t0=10.0,
                       kappa=0.75):
        """Adapt the step size by Hoffman+14 dual averaging over the
        next Nadapt steps, starting from the current self.eps
        (reference :630-731). Subsequent step() calls feed acceptance
        probabilities into the schedule; after Nadapt steps the
        averaged eps freezes."""
        self.stepsize = DynamicStepSize(self.eps, target=target,
                                        gamma=gamma, t0=t0, kappa=kappa,
                                        Nadapt=Nadapt)

    def step(self, sample_p=True):
        """One HMC step with Metropolis accept and divergence recovery
        (reference :548-626). sample_p=False reuses the existing
        momentum self.p (trajectory tracking, not standard HMC)."""
        self.key, kp, ka = jax.random.split(self.key, 3)
        if sample_p or getattr(self, "p", None) is None:
            p = self.apply_pmask(self.mass.sample_momentum(kp, self.x))
        else:
            p = self.p
        self.p = p
        if self._U is None:
            self._U, self._grad = self.dUdx(self.x)
        H0 = self._energy(self._U, p)

        nstep = self.Nstep
        if self.jitter_Nstep:
            self.key, kn = jax.random.split(self.key)
            nstep = int(jax.random.randint(kn, (), 1, self.Nstep + 1))

        if self._traj is not None:
            data, icov = self._prob._batch_args(0)
            q_new, p_new, U_new, grad_new = self._traj(
                self.x, p, self._prob.model, data, icov, self.eps, nstep)
            self.fn_evals += nstep + 1
        else:
            q_new, p_new, U_new, grad_new, _ = leapfrog(
                self.x, p, self.dUdx, self.eps, nstep, self.mass.minv)
        H1 = self._energy(U_new, p_new)
        dH = H1 - H0

        # divergence: restart from a random chain sample (reference
        # :595-609)
        if not np.isfinite(dH) or dH > self.dHmax:
            self._divergences.append(self.Nsamples)
            if self.Nsamples > 1:
                self.key, kr = jax.random.split(self.key)
                idx = int(jax.random.randint(kr, (), 0, self.Nsamples))
                self.x = ParamDict({k: jnp.asarray(self.chain[k][idx])
                                    for k in self.chain})
                self._U = None
            self.append_chain(self.x)
            self._acceptances.append(0.0)
            if self.stepsize is not None:
                self.eps = self.stepsize.update(0.0)
            return False

        accept_prob = min(1.0, float(np.exp(-dH)))
        u = float(jax.random.uniform(ka))
        accepted = u < accept_prob
        if accepted:
            self.x = q_new
            self._U, self._grad = U_new, grad_new
        self.append_chain(self.x, U=float(self._U))
        self._acceptances.append(accept_prob)
        self.Usteps.append(float(self._U))
        if self.stepsize is not None:
            self.eps = self.stepsize.update(accept_prob)
        return accepted

    def _chains_runner(self, Nsample, nstep, eps):
        """Compiled vmap(scan) runner for sample_chains, cached so
        repeated same-shape calls don't retrace. eps rides as a traced
        ARGUMENT (so dual-averaged updates between calls reuse the
        executable); mass/pmask are closures — the cache keys on their
        identities and is invalidated when they are replaced (set_chol
        / estimate_cov build new _Mass objects). The prob's model/data/
        icov leaves ride as ARGUMENTS too, NOT closures: a closed-over
        complex device array becomes a trace-time MLIR constant, which
        forces a device->host fetch that the axon remote TPU backend
        cannot do for complex64 (measured: the Gaussian path ran, the
        RIME path died fetching a closure constant).

        Returns (runner, model, data, icov)."""
        ckey = (Nsample, nstep, id(self.mass), id(self.pmask),
                hasattr(eps, "keys"),
                id(getattr(self._prob, "main_params", None)))
        cached = self._chains_runners.get(ckey)
        if cached is not None:
            return cached

        if self._prob is not None:
            assert self._traj_eligible(), (
                "sample_chains needs the on-device trajectory path: a "
                "single-batch LogProb with no grad mods (got Nbatch="
                f"{getattr(self._prob, 'Nbatch', 1)})")
            fn = self._prob._batch_fn(0)
            vg = jax.value_and_grad(fn)
            model = self._prob.model
            data, icov = self._prob._batch_args(0)
        else:
            pot = self.potential

            def vg(q, model, data, icov):
                return pot(q)

            model = data = icov = None

        traj = make_leapfrog_traj(vg, self.mass.minv)
        dHmax = float(self.dHmax)
        mass = self.mass
        pmask = self.pmask

        def kin(p):
            mp = mass.minv(p)
            return sum(jnp.sum((p[k] * mp[k]).real)
                       for k in p.keys()) * 0.5

        def one_chain(key, q0, eps, model, data, icov):
            def one_step(carry, _):
                key, q, U, g = carry
                key, kp, ka = jax.random.split(key, 3)
                p = mass.sample_momentum(kp, q)
                if pmask is not None:
                    p = ParamDict({k: p[k] * pmask[k] if k in pmask
                                   else p[k] for k in p.keys()})
                H0 = U + kin(p)
                q1, p1, U1, g1 = traj(q, p, model, data, icov, eps,
                                      nstep)
                dH = (U1 + kin(p1)) - H0
                divergent = jnp.logical_or(~jnp.isfinite(dH), dH > dHmax)
                accept_prob = jnp.where(
                    divergent, 0.0, jnp.minimum(1.0, jnp.exp(-dH)))
                acc = jax.random.uniform(ka) < accept_prob
                qn = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(acc, b, a), q, q1)
                gn = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(acc, b, a), g, g1)
                Un = jnp.where(acc, U1, U)
                return (key, qn, Un, gn), (qn, Un, accept_prob,
                                           divergent)

            U0, g0 = vg(q0, model, data, icov)
            (_, qf, _, _), ys = jax.lax.scan(
                one_step, (key, q0, U0, g0), None, length=Nsample)
            return ys + (qf,)

        runner = jax.jit(jax.vmap(
            one_chain, in_axes=(0, 0, None, None, None, None)))
        cached = (runner, model, data, icov)
        self._chains_runners[ckey] = cached
        return cached

    def sample_chains(self, Nsample, Nchain=4, x0=None, seed=None,
                      Nstep=None, eps=None):
        """Vectorized multi-chain HMC, fully on device (TPU-native —
        beyond the reference, which runs one sequential chain per
        process, sampler.py:181-757): ``jax.vmap`` over Nchain
        independent chains x ``lax.scan`` over Nsample steps, so the
        ENTIRE multi-chain run is ONE compiled device computation with
        no per-sample host round trips (~30 ms each over the remote
        backend). Chains differ by PRNG stream (and optionally by
        starting point); any mass-matrix form whose operator actions
        are jax-traceable (identity / diagonal / dense or hmat
        Cholesky) rides along unchanged.

        Works when the wrapped Potential carries a single-batch LogProb
        with no grad mods (the on-device trajectory requirement, see
        ``_traj_eligible``) or when ``potential`` itself is a pure jax
        function ``q -> (U, grad)``.

        Divergent trajectories reject in place and are flagged in the
        returned ``divergent`` array — the sequential ``step()``'s
        restart-from-a-random-chain-sample recovery is a host-side
        policy that has no analog inside a fused scan. Step-size
        adaptation is likewise host-side state: run a short sequential
        warmup (``dual_averaging`` + ``sample``) first, then hand the
        tuned ``self.eps`` to this method for the long vectorized run.

        Parameters
        ----------
        Nsample : int — samples per chain.
        Nchain : int — number of chains (ignored if x0 fixes it).
        x0 : optional; list of ParamDicts (one per chain), or a
            ParamDict whose leaves carry a leading chain axis. Default:
            every chain starts at the current state self.x (distinct
            momentum draws decorrelate them immediately).
        seed : optional int — PRNG seed for the whole run; default
            splits the sampler's running key.
        Nstep, eps : optional overrides of the sampler settings.

        Returns
        -------
        dict with ``chain`` {key: (Nchain, Nsample, *shape) ndarray},
        ``U`` (Nchain, Nsample), ``accept_prob`` (Nchain, Nsample),
        ``divergent`` (Nchain, Nsample) bool, ``acceptance_rate``
        (Nchain,), and ``final`` (ParamDict, leading chain axis).
        The compiled runner is cached per (Nsample, Nstep, mass, pmask)
        so repeated same-shape calls reuse the executable; eps is a
        traced argument, so step-size changes between calls are free.
        """
        nstep = int(Nstep if Nstep is not None else self.Nstep)
        eps = eps if eps is not None else self.eps

        if x0 is None:
            q0s = jax.tree_util.tree_map(
                lambda v: jnp.broadcast_to(v, (int(Nchain),) + v.shape),
                self.x)
        elif isinstance(x0, (list, tuple)):
            Nchain = len(x0)
            q0s = jax.tree_util.tree_map(lambda *vs: jnp.stack(vs), *x0)
        else:
            q0s = x0
            Nchain = int(np.shape(q0s[next(iter(q0s.keys()))])[0])

        if seed is not None:
            krun = jax.random.PRNGKey(int(seed))
        else:
            self.key, krun = jax.random.split(self.key)
        keys = jax.random.split(krun, int(Nchain))

        runner, model, data, icov = self._chains_runner(
            int(Nsample), nstep, eps)
        qs, Us, aps, divs, qf = runner(keys, q0s, eps, model, data, icov)
        self.fn_evals += int(Nchain) * int(Nsample) * (nstep + 1)
        aps = np.asarray(aps)
        return {
            "chain": {k: np.asarray(qs[k]) for k in qs.keys()},
            "U": np.asarray(Us),
            "accept_prob": aps,
            "divergent": np.asarray(divs),
            "acceptance_rate": aps.mean(axis=1),
            "final": qf,
        }

    def estimate_cov(self, Nback=None, diag_mass=True, robust=False,
                     eps=None, set_mass=True, burn=0):
        """Estimate parameter covariance from the Nback most-recent
        chain samples and (by default) install it as the mass matrix —
        the reference's estimate_cov -> set_chol flow (sampler.py:673-
        713). robust uses the 1.42*MAD variance estimate the reference
        intends (its robust branch references an undefined name — a
        reference bug, pinned in tests). eps: per-key Tikhonov added to
        the dense sample covariance before the Cholesky.

        Returns the covariance: ParamDict of per-element variances when
        diag_mass, else a dict of dense covariance matrices."""
        from . import hmat as _hmat
        ch = self.get_chain(burn=burn)
        eps = eps if eps is not None else {k: 0.0 for k in ch}
        variances, chols, covs = {}, {}, {}
        for k, v in ch.items():
            c = v.reshape(len(v), -1)
            if Nback is not None:
                c = c[-Nback:]
            if diag_mass:
                if robust:
                    med = np.median(c, axis=0)
                    var = (1.42 * np.median(np.abs(c - med), axis=0)) ** 2
                else:
                    var = np.var(c, axis=0)
                variances[k] = jnp.asarray(var.reshape(v.shape[1:]))
            else:
                cov = np.atleast_2d(np.cov(c.T))
                covs[k] = cov
                chols[k] = np.linalg.cholesky(
                    cov + np.eye(len(cov)) * float(eps[k]))
        if diag_mass:
            out = ParamDict(variances)
            if set_mass:
                # mass = inverse covariance (diagonal)
                self.mass = _Mass(mass=ParamDict(
                    {k: 1.0 / jnp.clip(v, 1e-30)
                     for k, v in variances.items()}))
            return out
        if set_mass:
            # covariance Cholesky = the mass INVERSE factor (M^-1=L L^T)
            self.mass = _Mass(invchol=_hmat.MatDict(
                {k: _hmat.TriangMat(jnp.asarray(L)) for k, L in
                 chols.items()}))
        return covs


class RecycledHMC(HMC):
    """Recycled-momentum HMC (Nishimura & Dunson 2020; reference
    sampler.py:759-954): stores all intermediate leapfrog states as
    (weighted) samples. With an on-device trajectory available (see
    HMC), the whole Nstep integration + per-state energies run as one
    device dispatch."""

    def _recycled_traj(self):
        key = id(getattr(self._prob, "main_params", None))
        if getattr(self, "_rtraj_key", None) != key:
            self._rtraj_fn = None
            self._rtraj_key = key
        if getattr(self, "_rtraj_fn", None) is None:
            fn = self._prob._batch_fn(0)
            vg = jax.value_and_grad(fn)
            Minv = self.mass.minv

            def kin(p):
                mp = Minv(p)
                return 0.5 * sum(jnp.sum((p[k].conj() * mp[k]).real)
                                 for k in p.keys())

            def traj(q, p, model, data, icov, eps, nstep):
                _, g0 = vg(q, model, data, icov)

                def body(carry, _):
                    q, p, g = carry
                    p1 = p - g * (eps * 0.5)
                    q1 = q + Minv(p1) * eps
                    U, g1 = vg(q1, model, data, icov)
                    p2 = p1 - g1 * (eps * 0.5)
                    return (q1, p2, g1), (q1, U + kin(p2))

                _, (qs, Hs) = jax.lax.scan(body, (q, p, g0), None,
                                           length=nstep)
                return qs, Hs

            self._rtraj_fn = jax.jit(traj, static_argnums=(6,))
        return self._rtraj_fn

    def step(self):
        self.key, kp, ka = jax.random.split(self.key, 3)
        p = self.mass.sample_momentum(kp, self.x)
        if self._U is None:
            self._U, self._grad = self.dUdx(self.x)
        H0 = self._energy(self._U, p)

        if self._traj is not None:
            # one dispatch: all Nstep states + their energies
            data, icov = self._prob._batch_args(0)
            qs, Hs = self._recycled_traj()(
                self.x, p, self._prob.model, data, icov, self.eps,
                self.Nstep)
            self.fn_evals += self.Nstep + 1
            Hs = np.asarray(Hs)
            states = [(jax.tree_util.tree_map(lambda a, i=i: a[i], qs),
                       None, None, float(Hs[i]))
                      for i in range(self.Nstep)]
        else:
            # host path: integrate step by step, recording each state
            q, mom = self.x, p
            states = []
            U, grad = self._U, self._grad
            for i in range(self.Nstep):
                q, mom, U, grad, _ = leapfrog(q, mom, self.dUdx, self.eps,
                                              1, self.mass.minv)
                H = self._energy(U, mom)
                states.append((q, U, grad, H))
        # accept each state independently vs H0
        any_acc = False
        for (q, U, grad, H) in states:
            dH = H - H0
            if not np.isfinite(dH):
                continue
            ap = min(1.0, float(np.exp(-dH)))
            self.key, ku = jax.random.split(self.key)
            if float(jax.random.uniform(ku)) < ap:
                self.x = q
                if U is not None:
                    self._U, self._grad = U, grad
                else:
                    self._U = None
                any_acc = True
            self.append_chain(self.x)
            self._acceptances.append(ap)
        return any_acc


class NUTS(SamplerBase):
    """No-U-Turn Sampler with recursive tree doubling and slice sampling
    (Hoffman & Gelman 2014 Alg. 3; reference sampler.py:956-1337)."""

    def __init__(self, potential, x0, eps=0.1, mass=None, chol=None,
                 invchol=None, max_treedepth=8, dHmax=1000.0, seed=0,
                 adapt_eps=False, adapt_kwargs=None, on_device="auto",
                 tree_variant="slice", biased=True, sample_direction=True):
        """on_device: expand each tree doubling's 2^depth leapfrog steps
        inside ONE device dispatch (lax.while_loop, iterative NUTS with
        the O(log N) checkpoint scheme) when the wrapped LogProb is
        single-batch; False forces the recursive host tree.

        tree_variant: 'slice' (default) is Hoffman & Gelman Alg. 3 with
        slice sampling (on-device capable). 'reference' mirrors the
        reference's merge-trees NUTS draw for draw (sampler.py:956-1337:
        Betancourt Sec A.3.2 (biased) progressive sampling with
        multinomial logaddexp weights, raw-momentum hoffman_uturn, and
        a final Metropolis accept on the active state) — host path
        only; pinned against the actual reference by the trajectory
        fuzz in tests/test_reference_parity.py. biased /
        sample_direction match the reference kwargs."""
        super().__init__(x0)
        self.potential = potential
        self.eps = eps
        self.mass = _Mass(mass, chol, invchol)
        self.max_treedepth = max_treedepth
        self.dHmax = dHmax
        self.key = jax.random.PRNGKey(seed)
        self.fn_evals = 0
        self.stepsize = DynamicStepSize(eps, **(adapt_kwargs or {})) \
            if adapt_eps else None
        self.tree_depths = []
        self._on_device = on_device
        self._subtree_cache = {}
        self._chains_runners = {}
        self._prob = getattr(potential, "prob", None)
        assert tree_variant in ("slice", "reference")
        self.tree_variant = tree_variant
        self.biased = biased
        self.sample_direction = sample_direction

    def _subtree_eligible(self):
        p = self._prob
        return (self._on_device and p is not None
                and hasattr(p, "_batch_fn")
                and getattr(p, "Nbatch", 1) == 1
                and not getattr(p, "grad_mods", None))

    @property
    def _subtree(self):
        if not self._subtree_eligible():
            return None
        key = id(getattr(self._prob, "main_params", None))
        if key not in self._subtree_cache:
            fn = self._prob._batch_fn(0)
            vg = jax.value_and_grad(fn)
            self._subtree_cache[key] = jax.jit(
                make_nuts_subtree(vg, self.mass.minv,
                                  max_depth=self.max_treedepth))
        return self._subtree_cache[key]

    def dUdx(self, x):
        self.fn_evals += 1
        return self.potential(x)

    def _chains_runner(self, Nsample, eps):
        """Compiled vmap(scan(while)) runner for NUTS.sample_chains:
        the outer tree-doubling loop is a lax.while_loop around the
        traced-depth on-device subtree, so an entire Nchain x Nsample
        NUTS run is ONE device computation. Cached like the HMC runner;
        eps and the prob's model/data/icov leaves ride as traced
        ARGUMENTS (complex closure constants cannot be fetched for
        trace-time embedding on the axon remote backend).

        Returns (runner, model, data, icov)."""
        ckey = (int(Nsample), id(self.mass), hasattr(eps, "keys"),
                id(getattr(self._prob, "main_params", None)))
        cached = self._chains_runners.get(ckey)
        if cached is not None:
            return cached

        if self._prob is not None:
            assert self._subtree_eligible(), (
                "sample_chains needs the on-device subtree path: a "
                "single-batch LogProb with no grad mods")
            fn = self._prob._batch_fn(0)
            vg = jax.value_and_grad(fn)
            model = self._prob.model
            data, icov = self._prob._batch_args(0)
        else:
            pot = self.potential

            def vg(q, model, data, icov):
                return pot(q)

            model = data = icov = None

        subtree = make_nuts_subtree(vg, self.mass.minv,
                                    max_depth=self.max_treedepth)
        mass = self.mass
        max_depth = int(self.max_treedepth)
        dHmax = float(self.dHmax)

        def kin(p):
            mp = mass.minv(p)
            return sum(jnp.sum((p[k].conj() * mp[k]).real)
                       for k in p.keys()) * 0.5

        def pdot(a, b):
            return sum(jnp.sum((a[k].conj() * b[k]).real)
                       for k in a.keys())

        def uturn(qm, qp, pm, pp):
            dq = qp - qm
            return (pdot(dq, mass.minv(pm)) < 0) | \
                   (pdot(dq, mass.minv(pp)) < 0)

        def sel(flag, a, b):
            """tree_map where(flag, a, b) over ParamDicts."""
            return jax.tree_util.tree_map(
                lambda x, y: jnp.where(flag, x, y), a, b)

        def one_draw(carry, _):
            # model/data/icov ride in the carry (loop-invariant; XLA
            # hoists them) so nothing complex is a closure constant
            key, q, eps, model, data, icov = carry
            key, kp, ku = jax.random.split(key, 3)
            p0 = mass.sample_momentum(kp, q)
            U0, _ = vg(q, model, data, icov)
            H0 = U0 + kin(p0)
            logu = -H0 + jnp.log(jax.random.uniform(ku) + 1e-300)

            def cond(st):
                return st[8] & (st[9] < max_depth)

            def body(st):
                (key, qm, pm, qp, pp, qk, n, alpha_na, s, depth) = st
                key, kd, ks, kt = jax.random.split(key, 4)
                fwd = jax.random.uniform(kd) >= 0.5
                direction = jnp.where(fwd, 1, -1).astype(jnp.int32)
                zq = sel(fwd, qp, qm)
                zp = sel(fwd, pp, pm)
                res = subtree(zq, zp, kt, logu, H0, direction, eps,
                              model, data, icov, depth, dHmax)
                qm = sel(fwd, qm, res["q_end"])
                pm = sel(fwd, pm, res["p_end"])
                qp = sel(fwd, res["q_end"], qp)
                pp = sel(fwd, res["p_end"], pp)
                n2, s2 = res["n"], res["ok"]
                u = jax.random.uniform(ks)
                take = s2 & (u * jnp.maximum(n, 1).astype(u.dtype)
                             < n2.astype(u.dtype))
                qk = sel(take, res["q_prop"], qk)
                n = n + n2
                alpha_na = (alpha_na[0] + res["alpha"],
                            alpha_na[1] + res["na"])
                s = s2 & ~uturn(qm, qp, pm, pp)
                return (key, qm, pm, qp, pp, qk, n, alpha_na, s,
                        depth + 1)

            st0 = (key, q, p0, q, p0, q, jnp.asarray(1, jnp.int32),
                   (jnp.asarray(0.0), jnp.asarray(0, jnp.int32)),
                   jnp.asarray(True), jnp.asarray(0, jnp.int32))
            st = jax.lax.while_loop(cond, body, st0)
            key, qk, (alpha, na), depth = st[0], st[5], st[7], st[9]
            Uk, _ = vg(qk, model, data, icov)
            ap = alpha / jnp.maximum(na, 1)
            return (key, qk, eps, model, data, icov), (qk, Uk, ap, depth)

        def one_chain(key, q0, eps, model, data, icov):
            (_, qf, *_), ys = jax.lax.scan(
                one_draw, (key, q0, eps, model, data, icov), None,
                length=int(Nsample))
            return ys + (qf,)

        runner = jax.jit(jax.vmap(
            one_chain, in_axes=(0, 0, None, None, None, None)))
        cached = (runner, model, data, icov)
        self._chains_runners[ckey] = cached
        return cached

    def sample_chains(self, Nsample, Nchain=4, x0=None, seed=None,
                      eps=None):
        """Vectorized multi-chain NUTS, fully on device (TPU-native —
        beyond the reference): vmap over Nchain chains x lax.scan over
        draws, each draw's tree-doubling loop a lax.while_loop around
        the traced-depth on-device subtree — the whole multi-chain NUTS
        run is ONE compiled device computation. Slice-variant (Hoffman
        & Gelman Alg. 3) semantics, identical to the sequential
        ``step()``'s on-device path; step-size adaptation is host-side
        state, so run a sequential warmup first and pass the tuned eps.

        Returns dict with ``chain`` {key: (Nchain, Nsample, *shape)},
        ``U`` (Nchain, Nsample), ``accept_prob``, ``tree_depth``
        (Nchain, Nsample), ``acceptance_rate`` (Nchain,), ``final``.
        """
        eps = eps if eps is not None else self.eps

        if x0 is None:
            q0s = jax.tree_util.tree_map(
                lambda v: jnp.broadcast_to(v, (int(Nchain),) + v.shape),
                self.x)
        elif isinstance(x0, (list, tuple)):
            Nchain = len(x0)
            q0s = jax.tree_util.tree_map(lambda *vs: jnp.stack(vs), *x0)
        else:
            q0s = x0
            Nchain = int(np.shape(q0s[next(iter(q0s.keys()))])[0])

        if seed is not None:
            krun = jax.random.PRNGKey(int(seed))
        else:
            self.key, krun = jax.random.split(self.key)
        keys = jax.random.split(krun, int(Nchain))

        runner, model, data, icov = self._chains_runner(int(Nsample), eps)
        qs, Us, aps, depths, qf = runner(keys, q0s, eps, model, data,
                                         icov)
        aps = np.asarray(aps)
        return {
            "chain": {k: np.asarray(qs[k]) for k in qs.keys()},
            "U": np.asarray(Us),
            "accept_prob": aps,
            "tree_depth": np.asarray(depths),
            "acceptance_rate": aps.mean(axis=1),
            "final": qf,
        }

    # reference NUTS subclasses HMC and inherits its mass plumbing
    set_chol = HMC.set_chol
    K = HMC.K
    is_divergent = HMC.is_divergent

    def _uturn(self, q_minus, q_plus, p_minus, p_plus):
        """Hoffman u-turn criterion (reference :1402-1432)."""
        dq = (q_plus - q_minus).ravel()
        return (float(dq @ self.mass.minv(p_minus).ravel()) < 0) or \
               (float(dq @ self.mass.minv(p_plus).ravel()) < 0)

    # ---- tree_variant='reference': the reference's merge-trees NUTS,
    # draw for draw (sampler.py:956-1337). Uniform-consumption order
    # matches the reference's np.random.rand order exactly: one
    # direction draw per doubling, one merge draw per internal tree
    # merge (2^depth - 1 inside build_tree, bottom-up), one step-level
    # merge draw, one final Metropolis draw.

    def _u(self):
        """One uniform [0,1) draw; advances self.key."""
        self.key, ku = jax.random.split(self.key)
        return float(jax.random.uniform(ku))

    def _ref_uturn(self, qm, qp_, pm, pp_):
        """The reference's hoffman_uturn (:1402-1432): RAW momentum
        (no mass-inverse), conjugated position difference."""
        ma = sum(float(jnp.real(jnp.vdot(jnp.ravel(qp_[k] - qm[k]),
                                         jnp.ravel(pm[k]))))
                 for k in qm.keys())
        pa = sum(float(jnp.real(jnp.vdot(jnp.ravel(qp_[k] - qm[k]),
                                         jnp.ravel(pp_[k]))))
                 for k in qm.keys())
        return (ma < 0) or (pa < 0)

    def _ref_basetree(self, q, p, direction, H0):
        """Depth-0 tree: one leapfrog step (reference :1104-1141). The
        node weight is logaddexp(-H_start, -H_new), mirroring the
        reference's formula (its own TODO notes -H_new would be the
        textbook choice)."""
        q2, p2, U2, _g2, _ = leapfrog(q, p, self.dUdx,
                                      self.eps * direction, 1,
                                      self.mass.minv)
        H2 = float(U2) + self.mass.kinetic(p2)
        # exactly the reference's is_divergent (:452-469): False for a
        # NaN Hamiltonian too (NaN > dHmax is False), so a NaN-producing
        # trajectory keeps doubling and consuming uniforms just like the
        # reference — required for draw-for-draw RNG parity
        diverging = (H2 - H0) > self.dHmax
        return dict(ql=q2, pl=p2, qr=q2, pr=p2, qp=q2, pp=p2,
                    U=float(U2), H=H2, w=float(np.logaddexp(-H0, -H2)),
                    turning=False, diverging=diverging)

    def _ref_merge(self, old, new, new_right):
        """Betancourt Sec A.3.2 (biased) progressive sampling
        (reference merge_trees, :1037-1103)."""
        if self.biased:
            prob = min(1.0, float(np.exp(new["w"] - old["w"])))
        else:
            prob = min(1.0, float(np.exp(
                new["w"] - np.logaddexp(old["w"], new["w"]))))
        src = new if self._u() < prob else old
        m = dict(src)
        # edges always span both trees
        left, right = (old, new) if new_right else (new, old)
        m["ql"], m["pl"] = left["ql"], left["pl"]
        m["qr"], m["pr"] = right["qr"], right["pr"]
        m["w"] = float(np.logaddexp(old["w"], new["w"]))
        m["turning"] = old["turning"] or new["turning"]
        m["diverging"] = old["diverging"] or new["diverging"]
        return m

    def _ref_build(self, q, p, direction, depth, H0, base):
        """Recursive subtree doubling (reference build_tree,
        :1142-1219): both halves are always built (the reference's
        early break is commented out), merged with one uniform, then
        the u-turn cross-check runs against the BASE tree's far edge
        (the merged tree's own-edge check is dead code there — the
        base_tree branch overwrites it)."""
        if depth == 0:
            return self._ref_basetree(q, p, direction, H0)
        half = self._ref_build(q, p, direction, depth - 1, H0, base)
        qs, ps_ = (half["qr"], half["pr"]) if direction > 0 \
            else (half["ql"], half["pl"])
        other = self._ref_build(qs, ps_, direction, depth - 1, H0, base)
        m = self._ref_merge(half, other, new_right=direction > 0)
        if direction > 0:
            qm, pm, qp_, pp_ = base["ql"], base["pl"], m["qr"], m["pr"]
        else:
            qm, pm, qp_, pp_ = m["ql"], m["pl"], base["qr"], base["pr"]
        m["turning"] = m["turning"] or self._ref_uturn(qm, qp_, pm, pp_)
        return m

    def _step_reference(self, sample_p=True):
        """One reference-semantics NUTS step (reference step,
        :1220-1337): multiplicative doublings merged into a base tree,
        final Metropolis accept on the active state."""
        self.key, kp = jax.random.split(self.key)
        if sample_p or getattr(self, "p", None) is None:
            p = self.mass.sample_momentum(kp, self.x)
        else:
            p = self.p
        U0, _g0 = self.dUdx(self.x)
        H0 = float(U0) + self.mass.kinetic(p)
        base = dict(ql=self.x, pl=p, qr=self.x, pr=p, qp=self.x, pp=p,
                    U=float(U0), H=H0, w=-H0, turning=False,
                    diverging=False)
        depth = 0
        new = base
        while depth < self.max_treedepth:
            direction = (1 if self._u() > 0.5 else -1) \
                if self.sample_direction else 1
            qs, ps_ = (base["qr"], base["pr"]) if direction > 0 \
                else (base["ql"], base["pl"])
            new = self._ref_build(qs, ps_, direction, depth, H0, base)
            if new["diverging"] or new["turning"]:
                break
            base = self._ref_merge(base, new, direction > 0)
            depth += 1

        if new["diverging"]:
            self._divergences.append(self.Nsamples)
            if self.Nsamples > 0 and depth < 2:
                # restart from a random chain position (reference
                # :1307-1315)
                self.key, kr = jax.random.split(self.key)
                idx = int(jax.random.randint(kr, (), 0, self.Nsamples))
                self.x = ParamDict({k: jnp.asarray(self.chain[k][idx])
                                    for k in self.chain})
                self.append_chain(self.x)
                self._acceptances.append(0.0)
                self.tree_depths.append(depth)
                return False

        prob = min(1.0, float(np.exp(H0 - base["H"])))
        # the reference always consumes the accept uniform (a nan/0
        # prob simply never accepts) — match its draw count exactly
        accept = bool(self._u() < prob)
        if accept:
            self.x = base["qp"]
            self.p = base["pp"]
            U = base["U"]
        else:
            U = float(U0)
        self.append_chain(self.x, U=U)
        self._acceptances.append(prob)
        self.tree_depths.append(depth)
        if self.stepsize is not None:
            self.eps = self.stepsize.update(prob)
        return accept

    def _leap1(self, q, p, direction):
        q2, p2, U2, g2, _ = leapfrog(q, p, self.dUdx, direction * self.eps,
                                     1, self.mass.minv)
        return q2, p2, U2

    def _build_tree(self, q, p, logu, direction, depth, H0):
        """Recursive doubling (Alg. 3)."""
        if depth == 0:
            q2, p2, U2 = self._leap1(q, p, direction)
            H2 = float(U2) + self.mass.kinetic(p2)
            n2 = int(logu <= -H2)
            s2 = int(logu < self.dHmax - H2)
            return q2, p2, q2, p2, q2, n2, s2, min(1.0, np.exp(H0 - H2)), 1
        qm, pm, qp, pp, q2, n2, s2, a2, na2 = self._build_tree(
            q, p, logu, direction, depth - 1, H0)
        if s2:
            if direction == -1:
                qm, pm, _, _, q3, n3, s3, a3, na3 = self._build_tree(
                    qm, pm, logu, direction, depth - 1, H0)
            else:
                _, _, qp, pp, q3, n3, s3, a3, na3 = self._build_tree(
                    qp, pp, logu, direction, depth - 1, H0)
            self.key, ku = jax.random.split(self.key)
            if n3 > 0 and float(jax.random.uniform(ku)) < n3 / max(n2 + n3, 1):
                q2 = q3
            a2 += a3
            na2 += na3
            s2 = s3 * int(not self._uturn(qm, qp, pm, pp))
            n2 += n3
        return qm, pm, qp, pp, q2, n2, s2, a2, na2

    def step(self, sample_p=True):
        if self.tree_variant == "reference":
            return self._step_reference(sample_p=sample_p)
        self.key, kp, ku = jax.random.split(self.key, 3)
        p0 = self.mass.sample_momentum(kp, self.x) \
            if sample_p or getattr(self, "p", None) is None else self.p
        U0, _ = self.dUdx(self.x)
        H0 = float(U0) + self.mass.kinetic(p0)
        # slice variable
        logu = -H0 + float(np.log(float(jax.random.uniform(ku)) + 1e-300))

        qm = qp = self.x
        pm = pp = p0
        q_keep = self.x
        n, s, depth = 1, 1, 0
        alpha, nalpha = 0.0, 0
        data = icov = None
        if self._subtree is not None:
            data, icov = self._prob._batch_args(0)
        while s and depth < self.max_treedepth:
            self.key, kd, ks, kt = jax.random.split(self.key, 4)
            direction = 1 if float(jax.random.uniform(kd)) < 0.5 else -1
            if self._subtree is not None:
                zq, zp = (qm, pm) if direction == -1 else (qp, pp)
                res = self._subtree(zq, zp, kt, logu, H0,
                                    direction, self.eps, self._prob.model,
                                    data, icov, depth=depth,
                                    dHmax=self.dHmax)
                if direction == -1:
                    qm, pm = res["q_end"], res["p_end"]
                else:
                    qp, pp = res["q_end"], res["p_end"]
                q2 = res["q_prop"]
                n2 = int(res["n"])
                s2 = int(res["ok"])
                a2 = float(res["alpha"])
                na2 = int(res["na"])
                self.fn_evals += na2 + 1
            elif direction == -1:
                qm, pm, _, _, q2, n2, s2, a2, na2 = self._build_tree(
                    qm, pm, logu, direction, depth, H0)
            else:
                _, _, qp, pp, q2, n2, s2, a2, na2 = self._build_tree(
                    qp, pp, logu, direction, depth, H0)
            if s2 and float(jax.random.uniform(ks)) < min(1.0, n2 / max(n, 1)):
                q_keep = q2
            n += n2
            alpha += a2
            nalpha += na2
            s = s2 * int(not self._uturn(qm, qp, pm, pp))
            depth += 1

        self.x = q_keep
        self.append_chain(self.x)
        ap = alpha / max(nalpha, 1)
        self._acceptances.append(ap)
        self.tree_depths.append(depth)
        if self.stepsize is not None:
            self.eps = self.stepsize.update(ap)
        return True


