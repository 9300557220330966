"""
Quasi-Newton optimizers: dense BFGS and low-memory L-BFGS with
strong-Wolfe line search.

Reference parity: bayeslim/bfgs.py (BFGS :17-375, LBFGS :377-552,
lbfgs_approx_cov :553, strong-Wolfe search :1103 with cubic interpolation
:1050). The algorithms operate on the raveled ParamDict vector; the
closure returns (value, gradient-vector). The two-loop recursion and the
Wolfe zoom run on host (they are inherently sequential scalar logic), with
all heavy math (the closure) jitted.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import ParamDict

__all__ = ["BFGS", "LBFGS", "strong_wolfe", "lbfgs_approx_cov"]


def _cubic_interpolate(x1, f1, g1, x2, f2, g2, bounds=None):
    """Cubic minimizer of a 1D function from two (x, f, f') samples
    (reference bfgs.py:1050-1100)."""
    if bounds is not None:
        xmin_bound, xmax_bound = bounds
    else:
        xmin_bound, xmax_bound = (x1, x2) if x1 <= x2 else (x2, x1)
    d1 = g1 + g2 - 3 * (f1 - f2) / (x1 - x2)
    d2_square = d1 ** 2 - g1 * g2
    if d2_square >= 0:
        d2 = np.sqrt(d2_square)
        if x1 <= x2:
            min_pos = x2 - (x2 - x1) * ((g2 + d2 - d1) / (g2 - g1 + 2 * d2))
        else:
            min_pos = x1 - (x1 - x2) * ((g1 + d2 - d1) / (g1 - g2 + 2 * d2))
        return min(max(min_pos, xmin_bound), xmax_bound)
    return (xmin_bound + xmax_bound) / 2.0


def strong_wolfe(fun, x, t, d, f, g, gtd, c1=1e-4, c2=0.9, tolerance_change=1e-9,
                 max_ls=25):
    """Strong-Wolfe line search (reference bfgs.py:1103-1310).

    fun(x) -> (f, g-vector). Returns (f_new, g_new, t, ls_evals).
    """
    d_norm = float(jnp.abs(d).max())
    g = jnp.asarray(g)
    # evaluate at initial step
    f_new, g_new = fun(x + t * d)
    ls_func_evals = 1
    gtd_new = float(g_new @ d)

    t_prev, f_prev, g_prev, gtd_prev = 0.0, f, g, gtd
    done = False
    ls_iter = 0
    while ls_iter < max_ls:
        if f_new > (f + c1 * t * gtd) or (ls_iter > 1 and f_new >= f_prev):
            bracket = [t_prev, t]
            bracket_f = [f_prev, float(f_new)]
            bracket_g = [g_prev, g_new]
            bracket_gtd = [gtd_prev, gtd_new]
            break
        if abs(gtd_new) <= -c2 * gtd:
            bracket = [t, t]
            bracket_f = [float(f_new), float(f_new)]
            bracket_g = [g_new, g_new]
            done = True
            break
        if gtd_new >= 0:
            bracket = [t_prev, t]
            bracket_f = [f_prev, float(f_new)]
            bracket_g = [g_prev, g_new]
            bracket_gtd = [gtd_prev, gtd_new]
            break

        min_step = t + 0.01 * (t - t_prev)
        max_step = t * 10
        tmp = t
        t = _cubic_interpolate(t_prev, f_prev, gtd_prev, t, float(f_new),
                               gtd_new, bounds=(min_step, max_step))
        t_prev, f_prev, g_prev, gtd_prev = tmp, float(f_new), g_new, gtd_new
        f_new, g_new = fun(x + t * d)
        ls_func_evals += 1
        gtd_new = float(g_new @ d)
        ls_iter += 1
    else:
        bracket = [0, t]
        bracket_f = [f, float(f_new)]
        bracket_g = [g, g_new]
        bracket_gtd = [gtd, gtd_new]

    # zoom phase
    insuf_progress = False
    low_pos, high_pos = (0, 1) if bracket_f[0] <= bracket_f[-1] else (1, 0)
    while not done and ls_iter < max_ls:
        if abs(bracket[1] - bracket[0]) * d_norm < tolerance_change:
            break
        t = _cubic_interpolate(bracket[0], bracket_f[0], bracket_gtd[0],
                               bracket[1], bracket_f[1], bracket_gtd[1])
        eps = 0.1 * (max(bracket) - min(bracket))
        if min(max(bracket) - t, t - min(bracket)) < eps:
            if insuf_progress or t >= max(bracket) or t <= min(bracket):
                if abs(t - max(bracket)) < abs(t - min(bracket)):
                    t = max(bracket) - eps
                else:
                    t = min(bracket) + eps
                insuf_progress = False
            else:
                insuf_progress = True
        else:
            insuf_progress = False

        f_new, g_new = fun(x + t * d)
        ls_func_evals += 1
        gtd_new = float(g_new @ d)
        ls_iter += 1

        if f_new > (f + c1 * t * gtd) or f_new >= bracket_f[low_pos]:
            bracket[high_pos] = t
            bracket_f[high_pos] = float(f_new)
            bracket_g[high_pos] = g_new
            bracket_gtd[high_pos] = gtd_new
            low_pos, high_pos = (0, 1) if bracket_f[0] <= bracket_f[1] else (1, 0)
        else:
            if abs(gtd_new) <= -c2 * gtd:
                done = True
            elif gtd_new * (bracket[high_pos] - bracket[low_pos]) >= 0:
                bracket[high_pos] = bracket[low_pos]
                bracket_f[high_pos] = bracket_f[low_pos]
                bracket_g[high_pos] = bracket_g[low_pos]
                bracket_gtd[high_pos] = bracket_gtd[low_pos]
            bracket[low_pos] = t
            bracket_f[low_pos] = float(f_new)
            bracket_g[low_pos] = g_new
            bracket_gtd[low_pos] = gtd_new

    t = bracket[low_pos] if not done else t
    f_new = bracket_f[low_pos] if not done else float(f_new)
    g_new = bracket_g[low_pos] if not done else g_new
    return f_new, g_new, t, ls_func_evals


class _QuasiNewtonBase:
    """Shared machinery: ravel/unravel, closure adaptation, step loop."""

    def __init__(self, prob, pdict=None, lr=1.0, max_iter=20,
                 tolerance_grad=1e-14, tolerance_change=1e-16,
                 line_search_fn="strong_wolfe"):
        self.prob = prob
        self.pdict = pdict if pdict is not None else prob.collect_main_params()
        self._template = self.pdict.copy()
        self.lr = lr
        self.max_iter = max_iter
        self.tolerance_grad = tolerance_grad
        self.tolerance_change = tolerance_change
        self.line_search_fn = line_search_fn
        self.n_iter = 0
        self.func_evals = 0

    def _fun(self, x):
        pd = self._template.unravel(x)
        v, g = self.prob.value_and_grad(pd)
        self.func_evals += 1
        return float(v), g.ravel()

    def _exit_after_ls(self, f, f_new, g_new, t, d):
        """Reference break conditions evaluated after the line search
        (bfgs.py:333-347): optimality (exit 2), step-size stagnation
        (exit 3), loss stagnation (exit 4). True = skip the Hessian
        update for this iteration."""
        if float(jnp.abs(g_new).max()) <= self.tolerance_grad:
            return True
        if float(jnp.abs(t * d).max()) <= self.tolerance_change:
            return True
        if abs(f_new - f) < self.tolerance_change:
            return True
        return False

    @property
    def x(self):
        return self.pdict.ravel()

    def _commit(self, x):
        self.pdict = self._template.unravel(x)
        self.prob.update(self.pdict)


class BFGS(_QuasiNewtonBase):
    """Dense inverse-Hessian BFGS (reference bfgs.py:17-375)."""

    def __init__(self, prob, pdict=None, H0=None, **kwargs):
        super().__init__(prob, pdict, **kwargs)
        n = self.x.size
        if H0 is None:
            self.H = jnp.eye(n)
        elif jnp.ndim(H0) < 2:
            # scalar/diag starting inverse Hessian (reference :101-115)
            self.H = jnp.eye(n) * jnp.asarray(H0)
        else:
            self.H = jnp.asarray(H0)
        self._f = None
        self._g = None

    def step(self):
        """One outer BFGS iteration (direction + line search + H update)."""
        x = self.x
        if self._g is None:
            self._f, self._g = self._fun(x)
        f, g = self._f, self._g
        if float(jnp.abs(g).max()) <= self.tolerance_grad:
            return f
        d = -(self.H @ g)
        gtd = float(g @ d)
        # non-descent direction guard (reference :290-292, exit 1)
        if gtd > -self.tolerance_change:
            return f
        # the reference scales the FIRST trial step only without a line
        # search (bfgs.py:281-284); strong_wolfe always starts at lr
        t = self.lr
        if self.n_iter == 0 and self.line_search_fn is None:
            t = min(1.0, 1.0 / float(jnp.abs(g).sum())) * self.lr
        if self.line_search_fn == "strong_wolfe":
            f_new, g_new, t, _ = strong_wolfe(self._fun, x, t, d, f, g, gtd)
        else:
            f_new, g_new = self._fun(x + t * d)
        x_new = x + t * d
        s = x_new - x
        y = g_new - g
        # the reference's exits 2/3/4 (bfgs.py:333-347) fire AFTER the
        # parameter update but BEFORE update_hessian: the near-converged
        # curvature pair is dropped and n_iter not incremented
        if self._exit_after_ls(f, f_new, g_new, t, d):
            self._commit(x_new)
            self._f, self._g = f_new, g_new
            return f_new
        ys = float(y @ s)
        # sufficient-curvature condition (reference :192)
        if ys > self.tolerance_grad:
            rho = 1.0 / ys
            I = jnp.eye(x.size)
            V = I - rho * jnp.outer(s, y)
            self.H = V @ self.H @ V.T + rho * jnp.outer(s, s)
        self._commit(x_new)
        self._f, self._g = f_new, g_new
        self.n_iter += 1
        return f_new

    def minimize(self, Nsteps=None):
        Nsteps = Nsteps if Nsteps is not None else self.max_iter
        losses = []
        for _ in range(Nsteps):
            losses.append(self.step())
        return losses


class LBFGS(_QuasiNewtonBase):
    """Two-loop-recursion L-BFGS (reference bfgs.py:377-552,619).

    H0: starting inverse Hessian — scalar, diag vector, or a hmat
    BaseMat (reference _init_H :442-476). update_Hdiag (default True,
    reference :423-428): rescale the starting diagonal each accepted
    curvature pair by Nocedal Eqn 7.20 normalized to the current
    diagonal, update = sᵀy / (yᵀ H₀ y). With a uniform H0 this equals
    the standard gamma scaling sᵀy/yᵀy.
    """

    def __init__(self, prob, pdict=None, history_size=20, H0=None,
                 update_Hdiag=True, **kwargs):
        super().__init__(prob, pdict, **kwargs)
        self.history_size = history_size
        self.update_Hdiag = update_Hdiag
        self.s_hist = []
        self.y_hist = []
        self.rho_hist = []
        self.t_hist = []  # line-search steps matching (s, y) pairs
        self._f = None
        self._g = None
        n = self.x.size
        from .hmat import BaseMat
        if H0 is None:
            self._Hdiag = jnp.ones(n)
        elif isinstance(H0, BaseMat):
            self._Hdiag = jnp.asarray(H0.diagonal()).real
        elif jnp.ndim(H0) == 0:
            self._Hdiag = jnp.full((n,), float(H0))
        else:
            # diag vector (numpy/jax arrays also expose .diagonal —
            # the BaseMat check must come first, not hasattr)
            self._Hdiag = jnp.asarray(H0)

    @property
    def H(self):
        """Running starting inverse Hessian as a DiagMat (reference
        keeps self.H as the hmat it scalar_mul's; tests read .diag)."""
        from .hmat import DiagMat
        return DiagMat(self._Hdiag)

    def _two_loop(self, g):
        q = g
        alphas = []
        for s, y, rho in zip(reversed(self.s_hist), reversed(self.y_hist),
                             reversed(self.rho_hist)):
            a = rho * float(s @ q)
            alphas.append(a)
            q = q - a * y
        r = q * self._Hdiag
        for (s, y, rho), a in zip(zip(self.s_hist, self.y_hist, self.rho_hist),
                                  reversed(alphas)):
            b = rho * float(y @ r)
            r = r + (a - b) * s
        return r

    def step(self):
        x = self.x
        if self._g is None:
            self._f, self._g = self._fun(x)
        f, g = self._f, self._g
        if float(jnp.abs(g).max()) <= self.tolerance_grad:
            return f
        d = -self._two_loop(g)
        gtd = float(g @ d)
        # non-descent direction guard (reference :290-292, exit 1)
        if gtd > -self.tolerance_change:
            return f
        # the reference scales the FIRST trial step only without a line
        # search (bfgs.py:281-284); strong_wolfe always starts at lr
        t = self.lr
        if self.n_iter == 0 and self.line_search_fn is None:
            t = min(1.0, 1.0 / float(jnp.abs(g).sum())) * self.lr
        if self.line_search_fn == "strong_wolfe":
            f_new, g_new, t, _ = strong_wolfe(self._fun, x, t, d, f, g, gtd)
        else:
            f_new, g_new = self._fun(x + t * d)
        x_new = x + t * d
        s = x_new - x
        y = g_new - g
        # reference exits 2/3/4 drop the curvature pair (see BFGS.step)
        if self._exit_after_ls(f, f_new, g_new, t, d):
            self._commit(x_new)
            self._f, self._g = f_new, g_new
            return f_new
        ys = float(y @ s)
        # sufficient-curvature condition (reference :120)
        if ys > self.tolerance_grad:
            self.s_hist.append(s)
            self.y_hist.append(y)
            self.rho_hist.append(1.0 / ys)
            self.t_hist.append(t)
            if len(self.s_hist) > self.history_size:
                self.s_hist.pop(0)
                self.y_hist.pop(0)
                self.rho_hist.pop(0)
                self.t_hist.pop(0)
            if self.update_Hdiag:
                # Eqn 7.20 normalized to the current diagonal
                # (reference :520-535)
                upd = ys / float(y @ (self._Hdiag * y))
                self._Hdiag = self._Hdiag * upd
        self._commit(x_new)
        self._f, self._g = f_new, g_new
        self.n_iter += 1
        return f_new

    def minimize(self, Nsteps=None):
        Nsteps = Nsteps if Nsteps is not None else self.max_iter
        losses = []
        for _ in range(Nsteps):
            losses.append(self.step())
        return losses


def lbfgs_approx_cov(obj, Nsteps=5, as_dense=True, **kwargs):
    """Approximate covariance (inverse Hessian) from L-BFGS curvature.

    Two forms:
    - obj is a LogProb-like (has collect_main_params): the reference's
      contract (bfgs.py:553-617) — run a short LBFGS per trainable leaf
      (Eqn 6.20 H_diag heuristic) and return a DiagMat over the raveled
      parameters. NOTE (as in the reference): the probe steps UPDATE the
      model's parameter values; checkpoint first to restore.
    - obj is a finished LBFGS optimizer: materialize the dense Nocedal
      6.20 inverse Hessian from its (s, y) pairs (extension; small
      problems)."""
    if hasattr(obj, "collect_main_params"):
        from .hmat import DiagMat
        prob = obj
        pd = prob.collect_main_params()
        diags = []
        for key in pd:
            sub = ParamDict({key: pd[key]})
            opt = LBFGS(prob, sub, **kwargs)
            opt.minimize(Nsteps)
            diags.append(opt._Hdiag)
        return DiagMat(jnp.concatenate(diags))

    lbfgs = obj
    n = lbfgs.x.size
    H = jnp.diag(lbfgs._Hdiag)
    for s, y, rho in zip(lbfgs.s_hist, lbfgs.y_hist, lbfgs.rho_hist):
        I = jnp.eye(n)
        V = I - rho * jnp.outer(s, y)
        H = V @ H @ V.T + rho * jnp.outer(s, s)
    return H
