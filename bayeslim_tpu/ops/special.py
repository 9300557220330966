"""
High-precision special functions for cut-sky spherical harmonics.

Reference parity: bayeslim/special.py (Plm :14, Qlm :122, hypF :227,
pochln :318, jl :377, yl :442). All functions here are HOST-side
numpy/mpmath: they exist to build non-integer-degree Legendre bases for
spherical caps/stripes, which is a precompute stage (the resulting design
matrices are the device-side objects). mpmath's arbitrary precision is
required for stability at large degree (stable to l = m ~ 800); scipy's
hyp2f1 is the fast low-precision fallback.

Math: Ferrers functions of the first/second kind on -1 < x < 1,
DLMF 14.3.1 and 14.3.12, orthonormalized by
sqrt((2l+1)/(4pi) (l-m)!/(l+m)!); degenerate hypergeometric c <= 0 handled
via DLMF 15.2.3_5 with log-space Pochhammer accounting (DLMF 5.2.6).
"""
from __future__ import annotations

import numpy as np
from scipy.special import gamma, gammaln, jv, jvp, yv, yvp

__all__ = ["Plm", "Qlm", "hypF", "pochln", "jl", "yl", "log_legendre_norm",
           "softplus", "j1", "j1_integral"]

HYPF_KWGS = {"zeroprec": 1000}


def log_legendre_norm(l, m):
    """log of sqrt((2l+1)/(4pi) * (l-m)!/(l+m)!)."""
    return 0.5 * (np.log(2 * l + 1) - np.log(4 * np.pi)
                  + gammaln(l - m + 1) - gammaln(l + m + 1))


def pochln(a, n):
    """Signed log Pochhammer (a)_n = Gamma(a+n)/Gamma(a) (DLMF 5.2.6).

    Returns (sign, log|poch|) arrays.
    """
    a = np.atleast_1d(np.asarray(a, dtype=float))
    n = np.atleast_1d(np.asarray(n, dtype=float))
    a, n = np.broadcast_arrays(a, n)
    out = np.zeros(a.shape, dtype=float)
    sign = np.ones(a.shape, dtype=int)

    is_int = ((a % 1) == 0) & ((n % 1) == 0)
    neg_a = is_int & (a < 0)

    s1 = neg_a & (n < 0)
    out[s1] = -np.inf

    s3 = neg_a & (n > 0)
    if s3.any():
        # (a)_n = (-1)^n (-a-n+1)_n for negative integer a
        sign[s3] = np.where(n[s3] % 2 == 0, 1, -1)
        out[s3] = pochln(-a[s3] - n[s3] + 1, n[s3])[1]

    s4 = ~(s1 | s3) & ~(neg_a & (n == 0))
    if s4.any():
        out[s4] = gammaln(a[s4] + n[s4]) - gammaln(a[s4])
        # track sign flips from negative gamma arguments
        flip = s4 & (np.abs(a + n) % 2 < 1) & ((a + n) < 0)
        sign[flip] *= -1
        flip = s4 & (np.abs(a) % 2 < 1) & (a < 0)
        sign[flip] *= -1
    return sign, out


def hypF(a, b, c, z, high_prec=True, keepdims=False):
    """Doubly-regularized Gauss hypergeometric 2F1(a,b;c;z)/(G(c) G(c+1)).

    The extra 1/Gamma(c+1) prevents overflow at large degree and is
    re-multiplied by the callers (Plm/Qlm). Handles non-positive integer c
    via DLMF 15.2.3_5. a, b, c are (Nmode, 1)-broadcastable; z is (Nz,).
    """
    if high_prec:
        from mpmath import hyp2f1 as _h21
        kg = HYPF_KWGS
    else:
        from scipy.special import hyp2f1 as _h21
        kg = {}

    a = np.atleast_2d(np.asarray(a, dtype=float))
    b = np.atleast_2d(np.asarray(b, dtype=float))
    c = np.atleast_2d(np.asarray(c, dtype=float))
    z = np.atleast_1d(np.asarray(z, dtype=float))
    nmode = max(a.shape[0], b.shape[0], c.shape[0])
    a = np.broadcast_to(a, (nmode, a.shape[1])).astype(float)
    b = np.broadcast_to(b, (nmode, b.shape[1])).astype(float)
    c = np.broadcast_to(c, (nmode, c.shape[1])).astype(float)

    f21_eval = np.frompyfunc(lambda *args: float(_h21(*args, **kg)), 4, 1)

    F = np.zeros((nmode, len(z)), dtype=float)
    cneg = (c.ravel() <= 0)
    if cneg.any():
        # DLMF 15.2.3_5: F~(a,b;-n;z) = poch(a)_{n+1} poch(b)_{n+1} /
        #   (n+1)! * z^{n+1} * 2F1(a+n+1, b+n+1; n+2; z)
        A, B, n = a[cneg], b[cneg], -c[cneg]
        sgn = np.ones_like(n, dtype=int)
        lognorm = np.zeros_like(n, dtype=float)
        for inp in (A, B):
            s, p = pochln(inp, n + 1)
            sgn = sgn * s
            lognorm = lognorm + p
        lognorm = lognorm - gammaln(n + 2) - gammaln(n + 1)  # /(n+1)!/G(|c|+1)
        f21 = np.asarray(f21_eval(A + n + 1, B + n + 1, n + 2, z),
                         dtype=float)
        with np.errstate(divide="ignore", invalid="ignore"):
            logz = np.log(np.abs(z)) * (n + 1)
            F[cneg] = sgn * np.sign(f21) * np.sign(z) ** (n + 1) * \
                np.exp(np.log(np.abs(f21) + 1e-300) + logz + lognorm)
        F[cneg][..., np.isclose(z, 0)] = 0.0
    if (~cneg).any():
        A, B, C = a[~cneg], b[~cneg], c[~cneg]
        f21 = np.asarray(f21_eval(A, B, C, z), dtype=float)
        F[~cneg] = f21 / gamma(C) / gamma(C + 1)

    if not keepdims and len(F) == 1:
        F = F[0]
    return F


def _prep_lm(l, m):
    l = np.atleast_1d(np.asarray(l, dtype=float))
    m = np.atleast_1d(np.asarray(m, dtype=float))
    if l.ndim == 1:
        l = l[:, None]
    if m.ndim == 1:
        m = m[:, None]
    return l, m


def Plm(l, m, x, deriv=False, dtheta=True, keepdims=False, high_prec=True,
        sq_norm=True):
    """Orthonormalized Ferrers function of the first kind (DLMF 14.3.1).

    P(x) = C ((1+x)/(1-x))^{m/2} F~(l+1, -l; 1-m; (1-x)/2),
    C = sqrt((2l+1)/(4pi) (l-m)!/(l+m)!). Stable to l = m ~ 800.
    sq_norm=False withholds the (1-x^2)^{-m/2} factor (used when
    combining with Qlm at high degree to avoid cancellation).
    deriv returns dP/dtheta (DLMF 14.10.5) with x = cos(theta).
    """
    l, m = _prep_lm(l, m)
    assert np.all(m <= l + 1e-5)
    x = np.atleast_1d(np.asarray(x, dtype=float))

    if deriv:
        with np.errstate(divide="ignore", invalid="ignore"):
            pref = 1.0 / (1 - x ** 2)
        t1 = (m - l - 1) * Plm(l + 1, m, x, keepdims=True, sq_norm=sq_norm,
                               high_prec=high_prec)
        t1 = t1 * np.exp(log_legendre_norm(l, m) - log_legendre_norm(l + 1, m))
        t2 = (l + 1) * x * Plm(l, m, x, keepdims=True, sq_norm=sq_norm,
                               high_prec=high_prec)
        dPdx = t1 + t2
        fin = np.isfinite(pref)
        dPdx[:, fin] *= pref[fin]
        if dtheta:
            dPdx = dPdx * (-np.sin(np.arccos(x)))
        return _squeeze(dPdx, keepdims)

    with np.errstate(divide="ignore", invalid="ignore"):
        pref = ((1 + x) / (1 - x)) ** (m / 2)
    F = hypF(l + 1, -l, 1 - m, (1 - x) / 2, high_prec=high_prec,
             keepdims=True)
    fin = np.isfinite(pref)
    F[fin] *= pref[fin]
    # undo hypF's extra 1/Gamma(|c|+1), apply orthonorm
    F *= np.exp(log_legendre_norm(l, m) + gammaln(np.abs(1 - m) + 1))
    if not sq_norm:
        F = F / (1 - x ** 2) ** (-m / 2)
    return _squeeze(F, keepdims)


def Qlm(l, m, x, deriv=False, dtheta=True, keepdims=False, high_prec=True,
        sq_norm=True):
    """Orthonormalized Ferrers function of the second kind (DLMF 14.3.12).

    Q = pi/2 [-sin((l+m)pi/2) w1 + cos((l+m)pi/2) w2] with w1/w2 the even/
    odd hypergeometric solutions. Diverges at |x| = 1.
    """
    l, m = _prep_lm(l, m)
    x = np.atleast_1d(np.asarray(x, dtype=float))

    if deriv:
        with np.errstate(divide="ignore", invalid="ignore"):
            pref = 1.0 / (1 - x ** 2)
        t1 = (m - l - 1) * Qlm(l + 1, m, x, keepdims=True, sq_norm=sq_norm,
                               high_prec=high_prec)
        t1 = t1 * np.exp(log_legendre_norm(l, m) - log_legendre_norm(l + 1, m))
        t2 = (l + 1) * x * Qlm(l, m, x, keepdims=True, sq_norm=sq_norm,
                               high_prec=high_prec)
        dQdx = pref * (t1 + t2)
        if dtheta:
            dQdx = dQdx * (-np.sin(np.arccos(x)))
        return _squeeze(dQdx, keepdims)

    C = log_legendre_norm(l, m)
    w1 = 2 ** m * hypF((-l - m) / 2, (l - m + 1) / 2, 0.5, x ** 2,
                       high_prec=high_prec, keepdims=True)
    w1 = w1 * np.exp(C + gammaln((l + m + 1) / 2) - gammaln((l - m + 2) / 2)
                     + gammaln(1.5))
    w2 = 2 ** m * x * hypF((1 - l - m) / 2, (l - m + 2) / 2, 1.5, x ** 2,
                           high_prec=high_prec, keepdims=True)
    w2 = w2 * np.exp(C + gammaln((l + m + 2) / 2) - gammaln((l - m + 1) / 2)
                     + gammaln(2.5))
    Q = 0.5 * np.pi * (-np.sin(0.5 * (l + m) * np.pi) * w1
                       + np.cos(0.5 * (l + m) * np.pi) * w2)
    if sq_norm:
        Q = Q * (1 - x ** 2) ** (-m / 2)
    return _squeeze(Q, keepdims)


def _squeeze(arr, keepdims):
    if keepdims:
        return arr
    if 1 in arr.shape:
        arr = arr.ravel()
    if arr.size == 1:
        arr = arr.reshape(())[()]
    return arr


def jl(l, z, deriv=False, keepdims=False):
    """Spherical Bessel of the first kind (DLMF 10.47.3), non-integer l ok.

    j_l(z) = sqrt(pi/(2z)) J_{l+1/2}(z).
    """
    l = np.atleast_1d(np.asarray(l, dtype=float))
    if l.ndim == 1:
        l = l[:, None]
    z = np.atleast_1d(np.asarray(z, dtype=float))
    nu = l + 0.5
    with np.errstate(divide="ignore", invalid="ignore"):
        pref = np.sqrt(np.pi / (2 * z))
        if deriv:
            out = pref * (jvp(nu, z) - jv(nu, z) / (2 * z))
        else:
            out = pref * jv(nu, z)
    # z = 0 limits
    z0 = np.isclose(z, 0)
    if z0.any():
        if deriv:
            out[:, z0] = np.where(np.isclose(l, 1), 1 / 3.0, 0.0)
        else:
            out[:, z0] = np.where(np.isclose(l, 0), 1.0, 0.0)
    return _squeeze(out, keepdims)


def yl(l, z, deriv=False, keepdims=False):
    """Spherical Bessel of the second kind (DLMF 10.47.4)."""
    l = np.atleast_1d(np.asarray(l, dtype=float))
    if l.ndim == 1:
        l = l[:, None]
    z = np.atleast_1d(np.asarray(z, dtype=float))
    nu = l + 0.5
    with np.errstate(divide="ignore", invalid="ignore"):
        pref = np.sqrt(np.pi / (2 * z))
        if deriv:
            out = pref * (yvp(nu, z) - yv(nu, z) / (2 * z))
        else:
            out = pref * yv(nu, z)
    return _squeeze(out, keepdims)


def j1_integral(x, Ntau=100):
    """Bessel J1 via trapezoidal integration of the Bessel integral
    J1(x) = (1/pi) int_0^pi cos(tau - x sin(tau)) dtau (reference
    special.j1 brute_force path, special.py:498-535). Fully
    differentiable; Ntau sets the quadrature density.
    """
    import jax.numpy as jnp
    x = jnp.asarray(x)
    t = jnp.linspace(0.0, jnp.pi, Ntau)
    t = t.reshape((-1,) + (1,) * x.ndim)
    integrand = jnp.cos(t - x[None] * jnp.sin(t))
    wgts = jnp.ones(Ntau).at[1:-1].set(2.0).reshape((-1,) + (1,) * x.ndim)
    dt = np.pi / (Ntau - 1)
    return jnp.sum(wgts * integrand, axis=0) * dt / 2.0 / np.pi


def j1(x, Ntau=100, brute_force=False):
    """Bessel J1 (reference special.py:498-535): brute_force integrates
    the Bessel integral with Ntau trapezoid points (the reference's
    differentiable path); otherwise the A&S 9.4.4/9.4.6 polynomial
    approximation (also differentiable — the reference falls back to
    non-differentiable scipy here)."""
    if brute_force:
        return j1_integral(x, Ntau=Ntau)
    from ..models.bessel import j1 as _j1_poly
    return _j1_poly(x)


def softplus(x, beta=1.0, threshold=20.0):
    """Numerically-stable softplus ln(1 + exp(beta x)) / beta (reference
    special.Softplus, special.py:689)."""
    import jax.numpy as jnp
    x = jnp.asarray(x)
    out = jnp.logaddexp(0.0, beta * x) / beta
    return jnp.where(beta * x > threshold, x, out)


class Softplus:
    """Callable softplus with fixed beta/threshold and an inverse
    (reference special.py:689-729): f(x) = ln(1+exp(x)),
    f^-1(y) = y + ln(1 - exp(-y)), with f(x) = x above the threshold."""

    def __init__(self, beta=1.0, threshold=20.0, inverted=False):
        self.beta = beta
        self.threshold = threshold
        self.set_inverted(inverted)

    def set_inverted(self, inverted):
        """If True, __call__ applies the inverse instead of the forward
        (reference special.py:710)."""
        self.inverted = inverted

    def forward(self, x):
        return softplus(x, self.beta, self.threshold)

    def inverse(self, x):
        """Inverse softplus log(exp(beta y) - 1)/beta, stable form
        y + log(-expm1(-beta y))/beta (reference special.py:719)."""
        import jax.numpy as jnp
        x = jnp.asarray(x)
        out = x + jnp.log(-jnp.expm1(-self.beta * x)) / self.beta
        return jnp.where(self.beta * x > self.threshold, x, out)

    def __call__(self, x):
        return self.inverse(x) if self.inverted else self.forward(x)
