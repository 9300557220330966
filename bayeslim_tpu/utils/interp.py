"""
Pixel interpolation: host-precomputed (indices, weights), device
gather-einsum.

TPU-first redesign of the reference's PixInterp (bayeslim/utils.py:684-878):
instead of an arr_hash-keyed runtime cache (needed because torch re-executes
eagerly), the interpolation metadata is precomputed once on host as numpy
(`PixInterp.precompute`) and passed/stored as constant arrays; the device op
(`interp`) is a static-shape gather + weighted sum that XLA fuses.

Supports:
- 'healpix': bilinear 4-neighbor interpolation (ring ordering)
- 'rect': bipolynomial interpolation on a rectangular (theta, phi) grid,
  degree 0..3 per axis (nearest/linear/quadratic/cubic), phi wrap-around.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import healpix as hp
from .dtypes import D2R

__all__ = ["PixInterp", "interp_gather", "bipoly_interp_weights"]

_S2D = {"nearest": 0, "linear": 1, "quadratic": 2, "cubic": 3}


def _lagrange_weights(xrel, offsets):
    """Lagrange interpolation weights at fractional position xrel.

    offsets : integer sample offsets (e.g. [0, 1] for linear), xrel is the
    target position in the same (grid-index) units, shape (N,).
    Returns (N, len(offsets)).
    """
    offs = np.asarray(offsets, dtype=np.float64)
    k = len(offs)
    w = np.ones((len(xrel), k), dtype=np.float64)
    for j in range(k):
        for m in range(k):
            if m == j:
                continue
            w[:, j] *= (xrel - offs[m]) / (offs[j] - offs[m])
    return w


def bipoly_interp_weights(xgrid, ygrid, xnew, ynew, degx=1, degy=1, wrapx=True):
    """Tensor-product polynomial interpolation on a rect grid.

    Grid raveling follows the reference convention (utils.py:702-706):
    x, y = meshgrid(phi_grid, theta_grid); pixels ordered x-fastest, i.e.
    flat index = iy * len(xgrid) + ix.

    Returns
    -------
    inds : (Nnew, (degx+1)*(degy+1)) int64 flat pixel indices
    wgts : same shape float64 weights
    """
    xgrid = np.asarray(xgrid, dtype=np.float64)
    ygrid = np.asarray(ygrid, dtype=np.float64)
    xnew = np.atleast_1d(np.asarray(xnew, dtype=np.float64))
    ynew = np.atleast_1d(np.asarray(ynew, dtype=np.float64))
    nx, ny = len(xgrid), len(ygrid)
    dx = xgrid[1] - xgrid[0]
    dy = ygrid[1] - ygrid[0]
    kx, ky = degx + 1, degy + 1

    # fractional grid coords
    fx = (xnew - xgrid[0]) / dx
    fy = (ynew - ygrid[0]) / dy
    if wrapx:
        fx = np.mod(fx, nx)

    # left-most sample of each interpolation window
    x0 = np.floor(fx - (kx - 1) / 2.0 + 0.5).astype(np.int64) if degx > 0 else np.round(fx).astype(np.int64)
    y0 = np.floor(fy - (ky - 1) / 2.0 + 0.5).astype(np.int64) if degy > 0 else np.round(fy).astype(np.int64)
    if not wrapx:
        x0 = np.clip(x0, 0, nx - kx)
    y0 = np.clip(y0, 0, ny - ky)

    wx = _lagrange_weights(fx - x0, np.arange(kx))
    wy = _lagrange_weights(fy - y0, np.arange(ky))

    ix = x0[:, None] + np.arange(kx)[None, :]
    if wrapx:
        ix = np.mod(ix, nx)
    else:
        ix = np.clip(ix, 0, nx - 1)
    iy = np.clip(y0[:, None] + np.arange(ky)[None, :], 0, ny - 1)

    # outer products -> (Nnew, ky, kx)
    inds = iy[:, :, None] * nx + ix[:, None, :]
    wgts = wy[:, :, None] * wx[:, None, :]
    return inds.reshape(len(xnew), -1), wgts.reshape(len(xnew), -1)


def interp_gather(m, inds, wgts):
    """Device-side interpolation: gather + weighted sum along last axis.

    m : (..., Npix); inds, wgts : (Nangles, Nnearest) -> (..., Nangles).
    Supports leading batch dims on inds/wgts: (..., Nangles, Nnearest)
    matched against m's trailing structure by broadcasting.
    """
    inds = jnp.asarray(inds)
    wgts = jnp.asarray(wgts, dtype=m.real.dtype if jnp.iscomplexobj(m) else m.dtype)
    nearest = jnp.take(m, inds, axis=-1)  # (..., Nangles, Nnearest)
    return jnp.einsum("...i,...i->...", nearest, wgts.astype(nearest.dtype))


class PixInterp:
    """Host-precompute + device-gather pixel interpolator.

    Parameters mirror the reference (utils.py:691-733): pixtype
    'healpix' (RING) or 'rect'; rect grids given by theta_grid/phi_grid
    pixel centers in degrees; interp_mode 'nearest'/'linear'/'quadratic'/
    'cubic' or 'azmode,zenmode' pairs (rect only; healpix is always
    bilinear).
    """

    def __init__(self, pixtype, nside=None, interp_mode="linear",
                 theta_grid=None, phi_grid=None):
        self.pixtype = pixtype
        self.nside = nside
        self.interp_mode = interp_mode
        self.theta_grid = None if theta_grid is None else np.asarray(theta_grid)
        self.phi_grid = None if phi_grid is None else np.asarray(phi_grid)
        self.interp_cache = {}

    def get_interp(self, zen, az):
        """Angle-hash-cached (inds, wgts) for target angles [deg]
        (reference utils.py PixInterp.get_interp :742-800). Use when the
        same pointing recurs across calls; precompute() is the uncached
        primitive."""
        from .indexing import arr_hash
        h = arr_hash(np.asarray(zen))
        if h not in self.interp_cache:
            self.interp_cache[h] = self.precompute(zen, az)
        return self.interp_cache[h]

    def clear_cache(self):
        """Drop the angle-hashed interpolation cache (reference :802)."""
        self.interp_cache = {}

    @property
    def nnearest(self):
        if self.pixtype == "healpix":
            return 4
        degx, degy = self._degrees()
        return (degx + 1) * (degy + 1)

    def _degrees(self):
        mode = self.interp_mode
        if "," in mode:
            az_mode, zen_mode = [s.strip() for s in mode.split(",")]
        else:
            az_mode = zen_mode = mode
        return _S2D[az_mode], _S2D[zen_mode]

    def precompute(self, zen, az):
        """Compute (inds, wgts) for target angles [deg] on host.

        Returns int32 indices (Nangles, Nnearest) and float weights.
        """
        zen = np.atleast_1d(np.asarray(zen, dtype=np.float64))
        az = np.atleast_1d(np.asarray(az, dtype=np.float64))
        if self.pixtype == "healpix":
            inds, wgts = hp.get_interp_weights(self.nside, zen * D2R, az * D2R)
            inds, wgts = inds.T, wgts.T
        elif self.pixtype == "rect":
            degx, degy = self._degrees()
            inds, wgts = bipoly_interp_weights(
                self.phi_grid, self.theta_grid, az, zen, degx, degy, wrapx=True)
        else:
            raise ValueError(f"unknown pixtype {self.pixtype}")
        return inds.astype(np.int32), wgts

    def interp(self, m, zen=None, az=None, inds=None, wgts=None):
        """Interpolate map(s) m (..., Npix) at target angles.

        Either pass precomputed (inds, wgts) — the jit-friendly path —
        or zen/az [deg] for host-side precompute on the fly.
        """
        if inds is None:
            inds, wgts = self.precompute(zen, az)
        return interp_gather(m, inds, wgts)
