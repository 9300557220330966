"""Multi-resolution healpix tests (reference utils.py:316-683)."""
import numpy as np
import pytest

from bayeslim_tpu.utils import multires as mr
from bayeslim_tpu.utils import healpix as hp


def test_nest_ring_roundtrip():
    for nside in [1, 2, 8, 32]:
        npix = 12 * nside * nside
        r = mr.nest2ring(nside, np.arange(npix))
        assert sorted(r.tolist()) == list(range(npix))
        assert (mr.ring2nest(nside, r) == np.arange(npix)).all()


def test_nested_hierarchy_containment():
    """Children of a nested pixel surround the parent center."""
    nside = 8
    for parent in [0, 37, 95, 500]:
        pt, pp = mr._nest_pix2ang(nside, np.asarray([parent]))
        ct, cp = mr._nest_pix2ang(nside * 2, parent * 4 + np.arange(4))
        pv = np.asarray([np.sin(pt) * np.cos(pp), np.sin(pt) * np.sin(pp),
                         np.cos(pt)]).ravel()
        cv = np.asarray([np.sin(ct) * np.cos(cp), np.sin(ct) * np.sin(cp),
                         np.cos(ct)]).mean(1)
        cv /= np.linalg.norm(cv)
        assert np.arccos(np.clip(pv @ cv, -1, 1)) < hp.nside2resol(nside) * 0.3


def test_adaptive_mesh():
    nside = 16
    npix = hp.nside2npix(nside)
    m = np.ones(npix)
    th, ph = hp.pix2ang(nside, np.arange(npix))
    m[(np.abs(th - 1.0) < 0.2) & (np.abs(ph - 1.0) < 0.2)] = 100.0
    grid, gth, gph, vals = mr.adaptive_healpix_mesh(m, base_nside=2)
    assert grid.npix < npix
    assert np.isclose(grid.pixareas().sum(), 4 * np.pi)
    # the bright region keeps full resolution
    bright = (np.abs(gth - 1.0) < 0.15) & (np.abs(gph - 1.0) < 0.15)
    assert grid.nsides[bright].max() == nside
    # downsampled map preserves area-weighted total flux
    mm = mr.multires_map(m, grid)
    flux_in = (m * hp.nside2pixarea(nside)).sum()
    flux_out = (mm * grid.pixareas()).sum()
    assert np.isclose(flux_in, flux_out, rtol=1e-12)


def test_nside_binning_and_dynamic():
    zen = np.linspace(0, 90, 192)
    ra = np.linspace(0, 360, 192)
    curve, bins = mr.nside_binning(zen, ra, min_nside=4, max_nside=16)
    assert set(np.unique(bins)).issubset({4, 8, 16})
    assert bins[0] == 16  # highest res at zenith

    th, ph, grid, total = mr.dynamic_pixelization(
        2, 8, target_nsides=np.full(48, 8))
    assert (grid.nsides == 8).all()
    assert np.isclose(grid.pixareas().sum(), 4 * np.pi)


def test_split_healpix_grid():
    nside = 8
    npix = hp.nside2npix(nside)
    th, ph = hp.pix2ang(nside, np.arange(npix))
    s, c1, c2, n = mr.split_healpix_grid(th, ph, nside)
    total = len(s) + len(c1) + len(c2) + len(n)
    assert total == npix
    assert set(s) | set(c1) | set(c2) | set(n) == set(range(npix))
