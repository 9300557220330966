"""
Antenna/baseline bookkeeping and misc host-side index utilities.

Reference parity: bayeslim/utils.py AntposDict (utils.py:2280),
blnum2ants/ants2blnum (utils.py:2352,2416), _make_hex (utils.py:1943),
split_into_groups (utils.py:1976), flatten (utils.py:2038), white_noise
(utils.py:1626) and window tapers (utils.py:132-199).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "AntposDict", "blnum2ants", "ants2blnum", "make_hex", "split_into_groups",
    "flatten", "white_noise", "gauss_taper", "tukey_taper", "arr_hash",
]


def arr_hash(arr, pntr=False):
    """Cheap array identifier: hash of (first value, last value, length)
    (reference utils.py:1643-1680); pntr=True hashes by object id
    instead. Device arrays are converted once via np.asarray — never
    index a device array element-wise here (one RPC per element on
    remote backends)."""
    if pntr:
        return id(arr)
    h = getattr(arr, "_arr_hash", None)
    if h is not None:
        return h
    a = np.atleast_1d(np.asarray(arr))
    return hash((a.flat[0].item(), a.flat[-1].item(), a.shape[0]))


class AntposDict:
    """Dict-like antenna-position store with contiguous memory.

    Host-side container: `ants` is a list of integers; `antvecs` is an
    (Nants, 3) array of ENU positions [m]. The array may be a jnp array
    so antenna positions can be trainable parameters upstream.
    """

    def __init__(self, ants, antvecs):
        self.ants = [int(a) for a in ants]
        self._ant_idx = {a: i for i, a in enumerate(self.ants)}
        host = antvecs if isinstance(antvecs, np.ndarray) else None
        self.antvecs = jnp.asarray(antvecs)
        if host is not None:
            # remember the host copy: asnumpy() then never needs a
            # device->host fetch (the first fetch on a remote TPU backend
            # pays ~30 s of session warmup)
            self._np_cache = (self.antvecs, np.asarray(host, dtype=np.float64))

    def asnumpy(self):
        """Host float64 numpy view of antvecs (cached; at most one
        device->host fetch per distinct antvecs array)."""
        c = getattr(self, "_np_cache", None)
        if c is None or c[0] is not self.antvecs:
            c = (self.antvecs, np.asarray(self.antvecs, dtype=np.float64))
            self._np_cache = c
        return c[1]

    def keys(self):
        return iter(self.ants)

    def values(self):
        return iter(self.antvecs)

    def items(self):
        return zip(self.ants, self.antvecs)

    def __getitem__(self, key):
        if isinstance(key, (int, np.integer)):
            return self.antvecs[self._ant_idx[key]]
        idx = [self._ant_idx[int(k)] for k in key]
        return self.antvecs[jnp.asarray(idx)]

    def __len__(self):
        return len(self.ants)

    def __contains__(self, key):
        return int(key) in self._ant_idx

    def __iter__(self):
        return self.keys()

    def __repr__(self):
        return f"Antpos{{{self.ants}}}"

    def select(self, new_ants):
        return AntposDict(new_ants, self[new_ants])

    def index(self, ants):
        """Integer indices into antvecs for a list of antenna numbers."""
        return np.asarray([self._ant_idx[int(a)] for a in ants])


# register AntposDict as a pytree so it can live inside Modules
def _antpos_flatten(ap):
    return (ap.antvecs,), tuple(ap.ants)


def _antpos_unflatten(ants, children):
    obj = object.__new__(AntposDict)
    obj.ants = list(ants)
    obj._ant_idx = {a: i for i, a in enumerate(obj.ants)}
    obj.antvecs = children[0]
    return obj


jax.tree_util.register_pytree_node(AntposDict, _antpos_flatten, _antpos_unflatten)


def ants2blnum(antnums, separate=False, tensor=False):
    """Antenna-pair tuple(s) -> baseline integer(s): (1, 2) -> 101102.

    Reference parity: bayeslim/utils.py:2416. tensor returns a jnp
    array instead of numpy.
    """
    if tensor:
        import jax.numpy as jnp
        out = ants2blnum(antnums, separate=separate, tensor=False)
        return tuple(jnp.asarray(o) for o in out) \
            if isinstance(out, tuple) else jnp.asarray(out)
    if isinstance(antnums, tuple):
        a1, a2 = antnums[0] + 100, antnums[1] + 100
        return (a1, a2) if separate else int(a1 * 1000 + a2)
    if isinstance(antnums, list) and len(antnums) and isinstance(antnums[0], tuple):
        bl = np.asarray(antnums) + 100
        if separate:
            return bl[:, 0] * 1000, bl[:, 1]
        return bl[:, 0] * 1000 + bl[:, 1]
    return np.asarray(antnums)  # already blnums


def blnum2ants(blnum, separate=False):
    """Baseline integer(s) -> antenna-pair tuple(s): 102103 -> (2, 3).

    Reference parity: bayeslim/utils.py:2352.
    """
    if isinstance(blnum, tuple):
        return blnum
    if isinstance(blnum, list) and len(blnum) and isinstance(blnum[0], tuple):
        return list(zip(*blnum)) if separate else blnum
    if isinstance(blnum, (int, np.integer)):
        a1 = int(blnum // 1000)
        a2 = int(blnum - a1 * 1000)
        return (a1 - 100, a2 - 100)
    arr = np.asarray(blnum)
    a1 = (arr // 1000).astype(np.int64) - 100
    a2 = (arr % 1000).astype(np.int64) - 100
    if separate:
        return a1.tolist(), a2.tolist()
    return list(zip(a1.tolist(), a2.tolist()))


def make_hex(N, D=15.0):
    """Build a hexagonal antenna array (reference utils.py:1943 _make_hex).

    Parameters
    ----------
    N : int
        Number of antennas per side of the hex.
    D : float
        Antenna spacing [m].

    Returns
    -------
    ants : list of int, antvecs : np.ndarray (Nants, 3)
    """
    x, y, ants = [], [], []
    ant, k, start = 0, 0, 0.0
    for i in range(2 * N - 1):
        for j in range(N + k):
            x.append(j + start)
            y.append(i * np.sin(np.pi / 3))
            ants.append(ant)
            ant += 1
        if i < N - 1:
            k += 1
            start -= 0.5
        else:
            k -= 1
            start += 0.5
    x = np.asarray(x) - np.mean(x)
    y = np.asarray(y) - np.mean(y)
    antvecs = np.vstack([x, y, np.zeros_like(x)]).T * D
    return ants, antvecs


def split_into_groups(items, Nelem=None, Ngroup=None, interleave=False):
    """Split a list into groups of Nelem (or into Ngroup groups);
    interleave=True deals round-robin (items[i::Ngroup]) instead of
    contiguous chunks (reference utils.py:1976-2035)."""
    items = list(items)
    if interleave:
        if Ngroup is None:
            assert Nelem is not None
            Ngroup = int(np.ceil(len(items) / Nelem))
        return [items[i::Ngroup] for i in range(Ngroup)]
    if Nelem is None:
        assert Ngroup is not None
        Nelem = int(np.ceil(len(items) / Ngroup))
    return [items[i:i + Nelem] for i in range(0, len(items), Nelem)]


def flatten(nested, Nelem=None, max_depth=1):
    """Flatten a nested sequence one level (reference utils.py:2038-2064).

    Nelem keeps only the first Nelem elements of each sub-sequence.
    max_depth > 1 (or None = unbounded) recurses deeper — an extension;
    the reference is always one level. Non-sequence items pass through
    unchanged (the reference raises on them)."""
    s = slice(None) if Nelem is None else slice(0, Nelem)
    out = []
    for x in nested:
        if isinstance(x, (list, tuple, np.ndarray)) \
                or hasattr(x, "__next__"):
            items = list(x)[s] if hasattr(x, "__next__") else x[s]
            if max_depth is None or max_depth > 1:
                nd = None if max_depth is None else max_depth - 1
                out.extend(flatten(items, Nelem, nd))
            else:
                out.extend(items)
        else:
            out.append(x)
    return out


def white_noise(shape, key=None, dtype=None, complex=False):
    """Unit-variance (complex) white noise (reference utils.py:1626).

    For complex output, real and imag each have variance 1/2 so that
    the complex variance is unity.
    """
    from .dtypes import _float, _cfloat
    if key is None:
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    if complex:
        k1, k2 = jax.random.split(key)
        re = jax.random.normal(k1, shape, dtype or _float())
        im = jax.random.normal(k2, shape, dtype or _float())
        return (re + 1j * im) / np.sqrt(2)
    return jax.random.normal(key, shape, dtype or _float())


def gauss_taper(x, scale):
    """Gaussian edge taper exp(-0.5 (x/scale)^2) (reference utils.py:132-199)."""
    return jnp.exp(-0.5 * (jnp.asarray(x) / scale) ** 2)


def tukey_taper(N, alpha=0.5):
    """Tukey (tapered cosine) window of length N."""
    from scipy.signal import windows
    return jnp.asarray(windows.tukey(N, alpha))


class SimpleIndex:
    """Returns the same value for any __getitem__ (reference
    utils.py:1966-1975); used as a trivial ant->beam-model map."""

    def __init__(self, value=0):
        self.value = value

    def __getitem__(self, k):
        return self.value


def Jy_to_KStr(freqs):
    """Jy -> Kelvin-steradian conversion [K sr / Jy]
    (reference utils.py:1610-1625)."""
    c = 2.99792458e8
    k_B = 1.380649e-23
    return 1e-26 * (c / np.asarray(freqs, dtype=np.float64)) ** 2 / (2 * k_B)


def tensor2numpy(x, clone=True):
    """Array -> numpy (reference utils.py:1738 tensor2numpy). clone
    forces an owning copy (np.asarray of a jax array already copies;
    clone=True additionally copies numpy inputs)."""
    out = np.asarray(x)
    if clone and out is x:
        out = out.copy()
    return out


def device_memory_stats():
    """Per-device memory statistics (TPU-native analog of the reference's
    nvidia-smi parser, utils.py:2016 smi). Returns {device: stats dict}."""
    import jax
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = {}
    return out


def conjbl(bl):
    """Conjugate a blnum or antpair tuple (reference utils.py:2471)."""
    if isinstance(bl, tuple):
        return bl[::-1]
    if isinstance(bl, list) and len(bl) and isinstance(bl[0], tuple):
        return [conjbl(b) for b in bl]
    bl = np.asarray(bl)
    out = 1000 * (bl % 1000) + bl // 1000
    return out if out.ndim else int(out)


def colat2lat(theta, deg=True):
    """Colatitude <-> latitude (reference utils.py:110)."""
    return (90 - np.asarray(theta)) if deg else (np.pi / 2 - np.asarray(theta))


def inflate_bls(red_bls, bl2red, all_bls=None):
    """Inflate unique baselines to all physical baselines (reference
    utils.py:2066): returns (new_bls, red_inds)."""
    if all_bls is None:
        all_bls = list(bl2red.keys())
    red_indices = set(bl2red.get(bl, None) for bl in red_bls)
    new_bls, red_inds = [], []
    for bl in all_bls:
        ridx = bl2red.get(bl, -1)
        if ridx in red_indices:
            new_bls.append(bl)
            red_inds.append(ridx)
    return new_bls, red_inds


def fit_zero(x, y):
    """Fit a quadratic to (x, y) and return the root nearest x[0]
    (reference utils.py:1906)."""
    a, b, c = np.polyfit(np.asarray(x), np.asarray(y), 2)
    d = np.sqrt(b ** 2 - 4 * a * c)
    x1, x2 = (-b + d) / (2 * a), (-b - d) / (2 * a)
    return x1 if abs(x1 - x[0]) < abs(x2 - x[0]) else x2


def get_zeros(x, y):
    """Zero crossings of a sampled function via local quadratic fits
    (reference utils.py:1916)."""
    x, y = np.asarray(x), np.asarray(y)
    roots, prev = [], np.sign(y[0])
    for i in range(1, len(y)):
        curr = np.sign(y[i])
        if (curr != prev) and abs(y[i]) > 1e-40 and curr != 0.0 \
                and np.isfinite(prev):
            if prev == 0.0:
                prev = curr
                continue
            start = max(i - 3, 0)
            nn = np.argsort(np.abs(y)[start:i + 3])[:3] + start
            roots.append(fit_zero(x[nn], y[nn]))
            prev = curr
    return roots


def stripe_tukey_mask(theta, theta_min, theta_max, phi, phi_min, phi_max,
                      theta_alpha=0.5, phi_alpha=0.5):
    """Tukey apodization mask for a spherical stripe (reference
    utils.py:132): product of 1D tukey tapers in colatitude and
    azimuth, interpolated onto the sample points [rad]."""
    from scipy.signal import windows

    def axis_mask(vals, vmin, vmax, alpha):
        grid = np.linspace(vmin, vmax, 5000, endpoint=True)
        win = windows.tukey(5000, alpha=alpha)
        return np.interp(np.asarray(vals), grid, win, left=0.0, right=0.0)

    return (axis_mask(theta, theta_min, theta_max, theta_alpha)
            * axis_mask(phi, phi_min, phi_max, phi_alpha))


def half_gaussian_taper(x, xcenter, sigma, below=True):
    """Single-sided Gaussian taper (reference utils.py:169)."""
    x = jnp.asarray(x)
    g = jnp.exp(-0.5 * (x - xcenter) ** 2 / sigma ** 2)
    sel = (x < xcenter) if below else (x > xcenter)
    return jnp.where(sel, g, jnp.ones_like(x))


def voigt_beam(nside, sigma, gamma):
    """Voigt-profile power beam on a HEALPix grid (reference
    utils.py:282): returns (beam, theta, phi) [rad]."""
    from scipy.special import voigt_profile
    from . import healpix as hp
    theta, phi = hp.pix2ang(nside, np.arange(hp.nside2npix(nside)))
    beam = voigt_profile(theta, sigma, gamma)
    return beam / beam.max(), theta, phi


def freq_interp(params, param_freqs, freqs, kind, axis,
                fill_value="extrapolate"):
    """Interpolate a params array onto a new frequency basis (reference
    utils.freq_interp, utils.py:902-947; its matched-frequency fast
    path contains a typo'd statement `index[axis] - indices` and is
    unreachable without error — only the scipy interp1d path is
    reproduced)."""
    from scipy.interpolate import interp1d
    p = np.asarray(params)
    f = interp1d(np.asarray(param_freqs), p, kind=kind, axis=axis,
                 fill_value=fill_value, bounds_error=False)
    out = f(np.asarray(freqs))
    if isinstance(params, jnp.ndarray):
        return jnp.asarray(out, dtype=params.dtype)
    return out
