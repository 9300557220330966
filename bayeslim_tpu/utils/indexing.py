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
    "flatten", "white_noise", "gauss_taper", "tukey_taper",
]


class AntposDict:
    """Dict-like antenna-position store with contiguous memory.

    Host-side container: `ants` is a list of integers; `antvecs` is an
    (Nants, 3) array of ENU positions [m]. The array may be a jnp array
    so antenna positions can be trainable parameters upstream.
    """

    def __init__(self, ants, antvecs):
        self.ants = [int(a) for a in ants]
        self._ant_idx = {a: i for i, a in enumerate(self.ants)}
        self.antvecs = jnp.asarray(antvecs)

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


def ants2blnum(antnums, separate=False):
    """Antenna-pair tuple(s) -> baseline integer(s): (1, 2) -> 101102.

    Reference parity: bayeslim/utils.py:2416.
    """
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


def split_into_groups(items, Nelem=None, Ngroup=None):
    """Split a list into groups of Nelem (or into Ngroup groups).

    Reference parity: bayeslim/utils.py:1976.
    """
    items = list(items)
    if Nelem is None:
        assert Ngroup is not None
        Nelem = int(np.ceil(len(items) / Ngroup))
    return [items[i:i + Nelem] for i in range(0, len(items), Nelem)]


def flatten(nested, max_depth=None):
    """Flatten nested lists/tuples/generators one level at a time.

    Reference parity: bayeslim/utils.py:2038.
    """
    out = []
    for x in nested:
        if isinstance(x, (list, tuple)) or hasattr(x, "__next__"):
            if max_depth is None or max_depth > 0:
                nd = None if max_depth is None else max_depth - 1
                out.extend(flatten(x, nd))
            else:
                out.append(x)
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


def tensor2numpy(x):
    """Array -> numpy (reference utils.py:1738 tensor2numpy)."""
    return np.asarray(x)


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
