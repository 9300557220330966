"""Generate the package's bundled demo data (bayeslim_tpu/data/bundled).

The reference ships demo artifacts under bayeslim/data (catalogue YAMLs,
downselected UVH5 observations, a true-gains calfits); this script
produces our standalone equivalents with THIS framework's own writers —
a point-source catalogue pair (write_catalogue), a simulated hex-7 UVH5
observation (setup_uvdata + run_rime_sim + write_uvh5) and a matching
gain calfits (write_calfits). Deterministic (seeded), so re-running
reproduces the bundle bit-for-bit.

Run from the repo root:  python scripts/gen_bundled_data.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)   # match the test env; the
# UVH5 stores complex64 so only output-storage rounding remains
import jax.numpy as jnp  # noqa: E402

import bayeslim_tpu as bl  # noqa: E402
from bayeslim_tpu.models.sky import (PointSky, PointSkyResponse,  # noqa: E402
                                     read_catalogue, write_catalogue)
from bayeslim_tpu.data.uvdata_interface import (  # noqa: E402
    run_rime_sim, setup_uvdata, write_calfits, write_uvh5)
from bayeslim_tpu.utils import AntposDict, make_hex  # noqa: E402

HERA_LOC = (21.428305555, -30.72152777, 1073.0)
JD0 = 2458168.3
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bayeslim_tpu", "data", "bundled")


def gen_catalogues(t0):
    os.makedirs(os.path.join(OUT, "configs"), exist_ok=True)
    rng = np.random.default_rng(2026)
    ra0 = float(bl.TelescopeModel(HERA_LOC).JD2RA(JD0))

    # powerlaw: 8 sources in the HERA stripe around the JD0 zenith RA
    n = 8
    params = np.zeros((1, 1, 2, n))
    params[0, 0, 0] = np.round(rng.uniform(1.0, 30.0, n), 3)        # Jy
    params[0, 0, 1] = np.round(rng.uniform(-1.0, -0.5, n), 3)       # alpha
    angs = np.stack([np.round((ra0 + rng.uniform(-25, 25, n)) % 360, 4),
                     np.round(HERA_LOC[1] + rng.uniform(-12, 12, n), 4)])
    fpl = os.path.join(OUT, "configs", "demo_powerlaw_cat.yaml")
    write_catalogue(fpl, params, angs,
                    names=[f"demo{i}" for i in range(n)],
                    freq_mode="powerlaw", f0=150e6, overwrite=True)

    # channel: 3 sources x 4 channels
    freqs = np.array([100e6, 110e6, 120e6, 130e6])
    ch = np.zeros((1, 1, 4, 3))
    base = np.round(rng.uniform(5, 20, 3), 3)
    ch[0, 0] = np.round(base * (freqs[:, None] / 150e6) ** -0.8, 3)
    angs_ch = np.stack([np.round((ra0 + rng.uniform(-20, 20, 3)) % 360, 4),
                        np.round(HERA_LOC[1] + rng.uniform(-10, 10, 3), 4)])
    fch = os.path.join(OUT, "configs", "demo_channel_cat.yaml")
    write_catalogue(fch, ch, angs_ch, names=[f"demo{i}" for i in range(3)],
                    freq_mode="channel", freqs=freqs, overwrite=True)
    return fpl


def gen_sim(catfile):
    ants, antvecs = make_hex(2, D=14.6)        # 7-antenna hex
    freqs = np.linspace(120e6, 128e6, 16)
    times = JD0 + np.arange(4) * 10.7374 / 86400.0

    tmpl = setup_uvdata(antnums=ants, antpos=antvecs,
                        telescope_location=HERA_LOC,
                        telescope_name="demo_hex7",
                        freq_array=freqs, time_array=times, pol="ee")
    params, angs, meta = read_catalogue(catfile)
    sky = PointSky(jnp.asarray(params), np.asarray(angs),
                   R=PointSkyResponse(freqs, freq_mode="powerlaw",
                                      f0=meta["f0"]))
    beam = bl.PixelBeam(jnp.ones((1, 1, 1, 1, 2)) * 12.0, freqs,
                        R=bl.beam_model.GaussResponse(), pol="e",
                        powerbeam=True, fov=160.0)
    vd = run_rime_sim(sky, beam, tmpl)
    vd.history = ("bayeslim_tpu demo: hex-7 point-source simulation "
                  "(scripts/gen_bundled_data.py)")
    fout = os.path.join(OUT, "demo_hex7_sim.uvh5")
    write_uvh5(vd, fout, overwrite=True)
    return ants, times, freqs


def gen_gains(ants, times, freqs):
    from bayeslim_tpu.data.containers import CalData
    rng = np.random.default_rng(7)
    na, nt, nf = len(ants), len(times), len(freqs)
    fr = (freqs - freqs[0]) / (freqs[-1] - freqs[0])
    g = np.zeros((2, 2, na, nt, nf), complex)
    for i in range(2):
        amp = 1.0 + 0.05 * rng.normal(size=(na, 1, 1)) \
            + 0.02 * np.sin(2 * np.pi * (2 + i) * fr)
        phs = (0.1 * rng.normal(size=(na, 1, 1))
               + 2 * np.pi * rng.normal(scale=5e-9, size=(na, 1, 1))
               * (freqs - freqs.mean()))
        g[i, i] = amp * np.exp(1j * phs)
    cd = CalData()
    cd.setup_meta(telescope=bl.TelescopeModel(HERA_LOC),
                  antpos=AntposDict(ants, make_hex(2, D=14.6)[1]))
    cd.setup_data(ants, times, freqs, pol=None, data=jnp.asarray(g),
                  history="bayeslim_tpu demo: smooth hex-7 gains")
    write_calfits(cd, os.path.join(OUT, "demo_hex7_gains.calfits"),
                  overwrite=True, telescope_name="demo_hex7")


if __name__ == "__main__":
    t0 = None
    catfile = gen_catalogues(t0)
    ants, times, freqs = gen_sim(catfile)
    gen_gains(ants, times, freqs)
    for root, _, files in os.walk(OUT):
        for f in sorted(files):
            p = os.path.join(root, f)
            print(f"{os.path.relpath(p, OUT):40s} {os.path.getsize(p):>9d} B")
