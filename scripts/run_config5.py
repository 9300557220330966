#!/usr/bin/env python
"""
Graded config #5 driver: HERA-scale RIME forward+gradient, delay
filtering, and dirty-map imaging through one sharded pipeline
(BASELINE.md config list item 5).

Usage:
  python scripts/run_config5.py                       # real TPU, small
  python scripts/run_config5.py --hexN 11 --nfreq 1024 --ntime 10
  python scripts/run_config5.py --cpu --mesh data=4,model=2   # 8-CPU mesh

The integration test (tests/test_config5.py) runs the same pipeline on
the virtual 8-device CPU mesh with sharded-vs-single gradient parity.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hexN", type=int, default=4)
    ap.add_argument("--nside", type=int, default=32)
    ap.add_argument("--nfreq", type=int, default=128)
    ap.add_argument("--ntime", type=int, default=4)
    ap.add_argument("--mesh", default=None,
                    help="e.g. data=4,model=2 (default: all devices on 'data')")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bayeslim_tpu as bl
    from bayeslim_tpu.utils import make_hex, AntposDict, healpix as hp
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse
    from bayeslim_tpu.models.filt import GPFilter, sinc_cov
    from bayeslim_tpu.models.imaging import VisMapper
    from bayeslim_tpu.inference import LogProb
    from bayeslim_tpu.parallel import make_mesh, ShardedLogProb

    loc = (21.428305555, -30.72152777, 1073.0)
    T = bl.TelescopeModel(loc)
    ants, antvecs = make_hex(args.hexN, D=15.0)
    freqs = np.linspace(100e6, 200e6, args.nfreq)
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs)
    npix = hp.nside2npix(args.nside)
    theta, phi = hp.pix2ang(args.nside, np.arange(npix))
    angs = np.stack([phi * 180 / np.pi, 90 - theta * 180 / np.pi])
    rng = np.random.default_rng(0)
    params = np.zeros((1, 1, 2, npix))
    params[0, 0, 0] = rng.uniform(1, 10, npix)
    params[0, 0, 1] = -2.5
    R = PixelSkyResponse(freqs, spatial_mode="pixel", freq_mode="powerlaw",
                         f0=float(freqs[0]))
    sky = PixelSky(jnp.asarray(params, dtype=bl._float()),
                   angs, hp.nside2pixarea(args.nside), R=R)
    beam = bl.PixelBeam(jnp.ones((1, 1, 1, 1, 2), dtype=bl._float()) * 14.0,
                        freqs, R=bl.beam_model.AiryResponse(), pol="e",
                        powerbeam=True, fov=180.0)
    bls = arr.get_bls(keep_autos=False)
    if args.mesh and "model" in args.mesh:
        nmod = int(dict(kv.split("=")
                        for kv in args.mesh.split(","))["model"])
        bls = bls[:len(bls) // nmod * nmod]  # bl shards must divide
    times = 2458168.3 + np.arange(args.ntime) * 5e-4
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs, time_mode="vmap")
    print(f"config5: {len(ants)} ants / {len(bls)} bls / {args.nfreq} freqs "
          f"/ {args.ntime} times / nside {args.nside} "
          f"({int(rime._pre[(0, 0)]['mask'].shape[-1])} cut pix) on "
          f"{len(jax.devices())} {jax.default_backend()} device(s)")

    # 1. simulate
    t0 = time.time()
    data = jax.jit(lambda m: m.forward().data)(rime)
    vd = bl.VisData()
    vd.setup_meta(T, arr.to_antpos())
    vd.setup_data(bls, times, freqs, pol="ee", data=data)
    print(f"forward simulation: {time.time() - t0:.1f}s "
          f"(|V| mean {float(jnp.abs(data).mean()):.3e})")

    # 2. sharded posterior gradient
    tgt = vd.copy()
    tgt.setup_data(bls, times, freqs, pol="ee", data=data)
    prob = LogProb(rime, tgt)
    if args.mesh:
        spec = dict(kv.split("=") for kv in args.mesh.split(","))
        mesh = make_mesh({k: int(v) for k, v in spec.items()})
        taxis = "data" if "data" in spec else list(spec)[0]
        baxis = "model" if "model" in spec else None
    else:
        mesh = make_mesh({"data": len(jax.devices())})
        taxis, baxis = "data", None
    sprob = ShardedLogProb(prob, mesh, time_axis=taxis, bl_axis=baxis)
    pd = sprob.collect_main_params()
    # perturb the sky so the posterior gradient is non-trivial
    pd["sky.params"] = pd["sky.params"] * 1.05
    t0 = time.time()
    v, g = sprob.value_and_grad(pd)
    gn = float(jnp.linalg.norm(g["sky.params"]))
    print(f"sharded fwd+grad step: {time.time() - t0:.1f}s "
          f"(loss {float(v):.4e}, |grad| {gn:.3e}, mesh "
          f"{dict(zip(mesh.axis_names, mesh.devices.shape))})")

    # 3. delay filter (Wiener, removes smooth spectra)
    x = (freqs - freqs[0]) / (freqs[-1] - freqs[0])
    filt = GPFilter(sinc_cov(x, ls=0.5),
                    jnp.eye(len(freqs)) * 1e-2, dim=-1, residual=True)
    t0 = time.time()
    vd_f = filt.forward(vd)
    supp = float(jnp.sum(jnp.abs(vd_f.data) ** 2)
                 / jnp.sum(jnp.abs(vd.data) ** 2))
    print(f"delay filter: {time.time() - t0:.1f}s "
          f"(residual power fraction {supp:.3e})")

    # 4. imaging
    t0 = time.time()
    mapper = VisMapper(vd, angs[0], angs[1])
    maps, P = mapper.make_map(return_P=True)
    print(f"dirty-map imaging: {time.time() - t0:.1f}s "
          f"(map rms {float(jnp.std(maps)):.3e}, "
          f"{maps.shape[0]} freqs x {maps.shape[1]} pix)")
    print("config5 pipeline OK")


if __name__ == "__main__":
    main()
