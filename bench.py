#!/usr/bin/env python
"""
Benchmark: RIME forward+gradient step throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- metric: RIME visibility points/sec/chip (Nbls * Nfreqs * Ntimes / step
  wall-clock) for a full forward+gradient posterior step (the BASELINE.md
  driver metric).
- vs_baseline: ratio against an in-process re-implementation of the
  reference's PyTorch inner loop (bayeslim/rime_model.py:423-429 pattern:
  materialize fringe, multiply beam-weighted sky, reduce over pixels;
  forward+backward) measured on this host's CPU torch on the same config
  (pixel-count subsampled and linearly extrapolated). The reference
  package itself cannot run here (astropy/healpy absent).

Usage: python bench.py [--cpu] [--size small|medium|large] [--x64]
"""
import argparse
import json
import sys
import time

import numpy as np


def build_case(size):
    cfg = {
        "small": dict(hexN=3, nside=16, nfreq=32, ntime=1),
        "medium": dict(hexN=4, nside=32, nfreq=64, ntime=2),
        "large": dict(hexN=5, nside=32, nfreq=128, ntime=2),
        # the BASELINE.md north-star scale: 331 ants (hex N=11),
        # 1024 freqs, multi-time
        "hera": dict(hexN=11, nside=32, nfreq=1024, ntime=2),
    }[size]
    return cfg


def run_jax(cfg, platform=None, x64=False):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    if x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import bayeslim_tpu as bl
    from bayeslim_tpu.utils import make_hex, AntposDict, healpix as hp
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse
    from bayeslim_tpu.inference import LogProb

    loc = (21.428305555, -30.72152777, 1073.0)
    T = bl.TelescopeModel(loc)
    ants, antvecs = make_hex(cfg["hexN"], D=15.0)
    freqs = np.linspace(100e6, 200e6, cfg["nfreq"])
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs)
    jd0 = 2458168.3

    nside = cfg["nside"]
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    angs = np.stack([phi * 180 / np.pi, 90 - theta * 180 / np.pi])
    rng = np.random.default_rng(0)
    # powerlaw diffuse sky: amp + spectral index per pixel
    params = np.zeros((1, 1, 2, npix), dtype=np.float64)
    params[0, 0, 0] = rng.uniform(1, 10, npix)
    params[0, 0, 1] = -2.5
    R = PixelSkyResponse(freqs, spatial_mode="pixel", freq_mode="powerlaw",
                         f0=float(freqs[0]))
    sky = PixelSky(jnp.asarray(params, dtype=bl._float()), jnp.asarray(angs),
                   hp.nside2pixarea(nside), R=R)

    beam = bl.PixelBeam(jnp.ones((1, 1, 1, 1, 2), dtype=bl._float()) * 14.0,
                        freqs, R=bl.beam_model.AiryResponse(), pol="e",
                        powerbeam=True, fov=180.0)
    bls = arr.get_bls(keep_autos=False)
    times = jd0 + np.arange(cfg["ntime"]) * 5e-4
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs, pix_chunk=2048)
    npix_cut = int(rime._pre[(0, 0)]["mask"].shape[-1])

    # build target via a jitted forward (op-by-op dispatch is slow on the
    # remote TPU backend)
    tgt_data = jax.jit(lambda m: m.forward().data)(rime)
    tgt = bl.VisData()
    tgt.setup_meta(T, arr.to_antpos())
    tgt.setup_data(bls, times, freqs, pol="ee", data=tgt_data,
                   cov=None, cov_axis=None, icov=None)
    prob = LogProb(rime, tgt)
    pd = prob.collect_main_params()

    # warmup (compile). NOTE: jax.block_until_ready is a no-op on the
    # axon remote backend (execution completes only on a value fetch), so
    # every rep fetches the scalar loss to force real execution.
    t0 = time.time()
    v, g = prob.value_and_grad(pd)
    _ = float(v)
    compile_time = time.time() - t0

    # timed steps (each fetch costs one ~30 ms RPC round trip, included)
    nrep = 3
    t0 = time.time()
    for _ in range(nrep):
        v, g = prob.value_and_grad(pd)
        _ = float(v)
    dt = (time.time() - t0) / nrep

    points = len(bls) * cfg["nfreq"] * cfg["ntime"]
    return dict(step_time=dt, compile_time=compile_time, points=points,
                nbls=len(bls), npix_cut=npix_cut,
                pps=points / dt)


def run_torch_baseline(cfg, npix_cut, sub_pix=512):
    """Reference-pattern inner loop in torch (CPU), pixel-subsampled."""
    import torch
    torch.set_default_dtype(torch.float32)
    nbl = None
    # hex count
    n = cfg["hexN"]
    nant = sum(n + k for k in list(range(n)) + list(range(n - 2, -1, -1)))
    nbl = nant * (nant - 1) // 2
    nf = cfg["nfreq"]
    nt = cfg["ntime"]
    npix = min(sub_pix, npix_cut)

    rng = np.random.default_rng(0)
    freqs = torch.tensor(np.linspace(100e6, 200e6, nf), dtype=torch.float32)
    blvecs = torch.tensor(rng.uniform(-300, 300, (nbl, 3)), dtype=torch.float32)
    s = torch.tensor(rng.normal(size=(3, npix)), dtype=torch.float32)
    s = s / s.norm(dim=0, keepdim=True)
    amp = torch.tensor(rng.uniform(1, 10, npix), dtype=torch.float32,
                       requires_grad=True)
    beam = torch.tensor(rng.uniform(0, 1, (nf, npix)), dtype=torch.float32)
    data = torch.randn(nbl, nt, nf, dtype=torch.complex64)

    def step():
        vis = []
        for t in range(nt):
            psky = beam * amp  # (nf, npix)
            const = freqs[:, None] * (2j * np.pi / 2.99792458e8)
            fringe = ((blvecs @ s)[:, None, :] * const).exp()  # (nbl, nf, npix)
            vis.append(torch.sum(fringe * psky, dim=-1))
        vis = torch.stack(vis, dim=1)
        loss = torch.sum(torch.abs(vis - data) ** 2)
        loss.backward()
        amp.grad = None
        return loss

    t0 = time.time()
    nrep = 1
    for _ in range(nrep):
        step()
    dt = (time.time() - t0) / nrep
    # extrapolate to the full pixel count
    dt_full = dt * (npix_cut / npix)
    points = nbl * nf * nt
    return dict(step_time=dt_full, points=points, pps=points / dt_full)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--size", default="large",
                    choices=["small", "medium", "large", "hera"])
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--no-baseline", action="store_true")
    args = ap.parse_args()

    cfg = build_case(args.size)
    res = run_jax(cfg, platform="cpu" if args.cpu else None, x64=args.x64)

    vs = 0.0
    if not args.no_baseline:
        try:
            base = run_torch_baseline(cfg, res["npix_cut"],
                                      sub_pix=256 if args.size == "large" else 512)
            vs = res["pps"] / base["pps"]
        except Exception as e:
            print(f"# torch baseline failed: {e}", file=sys.stderr)

    out = {
        "metric": "RIME vis points/sec/chip (bl*freq*time, fwd+grad step)",
        "value": round(res["pps"], 2),
        "unit": "points/s",
        "vs_baseline": round(vs, 3),
    }
    print(json.dumps(out))
    print(f"# size={args.size} nbls={res['nbls']} npix_cut={res['npix_cut']} "
          f"step={res['step_time']*1e3:.1f}ms compile={res['compile_time']:.1f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
