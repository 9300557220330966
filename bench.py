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

Timing methodology (axon remote TPU): jax.block_until_ready is a no-op on
this backend and a fetch costs a ~34 ms RPC, so K optimizer steps are
CHAINED inside one jit (adam update feeds step i's gradients into step
i+1's parameters -- nothing can be dead-code-eliminated) and the single
end-of-loop scalar fetch is subtracted via a measured fetch floor.

Usage: python bench.py [--cpu] [--size small|medium|large|hera|hera100]
                       [--ntime N] [--x64]
"""
import argparse
import json
import sys
import time

import numpy as np


def build_case(size):
    cfgs = {
        "small": dict(hexN=3, nside=16, nfreq=32, ntime=1, reps=8),
        "medium": dict(hexN=4, nside=32, nfreq=64, ntime=2, reps=8),
        "large": dict(hexN=5, nside=32, nfreq=128, ntime=2, reps=8),
        # 331 ants (hex N=11), 1024 freqs: the BASELINE.md array scale
        "hera": dict(hexN=11, nside=32, nfreq=1024, ntime=2, reps=2),
        # the full BASELINE.md north star: 331 ants, 1024 freqs,
        # 100 times, nside-64 sky. The 100-time visibility cube (45 GB)
        # exceeds one chip's HBM, so the step runs as 20 accumulate
        # minibatches of 5 times through RIME's indexed batching (one
        # compiled executable for all batches). Takes ~15 min on v5e-1.
        "hera100": dict(hexN=11, nside=64, nfreq=1024, ntime=100, reps=1,
                        tbatch=5, skip_fwd_split=True),
    }
    # "-red" variants: simulate only unique redundant baselines and
    # expand to the full set via RIME's sim->data index (the reference's
    # own sim_bls feature, rime_model.py:148-226) — the production
    # configuration for a redundant array like HERA. Output data and
    # gradients are identical to the full simulation.
    # "-stat" variants additionally solve against the redundant-group
    # SUFFICIENT STATISTICS (VisData.reduce_by_redundancy: icov-weighted
    # group means with summed weights): the per-baseline cube is never
    # materialized, yet posterior gradients are identical and chi^2
    # exact up to a data constant. hera100-stat then fits in one
    # executable (no time minibatching).
    if size.endswith("-stat"):
        base, red, stat = size[:-5], True, True
    elif size.endswith("-red"):
        base, red, stat = size[:-4], True, False
    else:
        base, red, stat = size, False, False
    cfg = dict(cfgs[base])
    cfg["redundant"] = red
    cfg["stat"] = stat
    if stat:
        cfg.pop("tbatch", None)   # whole time axis in one executable
        cfg["reps"] = 2
    return cfg


def _fetch_floor():
    """Measured cost of one scalar fetch RPC on this backend."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.float32(1.0)
    float(f(x))
    t0 = time.time()
    n = 5
    for _ in range(n):
        x = f(x)
        float(x)
    return (time.time() - t0) / n


def run_jax(cfg, platform=None, x64=False):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    if x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import optax
    import bayeslim_tpu as bl
    from bayeslim_tpu.utils import make_hex, AntposDict, healpix as hp
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse
    from bayeslim_tpu.inference import LogProb

    loc = (21.428305555, -30.72152777, 1073.0)
    T = bl.TelescopeModel(loc)
    ants, antvecs = make_hex(cfg["hexN"], D=15.0)
    freqs = np.linspace(100e6, 200e6, cfg["nfreq"])
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs,
                        redtol=0.5, skip_reds=not cfg.get("redundant"))
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
    if cfg.get("redundant"):
        red_groups = [r for r in arr.reds if r[0][0] != r[0][1]]
        sim_bls = [r[0] for r in red_groups]
        data_bls = None if cfg.get("stat") else bls
    else:
        sim_bls, data_bls = bls, None
    times = jd0 + np.arange(cfg["ntime"]) * 5e-4
    tb = cfg.get("tbatch")
    if tb:
        assert cfg["ntime"] % tb == 0
        tgroups = [times[i * tb:(i + 1) * tb]
                   for i in range(cfg["ntime"] // tb)]
        rime = bl.RIME(sky, T, beam, arr, sim_bls, tgroups, freqs,
                       data_bls=data_bls, pix_chunk=2048)
        rime.enable_indexed_batching()
    else:
        rime = bl.RIME(sky, T, beam, arr, sim_bls, times, freqs,
                       data_bls=data_bls, pix_chunk=2048)
    npix_cut = int(rime._pre[(0, 0)]["mask"].shape[-1])
    cfg["nbls_sim"] = len(sim_bls)

    if tb:
        return _run_batched(cfg, rime, T, arr, bls, tgroups, freqs,
                            npix_cut)

    # build target via a jitted forward (op-by-op dispatch is slow on the
    # remote TPU backend)
    tgt_data = jax.jit(lambda m: m.forward().data)(rime)
    tgt = bl.VisData()
    tgt.setup_meta(T, arr.to_antpos())
    if cfg.get("stat"):
        # sufficient-statistics likelihood: target is the redundant-group
        # means with icov = group baseline counts (exact gradients for
        # the full per-baseline posterior; see
        # VisData.reduce_by_redundancy)
        counts = np.asarray([len(r) for r in red_groups], dtype=np.float32)
        icov = jnp.broadcast_to(
            jnp.asarray(counts)[None, None, :, None, None], tgt_data.shape)
        tgt.setup_data(sim_bls, times, freqs, pol="ee", data=tgt_data,
                       cov=None, cov_axis=None, icov=icov)
    else:
        tgt.setup_data(bls, times, freqs, pol="ee", data=tgt_data,
                       cov=None, cov_axis=None, icov=None)
    prob = LogProb(rime, tgt)
    pd = dict(prob.collect_main_params())
    fn = prob._batch_fn(0)
    _, icov = prob._batch_args(0)

    opt = optax.adam(1e-3)
    reps = cfg.get("reps", 8)

    @jax.jit
    def train(pd, model, data):
        state = opt.init(pd)

        def body(carry, _):
            p, s = carry
            v, g = jax.value_and_grad(fn)(p, model, data, icov)
            up, s = opt.update(g, s, p)
            p = optax.apply_updates(p, up)
            return (p, s), v

        (p, _), vs = jax.lax.scan(body, (pd, state), None, length=reps)
        return vs[-1], p

    @jax.jit
    def fwd_loop(pd, model, data):
        def body(p0, _):
            v = fn({k: v + p0 * 0 for k, v in pd.items()}, model, data, icov)
            return jnp.real(v), None
        out, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None,
                              length=reps)
        return out

    fetch = _fetch_floor()

    # compile + first run
    t0 = time.time()
    v, _ = train(pd, prob.model, tgt_data)
    _ = float(v)
    compile_time = time.time() - t0

    t0 = time.time()
    v, _ = train(pd, prob.model, tgt_data)
    _ = float(v)
    dt = max(time.time() - t0 - fetch, 1e-9) / reps

    if cfg.get("skip_fwd_split"):
        dt_fwd = float("nan")
    else:
        float(fwd_loop(pd, prob.model, tgt_data))
        t0 = time.time()
        float(fwd_loop(pd, prob.model, tgt_data))
        dt_fwd = max(time.time() - t0 - fetch, 1e-9) / reps

    points = len(bls) * cfg["nfreq"] * cfg["ntime"]
    return dict(step_time=dt, fwd_time=dt_fwd, bwd_time=dt - dt_fwd,
                compile_time=compile_time, fetch=fetch, points=points,
                nbls=len(bls), npix_cut=npix_cut, pps=points / dt)


def _run_batched(cfg, rime, T, arr, bls, tgroups, freqs, npix_cut):
    """Full accumulate sweep over time minibatches (indexed batching:
    one executable for all batches). Target is a zeros VisData shared by
    every batch (benchmark loss = |V|^2; values are irrelevant to the
    timing, and a real target would not fit in HBM at this scale)."""
    import time as _time
    import jax
    import jax.numpy as jnp
    import bayeslim_tpu as bl
    from bayeslim_tpu.inference import LogProb

    tgt = bl.VisData()
    tgt.setup_meta(T, arr.to_antpos())
    nb, nt, nf = len(bls), len(tgroups[0]), cfg["nfreq"]
    # complex64 host->device transfers fail on the axon backend: build
    # the zeros target on device via lax.complex
    z = jax.jit(lambda: jax.lax.complex(
        jnp.zeros((1, 1, nb, nt, nf), jnp.float32),
        jnp.zeros((1, 1, nb, nt, nf), jnp.float32)))()
    tgt.setup_data(bls, tgroups[0], freqs, pol="ee", data=z)
    prob = LogProb(rime, [tgt])
    pd = prob.collect_main_params()

    def sweep():
        v, g = prob.value_and_grad(pd)
        # fetch loss AND one grad element: on the remote backend only
        # value fetches synchronize, and the loss alone would let the
        # final batch's backward run past the timer
        _ = float(jnp.real(v))
        for k in g:
            _ = float(np.asarray(jnp.ravel(g[k])[0]))
        return v

    t0 = _time.time()
    sweep()
    compile_time = _time.time() - t0
    t0 = _time.time()
    sweep()
    dt = _time.time() - t0

    points = nb * cfg["nfreq"] * cfg["ntime"]
    return dict(step_time=dt, fwd_time=float("nan"), bwd_time=float("nan"),
                compile_time=compile_time, fetch=0.0, points=points,
                nbls=nb, npix_cut=npix_cut, pps=points / dt)


def run_torch_baseline(cfg, npix_cut, sub_pix=512, sub_bl=1024):
    """Reference-pattern inner loop in torch (CPU), pixel- and
    baseline-subsampled then linearly extrapolated (the fringe tensor is
    O(Nbl*Nf*Npix) and cannot be materialized at full scale -- which is
    itself the reference's scaling limit)."""
    import torch
    torch.set_default_dtype(torch.float32)
    # hex count
    n = cfg["hexN"]
    nant = sum(n + k for k in list(range(n)) + list(range(n - 2, -1, -1)))
    nbl_data = nant * (nant - 1) // 2
    # redundant configs simulate only the unique baselines (the reference
    # would too, via sim_bls) and expand: extrapolate the fringe cost to
    # the SIMULATED count, while points counts the full data delivered
    nbl_full = cfg.get("nbls_sim", nbl_data)
    nbl = min(sub_bl, nbl_full)
    nf = cfg["nfreq"]
    nt = min(cfg["ntime"], 2)
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
    # extrapolate to the full pixel/baseline/time counts
    dt_full = dt * (npix_cut / npix) * (nbl_full / nbl) * (cfg["ntime"] / nt)
    points = nbl_data * nf * cfg["ntime"]
    return dict(step_time=dt_full, points=points, pps=points / dt_full)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--size", default="large",
                    choices=["small", "medium", "large", "hera", "hera100",
                             "small-red", "medium-red", "large-red",
                             "hera-red", "hera100-red",
                             "hera-stat", "hera100-stat"])
    ap.add_argument("--ntime", type=int, default=None)
    ap.add_argument("--tbatch", type=int, default=None,
                    help="override time-minibatch size for batched sizes")
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--no-baseline", action="store_true")
    args = ap.parse_args()

    cfg = build_case(args.size)
    if args.ntime:
        cfg["ntime"] = args.ntime
    if args.tbatch:
        assert not cfg.get("stat"), \
            "-stat sizes run the whole time axis in one executable"
        cfg["tbatch"] = args.tbatch
    res = run_jax(cfg, platform="cpu" if args.cpu else None, x64=args.x64)

    vs = 0.0
    if not args.no_baseline:
        try:
            base = run_torch_baseline(cfg, res["npix_cut"],
                                      sub_pix=256 if cfg["nfreq"] >= 128 else 512)
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
    print(f"# size={args.size} nbls={res['nbls']} "
          f"nbls_sim={cfg.get('nbls_sim', res['nbls'])} nfreqs={cfg['nfreq']} "
          f"ntimes={cfg['ntime']} npix_cut={res['npix_cut']} "
          f"step={res['step_time']*1e3:.1f}ms "
          f"(fwd={res['fwd_time']*1e3:.1f}ms bwd={res['bwd_time']*1e3:.1f}ms) "
          f"fetch_floor={res['fetch']*1e3:.1f}ms "
          f"compile={res['compile_time']:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
