#!/usr/bin/env python
"""
Profile the RIME step on the current backend: forward kernel, backward
kernels, and the full posterior step, with the remote-fetch RPC overhead
amortized by chaining K iterations inside one jit (jax.block_until_ready
is a no-op on the axon remote backend; only value fetches synchronize).

Usage: python scripts/profile_rime.py [--size large|hera] [--cpu] [--reps K]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, reps=4, label=""):
    """Time a jitted scalar-returning fn by chaining reps inside jit."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def step(carry, _):
            out = fn(*a, seed=carry)
            return out, None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=reps)
        return out

    t0 = time.time()
    v = float(loop(*args))
    compile_and_first = time.time() - t0
    t0 = time.time()
    v = float(loop(*args))
    total = time.time() - t0
    per = total / reps * 1e3
    print(f"{label:34s} {per:9.2f} ms/iter  (total {total*1e3:.1f} ms "
          f"/ {reps} reps; first+compile {compile_and_first:.1f}s)")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="large")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--ntime", type=int, default=None)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.getcwd())
    import bench

    cfg = bench.build_case(args.size)
    if args.ntime:
        cfg["ntime"] = args.ntime

    # build the same case as bench.py
    import bayeslim_tpu as bl
    from bayeslim_tpu.utils import make_hex, AntposDict, healpix as hp
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse
    from bayeslim_tpu.inference import LogProb

    loc = (21.428305555, -30.72152777, 1073.0)
    T = bl.TelescopeModel(loc)
    ants, antvecs = make_hex(cfg["hexN"], D=15.0)
    freqs = np.linspace(100e6, 200e6, cfg["nfreq"])
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs)
    nside = cfg["nside"]
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    angs = np.stack([phi * 180 / np.pi, 90 - theta * 180 / np.pi])
    rng = np.random.default_rng(0)
    params = np.zeros((1, 1, 2, npix))
    params[0, 0, 0] = rng.uniform(1, 10, npix)
    params[0, 0, 1] = -2.5
    R = PixelSkyResponse(freqs, spatial_mode="pixel", freq_mode="powerlaw",
                         f0=float(freqs[0]))
    sky = PixelSky(jnp.asarray(params, dtype=bl._float()), angs,
                   hp.nside2pixarea(nside), R=R)
    beam = bl.PixelBeam(jnp.ones((1, 1, 1, 1, 2), dtype=bl._float()) * 14.0,
                        freqs, R=bl.beam_model.AiryResponse(), pol="e",
                        powerbeam=True, fov=180.0)
    bls = arr.get_bls(keep_autos=False)
    times = 2458168.3 + np.arange(cfg["ntime"]) * 5e-4
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs, pix_chunk=2048)

    nb = len(bls)
    nf = cfg["nfreq"]
    nt = cfg["ntime"]
    ncut = int(rime._pre[(0, 0)]["mask"].shape[-1])
    print(f"size={args.size}: nbls={nb} nfreqs={nf} ntimes={nt} "
          f"npix_cut={ncut} backend={jax.default_backend()}")

    # raw kernel inputs at this scale (one time step)
    psky = jnp.asarray(rng.uniform(0.1, 1, (nf, ncut)), jnp.float32)
    tau = jnp.asarray(rng.uniform(-1e-6, 1e-6, (nb, ncut)), jnp.float32)
    ftup = tuple(freqs.tolist())

    from bayeslim_tpu.ops import rime_pallas as rp
    use_pallas = not args.cpu and rp.pallas_available()

    if use_pallas:
        f0 = float(freqs[0])
        df = float(freqs[1] - freqs[0])
        nfp = rp._round_up(nf, 8)

        def fwd_only(ps, tu, seed=0.0):
            out = rp.rime_pallas_reduce(ps + seed, tu, freqs)
            return jnp.real(out[0, 0])
        timed(fwd_only, psky, tau, reps=args.reps,
              label="pallas fwd kernel (1 time)")

        def dtau_only(ps, tu, seed=0.0):
            ct = jnp.full((nfp, nb), 1.0 + 0.5j, jnp.complex64)
            ps_p = rp._stack_pad(ps + seed, nf, nfp)
            out = rp._dtau_pallas(ct, ps_p, tu.T, f0, df, nfp)
            return out[0, 0]
        timed(dtau_only, psky, tau, reps=args.reps,
              label="pallas dtau kernel (1 time)")

        def dpsky_only(ps, tu, seed=0.0):
            ct = jnp.full((nfp, nb), 1.0 + 0.5j, jnp.complex64)
            dre, _ = rp._fwd_pallas(ct + seed, tu, f0, df, nfp,
                                    out_imag=False)
            return dre[0, 0]
        timed(dpsky_only, psky, tau, reps=args.reps,
              label="pallas dpsky (role-swapped fwd)")

    def fwd_bwd(ps, tu, seed=0.0):
        def f(ps_, tu_):
            from bayeslim_tpu.ops.rime_kernel import rime_reduce
            out = rime_reduce(ps_[None], tu_, freqs,
                              use_pallas="auto" if use_pallas else False)
            return jnp.sum(jnp.abs(out) ** 2)
        val, grads = jax.value_and_grad(f, argnums=(0, 1))(ps + seed, tu)
        # consume every gradient so XLA cannot dead-code-eliminate the
        # backward kernels (a *0 here silently drops the dtau sweep!)
        return val * 1e-20 + grads[0][0, 0] + grads[1][0, 0]
    timed(fwd_bwd, psky, tau, reps=args.reps,
          label="kernel fwd+bwd via vjp (1 time)")

    # full model forward / step
    tgt_data = jax.jit(lambda m: m.forward().data)(rime)
    tgt = bl.VisData()
    tgt.setup_meta(T, arr.to_antpos())
    tgt.setup_data(bls, times, freqs, pol="ee", data=tgt_data,
                   cov=None, cov_axis=None, icov=None)
    prob = LogProb(rime, tgt)
    pd = prob.collect_main_params()

    fn = prob._batch_fn(0)
    data, icov = prob._batch_args(0)
    k0 = list(pd.keys())[0]

    def full_fwd(p, model, data, seed=0.0):
        p = dict(p)
        p[k0] = p[k0] + seed
        return jnp.real(fn(p, model, data, icov))
    timed(full_fwd, dict(pd), prob.model, data, reps=args.reps,
          label="full forward+like")

    def full_step(p, model, data, seed=0.0):
        p = dict(p)
        p[k0] = p[k0] + seed
        v, g = jax.value_and_grad(fn)(p, model, data, icov)
        # consume all grads (no *0: it would DCE backward kernels)
        extra = sum(jnp.real(jnp.ravel(gv)[0]) for gv in g.values())
        return jnp.real(v) + extra * 1e-20
    timed(full_step, dict(pd), prob.model, data, reps=args.reps,
          label="full value_and_grad")


if __name__ == "__main__":
    main()
