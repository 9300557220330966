#!/usr/bin/env python
"""
One-process A/B of the fused forward kernel across (v2|v3) x (fast|precise)
on the current backend, at the bench 'large' and 'hera-red'-like shapes.

TPU throughput fluctuates run-to-run (~±20%, CLAUDE.md); a single process
with high reps and interleaved repeats is the only reliable comparison.
The kernel version/precision globals are read at trace time; each timing
builds a fresh jit so the mode is baked correctly.

Usage: python scripts/ab_kernel.py [--reps K] [--rounds N] [--shape large|red]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_timer(fn, reps):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def step(carry, _):
            return fn(*a, seed=carry), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=reps)
        return out

    return loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--shape", default="large", choices=["large", "red"])
    ap.add_argument("--bwd", action="store_true",
                    help="also time fwd+bwd (vjp) per mode")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bayeslim_tpu.ops import rime_pallas as rp

    if args.shape == "large":
        nb, nf, ncut = 1830, 128, 6144
    else:  # hera-red-like
        nb, nf, ncut = 630, 1024, 6144
    freqs = np.linspace(100e6, 200e6, nf)
    rng = np.random.default_rng(0)
    psky = jnp.asarray(rng.uniform(0.1, 1, (nf, ncut)), jnp.float32)
    tau = jnp.asarray(rng.uniform(-1e-6, 1e-6, (nb, ncut)), jnp.float32)
    triples = nb * nf * ncut

    def fwd_only(ps, tu, seed=0.0):
        out = rp.rime_pallas_reduce(ps + seed, tu, freqs)
        return jnp.real(out[0, 0])

    def fwd_bwd(ps, tu, seed=0.0):
        def f(ps_, tu_):
            from bayeslim_tpu.ops.rime_kernel import rime_reduce
            out = rime_reduce(ps_[None], tu_, freqs, use_pallas=True)
            return jnp.sum(jnp.abs(out) ** 2)
        val, grads = jax.value_and_grad(f, argnums=(0, 1))(ps + seed, tu)
        # consume every gradient so XLA cannot DCE the backward kernels
        return val * 1e-20 + grads[0][0, 0] + grads[1][0, 0]

    modes = [("v2-fast", False, False), ("v2-precise", False, True),
             ("v3-fast", True, False), ("v3-precise", True, True)]
    timers = {}
    for name, v3, precise in modes:
        rp.FWD_V3[0] = v3
        rp.PRECISE_DOTS[0] = precise
        timers[name] = make_timer(fwd_only, args.reps)
        # compile + warm
        t0 = time.time()
        float(timers[name](psky, tau))
        print(f"compiled {name} in {time.time()-t0:.1f}s", flush=True)
        if args.bwd:
            timers[name + "+bwd"] = make_timer(fwd_bwd, args.reps)
            t0 = time.time()
            float(timers[name + "+bwd"](psky, tau))
            print(f"compiled {name}+bwd in {time.time()-t0:.1f}s",
                  flush=True)

    results = {k: [] for k in timers}
    for r in range(args.rounds):
        for k, loop in timers.items():
            t0 = time.time()
            float(loop(psky, tau))
            results[k].append((time.time() - t0) / args.reps)

    print(f"\nshape={args.shape}: nbl={nb} nf={nf} ncut={ncut} "
          f"triples/iter={triples/1e9:.2f}G reps={args.reps} "
          f"rounds={args.rounds}")
    for k, ts in results.items():
        best = min(ts)
        print(f"{k:16s} {best*1e3:8.2f} ms  {triples/best/1e9:7.1f}G "
              f"triples/s   (all: {['%.2f' % (t*1e3) for t in ts]})")


if __name__ == "__main__":
    main()
