#!/usr/bin/env python
"""
Decompose the fused forward kernel's time into seed / rotate / dot /
residual (grid+memory) stages via the trace-time ablation hook
(rime_pallas._ABLATE). One process, chained reps, min-of-rounds — the
only reliable way to compare on the remote TPU (CLAUDE.md).

The ablated kernels are numerically WRONG by construction; only their
wall-clock matters.

Usage: python scripts/kernel_decompose.py [--shape large|red] [--precise]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--shape", default="large", choices=["large", "red"])
    ap.add_argument("--precise", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bayeslim_tpu.ops import rime_pallas as rp

    rp.PRECISE_DOTS[0] = args.precise

    if args.shape == "large":
        nb, nf, ncut = 1830, 128, 6144
    else:
        nb, nf, ncut = 630, 1024, 6144
    freqs = np.linspace(100e6, 200e6, nf)
    rng = np.random.default_rng(0)
    psky = jnp.asarray(rng.uniform(0.1, 1, (nf, ncut)), jnp.float32)
    tau = jnp.asarray(rng.uniform(-1e-6, 1e-6, (nb, ncut)), jnp.float32)
    triples = nb * nf * ncut

    def fwd_only(ps, tu, seed=0.0):
        out = rp.rime_pallas_reduce(ps + seed, tu, freqs)
        return jnp.real(out[0, 0])

    def make_timer(fn, reps):
        @jax.jit
        def loop(*a):
            def step(carry, _):
                return fn(*a, seed=carry), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=reps)
            return out
        return loop

    ablations = [
        ("full", frozenset()),
        ("-seed", frozenset({"seed"})),
        ("-rotate", frozenset({"rotate"})),
        ("-dot", frozenset({"dot"})),
        ("-seed-rotate", frozenset({"seed", "rotate"})),
        ("-seed-rot-dot", frozenset({"seed", "rotate", "dot"})),
        # round 5: 'stores' additionally elides the chain FILL stores
        # ('rotate' already removes the advance stores with the advance);
        # the (-rotate) vs (-rotate-stores) delta isolates the fill-store
        # VMEM bandwidth that round 4's 'residual' silently contained
        ("-rot-stores", frozenset({"rotate", "stores"})),
        ("-all-stores", frozenset({"seed", "rotate", "dot", "stores"})),
    ]
    timers = {}
    for name, ab in ablations:
        rp._ABLATE = ab
        timers[name] = make_timer(fwd_only, args.reps)
        t0 = time.time()
        float(timers[name](psky, tau))
        print(f"compiled {name} in {time.time()-t0:.1f}s", flush=True)
    rp._ABLATE = frozenset()

    results = {k: [] for k in timers}
    for _ in range(args.rounds):
        for k, loop in timers.items():
            t0 = time.time()
            float(loop(psky, tau))
            results[k].append((time.time() - t0) / args.reps)

    mode = "precise" if args.precise else "fast"
    print(f"\nshape={args.shape} mode={mode}: nbl={nb} nf={nf} ncut={ncut} "
          f"triples/iter={triples/1e9:.2f}G")
    base = min(results["full"])
    for k, ts in results.items():
        best = min(ts)
        print(f"{k:16s} {best*1e3:8.2f} ms  {triples/best/1e9:7.1f}G "
              f"triples/s  delta_vs_full={-(best-base)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
