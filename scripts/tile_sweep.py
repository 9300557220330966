#!/usr/bin/env python
"""Sweep forward-kernel tile choices at a given shape on the real TPU.

Measures G triples/s for the fused forward kernel alone (K reps chained
in one jit via lax.scan carrying a scalar so nothing is DCE'd; one
scalar fetch at the end). Usage:

  python scripts/tile_sweep.py [--nbl 1830] [--nfp 128] [--npx 6144]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nbl", type=int, default=1830)
    ap.add_argument("--nfp", type=int, default=128)
    ap.add_argument("--npx", type=int, default=6144)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--tiles", default=None,
                    help="semicolon list G,tb,tc,tf; default sweep")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bayeslim_tpu.ops import rime_pallas as rp

    nbl, nfp, npx = args.nbl, args.nfp, args.npx
    R = nfp
    rng = np.random.default_rng(0)
    ps = rng.normal(size=(R, npx)).astype(np.float32)
    tauT = rng.uniform(-1e-6, 1e-6, (npx, nbl)).astype(np.float32)

    if args.tiles:
        tiles = [tuple(int(x) for x in t.split(","))
                 for t in args.tiles.split(";")]
    else:
        tiles = [
            (8, 256, 512, 128),   # round-2 pick for this shape
            (8, 128, 512, 128),
            (8, 256, 256, 128),
            (8, 128, 256, 128),
            (8, 512, 256, 128),
            (8, 128, 1024, 128),
            (8, 256, 1024, 128),
            (16, 256, 256, 128),
            (16, 128, 512, 128),
            (8, 256, 512, 64),
            (8, 384, 512, 128),
            (8, 640, 512, 128),
        ]

    print(f"# shape: R={R} nbl={nbl} npx={npx} "
          f"(true triples/time = {nbl*nfp*npx/1e9:.2f}G)", file=sys.stderr)
    orig = rp._pick_fwd_tiles
    results = []
    for (G, tb, tc, tf) in tiles:
        if R % tf or tf % G:
            print(f"G={G} tb={tb} tc={tc} tf={tf}: skip (tf)", file=sys.stderr)
            continue
        rp._pick_fwd_tiles = lambda *a, **k: (G, tb, tc, tf)
        try:
            def once(x, _):
                re, im = rp._fwd_pallas(ps + x * 0, tauT, 1.0e8,
                                        0.78125e6, nfp)
                return x + re[0, 0] + im[0, 0], None

            @jax.jit
            def run(x):
                out, _ = jax.lax.scan(once, x, None, length=args.reps)
                return out

            v = run(jnp.float32(0.0))
            _ = float(v)  # compile+run
            t0 = time.time()
            v = run(jnp.float32(1e-6))
            _ = float(v)
            dt = (time.time() - t0) / args.reps
            rate = nbl * nfp * npx / dt / 1e9
            results.append((rate, (G, tb, tc, tf), dt))
            print(f"G={G:2d} tb={tb:3d} tc={tc:4d} tf={tf:3d}: "
                  f"{dt*1e3:7.2f} ms  {rate:6.1f}G triples/s",
                  file=sys.stderr)
        except Exception as e:
            msg = str(e)
            i = msg.find("Scoped allocation")
            print(f"G={G} tb={tb} tc={tc} tf={tf}: FAIL "
                  f"{msg[i:i+60] if i >= 0 else msg[:80]}", file=sys.stderr)
        finally:
            rp._pick_fwd_tiles = orig
    if results:
        results.sort(reverse=True)
        rate, tile, dt = results[0]
        print(f"best: G,tb,tc,tf={tile} {rate:.1f}G ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
