#!/usr/bin/env python
"""On-device fused-Pallas vs XLA parity check (bench.py --check).

Runs the fused RIME kernels (ops/rime_pallas.py) and the chunked XLA
fallback (ops/rime_kernel.py) on the SAME device for forward AND both
cotangents (dpsky, dtau / dblvecs+ds), across the shape families the
production configs exercise (1-pol real, bs-factored, 4-pol complex,
Nmp>1 grouped, large), and asserts <=1e-4 relative agreement.

This validates the Mosaic-compiled kernels themselves (fma contraction,
f32 rounding, tile pipelining) — CI covers interpret mode only
(tests/test_pallas.py).

Usage: python scripts/kernel_check.py [--cpu] [--quick]
Exit code 0 = all checks pass.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _cases(quick=False):
    # (name, lead, nmp, nbl, nf, npix, complex_ps, use_mp_idx, bs)
    cases = [
        ("1pol-real", (), 1, 256, 64, 3072, False, False, False),
        ("1pol-bs", (), 1, 256, 64, 3072, False, False, True),
        ("4pol-complex", (2, 2), 1, 128, 32, 1536, True, False, False),
        ("nmp3-grouped", (), 3, 192, 32, 1536, False, True, False),
        ("4pol-bs", (2, 2), 1, 128, 32, 1536, True, False, True),
    ]
    if not quick:
        # the large bench shape (630 bls x 128 f x 6144 pix)
        cases.append(("large", (), 1, 630, 128, 6144, False, False, False))
        cases.append(("large-bs", (), 1, 630, 128, 6144, False, False, True))
    return cases


def _relerr(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    scale = np.abs(b).max() + 1e-30
    return float(np.abs(a - b).max() / scale)


def run_checks(platform=None, quick=False, tol=1e-4, verbose=True):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    from bayeslim_tpu.ops import rime_kernel, rime_pallas

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        # CPU: run the kernels in interpret mode (emulation smoke check)
        rime_pallas.INTERPRET = True

    failures = []
    results = {}
    for (name, lead, nmp, nbl, nf, npix, cplx, use_mp, bs) in _cases(quick):
        rng = np.random.default_rng(abs(hash(name)) % 2 ** 31)
        freqs = np.linspace(100e6, 200e6, nf)
        psr = rng.normal(size=lead + (nmp, nf, npix)).astype(np.float32)
        psi = rng.normal(size=lead + (nmp, nf, npix)).astype(np.float32) \
            if cplx else None
        blvecs = rng.uniform(-300, 300, (nbl, 3)).astype(np.float32)
        s = rng.normal(size=(3, npix))
        s_c = (s / np.linalg.norm(s, axis=0) / 2.99792458e8).astype(np.float32)
        mp_idx = rng.integers(0, nmp, nbl) if use_mp else None
        # deterministic cotangent seeds (complex built on device)
        ctr = rng.normal(size=lead + (nbl, nf)).astype(np.float32)
        cti = rng.normal(size=lead + (nbl, nf)).astype(np.float32)

        def make(use_pallas):
            def f(psr, psi, blvecs, s_c, ctr, cti):
                ps = jax.lax.complex(psr, psi) if psi is not None else psr

                def g(ps, bv, sc):
                    if bs:
                        return rime_kernel.rime_reduce(
                            ps, None, freqs, mp_idx=mp_idx,
                            use_pallas=use_pallas, blvecs=bv, s_c=sc)
                    tau = jnp.matmul(bv, sc,
                                     precision=jax.lax.Precision.HIGHEST)
                    return rime_kernel.rime_reduce(
                        ps, tau, freqs, mp_idx=mp_idx,
                        use_pallas=use_pallas)

                y, vjp = jax.vjp(g, ps, blvecs, s_c)
                ct = jax.lax.complex(ctr, cti)
                dps, dbv, dsc = vjp(ct)
                # complex64 device->host fetches are UNIMPLEMENTED on the
                # axon backend (both directions!): return real planes
                def planes(x):
                    return (x.real, x.imag) if jnp.iscomplexobj(x) \
                        else (x, jnp.zeros((1,), x.dtype))
                return planes(y) + planes(dps) + planes(dbv) + planes(dsc)
            return jax.jit(f) if psi is not None else \
                jax.jit(lambda a, b, c, d, e: f(a, None, b, c, d, e))

        fp = make(True)
        fx = make(False)
        argsp = (psr, psi, blvecs, s_c, ctr, cti) if cplx else \
            (psr, blvecs, s_c, ctr, cti)
        t0 = time.time()
        outs_p = jax.tree.map(np.asarray, fp(*argsp))
        outs_x = jax.tree.map(np.asarray, fx(*argsp))
        dt = time.time() - t0

        labels = ["fwd.re", "fwd.im", "dpsky.re", "dpsky.im",
                  "dblvecs.re", "dblvecs.im", "ds_c.re", "ds_c.im"]
        errs = {}
        for lab, a, b in zip(labels, outs_p, outs_x):
            if a.shape == (1,) and b.shape == (1,):
                continue  # zero placeholder plane of a real output
            errs[lab] = _relerr(a, b)
        bad = {k: v for k, v in errs.items() if not np.isfinite(v)
               or v > tol}
        results[name] = errs
        if bad:
            failures.append((name, bad))
        if verbose:
            status = "FAIL" if bad else "ok"
            print(f"# check {name:14s} [{status}] " +
                  " ".join(f"{k}={v:.2e}" for k, v in errs.items()) +
                  f" ({dt:.1f}s)", file=sys.stderr)

    return results, failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="skip the large shapes")
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--fast", action="store_true",
                    help="measure the single-pass bf16 kernel mode "
                         "(informational: ~2e-3 expected; tolerance "
                         "relaxed to 1e-2)")
    args = ap.parse_args()
    if args.fast:
        from bayeslim_tpu.ops.rime_pallas import set_precise_dots
        set_precise_dots(False)
        args.tol = max(args.tol, 1e-2)
    results, failures = run_checks(platform="cpu" if args.cpu else None,
                                   quick=args.quick, tol=args.tol)
    worst = max(v for errs in results.values() for v in errs.values())
    print(json.dumps({
        "metric": "fused-vs-XLA kernel parity (max rel err, fwd+cotangents)",
        "value": worst, "unit": "relerr",
        "vs_baseline": 1.0 if not failures else 0.0}))
    if failures:
        print(f"# FAILURES: {failures}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
