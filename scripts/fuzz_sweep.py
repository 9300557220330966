#!/usr/bin/env python
"""
Extended fuzz sweep: re-run every in-suite fuzz test with OFFSET seeds.

Every fuzz test in tests/ seeds its trials through
``np.random.default_rng(<fixed int>)`` so the committed suite is
deterministic. This harness monkeypatches ``np.random.default_rng`` to
displace integer seeds by ``offset * 100003`` (a prime, so different
offsets never collide across the small fixed seeds used in-suite) and
re-executes the same fuzz bodies — fresh random trials through the
exact same assertions against the actual reference package.

Usage:
    python scripts/fuzz_sweep.py --offsets 1 2 3 [--only PATTERN]

Exit code 0 = all fuzz bodies passed at every offset; 1 = failures
(each printed with its test name, offset, and the assertion tag).
"""
import argparse
import importlib
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

_REAL_DEFAULT_RNG = np.random.default_rng
_OFFSET = 0


def _patched_default_rng(seed=None, *a, **kw):
    if isinstance(seed, (int, np.integer)) and _OFFSET:
        seed = int(seed) + _OFFSET * 100003
    return _REAL_DEFAULT_RNG(seed, *a, **kw)


class _NullMonkeypatch:
    """Stand-in for pytest's monkeypatch fixture (the sampler fuzzes use
    it only to sync the reference's torch RNG draws)."""

    def __init__(self):
        self._undo = []

    def setattr(self, target, name, value):
        old = getattr(target, name)
        self._undo.append((target, name, old))
        setattr(target, name, value)

    def undo(self):
        for target, name, old in reversed(self._undo):
            setattr(target, name, old)
        self._undo.clear()


def collect_fuzz_tests(only=None):
    mods = ["test_reference_parity", "test_parallel"]
    out = []
    for mname in mods:
        mod = importlib.import_module(mname)
        for attr in sorted(dir(mod)):
            if attr.startswith("test_") and "fuzz" in attr:
                if only and only not in attr:
                    continue
                out.append((f"{mname}.{attr}", getattr(mod, attr)))
    return out


def main():
    global _OFFSET
    ap = argparse.ArgumentParser()
    ap.add_argument("--offsets", type=int, nargs="+", default=[1])
    ap.add_argument("--only", default=None,
                    help="substring filter on test names")
    args = ap.parse_args()

    np.random.default_rng = _patched_default_rng

    tests = collect_fuzz_tests(args.only)
    print(f"collected {len(tests)} fuzz tests x {len(args.offsets)} "
          f"offsets", flush=True)
    failures = []
    for off in args.offsets:
        _OFFSET = off
        for name, fn in tests:
            t0 = time.time()
            mp = _NullMonkeypatch()
            try:
                kw = {}
                if "monkeypatch" in fn.__code__.co_varnames[
                        :fn.__code__.co_argcount]:
                    kw["monkeypatch"] = mp
                fn(**kw)
                print(f"PASS offset={off} {name} "
                      f"({time.time() - t0:.1f}s)", flush=True)
            except Exception:
                failures.append((off, name))
                print(f"FAIL offset={off} {name}", flush=True)
                traceback.print_exc()
            finally:
                mp.undo()
    print(f"\n{len(failures)} failures"
          + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
