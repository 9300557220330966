"""The README quick-start must actually run: extract its first python
code block and execute it (with sizes scaled down so the doc snippet
stays honest but the test stays fast). Catches API drift between docs
and package."""
import re

import numpy as np
import pytest


def test_readme_quickstart_runs():
    src = open("README.md").read() if __name__ != "__main__" else None
    if src is None or "## Quick start" not in src:
        import os
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        src = open(os.path.join(here, "README.md")).read()
    m = re.search(r"## Quick start\s+```python\n(.*?)```", src, re.S)
    assert m, "README quick-start code block not found"
    code = m.group(1)

    # scale down for test wall-clock; assert each substitution applied
    subs = [
        ("np.linspace(100e6, 120e6, 64)", "np.linspace(100e6, 120e6, 4)"),
        ("np.zeros((1, 1, 2, 50))", "np.zeros((1, 1, 2, 6))"),
        ("np.random.uniform(1, 10, 50)", "np.random.uniform(1, 10, 6)"),
        ("np.random.uniform(0, 360, 50)", "np.random.uniform(0, 360, 6)"),
        ("np.random.uniform(-80, 20, 50)", "np.random.uniform(-80, 20, 6)"),
        ("np.arange(4) * 5e-4", "np.arange(2) * 5e-4"),
        ("opt.minimize(20)", "opt.minimize(2)"),
        ("hmc.sample(500)", "hmc.sample(3)"),
    ]
    for old, new in subs:
        assert old in code, f"README drifted: {old!r} not in quick-start"
        code = code.replace(old, new)
    # trim the full hera19 baseline set for wall-clock
    assert "bls = arr.get_bls(keep_autos=False)" in code
    code = code.replace("bls = arr.get_bls(keep_autos=False)",
                        "bls = arr.get_bls(keep_autos=False)[:12]")

    ns = {}
    exec(compile(code, "README-quickstart", "exec"), ns)
    vis = ns["vis"]
    assert np.shape(vis.data)[2] == 12
    assert np.isfinite(np.asarray(ns["opt"].pdict.ravel())).all()
