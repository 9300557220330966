#!/usr/bin/env python
"""Regenerate tests/_slow_tests.py from a pytest --durations=0 run.

Usage:
    python -m pytest tests/ -q --durations=0 | python scripts/refresh_slow_tests.py
    # or from a saved log:
    python scripts/refresh_slow_tests.py < durations.log

Parses `<secs>s call <nodeid>` lines, keeps nodeids with call time >=
THRESHOLD_S, and rewrites tests/_slow_tests.py in place (the conftest
marks those `slow`; `-m fast` deselects them for the smoke loop).
"""
import re
import sys
import time

THRESHOLD_S = 2.0
OUT = "tests/_slow_tests.py"

pat = re.compile(r"^\s*([0-9.]+)s\s+call\s+(\S+)")
slow = []
for line in sys.stdin:
    m = pat.match(line)
    if not m:
        continue
    secs, nodeid = float(m.group(1)), m.group(2)
    if secs >= THRESHOLD_S:
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.split("tests/")[-1]
        slow.append((secs, nodeid))

if not slow:
    sys.exit("no `Ns call <nodeid>` lines on stdin — pipe a "
             "`pytest --durations=0` run")

slow.sort(key=lambda x: x[1])
stamp = time.strftime("%Y-%m-%d")
with open(OUT, "w") as f:
    f.write(f'"""Test IDs taking >={THRESHOLD_S:g} s (regenerated '
            f'{stamp} via scripts/refresh_slow_tests.py).\n'
            'conftest.py marks these `slow`; `-m fast` deselects them '
            'for a fast\nsmoke loop. An unlisted new slow test just '
            'lands in the fast set until the\nlist is refreshed — no '
            'correctness impact."""\n\nSLOW = {\n')
    for _, nodeid in slow:
        f.write(f'    "{nodeid}",\n')
    f.write("}\n")
print(f"wrote {OUT}: {len(slow)} slow tests", file=sys.stderr)
