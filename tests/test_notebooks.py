"""The shipped tutorial notebooks execute end to end (VERDICT r4 #8).

docs/notebooks/*.ipynb are generated from the percent-format sources in
docs/notebooks/src/ by scripts/gen_notebooks.py; these tests execute
every code cell of each source in order (one namespace, like a kernel
run) and pin the .ipynb files to their sources so they cannot drift.
Reference bar: /root/reference/docs/notebooks/ (beam_fg_demo,
minibatching_and_distributed_training)."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "docs", "notebooks", "src")
sys.path.insert(0, os.path.join(REPO, "scripts"))

NOTEBOOKS = ["minibatching_and_distributed_training", "beam_fg_demo"]


@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_executes(name):
    from gen_notebooks import parse_percent
    with open(os.path.join(SRC, name + ".py")) as f:
        cells = parse_percent(f.read())
    ns = {"__name__": f"notebook_{name}"}
    ncode = 0
    for ctype, lines in cells:
        if ctype != "code":
            continue
        ncode += 1
        exec(compile("\n".join(lines), f"{name}.ipynb cell {ncode}",
                     "exec"), ns)
    assert ncode >= 5


def test_notebooks_in_sync():
    """The generated .ipynb match their sources (regen check) and are
    valid nbformat-4 JSON with the expected cell structure."""
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "gen_notebooks.py"),
                        "--check"], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    for name in NOTEBOOKS:
        with open(os.path.join(REPO, "docs", "notebooks",
                               name + ".ipynb")) as f:
            nb = json.load(f)
        assert nb["nbformat"] == 4
        types = {c["cell_type"] for c in nb["cells"]}
        assert types == {"markdown", "code"}
        for c in nb["cells"]:
            if c["cell_type"] == "code":
                assert c["outputs"] == [] and "execution_count" in c
