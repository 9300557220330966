"""
Structured logging and profiling hooks (SURVEY.md §5: the reference has
only print-based verbose flags, rime_model.py:485-535 / optim.py:1649;
this lifts them to a structured, machine-readable event stream plus
jax-profiler trace capture).
"""
from __future__ import annotations

import contextlib
import json
import logging
import time

import numpy as np

__all__ = ["log", "get_logger", "log_event", "Metrics", "trace_profile",
           "device_memory_stats"]

_LOGGER = None


def get_logger(name="bayeslim_tpu", level=logging.INFO, jsonl_path=None):
    """Package logger; with jsonl_path, events also append to a JSONL
    file (one structured record per line)."""
    global _LOGGER
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(level)
    if jsonl_path is not None:
        import os
        path = os.path.abspath(str(jsonl_path))
        have = any(isinstance(h, logging.FileHandler)
                   and getattr(h, "baseFilename", None) == path
                   for h in logger.handlers)
        if not have:
            fh = logging.FileHandler(path)
            fh.setFormatter(logging.Formatter("%(message)s"))
            fh.addFilter(lambda rec: rec.getMessage().startswith("{"))
            logger.addHandler(fh)
    _LOGGER = logger
    return logger


def log_event(event, logger=None, **fields):
    """Emit one structured event record: {"event": ..., "t": ..., **fields}.

    Values are coerced to JSON-safe scalars (device arrays fetched)."""
    logger = logger or _LOGGER or get_logger()
    rec = {"event": event, "t": time.time()}
    for k, v in fields.items():
        if isinstance(v, (np.generic,)):
            v = v.item()
        elif hasattr(v, "item") and getattr(v, "ndim", None) == 0:
            v = float(v)
        rec[k] = v
    logger.info(json.dumps(rec, default=str))
    return rec


class Metrics:
    """Accumulating metrics store: scalar series keyed by name, with
    summary statistics and JSONL export. Replaces the reference's
    loss/time history lists (optim.py:1649-1656) with a queryable,
    multi-series structure."""

    def __init__(self):
        self.series = {}

    def log(self, name, value, step=None):
        s = self.series.setdefault(name, {"steps": [], "values": []})
        s["steps"].append(len(s["values"]) if step is None else step)
        s["values"].append(float(value))

    def __getitem__(self, name):
        return np.asarray(self.series[name]["values"])

    def summary(self):
        return {k: dict(n=len(v["values"]),
                        last=v["values"][-1] if v["values"] else None,
                        min=float(np.min(v["values"])) if v["values"] else None,
                        mean=float(np.mean(v["values"])) if v["values"] else None)
                for k, v in self.series.items()}

    def to_jsonl(self, path):
        with open(path, "w") as f:
            for k, s in self.series.items():
                for st, v in zip(s["steps"], s["values"]):
                    f.write(json.dumps({"name": k, "step": st, "value": v})
                            + "\n")


@contextlib.contextmanager
def trace_profile(logdir=None, enabled=True):
    """jax profiler trace context: captures a TensorBoard-readable trace
    of everything inside the block (no-op when disabled or when the
    profiler is unavailable on the backend)."""
    import jax
    started = False
    if enabled and logdir is not None:
        try:
            jax.profiler.start_trace(str(logdir))
            started = True
        except Exception:
            pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def device_memory_stats():
    """Per-device memory statistics (the reference shells out to
    nvidia-smi, utils.py:2016-2037; jax exposes them directly)."""
    import jax
    out = {}
    for d in jax.devices():
        try:
            st = d.memory_stats() or {}
        except Exception:
            st = {}
        out[str(d)] = {k: st.get(k) for k in
                       ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                       if k in st}
    return out


def log(message, verbose=False, style=1):
    """Print a message when verbose (reference rime_model.py:485-505):
    style 1 plain, 2 underlined, 3 boxed."""
    if not verbose:
        return
    if style == 2:
        print(f"{message}\n{'-' * 30}")
    elif style == 3:
        print(f"\n{'-' * 30}\n{message}\n{'-' * 30}")
    else:
        print(f"{message}")
