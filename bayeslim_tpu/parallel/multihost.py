"""
Multi-host (multi-process) execution over DCN.

SURVEY §2.7's one remaining plan row: scaling beyond a single host uses
jax.distributed — every process runs the same program, JAX stitches the
per-process devices into one global device set, and the existing
mesh/sharding machinery (parallel.sharding) then spans hosts: XLA routes
collectives over ICI within a host and DCN across hosts.

The reference has no multi-host story (its DistributedLogProb is
single-node, optim.py:1391-1628); this module is the TPU-native
extension. Launch recipe (one command per process / host):

    # host 0 (also the coordinator)
    python train.py --coord=host0:8476 --nproc=2 --pid=0
    # host 1
    python train.py --coord=host0:8476 --nproc=2 --pid=1

    # inside train.py, before any jax array work:
    from bayeslim_tpu.parallel import multihost
    multihost.initialize(coordinator_address=args.coord,
                         num_processes=args.nproc, process_id=args.pid)
    mesh = make_mesh({"data": len(jax.devices())})   # global devices
    sprob = ShardedLogProb(prob, mesh)               # unchanged API

On TPU pods the three arguments are auto-detected from the environment
(jax.distributed.initialize() with no args); pass them explicitly for
CPU/GPU clusters or tests.

ShardedLogProb composes across processes because every host-side array
it places is either replicated (parameters; every process holds the
same value) or globally sharded from identical per-process copies of
the full array (targets and the RIME's per-time precompute — host
metadata is deterministic, so every process computes identical arrays
at construction). `global_put` below builds the multi-process global
jax.Array from those per-process copies; on a single process it is
exactly jax.device_put.
"""
from __future__ import annotations

import jax
import numpy as np

__all__ = ["initialize", "is_initialized", "is_multiprocess",
           "global_put", "process_count", "process_index"]

_STATE = {"initialized": False}


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, local_device_ids=None, **kwargs):
    """jax.distributed.initialize wrapper (idempotent).

    With no arguments, auto-detects the cluster environment (TPU pods,
    SLURM, ...). For CPU/GPU clusters pass coordinator_address
    ("host:port"), num_processes and process_id explicitly.
    """
    if _STATE["initialized"]:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids,
                               **kwargs)
    _STATE["initialized"] = True


def is_initialized():
    return _STATE["initialized"]


def process_count():
    return jax.process_count()


def process_index():
    return jax.process_index()


def is_multiprocess():
    return jax.process_count() > 1


def global_put(x, sharding):
    """Place a host array onto a (possibly multi-process) sharding.

    Single process: jax.device_put. Multi-process: every process holds
    the SAME full-size host copy of x (replicated construction-time
    metadata — the ShardedLogProb invariant); build the global jax.Array
    by handing each process its addressable shards.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # already a global array: only pass through if it carries the
        # REQUESTED sharding — cross-process resharding of a
        # non-addressable array is not supported here, and silently
        # returning a differently-sharded array would corrupt the
        # caller's spec bookkeeping
        if x.sharding == sharding:
            return x
        raise ValueError(
            f"global_put: cannot reshard a non-fully-addressable array "
            f"from {x.sharding} to {sharding}; rebuild it from the host "
            f"copy instead")
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])
