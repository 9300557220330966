"""Multi-host (multi-process) execution: jax.distributed over two CPU
processes, ShardedLogProb composing across them (SURVEY §2.7's last plan
row; no reference counterpart — its DistributedLogProb is single-node).

The worker subprocesses each own ONE cpu device; jax.distributed stitches
them into a two-device global mesh and the smap path runs across the
process boundary (collectives over the Gloo DCN transport)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/tests")
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
from bayeslim_tpu.parallel import multihost, make_mesh, ShardedLogProb
multihost.initialize(coordinator_address=f"localhost:{{port}}",
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 2, jax.devices()
import numpy as np
import bayeslim_tpu as bl
from bayeslim_tpu.inference import LogProb
from test_rime import (setup_Telescope, setup_PointSky, setup_Array,
                       setup_GaussBeam, JD0)

T = setup_Telescope()
sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
arr = setup_Array(N=2, freqs=freqs)
beam = setup_GaussBeam(freqs)
bls = arr.get_bls(keep_autos=False)[:6]
times = JD0 + np.arange(4) * 5e-4
rime = bl.RIME(sky, T, beam, arr, bls, times, freqs, time_mode="vmap")
vd = rime.forward()
tgt = vd.copy()
tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data + 0.02)
prob = LogProb(rime, tgt)
pd = prob.collect_main_params()
sprob = ShardedLogProb(prob, make_mesh({{"data": 2}}))
v, g = sprob.smap_value_and_grad(pd)
if pid == 0:
    np.savez(out, v=float(v), gsky=np.asarray(g["sky.params"]),
             gbeam=np.asarray(g["beam.params"]))
print("ok", float(v))
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_logprob(tmp_path):
    # single-process reference value (this process, 8 virtual devices
    # already initialized by conftest — use plain LogProb)
    import jax
    import bayeslim_tpu as bl
    from bayeslim_tpu.inference import LogProb
    from tests.test_rime import (setup_Telescope, setup_PointSky,
                                 setup_Array, setup_GaussBeam, JD0)

    T = setup_Telescope()
    sky, freqs = setup_PointSky(T, Nsource=3, Nfreqs=4)
    arr = setup_Array(N=2, freqs=freqs)
    beam = setup_GaussBeam(freqs)
    bls = arr.get_bls(keep_autos=False)[:6]
    times = JD0 + np.arange(4) * 5e-4
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs)
    vd = rime.forward()
    tgt = vd.copy()
    tgt.setup_data(bls, times, freqs, pol="ee", data=vd.data + 0.02)
    prob = LogProb(rime, tgt)
    pd = prob.collect_main_params()
    v0, g0 = prob.value_and_grad(pd)

    # two worker processes, one cpu device each
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(WORKER.format(repo=REPO))
    out = str(tmp_path / "out.npz")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process
    procs = [subprocess.Popen(
        [sys.executable, script, str(i), str(port), out],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=570)[0].decode(errors="replace")
            for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"

    res = np.load(out)
    # f32 psum reduction-order differences across the process
    # boundary: ~2e-5 relative
    assert np.isclose(float(res["v"]), float(v0), rtol=2e-4)
    assert np.allclose(res["gsky"], np.asarray(g0["sky.params"]),
                       rtol=2e-3, atol=1e-8)
    assert np.allclose(res["gbeam"], np.asarray(g0["beam.params"]),
                       rtol=2e-3, atol=1e-8)
