#!/usr/bin/env python
"""
Benchmark: RIME forward+gradient step throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- metric: RIME visibility points/sec/chip (Nbls * Nfreqs * Ntimes / step
  wall-clock) for a full forward+gradient posterior step (the BASELINE.md
  driver metric).
- vs_baseline: ratio against an in-process re-implementation of the
  reference's PyTorch inner loop (bayeslim/rime_model.py:423-429 pattern:
  materialize fringe, multiply beam-weighted sky, reduce over pixels;
  forward+backward) measured on this host's CPU torch on the same config
  (pixel-count subsampled and linearly extrapolated). The reference
  package itself cannot run here (astropy/healpy absent).

Timing methodology (axon remote TPU): jax.block_until_ready is a no-op on
this backend and a fetch costs a ~34 ms RPC, so K optimizer steps are
CHAINED inside one jit (adam update feeds step i's gradients into step
i+1's parameters -- nothing can be dead-code-eliminated) and the single
end-of-loop scalar fetch is subtracted via a measured fetch floor.

Usage: python bench.py [--cpu] [--size small|...|hera-stat|hera100-stat]
                       [--ntime N] [--x64]
Default size: hera-stat (the production redundant-array configuration)
on TPU; 'large' under --cpu. A persistent XLA compilation cache
(.jax_cache) makes warm runs skip the 43s train compile.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

_T0 = time.time()


def _note(msg):
    """Incremental stage line on stderr (flushed) so a timed-out run is
    diagnosable from its captured stderr alone (r3 verdict weak #1)."""
    print(f"# [{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _watchdog(label, interval=30):
    """Daemon that notes every `interval`s until .set() — makes a hung
    remote-backend init (the axon tunnel can drop) visible in stderr
    instead of a silent timeout. Returns the stop Event."""
    import threading
    done = threading.Event()

    def loop():
        n = 0
        while not done.wait(interval):
            n += 1
            _note(f"still in {label} after {n * interval}s — if this is "
                  f"backend init, the remote TPU tunnel may be down")

    threading.Thread(target=loop, daemon=True).start()
    return done


def build_case(size):
    cfgs = {
        "small": dict(hexN=3, nside=16, nfreq=32, ntime=1, reps=32),
        "medium": dict(hexN=4, nside=32, nfreq=64, ntime=2, reps=32),
        "large": dict(hexN=5, nside=32, nfreq=128, ntime=2, reps=32),
        # 331 ants (hex N=11), 1024 freqs: the BASELINE.md array scale
        "hera": dict(hexN=11, nside=32, nfreq=1024, ntime=2, reps=2),
        # the full BASELINE.md north star: 331 ants, 1024 freqs,
        # 100 times, nside-64 sky. The 100-time visibility cube (45 GB)
        # exceeds one chip's HBM, so the step runs as 20 accumulate
        # minibatches of 5 times through RIME's indexed batching (one
        # compiled executable for all batches). Takes ~15 min on v5e-1.
        "hera100": dict(hexN=11, nside=64, nfreq=1024, ntime=100, reps=1,
                        tbatch=5),
    }
    # "-red" variants: simulate only unique redundant baselines and
    # expand to the full set via RIME's sim->data index (the reference's
    # own sim_bls feature, rime_model.py:148-226) — the production
    # configuration for a redundant array like HERA. Output data and
    # gradients are identical to the full simulation.
    # "-stat" variants additionally solve against the redundant-group
    # SUFFICIENT STATISTICS (VisData.reduce_by_redundancy: icov-weighted
    # group means with summed weights): the per-baseline cube is never
    # materialized, yet posterior gradients are identical and chi^2
    # exact up to a data constant. hera100-stat then fits in one
    # executable (no time minibatching).
    if size.endswith("-stat"):
        base, red, stat = size[:-5], True, True
    elif size.endswith("-red"):
        base, red, stat = size[:-4], True, False
    else:
        base, red, stat = size, False, False
    cfg = dict(cfgs[base])
    cfg["redundant"] = red
    cfg["stat"] = stat
    if stat:
        cfg.pop("tbatch", None)   # whole time axis in one executable
        # hera-stat steps are ~87 ms: use enough chained reps that the
        # per-window fetch floor (~30 ms) is noise; hera100-stat steps
        # are ~18 s and 2 reps already dominate the floor
        cfg["reps"] = 8 if base == "hera" else 2
    return cfg


def _setup_compile_cache():
    """Persistent on-disk XLA compilation cache (VERDICT r4 weak #2).

    Measured on the axon remote backend (round 5): executables cache on
    disk keyed by HLO + flags and reload across processes — a probe
    graph compiled cold in 265 s vs 2.5 s warm, and the hera-stat train
    loop (Mosaic kernels included) went 43.4 s cold -> see stage notes
    for the warm number. The default dir lives in the repo so a driver
    run hits entries warmed during development. Opt out with
    BENCH_COMPILE_CACHE=0. Returns the cache dir (or None)."""
    if os.environ.get("BENCH_COMPILE_CACHE", "1") == "0":
        return None
    import jax
    d = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return d


def _cache_entries(cache_dir):
    try:
        return len(os.listdir(cache_dir)) if cache_dir else 0
    except OSError:
        return 0


def _fetch_floor():
    """Measured cost of one scalar fetch RPC on this backend."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.float32(1.0)
    float(f(x))
    t0 = time.time()
    n = 5
    for _ in range(n):
        x = f(x)
        float(x)
    return (time.time() - t0) / n


def build_model(cfg):
    """Construct the benchmark RIME (+ redundant/stat variants) for a
    size config. Returns (rime, T, arr, bls, sim_bls, times_or_tgroups,
    freqs, red_groups)."""
    import jax.numpy as jnp
    import bayeslim_tpu as bl
    from bayeslim_tpu.utils import make_hex, AntposDict, healpix as hp
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse

    loc = (21.428305555, -30.72152777, 1073.0)
    T = bl.TelescopeModel(loc)
    ants, antvecs = make_hex(cfg["hexN"], D=15.0)
    freqs = np.linspace(100e6, 200e6, cfg["nfreq"])
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs,
                        redtol=0.5, skip_reds=not cfg.get("redundant"))
    jd0 = 2458168.3

    nside = cfg["nside"]
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    angs = np.stack([phi * 180 / np.pi, 90 - theta * 180 / np.pi])
    rng = np.random.default_rng(0)
    # powerlaw diffuse sky: amp + spectral index per pixel
    params = np.zeros((1, 1, 2, npix), dtype=np.float64)
    params[0, 0, 0] = rng.uniform(1, 10, npix)
    params[0, 0, 1] = -2.5
    R = PixelSkyResponse(freqs, spatial_mode="pixel", freq_mode="powerlaw",
                         f0=float(freqs[0]))
    sky = PixelSky(jnp.asarray(params, dtype=bl._float()), angs,
                   hp.nside2pixarea(nside), R=R)

    beam = bl.PixelBeam(jnp.ones((1, 1, 1, 1, 2), dtype=bl._float()) * 14.0,
                        freqs, R=bl.beam_model.AiryResponse(), pol="e",
                        powerbeam=True, fov=180.0)
    bls = arr.get_bls(keep_autos=False)
    if cfg.get("redundant"):
        red_groups = [r for r in arr.reds if r[0][0] != r[0][1]]
        sim_bls = [r[0] for r in red_groups]
        data_bls = None if cfg.get("stat") else bls
    else:
        sim_bls, data_bls = bls, None
    times = jd0 + np.arange(cfg["ntime"]) * 5e-4
    tb = cfg.get("tbatch")
    if tb:
        assert cfg["ntime"] % tb == 0
        tgroups = [times[i * tb:(i + 1) * tb]
                   for i in range(cfg["ntime"] // tb)]
        rime = bl.RIME(sky, T, beam, arr, sim_bls, tgroups, freqs,
                       data_bls=data_bls, pix_chunk=2048)
        rime.enable_indexed_batching()
    else:
        rime = bl.RIME(sky, T, beam, arr, sim_bls, times, freqs,
                       data_bls=data_bls, pix_chunk=2048)
    npix_cut = int(rime._pre[(0, 0)]["mask"].shape[-1])
    cfg["nbls_sim"] = len(sim_bls)
    return dict(rime=rime, T=T, arr=arr, bls=bls, sim_bls=sim_bls,
                times=times, tgroups=tgroups if tb else None, freqs=freqs,
                red_groups=red_groups if cfg.get("redundant") else None,
                npix_cut=npix_cut)


def build_prob(cfg, m):
    """Target + LogProb for a (non-time-batched) built model."""
    import jax
    import jax.numpy as jnp
    import bayeslim_tpu as bl
    from bayeslim_tpu.inference import LogProb

    rime, T, arr = m["rime"], m["T"], m["arr"]
    bls, sim_bls, times, freqs = m["bls"], m["sim_bls"], m["times"], \
        m["freqs"]
    # synthetic random target built on-device (complex64 host->device
    # transfers fail on axon; lax.complex inside a trivial jit). Target
    # VALUES are irrelevant to step timing (adam does identical compute
    # for any residual), and the model-forward target used in rounds 1-3
    # cost a third full ~30 s compile (r3 verdict weak #1).
    nbd = len(sim_bls) if cfg.get("stat") else len(bls)
    shp = (1, 1, nbd, cfg["ntime"], cfg["nfreq"])
    keys = jax.random.split(jax.random.PRNGKey(0))
    tgt_data = jax.jit(lambda k: jax.lax.complex(
        jax.random.normal(k[0], shp), jax.random.normal(k[1], shp)))(keys)
    tgt = bl.VisData()
    tgt.setup_meta(T, arr.to_antpos())
    if cfg.get("stat"):
        # sufficient-statistics likelihood: target is the redundant-group
        # means with icov = group baseline counts (exact gradients for
        # the full per-baseline posterior; see
        # VisData.reduce_by_redundancy)
        counts = np.asarray([len(r) for r in m["red_groups"]],
                            dtype=np.float32)
        icov = jnp.broadcast_to(
            jnp.asarray(counts)[None, None, :, None, None], tgt_data.shape)
        tgt.setup_data(sim_bls, times, freqs, pol="ee", data=tgt_data,
                       cov=None, cov_axis=None, icov=icov)
    else:
        tgt.setup_data(bls, times, freqs, pol="ee", data=tgt_data,
                       cov=None, cov_axis=None, icov=None)
    return LogProb(rime, tgt), tgt_data


def run_jax(cfg, platform=None, x64=False):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    if x64:
        jax.config.update("jax_enable_x64", True)
    cache_dir = _setup_compile_cache()
    import jax.numpy as jnp
    import optax

    stage = {}
    w = _watchdog("backend init (jax.devices)")
    # hard deadline on backend init: when the axon tunnel is down,
    # jax.devices() blocks indefinitely — emit a PARSEABLE error line
    # instead of dying at the driver's timeout with nothing recorded
    import threading
    box = {}

    def _init():
        try:
            box["devices"] = [d.platform for d in jax.devices()]
        except Exception as e:  # pragma: no cover - infra failure path
            box["error"] = repr(e)

    th = threading.Thread(target=_init, daemon=True)
    th.start()
    th.join(timeout=float(os.environ.get("BENCH_INIT_DEADLINE_S", 300)))
    if "devices" not in box:
        msg = box.get("error",
                      "backend init (jax.devices) exceeded deadline — "
                      "remote TPU tunnel down?")
        print(json.dumps({
            "metric": "RIME vis points/sec/chip "
                      "(bl*freq*time, fwd+grad step)",
            "value": None, "unit": "points/s", "vs_baseline": None,
            "error": msg}), flush=True)
        _note(f"FATAL: {msg}")
        # os._exit skips stdio teardown — the flush above is what puts
        # the JSON on the (block-buffered) driver pipe
        os._exit(3)
    _note(f"devices={box['devices']}")
    w.set()

    # Warm the first blocking fetch in the background. A fresh process's
    # FIRST value fetch from the remote TPU intermittently stalls
    # 20-140 s (measured: 67 s for a 1-element fetch after a trivial
    # dispatch; 0.04 s for every later fetch) — a per-session server
    # warmup, independent of how much work is queued. Paying it on a
    # daemon thread overlaps it with the host-side build/trace stages
    # instead of serializing it into build_prob's wall.
    warm_box = {}

    def _warm_fetch():
        tw = time.time()
        try:
            warm_box["s"] = float(jax.jit(lambda: jnp.asarray(1.0) + 1.0)())
        except Exception as e:  # pragma: no cover
            warm_box["error"] = repr(e)
        warm_box["t"] = time.time() - tw

    warm_th = threading.Thread(target=_warm_fetch, daemon=True)
    warm_th.start()

    t0 = time.time()
    m = build_model(cfg)
    stage["build_model"] = time.time() - t0
    _note(f"build_model done ({stage['build_model']:.1f}s)")
    npix_cut = m["npix_cut"]
    bls, freqs = m["bls"], m["freqs"]
    if m["tgroups"] is not None:
        out = _run_batched(cfg, m["rime"], m["T"], m["arr"], bls,
                           m["tgroups"], freqs, npix_cut)
        out["stage"] = stage
        return out

    t0 = time.time()
    prob, tgt_data = build_prob(cfg, m)
    stage["build_prob"] = time.time() - t0
    _note(f"build_prob done ({stage['build_prob']:.1f}s)")
    pd = dict(prob.collect_main_params())
    fn = prob._batch_fn(0)
    _, icov = prob._batch_args(0)

    opt = optax.adam(1e-3)
    reps = cfg.get("reps", 8)

    @jax.jit
    def train(pd, model, data):
        state = opt.init(pd)

        def body(carry, _):
            p, s = carry
            v, g = jax.value_and_grad(fn)(p, model, data, icov)
            up, s = opt.update(g, s, p)
            p = optax.apply_updates(p, up)
            return (p, s), v

        (p, _), vs = jax.lax.scan(body, (pd, state), None, length=reps)
        return vs[-1], p

    @jax.jit
    def fwd_loop(pd, model, data):
        def body(p0, _):
            v = fn({k: v + p0 * 0 for k, v in pd.items()}, model, data, icov)
            return jnp.real(v), None
        out, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None,
                              length=reps)
        return out

    # first-fetch warmup must be done before anything is timed
    warm_th.join()
    stage["first_fetch_warm"] = warm_box.get("t", float("nan"))
    _note(f"first-fetch warm {stage['first_fetch_warm']:.1f}s "
          f"(overlapped with build)")

    fetch = _fetch_floor()
    _note(f"fetch_floor={fetch*1e3:.1f}ms; compiling train loop")

    # compile + first run
    n_cache0 = _cache_entries(cache_dir)
    t0 = time.time()
    v, _ = train(pd, prob.model, tgt_data)
    _ = float(v)
    compile_time = time.time() - t0
    cache_new = _cache_entries(cache_dir) - n_cache0
    # zero new entries only proves a hit when a miss would have persisted
    # something: compiles under the 2s min_compile_time threshold write
    # nothing, so a fast cold compile on an empty/unrelated cache is
    # indistinguishable from a hit — label it honestly
    cache_note = ("off" if cache_dir is None else
                  "miss-populated" if cache_new else
                  "hit" if (n_cache0 and compile_time >= 5.0) else
                  "no-new-entries (sub-threshold compile: hit/cold "
                  "indistinguishable)")
    _note(f"train compile+first run done ({compile_time:.1f}s, "
          f"persistent cache {cache_note})")

    # min-of-3 timed windows: remote-TPU RPC latency fluctuates ~±20%
    # run-to-run; the floor-subtracted min is the stable estimator
    windows = []
    for _ in range(3):
        t0 = time.time()
        v, _ = train(pd, prob.model, tgt_data)
        _ = float(v)
        windows.append(time.time() - t0)
        _note(f"window {len(windows)}/3 = {windows[-1]:.3f}s")
    dt = max(min(windows) - fetch, 1e-9) / reps

    # fwd/bwd split (VERDICT r4 weak #3): time a chained forward-only
    # loop under the same floor-subtracted methodology. 'auto' runs it
    # only when the train compile was warm (persistent-cache hit) so a
    # cold-cache driver run never risks its budget on the extra compile.
    split = cfg.get("fwd_split", False)
    if split == "auto":
        split = compile_time < 60.0
    if split:
        t0 = time.time()
        float(fwd_loop(pd, prob.model, tgt_data))
        stage["compile_fwd"] = time.time() - t0
        _note(f"fwd loop compile+first done ({stage['compile_fwd']:.1f}s)")
        fws = []
        for _ in range(3):
            t0 = time.time()
            float(fwd_loop(pd, prob.model, tgt_data))
            fws.append(time.time() - t0)
        dt_fwd = max(min(fws) - fetch, 1e-9) / reps
    else:
        dt_fwd = float("nan")
        if cfg.get("fwd_split") == "auto":
            _note("fwd split skipped: cold-cache compile — rerun warm "
                  "for the fwd/bwd line")

    points = len(bls) * cfg["nfreq"] * cfg["ntime"]
    stage["compile"] = compile_time
    stage["steady"] = sum(windows)
    return dict(step_time=dt, fwd_time=dt_fwd, bwd_time=dt - dt_fwd,
                compile_time=compile_time, fetch=fetch, points=points,
                windows=windows, stage=stage, cache_note=cache_note,
                nbls=len(bls), npix_cut=npix_cut, pps=points / dt)


def _run_batched(cfg, rime, T, arr, bls, tgroups, freqs, npix_cut):
    """Full accumulate sweep over time minibatches (indexed batching:
    one executable for all batches). Target is a zeros VisData shared by
    every batch (benchmark loss = |V|^2; values are irrelevant to the
    timing, and a real target would not fit in HBM at this scale)."""
    import time as _time
    import jax
    import jax.numpy as jnp
    import bayeslim_tpu as bl
    from bayeslim_tpu.inference import LogProb

    tgt = bl.VisData()
    tgt.setup_meta(T, arr.to_antpos())
    nb, nt, nf = len(bls), len(tgroups[0]), cfg["nfreq"]
    # complex64 host->device transfers fail on the axon backend: build
    # the zeros target on device via lax.complex
    z = jax.jit(lambda: jax.lax.complex(
        jnp.zeros((1, 1, nb, nt, nf), jnp.float32),
        jnp.zeros((1, 1, nb, nt, nf), jnp.float32)))()
    tgt.setup_data(bls, tgroups[0], freqs, pol="ee", data=z)
    prob = LogProb(rime, [tgt])
    pd = prob.collect_main_params()

    def sweep():
        v, g = prob.value_and_grad(pd)
        # fetch loss AND one grad element: on the remote backend only
        # value fetches synchronize, and the loss alone would let the
        # final batch's backward run past the timer
        _ = float(jnp.real(v))
        for k in g:
            _ = float(np.asarray(jnp.ravel(g[k])[0]))
        return v

    _note("batched: compiling accumulate sweep")
    t0 = _time.time()
    sweep()
    compile_time = _time.time() - t0
    _note(f"batched sweep compile+first done ({compile_time:.1f}s)")
    t0 = _time.time()
    sweep()
    dt = _time.time() - t0
    _note(f"batched timed sweep = {dt:.1f}s")

    points = nb * cfg["nfreq"] * cfg["ntime"]
    return dict(step_time=dt, fwd_time=float("nan"), bwd_time=float("nan"),
                compile_time=compile_time, fetch=0.0, points=points,
                nbls=nb, npix_cut=npix_cut, pps=points / dt)


def run_hvp_bench(cfg, platform=None, x64=False, nhvp=2):
    """Second-order benchmark (VERDICT r2 #4): wall-clock of one
    Hessian-vector product through the XLA-recompute path (the
    compute_hessian / Laplace-covariance inner loop; second-order AD
    cannot cross the fused kernels' custom_vjp, see
    ops/rime_kernel.force_xla) vs the fused first-order gradient.

    Reports sec/HVP and the recompute penalty = t_HVP / (4 x t_grad):
    an ideal kernel-based forward-over-reverse HVP costs ~4 forward
    sweeps, i.e. ~2x a fwd+bwd gradient step; penalty ~1 means the XLA
    fallback costs about what a kernel HVP would.
    """
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    if x64:
        jax.config.update("jax_enable_x64", True)
    _setup_compile_cache()
    import jax.numpy as jnp
    from bayeslim_tpu.utils import ParamDict
    from bayeslim_tpu.ops.rime_kernel import force_xla

    m = build_model(cfg)
    prob, tgt_data = build_prob(cfg, m)
    pd = prob.collect_main_params()
    fn = prob._batch_fn(0)
    data, icov = prob._batch_args(0)
    template = pd.copy()
    x0 = pd.ravel()
    n = int(x0.size)

    # model/data/icov are explicit jit ARGUMENTS: a complex64 device
    # array captured as a closure constant would be fetched to host for
    # MLIR embedding at trace time, which the axon backend cannot do
    def f(x, model, data, icov):
        return fn(ParamDict(dict(template.unravel(x))), model, data,
                  icov)

    grad_f = jax.grad(f)
    hvp = jax.jit(lambda x, v, model, data, icov: jax.jvp(
        lambda y: grad_f(y, model, data, icov), (x,), (v,))[1])
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.normal(size=n).astype(np.float32))

    fetch = _fetch_floor()
    with force_xla():  # statics read at trace time
        t0 = time.time()
        out = hvp(x0, v0, prob.model, data, icov)
        _ = float(jnp.ravel(out)[0])
        compile_hvp = time.time() - t0
        t0 = time.time()
        for _i in range(nhvp):
            out = hvp(x0, v0, prob.model, data, icov)
            _ = float(jnp.ravel(out)[0])
        t_hvp = max((time.time() - t0) / nhvp - fetch, 1e-9)

    # fused first-order gradient for the penalty denominator. Fetch a
    # GRADIENT element, not just the value: on the remote backend only
    # value fetches synchronize, and the loss alone would let the
    # backward kernels run past the timer
    vg = jax.jit(jax.value_and_grad(f))
    t0 = time.time()
    val, g = vg(x0, prob.model, data, icov)
    _ = float(jnp.ravel(g)[0])
    compile_vg = time.time() - t0
    t0 = time.time()
    for _i in range(nhvp):
        val, g = vg(x0, prob.model, data, icov)
        _ = float(jnp.ravel(g)[0])
    t_vg = max((time.time() - t0) / nhvp - fetch, 1e-9)

    penalty = t_hvp / (2.0 * t_vg)  # kernel-ideal HVP ~ 2x fwd+bwd
    return dict(t_hvp=t_hvp, t_vg=t_vg, penalty=penalty, nparam=n,
                compile_hvp=compile_hvp, compile_vg=compile_vg,
                nbls=len(m["bls"]), npix_cut=m["npix_cut"])


def run_hmc_bench(platform=None, x64=False, hexN=3, nfreq=128, nside=32,
                  lmax=8, nsample=20, nstep=10, nwarm=3, nchain=0):
    """Joint-posterior HMC throughput (BASELINE config #4 shape): alm
    diffuse sky + per-antenna complex gains through the full
    RIME+Jones chain, sampled with the on-device leapfrog trajectory
    (lax.scan — one device dispatch per trajectory).

    Reports leapfrog steps/s and seconds per effective sample (ESS from
    the energy-chain autocorrelation).
    """
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    if x64:
        jax.config.update("jax_enable_x64", True)
    _setup_compile_cache()
    import jax.numpy as jnp
    import bayeslim_tpu as bl
    from bayeslim_tpu.utils import make_hex, AntposDict, Sequential
    from bayeslim_tpu.utils import healpix as hp
    from bayeslim_tpu.models.sky import PixelSky, PixelSkyResponse
    from bayeslim_tpu.models.calibration import JonesModel
    from bayeslim_tpu.ops import sph_harm as sh
    from bayeslim_tpu.inference import LogProb
    from bayeslim_tpu.inference.sampler import HMC, Potential

    loc = (21.428305555, -30.72152777, 1073.0)
    T = bl.TelescopeModel(loc)
    ants, antvecs = make_hex(hexN, D=15.0)
    freqs = np.linspace(100e6, 200e6, nfreq)
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs)
    bls = arr.get_bls(keep_autos=False)
    jd0 = 2458168.3

    # alm diffuse sky (real Ylm basis), one spectral surface per freq
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    angs = np.stack([phi * 180 / np.pi, 90 - theta * 180 / np.pi])
    l, m = sh.gen_lm(lmax)
    spat = sh.AlmModel(l, m, real_output=True)
    spat.generate_Ylm(theta, phi, method="sphere", high_prec=False,
                      real=True)
    rng = np.random.default_rng(0)
    alm = np.zeros((1, 1, 2, len(l)))
    alm[0, 0, 0] = rng.normal(size=len(l)) * 2.0
    alm[0, 0, 0, 0] = 20.0
    alm[0, 0, 1] = -2.5
    R = PixelSkyResponse(freqs, spatial_mode="alm", freq_mode="powerlaw",
                         f0=float(freqs[0]), spat_LM=spat)
    sky = PixelSky(jnp.asarray(alm, dtype=bl._float()), angs,
                   hp.nside2pixarea(nside), R=R)
    beam = bl.PixelBeam(jnp.ones((1, 1, 1, 1, 2), dtype=bl._float()) * 14.0,
                        freqs, R=bl.beam_model.AiryResponse(), pol="e",
                        powerbeam=True, fov=180.0, parameter=False)
    times = jd0 + np.arange(1) * 5e-4
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs, pix_chunk=2048)

    # per-antenna complex gains as a real (re, im) pair view built with
    # HOST numpy (a complex64 host->device transfer fails on the axon
    # backend), refant fixed
    shape = (1, 1, len(ants), 1, nfreq)
    g0 = np.stack([np.ones(shape, np.float32),
                   np.zeros(shape, np.float32)], axis=-1)
    J = JonesModel(jnp.asarray(g0), ants, refant=ants[0])
    model = Sequential({"rime": rime, "cal": J})

    tgt_data = jax.jit(lambda mm: mm.forward().data)(model)
    noise = 1e-2
    tgt = bl.VisData()
    tgt.setup_meta(T, arr.to_antpos())
    icov_val = 1.0 / (2 * noise ** 2)
    tgt.setup_data(bls, times, freqs, pol="ee", data=tgt_data,
                   icov=jnp.full(tgt_data.shape, icov_val,
                                 dtype=jnp.float32))
    prob = LogProb(model, tgt, negate=True)
    pot = Potential(prob)
    x0 = prob.collect_main_params()
    nparam = int(sum(np.prod(np.shape(v)) for v in dict(x0).values()))

    hmc = HMC(pot, x0, eps=2e-5, Nstep=nstep, seed=1)
    t0 = time.time()
    hmc.sample(nwarm)
    compile_time = time.time() - t0

    t0 = time.time()
    hmc.sample(nsample)
    dt = time.time() - t0

    steps_per_s = nsample * nstep / dt
    # ESS from the energy chain (Geyer initial positive sequence)
    u = np.asarray(hmc.Usteps[-nsample:], dtype=np.float64)
    if len(u) >= 4 and np.std(u) > 0:
        uc = u - u.mean()
        ac = np.correlate(uc, uc, mode="full")[len(uc) - 1:]
        ac = ac / ac[0]
        tau = 1.0
        for k in range(1, len(ac) - 1, 2):
            pair = ac[k] + ac[k + 1]
            if pair < 0:
                break
            tau += 2 * pair
        ess = max(1.0, len(u) / tau)
    else:
        ess = float(len(u))
    sec_per_ess = dt / ess
    out = dict(steps_per_s=steps_per_s, sec_per_ess=sec_per_ess,
               ess=ess, accept=hmc.acceptance_rate, nbls=len(bls),
               nfreq=nfreq, nparam=nparam, compile_time=compile_time,
               step_time=dt / nsample)

    if nchain:
        # vectorized multi-chain A/B: same posterior, nchain chains x
        # nsample steps fused into ONE dispatch (HMC.sample_chains);
        # the first call compiles, the second reuses the cached runner
        t0 = time.time()
        hmc.sample_chains(nsample, Nchain=nchain, seed=2)
        chains_compile = time.time() - t0
        t0 = time.time()
        res = hmc.sample_chains(nsample, Nchain=nchain, seed=3)
        dtc = time.time() - t0
        out.update(
            nchain=nchain,
            chains_steps_per_s=nsample * nstep * nchain / dtc,
            chains_accept=float(np.mean(res["acceptance_rate"])),
            chains_compile=chains_compile,
            chains_run_time=dtc)
    return out


def a100_roofline_step(cfg, res):
    """Projected A100-80GB value_and_grad step time for this config from
    the reference algorithm's memory-bound floor (docs/performance.md
    "A100-equivalence roofline"): the torch inner loop
    (rime_model.py:423-429) materializes the complex64 fringe tensor
    through HBM (>=16 B/triple at 2.0 TB/s), and the backward
    re-materializes it for both cotangents (>=3 sweeps per step). A
    deterministic, defensible denominator — unlike the extrapolated
    CPU-torch loop (run_torch_baseline), whose host-load swings made
    vs_baseline fluctuate 4x between rounds."""
    nsim = cfg.get("nbls_sim", res["nbls"])
    triples = float(nsim) * cfg["nfreq"] * res["npix_cut"] * cfg["ntime"]
    return 3.0 * triples * 16.0 / 2.0e12


def run_torch_baseline(cfg, npix_cut, sub_pix=512, sub_bl=1024):
    """Reference-pattern inner loop in torch (CPU), pixel- and
    baseline-subsampled then linearly extrapolated (the fringe tensor is
    O(Nbl*Nf*Npix) and cannot be materialized at full scale -- which is
    itself the reference's scaling limit)."""
    import torch
    torch.set_default_dtype(torch.float32)
    # hex count
    n = cfg["hexN"]
    nant = sum(n + k for k in list(range(n)) + list(range(n - 2, -1, -1)))
    nbl_data = nant * (nant - 1) // 2
    # redundant configs simulate only the unique baselines (the reference
    # would too, via sim_bls) and expand: extrapolate the fringe cost to
    # the SIMULATED count, while points counts the full data delivered
    nbl_full = cfg.get("nbls_sim", nbl_data)
    nbl = min(sub_bl, nbl_full)
    nf = cfg["nfreq"]
    nt = min(cfg["ntime"], 2)
    npix = min(sub_pix, npix_cut)

    rng = np.random.default_rng(0)
    freqs = torch.tensor(np.linspace(100e6, 200e6, nf), dtype=torch.float32)
    blvecs = torch.tensor(rng.uniform(-300, 300, (nbl, 3)), dtype=torch.float32)
    s = torch.tensor(rng.normal(size=(3, npix)), dtype=torch.float32)
    s = s / s.norm(dim=0, keepdim=True)
    amp = torch.tensor(rng.uniform(1, 10, npix), dtype=torch.float32,
                       requires_grad=True)
    beam = torch.tensor(rng.uniform(0, 1, (nf, npix)), dtype=torch.float32)
    data = torch.randn(nbl, nt, nf, dtype=torch.complex64)

    def step():
        vis = []
        for t in range(nt):
            psky = beam * amp  # (nf, npix)
            const = freqs[:, None] * (2j * np.pi / 2.99792458e8)
            fringe = ((blvecs @ s)[:, None, :] * const).exp()  # (nbl, nf, npix)
            vis.append(torch.sum(fringe * psky, dim=-1))
        vis = torch.stack(vis, dim=1)
        loss = torch.sum(torch.abs(vis - data) ** 2)
        loss.backward()
        amp.grad = None
        return loss

    t0 = time.time()
    nrep = 1
    for _ in range(nrep):
        step()
    dt = (time.time() - t0) / nrep
    # extrapolate to the full pixel/baseline/time counts
    dt_full = dt * (npix_cut / npix) * (nbl_full / nbl) * (cfg["ntime"] / nt)
    points = nbl_data * nf * cfg["ntime"]
    return dict(step_time=dt_full, points=points, pps=points / dt_full)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="on-device fused-Pallas vs XLA parity check "
                         "(scripts/kernel_check.py) instead of timing")
    ap.add_argument("--cpu", action="store_true")
    # default = hera-stat (VERDICT r4 #1): the production redundant-array
    # configuration at BASELINE array scale (331 ants / 54,615 delivered
    # baselines x 1024 freqs, sufficient-statistics solve) — the
    # representative number. 'large' remains available behind --size and
    # stays the default for --cpu drives (hera-stat is a TPU-scale
    # config).
    ap.add_argument("--size", default=None,
                    choices=["small", "medium", "large", "hera", "hera100",
                             "small-red", "medium-red", "large-red",
                             "hera-red", "hera100-red",
                             "hera-stat", "hera100-stat",
                             "hmc", "hmc-small"])
    ap.add_argument("--hvp", action="store_true",
                    help="second-order (HVP) benchmark on the given size")
    ap.add_argument("--nchain", type=int, default=0,
                    help="with --size hmc*: also run the vectorized "
                         "multi-chain sampler (HMC.sample_chains) at "
                         "this many chains and report its throughput")
    ap.add_argument("--ntime", type=int, default=None)
    ap.add_argument("--tbatch", type=int, default=None,
                    help="override time-minibatch size for batched sizes")
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="single-pass bf16 MXU contraction in the fused "
                         "kernels (~2e-3 relative vs the default 3-pass "
                         "compensated ~1.6e-5; see ops/rime_pallas.py "
                         "PRECISE_DOTS)")
    ap.add_argument("--no-baseline", action="store_true")
    ap.add_argument("--torch-baseline", action="store_true",
                    help="use the extrapolated CPU-torch loop as the "
                         "vs_baseline denominator (noisy, host-load "
                         "dependent) instead of the default A100 "
                         "roofline projection")
    ap.add_argument("--fwd-split", action="store_true",
                    help="force the forward-only timing loop (default "
                         "'auto': runs only when the train compile hit "
                         "the persistent cache, protecting a cold run's "
                         "wall budget)")
    ap.add_argument("--no-fwd-split", action="store_true",
                    help="never run the forward-only loop")
    ap.add_argument("--extra", metavar="PATH",
                    help="run the hera100-red and hera100-stat north "
                         "stars and write a JSON artifact (size, mode, "
                         "step, compile) to PATH for round-over-round "
                         "tracking")
    args = ap.parse_args()
    if args.size is None:
        args.size = "large" if args.cpu else "hera-stat"

    # Whole-run deadline (BENCH_TOTAL_DEADLINE_S, default 20 min, 0 =
    # off): the remote TPU tunnel intermittently stalls for multiple
    # minutes mid-run (measured: a 1-element fetch blocked 67 s; one
    # run sat >480 s inside a single fetch) — past the deadline, emit
    # the standard JSON line with value=null + an error field and exit
    # 3 so the driver records a parseable failure instead of timing the
    # process out with nothing on stdout (the round-3 rc=124 scar).
    deadline = float(os.environ.get("BENCH_TOTAL_DEADLINE_S", 1200))
    if deadline > 0 and not args.cpu:
        import threading

        def _too_long():
            msg = (f"bench exceeded BENCH_TOTAL_DEADLINE_S={deadline:.0f}s"
                   " — remote TPU tunnel stalled mid-run?")
            print(json.dumps({
                "metric": "RIME vis points/sec/chip "
                          "(bl*freq*time, fwd+grad step)",
                "value": None, "unit": "points/s", "vs_baseline": None,
                "error": msg}), flush=True)
            _note(f"FATAL: {msg}")
            os._exit(3)

        _timer = threading.Timer(deadline, _too_long)
        _timer.daemon = True  # must not keep a finished bench alive
        _timer.start()

    if args.fast:
        from bayeslim_tpu.ops.rime_pallas import set_precise_dots
        set_precise_dots(False)

    if args.extra:
        from bayeslim_tpu.ops.rime_pallas import PRECISE_DOTS
        out = {"kernel_mode": "precise" if PRECISE_DOTS[0] else "fast",
               "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S")}
        for size in ("hera100-red", "hera100-stat"):
            cfg = build_case(size)
            cfg["fwd_split"] = False
            t0 = time.time()
            res = run_jax(cfg, platform="cpu" if args.cpu else None,
                          x64=args.x64)
            out[size] = {
                "step_s": round(res["step_time"], 3),
                "compile_s": round(res["compile_time"], 1),
                "nbls": res["nbls"], "npix_cut": res["npix_cut"],
                "points": res["points"],
                "pps": round(res["pps"], 1),
                "wall_s": round(time.time() - t0, 1),
            }
            print(f"# extra {size}: step={res['step_time']:.3f}s "
                  f"compile={res['compile_time']:.1f}s", file=sys.stderr)
        with open(args.extra, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        return

    if args.check:
        sys.path.insert(0, "scripts")
        from kernel_check import run_checks
        results, failures = run_checks(
            platform="cpu" if args.cpu else None, quick=args.cpu)
        worst = max(v for errs in results.values() for v in errs.values())
        print(json.dumps({
            "metric": "fused-vs-XLA kernel parity "
                      "(max rel err, fwd+cotangents)",
            "value": worst, "unit": "relerr",
            "vs_baseline": 1.0 if not failures else 0.0}))
        sys.exit(1 if failures else 0)

    if args.size.startswith("hmc"):
        kw = dict(hexN=2, nfreq=16, nside=8, nsample=10) \
            if args.size == "hmc-small" else {}
        res = run_hmc_bench(platform="cpu" if args.cpu else None,
                            x64=args.x64, nchain=args.nchain, **kw)
        print(json.dumps({
            "metric": "joint-posterior HMC leapfrog steps/s "
                      "(alm sky + gains, RIME+Jones chain)",
            "value": round(res["steps_per_s"], 3),
            "unit": "steps/s",
            "vs_baseline": 0.0}))
        print(f"# size={args.size} nbls={res['nbls']} nfreqs={res['nfreq']} "
              f"nparam={res['nparam']} accept={res['accept']:.2f} "
              f"ESS={res['ess']:.1f} sec/ESS={res['sec_per_ess']:.2f} "
              f"traj={res['step_time']*1e3:.0f}ms "
              f"compile={res['compile_time']:.1f}s", file=sys.stderr)
        if args.nchain:
            print(f"# chains: nchain={res['nchain']} "
                  f"steps/s={res['chains_steps_per_s']:.1f} "
                  f"({res['chains_steps_per_s']/res['steps_per_s']:.2f}x "
                  f"sequential) accept={res['chains_accept']:.2f} "
                  f"run={res['chains_run_time']:.2f}s "
                  f"compile={res['chains_compile']:.1f}s",
                  file=sys.stderr)
        return

    cfg = build_case(args.size)
    if args.ntime:
        cfg["ntime"] = args.ntime
    if args.hvp:
        assert not cfg.get("tbatch"), "--hvp needs a non-time-batched size"
        res = run_hvp_bench(cfg, platform="cpu" if args.cpu else None,
                            x64=args.x64)
        print(json.dumps({
            "metric": "HVP wall-clock (XLA-recompute second-order path)",
            "value": round(res["t_hvp"], 4), "unit": "s/HVP",
            "vs_baseline": round(1.0 / res["penalty"], 3)}))
        print(f"# size={args.size} nparam={res['nparam']} "
              f"nbls={res['nbls']} npix_cut={res['npix_cut']} "
              f"HVP={res['t_hvp']*1e3:.1f}ms grad={res['t_vg']*1e3:.1f}ms "
              f"penalty={res['penalty']:.2f}x (vs 2x-grad kernel ideal) "
              f"compile: hvp={res['compile_hvp']:.1f}s "
              f"vg={res['compile_vg']:.1f}s", file=sys.stderr)
        return
    if args.tbatch:
        assert not cfg.get("stat"), \
            "-stat sizes run the whole time axis in one executable"
        cfg["tbatch"] = args.tbatch
    cfg["fwd_split"] = (False if args.no_fwd_split
                        else True if args.fwd_split else "auto")
    res = run_jax(cfg, platform="cpu" if args.cpu else None, x64=args.x64)

    vs = 0.0
    base_note = ""
    if args.torch_baseline:
        try:
            base = run_torch_baseline(cfg, res["npix_cut"],
                                      sub_pix=256 if cfg["nfreq"] >= 128 else 512)
            vs = res["pps"] / base["pps"]
            base_note = "# vs_baseline = extrapolated CPU-torch loop " \
                        "(noisy: host-load dependent)"
        except Exception as e:
            print(f"# torch baseline failed: {e}", file=sys.stderr)
    elif not args.no_baseline:
        a100 = a100_roofline_step(cfg, res)
        vs = a100 / res["step_time"]
        base_note = (f"# vs_baseline = projected A100 roofline step "
                     f"({a100:.3f}s, docs/performance.md) / measured "
                     f"step on this one chip")

    out = {
        "metric": "RIME vis points/sec/chip (bl*freq*time, fwd+grad step)",
        "value": round(res["pps"], 2),
        "unit": "points/s",
        "vs_baseline": round(vs, 3),
    }
    print(json.dumps(out))
    if base_note:
        print(base_note, file=sys.stderr)
    mode = "fast(bf16-1pass,2e-3)" if args.fast \
        else "precise(3pass,1.6e-5 default; --fast for 1.34x)"
    print(f"# kernel mode={mode}", file=sys.stderr)
    print(f"# size={args.size} nbls={res['nbls']} "
          f"nbls_sim={cfg.get('nbls_sim', res['nbls'])} nfreqs={cfg['nfreq']} "
          f"ntimes={cfg['ntime']} npix_cut={res['npix_cut']} "
          f"step={res['step_time']*1e3:.1f}ms "
          f"(fwd={res['fwd_time']*1e3:.1f}ms bwd={res['bwd_time']*1e3:.1f}ms) "
          f"fetch_floor={res['fetch']*1e3:.1f}ms "
          f"compile={res['compile_time']:.1f}s "
          f"(persistent cache {res.get('cache_note', 'n/a')})",
          file=sys.stderr)
    stg = res.get("stage", {})
    wins = res.get("windows")
    print("# stages: " + " ".join(f"{k}={v:.1f}s" for k, v in stg.items())
          + (f" windows={['%.3f' % w for w in wins]}" if wins else ""),
          file=sys.stderr)


if __name__ == "__main__":
    main()
