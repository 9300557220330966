#!/usr/bin/env python
"""
On-device end-to-end error budget (VERDICT r4 #2).

Runs the FULL posterior loss + gradient for the three graded-config
shapes (BASELINE.md / tests/test_reference_parity.py:804-1095):

  config1: point-source powerlaw sky x Gaussian power beam -> RIME
           -> LogProb (sky + beam gradients)
  config2: diffuse a_lm sky (complex alm via viewreal, channel freqs)
           x Gaussian beam -> RIME -> LogProb (alm gradients)
  config3: Sequential(RIME -> JonesModel 1pol complex gains) -> LogProb
           (sky + gain gradients)

on the axon TPU in f32 (the shipping precise-kernel default) AND on CPU
x64, and records the per-config max relative gradient error and relative
loss error. The x64 CPU values are themselves pinned against the actual
reference to 1e-9 (test_reference_parity.py), so this artifact closes
the loop: reference -> x64 -> on-device f32.

The whole-chain bar is the reference's optim.py:385-1389 gradient path.

Usage:
  python scripts/errbudget.py run --config config1 --platform cpu --x64 \
      --out /tmp/c1_cpu.npz
  python scripts/errbudget.py compare --out ERRBUDGET_r05.json
      (spawns the six runs itself, then assembles the artifact)

Axon constraints honored: complex64 transfers fail BOTH directions, so
the target visibilities cross host<->device as (real, imag) float planes
and are joined with lax.complex inside jit; every gradient leaf here is
real (viewreal parameterizations), so gradient fetches are plain floats.
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

CONFIGS = ("config1", "config2", "config3")


def _inputs(config):
    """Host-numpy inputs, identical for every backend/precision."""
    rng = np.random.default_rng(12 if config == "config1" else
                                14 if config == "config2" else 13)
    loc = (21.42827, -30.72148, 1051.69)
    out = dict(loc=loc)
    if config == "config1":
        nsrc, nfreq, ntime = 6, 4, 2
    elif config == "config2":
        nfreq, ntime = 3, 2
        npix = 96
    else:
        nsrc, nfreq, ntime = 4, 3, 2
    out["freqs"] = np.linspace(120e6, 130e6, nfreq)
    out["times"] = 2458148.15 + np.arange(ntime) * 1e-3
    # the sky geometry needs RA near the zenith at times[0]; compute it
    # with a throwaway TelescopeModel on whatever backend is active
    import bayeslim_tpu as bl
    T = bl.TelescopeModel(loc)
    ra0 = T.JD2RA(float(out["times"][0]))
    if config == "config2":
        ra = ra0 + rng.uniform(-25, 25, npix)
        dec = loc[1] + rng.uniform(-25, 25, npix)
        out["angs"] = np.stack([ra, dec])
        out["px_area"] = 4 * np.pi / (12 * 16 ** 2)
        from bayeslim_tpu.ops.sph_harm import gen_lm, gen_sph2pix
        l, m = gen_lm(4)
        theta = np.deg2rad(90 - dec)
        phi = np.deg2rad(ra)
        # REAL Ylm basis: a complex Ylm host matrix cannot be
        # host->device transferred on axon (generate_Ylm docstring);
        # the complex basis itself is parity-pinned on CPU x64 in
        # test_alm_sky_posterior_gradient_parity
        Y, _, am = gen_sph2pix(theta, phi, np.asarray(l, float),
                               np.asarray(m, float), real=True,
                               high_prec=False)
        out["lm"] = (np.asarray(l, float), np.asarray(m, float))
        out["Y"] = np.asarray(Y)
        out["am"] = None if am is None else np.asarray(am)
        out["alm"] = rng.normal(size=(1, 1, nfreq, len(l)))
    else:
        ra = ra0 + rng.uniform(-20 if config == "config1" else -15,
                               20 if config == "config1" else 15, nsrc)
        dec = loc[1] + rng.uniform(-20 if config == "config1" else -15,
                                   20 if config == "config1" else 15, nsrc)
        out["angs"] = np.stack([ra, dec])
        sky_params = np.zeros((1, 1, 2, nsrc))
        sky_params[0, 0, 0] = rng.uniform(1, 5, nsrc)
        sky_params[0, 0, 1] = -2.2
        out["sky_params"] = sky_params
    out["beam_params"] = np.full((1, 1, 1, nfreq, 2), 0.5)
    out["rng_noise"] = rng
    return out


def build_prob(config, dtype):
    """Build the posterior for `config` on the active jax backend."""
    import jax
    import jax.numpy as jnp
    import bayeslim_tpu as bl
    from bayeslim_tpu.utils import AntposDict

    inp = _inputs(config)
    loc, freqs, times = inp["loc"], inp["freqs"], inp["times"]
    ants, antvecs = bl.utils.make_hex(2)
    T = bl.TelescopeModel(loc)
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs)
    bls = [(a, b) for i, a in enumerate(ants) for b in ants[i + 1:]][
        :6 if config == "config2" else 8]
    beam_parameter = config == "config1"
    if config == "config2":
        # Airy beam (the graded config-2 shape): differentiable A&S J1
        # where the reference's torch J1 gradient is silently wrong
        beam = bl.PixelBeam(
            jnp.full((1, 1, 1, 1, 2), 14.0, dtype), freqs,
            R=bl.beam_model.AiryResponse(), pol="e", powerbeam=True,
            fov=180.0, parameter=False)
    else:
        beam = bl.PixelBeam(jnp.asarray(inp["beam_params"], dtype),
                            freqs, R=bl.beam_model.GaussResponse(),
                            pol="e", powerbeam=True, fov=180.0,
                            parameter=beam_parameter)

    if config == "config2":
        from bayeslim_tpu.ops.sph_harm import AlmModel
        l, m = inp["lm"]
        almmod = AlmModel(l, m, real_output=True)
        almmod.setup_Ylm(jnp.asarray(inp["Y"], dtype),
                         alm_mult=None if inp["am"] is None
                         else jnp.asarray(inp["am"], dtype))
        R = bl.sky_model.PixelSkyResponse(freqs, spatial_mode="alm",
                                          real_output=True,
                                          freq_mode="channel",
                                          spat_LM=almmod)
        sky = bl.PixelSky(
            jnp.asarray(inp["alm"], dtype),
            jnp.asarray(inp["angs"], dtype), inp["px_area"], R=R)
    else:
        sky = bl.PointSky(
            jnp.asarray(inp["sky_params"], dtype),
            jnp.asarray(inp["angs"], dtype),
            R=bl.sky_model.PointSkyResponse(freqs, freq_mode="powerlaw",
                                            f0=float(freqs[0])))
    rime = bl.RIME(sky, T, beam, arr, bls, times, freqs)
    if config == "config3":
        from bayeslim_tpu.models.calibration import JonesModel
        rng = np.random.default_rng(130)
        nant = len(ants)
        gains = (rng.normal(size=(1, 1, nant, len(times), len(freqs)))
                 * 0.05
                 + 1j * rng.normal(size=(1, 1, nant, len(times),
                                         len(freqs))) * 0.05 + 1.0)
        # build the (re, im) real view with HOST numpy: a complex host
        # array cannot be host->device transferred on axon
        gview = np.stack([gains.real, gains.imag], axis=-1)
        jones = JonesModel(jnp.asarray(gview, dtype), list(ants),
                           parameter=True, polmode="1pol")
        model = bl.utils.Sequential({"rime": rime, "cal": jones})
    else:
        model = rime

    # synthetic noisy target, defined in host float64 and shipped as
    # (re, im) planes (complex64 transfers fail on axon)
    rngn = np.random.default_rng(777)
    shp = (1, 1, len(bls), len(times), len(freqs))
    re = rngn.normal(size=shp) * 2.0
    im = rngn.normal(size=shp) * 2.0
    data = jax.jit(lambda a, b: jax.lax.complex(a, b))(
        jnp.asarray(re, dtype), jnp.asarray(im, dtype))
    tgt = bl.VisData()
    tgt.setup_meta(T, arr.to_antpos())
    tgt.setup_data(bls, times, freqs, pol="ee", data=data)
    return bl.LogProb(model, tgt)


def run_one(config, platform, x64, out_path):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    if x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    dtype = jnp.float64 if x64 else jnp.float32
    t0 = time.time()
    prob = build_prob(config, dtype)
    pd = prob.collect_main_params()
    v, g = prob.value_and_grad(pd)
    # fetch everything (the value fetch synchronizes on axon; gradient
    # leaves are real so plain np.asarray fetches work)
    loss = float(np.real(np.asarray(v)))
    grads = {k: np.asarray(g[k]) for k in g}
    np.savez(out_path, loss=loss,
             **{f"grad::{k}": v for k, v in grads.items()})
    print(f"# {config} [{platform or 'default'} "
          f"{'x64' if x64 else 'f32'}] loss={loss:.9e} "
          f"({time.time() - t0:.1f}s)", file=sys.stderr, flush=True)


def compare(out_path, platform="tpu"):
    """Spawn the six runs and assemble the artifact."""
    results = {}
    tmp = "/tmp/errbudget"
    os.makedirs(tmp, exist_ok=True)
    for config in CONFIGS:
        paths = {}
        for tag, (plat, x64) in {
                "device_f32": (None if platform == "tpu" else platform,
                               False),
                "cpu_x64": ("cpu", True)}.items():
            p = os.path.join(tmp, f"{config}_{tag}.npz")
            cmd = [sys.executable, os.path.abspath(__file__), "run",
                   "--config", config, "--out", p]
            if plat:
                cmd += ["--platform", plat]
            if x64:
                cmd += ["--x64"]
            # bound each child run: a down axon tunnel otherwise blocks
            # jax backend init forever (same scar as bench.py's
            # BENCH_INIT_DEADLINE_S)
            deadline = float(os.environ.get("ERRBUDGET_RUN_DEADLINE_S",
                                            1800))
            try:
                r = subprocess.run(cmd, cwd=_REPO, timeout=deadline)
            except subprocess.TimeoutExpired:
                raise SystemExit(
                    f"errbudget: {config}/{tag} exceeded {deadline:.0f}s "
                    "(axon tunnel down?) — no artifact written")
            assert r.returncode == 0, (config, tag)
            paths[tag] = p
        a = np.load(paths["device_f32"])
        b = np.load(paths["cpu_x64"])
        loss_rel = abs(float(a["loss"]) - float(b["loss"])) \
            / max(abs(float(b["loss"])), 1e-30)
        grad_rels = {}
        for k in b.files:
            if not k.startswith("grad::"):
                continue
            ga, gb = np.asarray(a[k], np.float64), np.asarray(b[k])
            grad_rels[k[6:]] = float(
                np.abs(ga - gb).max() / (np.abs(gb).max() + 1e-30))
        results[config] = {
            "loss_rel": loss_rel,
            "grad_max_rel": max(grad_rels.values()),
            "grad_rels": grad_rels,
            "loss_f32": float(a["loss"]), "loss_x64": float(b["loss"]),
        }
        print(f"# {config}: loss_rel={loss_rel:.3e} grad_max_rel="
              f"{results[config]['grad_max_rel']:.3e}", file=sys.stderr,
              flush=True)
    worst = max(r["grad_max_rel"] for r in results.values())
    artifact = {
        "metric": "on-device f32 whole-chain posterior gradient vs "
                  "CPU x64 (max rel err over configs)",
        "value": worst,
        "pass_1em4": bool(worst <= 1e-4),
        "device": platform,
        "kernel_mode": "precise-default",
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "configs": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"metric": artifact["metric"], "value": worst,
                      "pass_1em4": artifact["pass_1em4"]}))
    return artifact


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["run", "compare"])
    ap.add_argument("--config", choices=CONFIGS)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    if args.mode == "run":
        run_one(args.config, args.platform, args.x64, args.out)
    else:
        compare(args.out, platform=args.platform or "tpu")


if __name__ == "__main__":
    main()
