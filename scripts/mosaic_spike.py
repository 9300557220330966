#!/usr/bin/env python
"""Empirical spikes: which contraction shapes does Mosaic support/like on
this TPU? Times candidate inner ops for the RIME kernel redesign."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *args, n=400, label=""):
    try:
        out = f(*args)
        val = float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
        t0 = time.time()

        @jax.jit
        def loop(*a):
            def step(c, _):
                o = f(*[x + c * 0 for x in a])
                o = o if not isinstance(o, tuple) else o[0]
                return jnp.float32(jnp.real(o.ravel()[0])), None
            s, _ = jax.lax.scan(step, jnp.float32(0), None, length=n)
            return s
        float(loop(*args))
        t0 = time.time()
        float(loop(*args))
        dt = (time.time() - t0) / n * 1e3
        print(f"  {label:44s} {dt:8.3f} ms/iter")
    except Exception as e:
        print(f"  {label:44s} FAILED: {str(e)[:120]}")


TC, TB, G, NF = 256, 256, 8, 1024


def mk(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape), jnp.float32)


# 1. NN matvec-per-k loop: (1,TC)@(TC,TB) x NF inside one kernel
def k_nn(ps_ref, m_ref, o_ref):
    def body(j, _):
        pr = ps_ref[pl.ds(j, 1), :]
        row = jax.lax.dot_general(pr, m_ref[:, :], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[pl.ds(j, 1), :] += row
        return 0
    o_ref[:, :] = jnp.zeros_like(o_ref)
    jax.lax.fori_loop(0, NF, body, 0)


def run_nn(ps, m):
    return pl.pallas_call(
        k_nn, out_shape=jax.ShapeDtypeStruct((NF, TB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(ps, m)


# 2. NT dot: (1,TB)@(TC,TB) contracting lanes
def k_nt(ct_ref, m_ref, o_ref):
    def body(j, _):
        cr = ct_ref[pl.ds(j, 1), :]
        row = jax.lax.dot_general(cr, m_ref[:, :], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[pl.ds(j, 1), :] += row
        return 0
    o_ref[:, :] = jnp.zeros_like(o_ref)
    jax.lax.fori_loop(0, NF, body, 0)


def run_nt(ct, m):
    return pl.pallas_call(
        k_nt, out_shape=jax.ShapeDtypeStruct((NF, TC), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(ct, m)


# 3. vector reshape-transpose (1,TC)->(TC,1) then broadcast FMA, per k
def k_vt(ps_ref, m_ref, o_ref):
    def body(j, acc):
        pr = ps_ref[pl.ds(j, 1), :].reshape(-1, 1)     # (TC,1)
        return acc + pr * m_ref[:, :]
    o_ref[:, :] = jax.lax.fori_loop(
        0, NF, body, jnp.zeros((TC, TB), jnp.float32))


def run_vt(ps, m):
    return pl.pallas_call(
        k_vt, out_shape=jax.ShapeDtypeStruct((TC, TB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(ps, m)


# 4. lane reduction per k: sum over TB lanes -> (1,TC)? no: sum (TC,TB) ax1
def k_lr(ct_ref, m_ref, o_ref):
    def body(j, _):
        cr = ct_ref[pl.ds(j, 1), :]
        w = cr * m_ref[:, :]                            # (TC,TB)? broadcast
        s = jnp.sum(w, axis=1)                          # (TC,)
        o_ref[pl.ds(j, 1), :] += s.reshape(1, -1)
        return 0
    o_ref[:, :] = jnp.zeros_like(o_ref)
    jax.lax.fori_loop(0, NF, body, 0)


def run_lr(ct, m):
    return pl.pallas_call(
        k_lr, out_shape=jax.ShapeDtypeStruct((NF, TC), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(ct, m)


# 5. G-batched block-diag dot: (G, G*TC)@(G*TC, TB), NF/G iters
def k_bd(ps_ref, m_ref, o_ref, c_ref):
    eye = (jax.lax.broadcasted_iota(jnp.int32, (G, G, 1), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (G, G, 1), 1)
           ).astype(jnp.float32)

    for g in range(G):
        c_ref[pl.ds(g * TC, TC), :] = m_ref[:, :] * (1.0 + g)

    def body(j, _):
        rows = ps_ref[pl.ds(j * G, G), :]               # (G, TC)
        lhs = (rows[:, None, :] * eye).reshape(G, G * TC)
        out = jax.lax.dot_general(lhs, c_ref[:, :], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[pl.ds(j * G, G), :] += out
        return 0
    o_ref[:, :] = jnp.zeros_like(o_ref)
    jax.lax.fori_loop(0, NF // G, body, 0)


def run_bd(ps, m):
    return pl.pallas_call(
        k_bd, out_shape=jax.ShapeDtypeStruct((NF, TB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G * TC, TB), jnp.float32)])(ps, m)


# 6. pure rotation loop (the VPU floor): 2 arrays, 6 ops/elt/k
def k_rot(m_ref, o_ref):
    cd = m_ref[:, :] * 0.9
    sd = m_ref[:, :] * 0.1

    def body(j, carry):
        c, s = carry
        return (c * cd - s * sd, s * cd + c * sd)
    c, s = jax.lax.fori_loop(0, NF, body, (m_ref[:, :], m_ref[:, :] * 0.5))
    o_ref[:, :] = c + s


def run_rot(m):
    return pl.pallas_call(
        k_rot, out_shape=jax.ShapeDtypeStruct((TC, TB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(m)


if __name__ == "__main__":
    print(f"device={jax.devices()[0].device_kind} TC={TC} TB={TB} NF={NF} G={G}")
    ps = mk((NF, TC))
    ct = mk((NF, TB))
    m = mk((TC, TB))
    timeit(jax.jit(run_rot), m, label="rotation only (6 ops/elt VPU floor)")
    timeit(jax.jit(run_nn), ps, m, label="NN matvec (1,TC)@(TC,TB) per k")
    timeit(jax.jit(run_nt), ct, m, label="NT dot (1,TB)x(TC,TB) lanes per k")
    timeit(jax.jit(run_vt), ps, m, label="reshape (1,TC)->(TC,1) + FMA per k")
    timeit(jax.jit(run_lr), ct, m, label="bcast mul + lane-reduce per k")
    timeit(jax.jit(run_bd), ps, m, label="G-batch blockdiag dot per G freqs")


# 7. the candidate fwd inner loop: G rolling phasor states in scratch,
#    rotate each by D^G per j (independent chains), block-diag dot
def k_fwd(tau_ref, ps_ref, ore_ref, oim_ref, c_ref, s_ref):
    eye = (jax.lax.broadcasted_iota(jnp.int32, (G, G, 1), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (G, G, 1), 1)
           ).astype(jnp.float32)
    tau = tau_ref[:, :]
    # fake seeds (real kernel: mod-1 split products)
    cd = jnp.cos(tau)
    sd = jnp.sin(tau)
    cdg = jnp.cos(tau * G)
    sdg = jnp.sin(tau * G)
    # fill G initial states sequentially
    c_ref[pl.ds(0, TC), :] = jnp.ones_like(tau)
    s_ref[pl.ds(0, TC), :] = jnp.zeros_like(tau)
    for g in range(1, G):
        cp = c_ref[pl.ds((g - 1) * TC, TC), :]
        sp = s_ref[pl.ds((g - 1) * TC, TC), :]
        c_ref[pl.ds(g * TC, TC), :] = cp * cd - sp * sd
        s_ref[pl.ds(g * TC, TC), :] = sp * cd + cp * sd

    def body(j, _):
        rows = ps_ref[pl.ds(j * G, G), :]
        lhs = (rows[:, None, :] * eye).reshape(G, G * TC)
        re = jax.lax.dot_general(lhs, c_ref[:, :], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        im = jax.lax.dot_general(lhs, s_ref[:, :], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ore_ref[pl.ds(j * G, G), :] += re
        oim_ref[pl.ds(j * G, G), :] += im
        # advance all G states by D^G (independent chains)
        for g in range(G):
            cg = c_ref[pl.ds(g * TC, TC), :]
            sg = s_ref[pl.ds(g * TC, TC), :]
            c_ref[pl.ds(g * TC, TC), :] = cg * cdg - sg * sdg
            s_ref[pl.ds(g * TC, TC), :] = sg * cdg + cg * sdg
        return 0
    ore_ref[:, :] = jnp.zeros_like(ore_ref)
    oim_ref[:, :] = jnp.zeros_like(oim_ref)
    jax.lax.fori_loop(0, NF // G, body, 0)


def run_fwd(tau, ps):
    return pl.pallas_call(
        k_fwd,
        out_shape=[jax.ShapeDtypeStruct((NF, TB), jnp.float32)] * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[pltpu.VMEM((G * TC, TB), jnp.float32)] * 2)(tau, ps)


if __name__ == "__main__":
    timeit(jax.jit(run_fwd), mk((TC, TB)), mk((NF, TC)), n=400, label="candidate fwd loop (rot+2 bd-dots)")
