"""
Fused Pallas TPU kernels for the RIME pixel reduction.

Computes V[r, b] = sum_c ps[r, c] * exp(+/- 2 pi i f_r tau[b, c]) without
materializing the (Nbls, Nfreqs, Npix) fringe in HBM, where r indexes
stacked frequency rows (Nstack * Nfreqs: polarization / model-pair blocks
stacked on top of each other share the same frequency grid f_r = f0 +
(r % Nfreqs) df). This generalizes the reference's product-and-sum
(bayeslim/rime_model.py:423-429) to the TPU memory hierarchy.

Kernel design (v2, MXU-centric):

- Transposed layout: tau enters as tau_T (Npix, Nbls) [pixels on
  sublanes, baselines on lanes] so per-frequency contractions are native
  NN matmuls. tau_T is free upstream: it is the output of a matmul
  (s^T @ blvecs^T) and XLA folds the orientation into the producer.
- Phasor recurrence with G parallel chains: a VMEM scratch holds G
  consecutive frequency states C/S (G*tc, tb); each grid step seeds them
  from float32-exact mod-1 split products (ops/phase.py) and advances
  every chain by D^G per loop iteration. G independent chains keep the
  VPU pipeline full (the serial 2-term recurrence is latency-bound).
- The pixel contraction for G frequencies at once is a single MXU
  matmul: a block-diagonal lhs (G, G*tc) built from the psky rows times
  the (G*tc, tb) state scratch. Measured ~16T MAC/s on v5e vs ~0.6T for
  per-frequency matvecs.
- Grid (freq tiles, bl tiles, pix tiles), pixel tiles innermost: the
  (tf, tb) output block accumulates in VMEM across pixel tiles.

The backward pass runs two sweeps of the same machinery:
- dps[r, c] = sum_b ct[r? b] conj(E): the SAME forward kernel with the
  roles of baselines and pixels swapped (tau enters untransposed, again
  free) and the phasor conjugated.
- dtau via a dedicated kernel (`_dtau_kernel`): same G-chain phasor
  scratch, pure-VPU FMA accumulation, with the -sgn*2*pi*f_r factor
  pre-folded into the cotangent rows outside the kernel.

Multi-polarization (Npol x Npol blocks) and multi-model-pair (Nmp > 1,
mp_idx) cases are handled by stacking rows / grouping baselines in
rime_reduce (ops/rime_kernel.py); this module only sees 2D problems.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .phase import fringe_cycles, mod1

__all__ = ["rime_pallas_reduce", "rime_fused", "rime_fused_bs",
           "pallas_available", "set_precise_dots"]

# test hook: force interpret mode (CPU emulation) for all pallas calls
INTERPRET = False

# MXU contraction precision mode. True (default): 3-pass compensated
# bf16 products — ~1.6e-5 relative agreement with true-f32 (the
# correctness bar bench.py --check enforces), ~1.6x the kernel time.
# False: single-pass bf16 MXU (Mosaic's DEFAULT f32 rounding) — fastest,
# ~2e-3 relative on this cancellation-heavy reduction; use for
# throughput-critical exploratory optimization where forward/gradient
# noise at that level is immaterial. Set via set_precise_dots().
PRECISE_DOTS = [True]

# set once the mode has been baked into a traced kernel; lets
# set_precise_dots warn about a toggle that existing executables
# (LogProb._jit_cache, user jits) will NOT see
_MODE_TRACED = [False]


def set_precise_dots(precise: bool):
    """Toggle the fused kernels' MXU precision mode (see PRECISE_DOTS).

    Call BEFORE building/tracing any model (as bench.py does): the mode
    is read at trace time and baked into each compiled executable, and
    jit caches do not key on it — toggling after a trace leaves every
    already-compiled function on the old mode (a warning is emitted)."""
    precise = bool(precise)
    if _MODE_TRACED[0] and precise != PRECISE_DOTS[0]:
        import warnings
        warnings.warn(
            "set_precise_dots(%s) called after a fused kernel was "
            "already traced: existing compiled executables (including "
            "LogProb's jit cache) keep the previous precision mode; "
            "only newly traced functions pick up the change. Set the "
            "mode before building models." % precise, stacklevel=2)
    PRECISE_DOTS[0] = precise


def pallas_available():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _split_f32(f):
    """Split a float into (a, b, lo): a has <=12 mantissa bits scaled,
    a + b + lo == f in f64; used for exact mod-1 products in f32."""
    f = float(f)
    hi = np.float32(f)
    a = np.float32(np.floor(np.float64(hi) / 4096.0) * 4096.0)
    b = np.float32(np.float64(hi) - np.float64(a))
    lo = np.float32(f - float(hi))
    return float(a), float(b), float(lo)


def _seed_cycles(tau, split):
    """Exact mod-1 of f * tau for f split by _split_f32."""
    a, b, lo = split
    return mod1(mod1(a * tau) + mod1(b * tau) + lo * tau)


def _phase0(c0, c1, k0f):
    """mod1(c0 + k0*c1) with k0 an integer float <= ~4096, f32-exact:
    split c1 at 12 mantissa bits so k0*c1_hi is exact."""
    c1_hi = jnp.floor(c1 * 4096.0) * (1.0 / 4096.0)
    c1_lo = c1 - c1_hi
    return mod1(mod1(k0f * c1_hi) + mod1(k0f * c1_lo) + c0)


# v3 forward kernel (concat-chain, merged wide dots). False restores the
# v2 per-term block-diagonal dots for A/B. See _fwd_kernel docstring.
FWD_V3 = [True]

# ping-pong chain scratch (v3 only): alternate two chain scratches so
# the MXU dot of step j and the VPU advance j->j+1 touch different
# refs (no WAR hazard) and Mosaic may overlap them. Costs 2x chain
# VMEM. Experimental A/B flag; see _fwd_kernel docstring.
FWD_PP = [False]

# v4 inner pixel-chunk loop (round 5, attacking the 26% residual stage
# of the round-4 decomposition): fold several pixel tiles into ONE grid
# step's operand block and loop over them inside the kernel (statically
# unrolled), cutting the pixel grid dimension — and its per-step
# grid/DMA-issue overhead — by the chunk count. VMEM-budgeted by
# _pick_ki; ki == 1 (or False here) is exactly the v3 kernel.
#
# MEASURED NEUTRAL on v5e (round 5, large shape, one process,
# min-of-4): fast 7.44 ms ki=2 vs 7.47 ms ki=1; precise 9.94 vs
# 9.96 ms — i.e. per-grid-step overhead is <1% of the kernel, so the
# round-4 'residual' stage is NOT grid machinery (see
# docs/performance.md round-5 section: it is chain fill-store VMEM
# bandwidth the rotate-ablation had retained). Default OFF: zero gain
# does not buy the VMEM-OOM risk on untested shapes (the first ki=3
# attempt exceeded scoped vmem by 80K at the 16M limit) or the HLO
# change that invalidates warmed compilation-cache entries. Kept as an
# A/B flag with an interpret-mode equivalence test.
FWD_KI = [False]

# profiling hook (scripts/kernel_decompose.py): trace-time ablations of
# the v3 forward kernel to attribute time to seed/rotate/dot stages.
# Values: 'seed' (constant angles, no per-tile transcendentals),
# 'rotate' (no chain fill/advance rotations), 'dot' (skip the MXU
# contractions, accumulate a cheap placeholder). NEVER set in
# production — results are numerically wrong by construction.
_ABLATE = frozenset()


def _fwd_kernel_old(tau_ref, psr_ref, psi_ref, ore_ref, oim_ref, c_ref, s_ref,
                    *, f0_split, df_split, tf, nfp, nc, G, conj, ps_real,
                    out_imag, precise=True):
    """V(tf, tb) += sum over this pixel tile. Layout: tau (tc, tb),
    ps rows (tf, tc), out (tf, tb); G-chain phasor scratch (G*tc, tb).

    Precision: Mosaic's f32 MXU matmul at DEFAULT precision rounds both
    operands to bf16 (~2e-3 relative on this cancellation-heavy
    reduction — found by bench.py --check on v5e); Precision.HIGHEST
    fixes it but its 6-pass decomposition blows the 16M scoped-vmem
    limit (and measures slower than the hand-rolled scheme here). The
    contraction instead runs as a 3-pass compensated product
    a*b ~= a_hi*b_hi + a_hi*b_lo + a_lo*b_hi where the hi parts are
    TRUNCATED-to-bf16-valued f32 arrays (one bitmask, no lane
    repacking; the MXU's internal bf16 rounding of an already
    bf16-valued f32 operand is exact) and the lo residuals ride the
    MXU's internal rounding harmlessly (error ~2^-17). All arrays stay
    f32-typed, avoiding bf16 pack/unpack on the VPU."""
    if_ = pl.program_id(0)
    ic = pl.program_id(2)
    tc = tau_ref.shape[0]

    @pl.when(ic == 0)
    def _():
        ore_ref[:, :] = jnp.zeros_like(ore_ref)
        if out_imag:
            oim_ref[:, :] = jnp.zeros_like(oim_ref)

    tau = tau_ref[:, :]                            # (tc, tb)
    c0 = _seed_cycles(tau, f0_split)
    c1 = _seed_cycles(tau, df_split)
    sgn = -1.0 if conj else 1.0

    # frequency index of this tile's first row within its pol block
    k0f = ((if_ * tf) % nfp).astype(jnp.float32)
    ang0 = (2 * np.pi) * _phase0(c0, c1, k0f)
    angd = (2 * np.pi) * c1
    cosd = jnp.cos(angd)
    sind = sgn * jnp.sin(angd)

    # fill the G chain states: state g = phase at row k0 + g
    c_ref[pl.ds(0, tc), :] = jnp.cos(ang0)
    s_ref[pl.ds(0, tc), :] = sgn * jnp.sin(ang0)
    for g in range(1, G):
        cp = c_ref[pl.ds((g - 1) * tc, tc), :]
        sp = s_ref[pl.ds((g - 1) * tc, tc), :]
        c_ref[pl.ds(g * tc, tc), :] = cp * cosd - sp * sind
        s_ref[pl.ds(g * tc, tc), :] = sp * cosd + cp * sind

    # advance step D^G: exact mod-1 doubling of c1
    cg = c1
    gg = G
    while gg > 1:
        cg = mod1(2.0 * cg)
        gg //= 2
    angG = (2 * np.pi) * cg
    cosdG = jnp.cos(angG)
    sindG = sgn * jnp.sin(angG)

    eye = (jax.lax.broadcasted_iota(jnp.int32, (G, G, 1), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (G, G, 1), 1)
           ).astype(jnp.float32)

    def dot(a, b):
        # pinned DEFAULT (single-pass bf16): the kernel manages its own
        # precision via the compensated 3-pass scheme below, and the
        # package-level jax_default_matmul_precision=highest would
        # otherwise trigger the 6-pass decomposition that blows the 16M
        # scoped-vmem limit
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)

    def hi_lo(x):
        """x = hi + lo with hi exactly bf16-valued, both f32-typed
        (mantissa truncation by bitmask — no lane repacking)."""
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(
            u & jnp.uint32(0xFFFF0000), jnp.float32)
        return hi, x - hi

    def dot3(ah, al, bh, bl):
        return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))

    nj = tf // G

    def body(j, _):
        rows_r = psr_ref[pl.ds(j * G, G), :]       # (G, tc)
        if precise:
            rh, rl = hi_lo(rows_r)
            lhs_rh = (rh[:, None, :] * eye).reshape(G, G * tc)
            lhs_rl = (rl[:, None, :] * eye).reshape(G, G * tc)
            Ch, Cl = hi_lo(c_ref[:, :])
            Sh, Sl = hi_lo(s_ref[:, :])
            re = dot3(lhs_rh, lhs_rl, Ch, Cl)
            im = dot3(lhs_rh, lhs_rl, Sh, Sl) if out_imag else None
        else:
            lhs_r = (rows_r[:, None, :] * eye).reshape(G, G * tc)
            re = dot(lhs_r, c_ref[:, :])
            im = dot(lhs_r, s_ref[:, :]) if out_imag else None
        if not ps_real:
            rows_i = psi_ref[pl.ds(j * G, G), :]
            if precise:
                ih, il = hi_lo(rows_i)
                lhs_ih = (ih[:, None, :] * eye).reshape(G, G * tc)
                lhs_il = (il[:, None, :] * eye).reshape(G, G * tc)
                re = re - dot3(lhs_ih, lhs_il, Sh, Sl)
                if out_imag:
                    im = im + dot3(lhs_ih, lhs_il, Ch, Cl)
            else:
                lhs_i = (rows_i[:, None, :] * eye).reshape(G, G * tc)
                re = re - dot(lhs_i, s_ref[:, :])
                if out_imag:
                    im = im + dot(lhs_i, c_ref[:, :])
        ore_ref[pl.ds(j * G, G), :] += re
        if out_imag:
            oim_ref[pl.ds(j * G, G), :] += im

        @pl.when(j < nj - 1)
        def _():
            for g in range(G):
                cg_ = c_ref[pl.ds(g * tc, tc), :]
                sg_ = s_ref[pl.ds(g * tc, tc), :]
                c_ref[pl.ds(g * tc, tc), :] = cg_ * cosdG - sg_ * sindG
                s_ref[pl.ds(g * tc, tc), :] = sg_ * cosdG + cg_ * sindG
        return 0

    jax.lax.fori_loop(0, nj, body, 0)


def _fwd_kernel(tau_ref, psr_ref, psi_ref, ore_ref, oim_ref, cs_ref,
                cs2_ref=None,
                *, f0_split, df_split, tf, nfp, nc, G, conj, ps_real,
                out_imag, precise=True, ki=1):
    """v3 forward kernel: V(tf, tb) += sum over this pixel tile.

    Same G-chain phasor recurrence as v2 (see _fwd_kernel_old), three
    efficiency changes (round-4, recovering the 3-pass compensated
    precision tax of the round-3 verdict):

    - The C and S chain states live CONCATENATED along lanes in one
      scratch (G*tc, 2*tb): [C | S]. A single dot against it yields both
      the cos and sin contractions at doubled N (better MXU pipelining,
      half the dot issues).
    - The compensated products are grouped by RHS instead of by output
      term: hi-parts of ALL psky rows ride ONE dot against the hi chain
      (lhs rows stacked [r; r_lo; i; i_lo], M = 2G or 4G), and the
      lo chain gets a second dot (lhs [r; i]). An M <= 128 matmul
      costs the same MXU time regardless of M, so stacking rows is free:
      12 M=8 dots (v2 complex) collapse to 2 dots, 6 (real psky) to 2.
    All arrays stay f32-typed (hi parts are truncated-to-bf16-VALUED f32
    via one bitmask; exactly-representable operands make the MXU's
    internal rounding an identity, so the scheme is independent of the
    hardware rounding mode). Alternatives measured on v5e and REJECTED
    (scripts/ab_kernel.py, round 4): implicit-hi dots with an astype-
    maintained lo scratch 11.13 ms, with an integer-RTNE lo scratch
    14.56 ms, vs 10.54 ms for this per-j bitmask split — bf16 astype
    costs sublane repacking and integer shift/add chains are slow on
    the VPU, while the bitmask split is 4 lane-local ops.
    """
    if_ = pl.program_id(0)
    ic = pl.program_id(2)
    tc = tau_ref.shape[0] // ki
    tb = ore_ref.shape[1]

    @pl.when(ic == 0)
    def _():
        ore_ref[:, :] = jnp.zeros_like(ore_ref)
        if out_imag:
            oim_ref[:, :] = jnp.zeros_like(oim_ref)

    sgn = -1.0 if conj else 1.0

    def store_state(g, half, x, ref=None):
        """Write chain state x (f32 values, in registers) for block g,
        lane half 0 (=C) or 1 (=S)."""
        ref = cs_ref if ref is None else ref
        ref[pl.ds(g * tc, tc), pl.ds(half * tb, tb)] = x

    def dot(a, b):
        # operands are bf16-valued f32 (precise: exact hi/lo pairs) or
        # f32 rounded to bf16 by the MXU (fast); precision is managed by
        # the compensated scheme; see _fwd_kernel_old
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)

    def hi_lo(x):
        """x = hi + lo with hi exactly bf16-valued, both f32-typed
        (mantissa truncation by bitmask — no lane repacking)."""
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(
            u & jnp.uint32(0xFFFF0000), jnp.float32)
        return hi, x - hi

    def bd(rows):
        """Stacked block-diagonal lhs: rows (S*G, tc) -> (S*G, G*tc)
        with row m's entries in contraction block m % G."""
        M = rows.shape[0]
        im_ = jax.lax.broadcasted_iota(jnp.int32, (M, G, 1), 0)
        ig_ = jax.lax.broadcasted_iota(jnp.int32, (M, G, 1), 1)
        mask = ((im_ % G) == ig_).astype(rows.dtype)
        return (rows[:, None, :] * mask).reshape(M, G * tc)

    # narrow mode: only the C half is contracted (real psky, no imag out)
    wide = out_imag or not ps_real
    nj = tf // G

    def run_chunk(kk):
        """Process pixel sub-chunk kk of this grid step's operand block
        (v4 inner pixel-chunk loop, statically unrolled: kk must be a
        python int — Mosaic rejects dynamic LANE slicing of the psky
        rows). ki == 1 reproduces the v3 kernel exactly."""
        lanes = slice(kk * tc, (kk + 1) * tc)
        tau = tau_ref[lanes, :]                    # (tc, tb)
        if "seed" in _ABLATE:
            ang0 = tau * 0.5
            cosd = tau
            sind = tau * sgn
            cosdG = tau
            sindG = tau * sgn
        else:
            c0 = _seed_cycles(tau, f0_split)
            c1 = _seed_cycles(tau, df_split)
            k0f = ((if_ * tf) % nfp).astype(jnp.float32)
            ang0 = (2 * np.pi) * _phase0(c0, c1, k0f)
            angd = (2 * np.pi) * c1
            cosd = jnp.cos(angd)
            sind = sgn * jnp.sin(angd)

        # fill the G chain states, C in the left half, S in the right
        cprev = jnp.cos(ang0) if "seed" not in _ABLATE else ang0
        sprev = sgn * jnp.sin(ang0) if "seed" not in _ABLATE else ang0
        if "stores" not in _ABLATE:
            store_state(0, 0, cprev)
            store_state(0, 1, sprev)
        for g in range(1, G):
            if "rotate" not in _ABLATE:
                cnew = cprev * cosd - sprev * sind
                snew = sprev * cosd + cprev * sind
            else:
                cnew, snew = cprev, sprev
            if "stores" not in _ABLATE:
                store_state(g, 0, cnew)
                store_state(g, 1, snew)
            cprev, sprev = cnew, snew

        if "seed" not in _ABLATE:
            # advance step D^G: exact mod-1 doubling of c1
            cg = c1
            gg = G
            while gg > 1:
                cg = mod1(2.0 * cg)
                gg //= 2
            angG = (2 * np.pi) * cg
            cosdG = jnp.cos(angG)
            sindG = sgn * jnp.sin(angG)
        return lanes, cosdG, sindG

    def step(j, src, dst, lanes, cosdG, sindG):
        rows_r = psr_ref[pl.ds(j * G, G), lanes]   # (G, tc)
        im = None
        if "dot" in _ABLATE:
            re = src[pl.ds(0, G), pl.ds(0, tb)] + rows_r[:, 0:1]
            if out_imag:
                im = re
        elif precise:
            cs = src[:, :] if wide else src[:, pl.ds(0, tb)]
            csh, csl = hi_lo(cs)
            if ps_real:
                rh, rl = hi_lo(rows_r)
                A = dot(bd(jnp.concatenate([rh, rl], axis=0)), csh)
                B = dot(bd(rh), csl)
                re = A[0:G, :tb] + A[G:2 * G, :tb] + B[0:G, :tb]
                if out_imag:
                    im = A[0:G, tb:] + A[G:2 * G, tb:] + B[0:G, tb:]
            else:
                rows_i = psi_ref[pl.ds(j * G, G), lanes]
                rh, rl = hi_lo(rows_r)
                ih, il = hi_lo(rows_i)
                A = dot(bd(jnp.concatenate([rh, rl, ih, il], axis=0)), csh)
                B = dot(bd(jnp.concatenate([rh, ih], axis=0)), csl)
                re = (A[0:G, :tb] + A[G:2 * G, :tb] + B[0:G, :tb]
                      - A[2 * G:3 * G, tb:] - A[3 * G:4 * G, tb:]
                      - B[G:2 * G, tb:])
                if out_imag:
                    im = (A[0:G, tb:] + A[G:2 * G, tb:] + B[0:G, tb:]
                          + A[2 * G:3 * G, :tb] + A[3 * G:4 * G, :tb]
                          + B[G:2 * G, :tb])
        else:
            cs = src[:, :] if wide else src[:, pl.ds(0, tb)]
            if ps_real:
                O = dot(bd(rows_r), cs)
                re = O[:, :tb]
                if out_imag:
                    im = O[:, tb:]
            else:
                rows_i = psi_ref[pl.ds(j * G, G), lanes]
                O = dot(bd(jnp.concatenate([rows_r, rows_i], axis=0)), cs)
                re = O[0:G, :tb] - O[G:2 * G, tb:]
                if out_imag:
                    im = O[0:G, tb:] + O[G:2 * G, :tb]
        ore_ref[pl.ds(j * G, G), :] += re
        if out_imag:
            oim_ref[pl.ds(j * G, G), :] += im

        if "rotate" not in _ABLATE:
            @pl.when(j < nj - 1)
            def _():
                for g in range(G):
                    cg_ = src[pl.ds(g * tc, tc), pl.ds(0, tb)]
                    sg_ = src[pl.ds(g * tc, tc), pl.ds(tb, tb)]
                    store_state(g, 0, cg_ * cosdG - sg_ * sindG, dst)
                    store_state(g, 1, sg_ * cosdG + cg_ * sindG, dst)

    for _kk in range(ki):
        _lanes, _cosdG, _sindG = run_chunk(_kk)
        if cs2_ref is not None:
            # ping-pong: the dot of step j (reads src) and the advance
            # j -> j+1 (writes dst) touch DIFFERENT scratches, removing
            # the WAR hazard that forces Mosaic to serialize MXU and VPU
            # work
            assert nj % 2 == 0, "ping-pong needs an even row-block count"

            def body2(jp, _, lanes=_lanes, cosdG=_cosdG, sindG=_sindG):
                step(2 * jp, cs_ref, cs2_ref, lanes, cosdG, sindG)
                step(2 * jp + 1, cs2_ref, cs_ref, lanes, cosdG, sindG)
                return 0

            jax.lax.fori_loop(0, nj // 2, body2, 0)
        else:
            def body(j, _, lanes=_lanes, cosdG=_cosdG, sindG=_sindG):
                step(j, cs_ref, cs_ref, lanes, cosdG, sindG)
                return 0

            jax.lax.fori_loop(0, nj, body, 0)


def _pad2(x, rows, cols):
    pr, pc = rows - x.shape[0], cols - x.shape[1]
    if pr or pc:
        x = jnp.pad(x, ((0, pr), (0, pc)))
    return x


def _choose_tf(nfp, budget):
    """Largest tile tf dividing nfp (tf % 8 == 0) with tf <= budget.
    _freq_params guarantees nfp > 1024 is a 128 multiple, so the halving
    always reaches the budget."""
    tf = nfp
    while tf > budget and tf % 16 == 0:
        tf //= 2
    return tf


def _pick_fwd_tiles(nbl, npx, nfp, ps_real, tb=256, tc=512, G=8,
                    budget=int(14.5 * 2 ** 20)):
    """Cost-aware forward-kernel tile choice. A small freq tile
    re-streams the (big) tau blocks NFp/tf times, so maximize tf first;
    then minimize the PADDED work round_up(NB,tb)*round_up(NC,tc) in
    waste buckets, with tile area breaking ties (pipeline efficiency).
    The bucket granularity is precision-mode dependent (measured on
    v5e): the single-pass mode uses 10% buckets — a <10% padding saving
    does not repay halving the tile area there (630 bls tb=128 -> -17%
    fwd time, but 1830 bls tb=128 -> +8%) — while the 3-pass compensated
    DEFAULT mode is MXU/issue-bound and prefers minimal padded work at
    5% granularity (1830 bls tb=128 measured 7% FASTER than tb=256;
    pinned in tests/test_pallas.py::test_fwd_tile_selection).
    Returns (G, tb, tc, tf)."""
    NB = _round_up(max(nbl, 128), 128)
    NC = _round_up(max(npx, 128), 128)

    def vmem(G, tc, tb, tf):
        scratch_bytes = 4 * 2 * G * tc * tb             # f32 [C|S] chain
        if FWD_V3[0] and FWD_PP[0]:
            scratch_bytes += 4 * 2 * G * tc * tb        # ping-pong copy
        if PRECISE_DOTS[0] and FWD_V3[0]:
            scratch_bytes += 2 * 4 * 2 * G * tc * tb    # hi/lo split temps
        blocks = (tc * tb                               # tau
                  + tf * tc * (1 if ps_real else 2)     # ps rows
                  + 2 * tf * tb)                        # out re/im
        # Mosaic stack temporaries (seed/trig intermediates, plus the
        # hi/lo split temps in v2 precise mode; ~12 vs ~6 live (tc, tb)
        # f32 arrays): calibrated against the compiler's scoped-vmem
        # accounting on v5e (16.02M measured vs 16.25M modeled at
        # tb=256, tc=512, tf=64 v2-precise). The v3 precise kernel's
        # per-j csh/csl materializations are counted as scratch-sized
        # temps above; its other stack temps match fast mode's.
        temps = (48 if PRECISE_DOTS[0] and not FWD_V3[0] else 24) * tc * tb
        return scratch_bytes + 4 * 2 * blocks + temps

    best = None
    for tbc, tcc in ((tb, tc), (256, 512), (256, 256), (512, 256),
                     (128, 512), (128, 256), (128, 128)):
        tbc, tcc = min(tbc, NB), min(tcc, NC)
        tfc = _choose_tf(nfp, 1024)
        while vmem(G, tcc, tbc, tfc) > budget and tfc > 128 \
                and tfc % 16 == 0:
            tfc //= 2
        if vmem(G, tcc, tbc, tfc) <= budget:
            padded = _round_up(NB, tbc) * _round_up(NC, tcc)
            # precise (3-pass) mode is VPU-issue-bound and benefits from
            # LESS padded work (measured: 1830 bls tb=128 7% faster than
            # tb=256); the single-pass mode pipelines better with larger
            # tiles (10% buckets keep its round-2 preferences)
            gran = 0.05 if PRECISE_DOTS[0] else 0.1
            waste_bucket = int(padded / (NB * NC) / gran)
            key = (tfc, -waste_bucket, tbc * tcc)
            if best is None or key > best[0]:
                best = (key, tbc, tcc, tfc)
    if best is not None:
        _, tb, tc, tf = best
        return G, tb, tc, tf
    tb, tc, tf = min(128, NB), min(128, NC), _choose_tf(nfp, 1024)
    while vmem(G, tc, tb, tf) > budget and tf > 128 and tf % 16 == 0:
        tf //= 2
    while vmem(G, tc, tb, tf) > budget and G > 2:
        G //= 2
    return G, tb, tc, tf


def _pick_ki(G, tb, tc, tf, NC, ps_real, budget=int(11.5 * 2 ** 20)):
    """Largest inner pixel-chunk count ki dividing the pixel-tile count
    whose grown operand blocks (tau (ki*tc, tb), psky rows (tf, ki*tc);
    both double-buffered by the Mosaic grid pipeline) still fit the
    scoped-vmem budget alongside the chain scratch. The budget is
    calibrated DOWN from the tile picker's 14.5M: at the large-fast
    shape ki=3 modeled 12.8M but the compiler's stack accounting hit
    16.08M (80K over the 16M limit) — the grown blocks carry ~3M of
    extra pipeline buffering the 24B/elem temp model misses."""
    nch = NC // tc
    if nch <= 1:
        return 1

    def vmem(ki):
        scratch = 4 * 2 * G * tc * tb
        if FWD_PP[0]:
            scratch += 4 * 2 * G * tc * tb
        if PRECISE_DOTS[0]:
            scratch += 2 * 4 * 2 * G * tc * tb
        blocks = (ki * tc * tb + tf * ki * tc * (1 if ps_real else 2)
                  + 2 * tf * tb)
        return scratch + 4 * 2 * blocks + 24 * tc * tb

    best = 1
    for ki in range(2, nch + 1):
        if nch % ki == 0 and vmem(ki) <= budget:
            best = ki
    return best


def _fwd_pallas(ps, tau_T, f0, df, nfp, conj=False, out_imag=True,
                tb=256, tc=512, interpret=False):
    """Run the forward kernel.

    ps : (R, Npix) real or complex; R = nstack * nfp (rows pre-padded)
    tau_T : (Npix, Nbls) float32
    Returns (out_re, out_im) with shape (R, Nbls) (out_im None if not
    out_imag).
    """
    R, npx = ps.shape
    nbl = tau_T.shape[1]
    assert tau_T.shape[0] == npx
    assert R % nfp == 0
    nstack = R // nfp

    ps_real = not jnp.iscomplexobj(ps)
    _MODE_TRACED[0] = True
    G, tb, tc, tf = _pick_fwd_tiles(nbl, npx, nfp, ps_real, tb=tb, tc=tc)
    NB = _round_up(_round_up(max(nbl, 128), 128), tb)
    NC = _round_up(_round_up(max(npx, 128), 128), tc)
    ki = _pick_ki(G, tb, tc, tf, NC, ps_real) \
        if FWD_V3[0] and FWD_KI[0] else 1

    tau_p = _pad2(tau_T.astype(jnp.float32), NC, NB)
    if ps_real:
        psr = _pad2(ps.astype(jnp.float32), R, NC)
        psi = psr[:1]  # dummy, unread
        psi_spec = pl.BlockSpec((1, ki * tc), lambda i, j, k: (0, k),
                                memory_space=pltpu.VMEM)
    else:
        psr = _pad2(ps.real.astype(jnp.float32), R, NC)
        psi = _pad2(ps.imag.astype(jnp.float32), R, NC)
        psi_spec = pl.BlockSpec((tf, ki * tc), lambda i, j, k: (i, k),
                                memory_space=pltpu.VMEM)

    grid = (R // tf, NB // tb, NC // (tc * ki))
    kfn = _fwd_kernel if FWD_V3[0] else _fwd_kernel_old
    kernel = functools.partial(
        kfn, f0_split=_split_f32(f0), df_split=_split_f32(df),
        tf=tf, nfp=nfp, nc=grid[2], G=G, conj=conj, ps_real=ps_real,
        out_imag=out_imag, precise=PRECISE_DOTS[0])
    if FWD_V3[0]:
        kernel = functools.partial(kernel, ki=ki)
        scratch = [pltpu.VMEM((G * tc, 2 * tb), jnp.float32)]
        if FWD_PP[0] and (tf // G) % 2 == 0:
            scratch += [pltpu.VMEM((G * tc, 2 * tb), jnp.float32)]
    else:
        scratch = [pltpu.VMEM((G * tc, tb), jnp.float32),
                   pltpu.VMEM((G * tc, tb), jnp.float32)]

    out_shape = [jax.ShapeDtypeStruct((R, NB), jnp.float32)] * 2
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ki * tc, tb), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tf, ki * tc), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            psi_spec,
        ],
        out_specs=[
            pl.BlockSpec((tf, tb), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tf, tb), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
        out_shape=out_shape,
        interpret=interpret or INTERPRET,
    )(tau_p, psr, psi)
    return out_re[:, :nbl], (out_im[:, :nbl] if out_imag else None)


def _dtau_kernel(tau_ref, psr_ref, psi_ref, ctr_ref, cti_ref, out_ref,
                 c_ref, s_ref, a_ref, *, f0_split, df_split, nfp, nf,
                 nstack, G, conj, ps_real):
    """dtau_T (tc, tb) = sum_r pr_c * (ctr_b * S + cti_b * C) [+ imag
    terms], with the -sgn*2*pi*f_r factor pre-folded into ctr/cti
    outside. Phasor chains as in the forward kernel; rows looped fully
    in-kernel per (pix, bl) block, re-seeded at each pol-block start."""
    tc = tau_ref.shape[0]
    tau = tau_ref[:, :]
    c0 = _seed_cycles(tau, f0_split)
    c1 = _seed_cycles(tau, df_split)
    sgn = -1.0 if conj else 1.0
    ang0 = (2 * np.pi) * c0
    angd = (2 * np.pi) * c1
    cosd = jnp.cos(angd)
    sind = sgn * jnp.sin(angd)
    cg = c1
    gg = G
    while gg > 1:
        cg = mod1(2.0 * cg)
        gg //= 2
    angG = (2 * np.pi) * cg
    cosdG = jnp.cos(angG)
    sindG = sgn * jnp.sin(angG)

    for g in range(G):
        a_ref[pl.ds(g * tc, tc), :] = jnp.zeros((tc, a_ref.shape[1]),
                                                jnp.float32)

    nj = nf // G
    for s_blk in range(nstack):
        # (re)seed the G chains at row 0 of this pol block
        c_ref[pl.ds(0, tc), :] = jnp.cos(ang0)
        s_ref[pl.ds(0, tc), :] = sgn * jnp.sin(ang0)
        for g in range(1, G):
            cp = c_ref[pl.ds((g - 1) * tc, tc), :]
            sp = s_ref[pl.ds((g - 1) * tc, tc), :]
            c_ref[pl.ds(g * tc, tc), :] = cp * cosd - sp * sind
            s_ref[pl.ds(g * tc, tc), :] = sp * cosd + cp * sind

        r0 = s_blk * nfp

        def body(j, _):
            for g in range(G):
                r = r0 + j * G + g
                pr = psr_ref[pl.ds(r, 1), :].reshape(-1, 1)   # (tc, 1)
                ctr = ctr_ref[pl.ds(r, 1), :]                  # (1, tb)
                cti = cti_ref[pl.ds(r, 1), :]
                C = c_ref[pl.ds(g * tc, tc), :]
                S = s_ref[pl.ds(g * tc, tc), :]
                # accumulate w_r * Im(ct ps E), w_r = -sgn 2 pi f_r folded
                # into ctr/cti (JAX passes the conjugate-convention
                # cotangent, so no conj on ct here); u = Re(ct ps),
                # v = Im(ct ps), Im(ct ps E) = u S + v C
                if ps_real:
                    t = ctr * S + cti * C
                    a_ref[pl.ds(g * tc, tc), :] += pr * t
                else:
                    pi_ = psi_ref[pl.ds(r, 1), :].reshape(-1, 1)
                    u = pr * ctr - pi_ * cti
                    v = pr * cti + pi_ * ctr
                    a_ref[pl.ds(g * tc, tc), :] += u * S + v * C

            @pl.when(j < nj - 1)
            def _():
                for g in range(G):
                    cg_ = c_ref[pl.ds(g * tc, tc), :]
                    sg_ = s_ref[pl.ds(g * tc, tc), :]
                    c_ref[pl.ds(g * tc, tc), :] = cg_ * cosdG - sg_ * sindG
                    s_ref[pl.ds(g * tc, tc), :] = sg_ * cosdG + cg_ * sindG
            return 0

        jax.lax.fori_loop(0, nj, body, 0)

    acc = a_ref[pl.ds(0, tc), :]
    for g in range(1, G):
        acc = acc + a_ref[pl.ds(g * tc, tc), :]
    out_ref[:, :] = acc


def _dtau_pallas(ct, ps, tau_T, f0, df, nfp, conj=False, tb=256, tc=256,
                 interpret=False):
    """tau cotangent, transposed: returns dtau_T (Npix, Nbls) float32.

    ct : (R, Nbls) complex cotangent rows (R = nstack * nfp, padded)
    ps : (R, Npix) real or complex psky rows
    tau_T : (Npix, Nbls) float32
    """
    R, npx = ps.shape
    nbl = tau_T.shape[1]
    nstack = R // nfp
    ps_real = not jnp.iscomplexobj(ps)
    sgn = -1.0 if conj else 1.0

    G = 8
    NB = _round_up(max(nbl, 128), 128)
    NC = _round_up(max(npx, 128), 128)
    tb = min(tb, NB)
    tc = min(tc, NC)

    def vmem(G, tc, tb):
        scratch = 3 * G * tc * tb                       # C, S, acc
        blocks = (tc * tb                               # tau
                  + R * tc * (1 if ps_real else 2)      # ps rows
                  + 2 * R * tb                          # ct rows
                  + tc * tb)                            # out
        return 4 * (scratch + 2 * blocks)               # double-buffered

    budget = 11 * 2 ** 20
    # shrink the G-chain scratch first: fewer chains on big tiles beats
    # more chains on latency-bound small tiles
    while vmem(G, tc, tb) > budget and G > 2:
        G //= 2
    while vmem(G, tc, tb) > budget and tb > 128:
        tb //= 2
    while vmem(G, tc, tb) > budget and tc > 128:
        tc //= 2
    NB = _round_up(NB, tb)
    NC = _round_up(NC, tc)

    # fold -sgn * 2 pi f_r into the cotangent rows (f_r = f0 + (r%nfp) df)
    k = jnp.arange(R, dtype=jnp.float32) % float(nfp)
    w = (-sgn * 2 * np.pi) * (f0 + k * df)
    ctr = _pad2((ct.real * w[:, None]).astype(jnp.float32), R, NB)
    cti = _pad2((ct.imag * w[:, None]).astype(jnp.float32), R, NB)

    tau_p = _pad2(tau_T.astype(jnp.float32), NC, NB)
    if ps_real:
        psr = _pad2(ps.astype(jnp.float32), R, NC)
        psi = psr[:1]
        psi_spec = pl.BlockSpec((1, tc), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM)
    else:
        psr = _pad2(ps.real.astype(jnp.float32), R, NC)
        psi = _pad2(ps.imag.astype(jnp.float32), R, NC)
        psi_spec = pl.BlockSpec((R, tc), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _dtau_kernel, f0_split=_split_f32(f0), df_split=_split_f32(df),
        nfp=nfp, nf=nfp, nstack=nstack, G=G, conj=conj, ps_real=ps_real)

    out = pl.pallas_call(
        kernel,
        grid=(NC // tc, NB // tb),
        in_specs=[
            pl.BlockSpec((tc, tb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tc), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            psi_spec,
            pl.BlockSpec((R, tb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, tb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G * tc, tb), jnp.float32),
            pltpu.VMEM((G * tc, tb), jnp.float32),
            pltpu.VMEM((G * tc, tb), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((NC, NB), jnp.float32),
        interpret=interpret or INTERPRET,
    )(tau_p, psr, psi, ctr, cti)
    return out[:npx, :nbl]


# ----------------------------------------------------------------- stacking
def _stack_pad(ps2d, nf, nfp):
    """(nstack*nf, Npix) -> (nstack*nfp, Npix) zero-padding each block."""
    if nf == nfp:
        return ps2d
    nstack = ps2d.shape[0] // nf
    x = ps2d.reshape(nstack, nf, -1)
    x = jnp.pad(x, ((0, 0), (0, nfp - nf), (0, 0)))
    return x.reshape(nstack * nfp, -1)


def _stack_unpad(out, nf, nfp):
    if nf == nfp:
        return out
    nstack = out.shape[0] // nfp
    return out.reshape(nstack, nfp, -1)[:, :nf].reshape(nstack * nf, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rime_fused(ps2d, tau, freqs_tuple, conj=False):
    """Differentiable fused RIME reduction on the Pallas kernels.

    ps2d : (nstack * Nfreqs, Npix) real or complex stacked psky rows
    tau : (Nbls, Npix) float32 geometric delays
    freqs_tuple : static tuple of the regular frequency grid
    Returns (nstack * Nfreqs, Nbls) complex64.
    """
    out, _ = _rime_fused_fwd(ps2d, tau, freqs_tuple, conj)
    return out


def _freq_params(freqs_tuple):
    freqs = np.asarray(freqs_tuple, dtype=np.float64)
    nf = len(freqs)
    f0 = float(freqs[0])
    df = float(freqs[1] - freqs[0]) if nf > 1 else 0.0
    nfp = _round_up(nf, 8)
    # large row counts must be tileable: an 8-but-not-16 multiple above
    # the VMEM freq-tile budget cannot halve, so pad to a 128 multiple
    # (padded rows are zeros; <= 6% extra work)
    if nfp > 1024 and nfp % 128:
        nfp = _round_up(nf, 128)
    return f0, df, nf, nfp


def _rime_fused_fwd(ps2d, tau, freqs_tuple, conj):
    f0, df, nf, nfp = _freq_params(freqs_tuple)
    ps_p = _stack_pad(ps2d, nf, nfp)
    out_re, out_im = _fwd_pallas(ps_p, tau.T, f0, df, nfp, conj=conj)
    out = jax.lax.complex(out_re, out_im)
    out = _stack_unpad(out, nf, nfp)
    return out, (ps2d, tau)


def _rime_fused_bwd(freqs_tuple, conj, res, ct):
    ps2d, tau = res
    f0, df, nf, nfp = _freq_params(freqs_tuple)
    ct_p = _stack_pad(ct, nf, nfp)
    ps_p = _stack_pad(ps2d, nf, nfp)

    # dps[r, c] = sum_b ct[r, b] E[b, c, f_r]: the forward kernel with
    # baselines <-> pixels swapped, SAME phasor sign (JAX hands custom_vjp
    # the conjugate-convention cotangent, so the usual conj(E) becomes E)
    ps_real = not jnp.iscomplexobj(ps2d)
    dre, dim = _fwd_pallas(ct_p, tau, f0, df, nfp, conj=conj,
                           out_imag=not ps_real)
    if ps_real:
        dps = dre
    else:
        dps = jax.lax.complex(dre, dim)
    dps = _stack_unpad(dps, nf, nfp).astype(ps2d.dtype)

    dtau_T = _dtau_pallas(ct_p, ps_p, tau.T, f0, df, nfp, conj=conj)
    return dps, dtau_T.T.astype(tau.dtype)


rime_fused.defvjp(_rime_fused_fwd, _rime_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def rime_fused_bs(ps2d, blvecs, s_c, freqs_tuple, conj=False):
    """rime_fused with the geometric delay factored: tau = blvecs @ s_c
    is (re)built inside both passes, so the (Nbls, Npix) delay matrix is
    a transient (never a stored VJP residual). Under a time scan this
    cuts backward memory from O(Ntimes * Nbls * Npix) to O(Npix).

    ps2d : (nstack * Nfreqs, Npix); blvecs : (Nbls, 3);
    s_c : (3, Npix) unit pointing vectors / c.
    Returns (nstack * Nfreqs, Nbls) complex64.
    """
    out, _ = _bs_fwd(ps2d, blvecs, s_c, freqs_tuple, conj)
    return out


# cap on transient delay-matrix elements (f32): chunk the pixel axis so
# no single (Nbls, chunk) buffer exceeds ~1 GB of HBM
_TAU_ELEM_BUDGET = 1 << 28


def _pix_chunks(nbl, npx):
    """Static pixel-chunk slices keeping nbl * chunk <= budget."""
    if nbl * npx <= _TAU_ELEM_BUDGET:
        return [slice(None)]
    chunk = max(128, (_TAU_ELEM_BUDGET // max(nbl, 1)) // 128 * 128)
    return [slice(i, min(i + chunk, npx)) for i in range(0, npx, chunk)]


def _bs_fwd(ps2d, blvecs, s_c, freqs_tuple, conj):
    f0, df, nf, nfp = _freq_params(freqs_tuple)
    ps_p = _stack_pad(ps2d, nf, nfp)
    out_re = out_im = None
    for sl in _pix_chunks(blvecs.shape[0], ps_p.shape[1]):
        tau_T = jnp.matmul(s_c[:, sl].T, blvecs.T,
                           precision=jax.lax.Precision.HIGHEST
                           ).astype(jnp.float32)
        re, im = _fwd_pallas(ps_p[:, sl], tau_T, f0, df, nfp, conj=conj)
        out_re = re if out_re is None else out_re + re
        out_im = im if out_im is None else out_im + im
    out = jax.lax.complex(out_re, out_im)
    return _stack_unpad(out, nf, nfp), (ps2d, blvecs, s_c)


def _bs_bwd(freqs_tuple, conj, res, ct):
    ps2d, blvecs, s_c = res
    f0, df, nf, nfp = _freq_params(freqs_tuple)
    ct_p = _stack_pad(ct, nf, nfp)
    ps_p = _stack_pad(ps2d, nf, nfp)
    ps_real = not jnp.iscomplexobj(ps2d)
    bv32 = blvecs.astype(jnp.float32)

    # pixel-chunked: the (Nbls, chunk) delay matrix and dtau cotangent
    # are transients, contracted to (Nbls, 3)/(3, chunk) immediately
    dps_parts, dblvecs, ds_parts = [], None, []
    for sl in _pix_chunks(blvecs.shape[0], ps_p.shape[1]):
        tau_T = jnp.matmul(s_c[:, sl].T, blvecs.T,
                           precision=jax.lax.Precision.HIGHEST
                           ).astype(jnp.float32)
        dtau_T = _dtau_pallas(ct_p, ps_p[:, sl], tau_T, f0, df, nfp,
                              conj=conj)
        db = jnp.matmul(s_c[:, sl].astype(jnp.float32), dtau_T,
                        precision=jax.lax.Precision.HIGHEST).T
        dblvecs = db if dblvecs is None else dblvecs + db
        ds_parts.append(jnp.matmul(
            dtau_T, bv32, precision=jax.lax.Precision.HIGHEST).T)

        # dps[r, c] = sum_b ct[r, b] E: role-swapped forward
        dre, dim = _fwd_pallas(ct_p, tau_T.T, f0, df, nfp, conj=conj,
                               out_imag=not ps_real)
        dps_parts.append(dre if ps_real else jax.lax.complex(dre, dim))

    dps = jnp.concatenate(dps_parts, axis=1)
    dps = _stack_unpad(dps, nf, nfp).astype(ps2d.dtype)
    ds_c = jnp.concatenate(ds_parts, axis=1).astype(s_c.dtype)
    return dps, dblvecs.astype(blvecs.dtype), ds_c


rime_fused_bs.defvjp(_bs_fwd, _bs_bwd)


# ------------------------------------------------------------ public compat
def rime_pallas_reduce(psky, tau, freqs, conj=False, tb=256, tc=256,
                       tf=None, interpret=False):
    """Fused RIME reduction (forward only).

    psky : (Nfreqs, Npix) float32 or complex64
    tau : (Nbls, Npix) float32
    freqs : (Nfreqs,) numpy, regular grid

    Returns (Nbls, Nfreqs) complex64.
    """
    freqs = np.asarray(freqs, dtype=np.float64)
    nb, npx = tau.shape
    nf = len(freqs)
    assert psky.shape == (nf, npx), (psky.shape, (nf, npx))
    f0 = float(freqs[0])
    df = float(freqs[1] - freqs[0]) if nf > 1 else 0.0
    assert nf == 1 or np.allclose(np.diff(freqs), df, rtol=1e-10), \
        "pallas kernel needs a regular frequency grid"
    nfp = _round_up(nf, 8)
    ps_p = _stack_pad(psky, nf, nfp)
    out_re, out_im = _fwd_pallas(ps_p, tau.T, f0, df, nfp, conj=conj,
                                 tb=tb, tc=tc, interpret=interpret)
    out = jax.lax.complex(out_re, out_im)
    return _stack_unpad(out, nf, nfp).T


def _chunk_forward(ps, tu, freqs, conj):
    """XLA forward of one pixel chunk: sum_c ps[f,c] E[b,f,c].

    Precision.HIGHEST: TPU default f32 matmuls are bf16-multiply."""
    cyc = fringe_cycles(tu, freqs)            # (B, C, F)
    ang = (2 * np.pi) * cyc
    s = -1.0 if conj else 1.0
    cosf, sinf = jnp.cos(ang), s * jnp.sin(ang)
    _es = functools.partial(jnp.einsum,
                            precision=jax.lax.Precision.HIGHEST)
    if jnp.iscomplexobj(ps):
        re = _es("fc,bcf->bf", ps.real, cosf) - \
            _es("fc,bcf->bf", ps.imag, sinf)
        im = _es("fc,bcf->bf", ps.real, sinf) + \
            _es("fc,bcf->bf", ps.imag, cosf)
    else:
        re = _es("fc,bcf->bf", ps, cosf)
        im = _es("fc,bcf->bf", ps, sinf)
    return jax.lax.complex(re, im)
