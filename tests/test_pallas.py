"""Pallas fused RIME kernels: parity vs the XLA path (interpret mode on
CPU; the compiled path is exercised by bench.py on real TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayeslim_tpu.ops import rime_pallas
from bayeslim_tpu.ops.rime_pallas import rime_pallas_reduce, _chunk_forward
from bayeslim_tpu.ops.rime_kernel import (rime_reduce, rime_reduce_ref,
                                          _pallas_eligible)


@pytest.fixture()
def interpret_mode():
    rime_pallas.INTERPRET = True
    yield
    rime_pallas.INTERPRET = False


def test_pallas_interpret_parity():
    rng = np.random.default_rng(0)
    nb, nf, npx = 48, 16, 512
    tau = jnp.asarray(rng.uniform(-1e-5, 1e-5, (nb, npx)), dtype=jnp.float32)
    ps = jnp.asarray(rng.normal(size=(nf, npx)), dtype=jnp.float32)
    freqs = np.linspace(100e6, 120e6, nf)
    ref = np.asarray(rime_reduce_ref(ps[None], tau, freqs))
    out = np.asarray(rime_pallas_reduce(ps, tau, freqs, tb=128, tc=128,
                                        interpret=True))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-4, f"pallas parity {err:.2e}"
    # conjugated
    refc = np.asarray(rime_reduce_ref(ps[None], tau, freqs, conj=True))
    outc = np.asarray(rime_pallas_reduce(ps, tau, freqs, tb=128, tc=128,
                                         conj=True, interpret=True))
    assert np.abs(outc - refc).max() / np.abs(refc).max() < 1e-4


def test_pallas_complex_psky():
    rng = np.random.default_rng(1)
    nb, nf, npx = 32, 8, 256
    tau = jnp.asarray(rng.uniform(-1e-5, 1e-5, (nb, npx)), dtype=jnp.float32)
    ps = jnp.asarray(rng.normal(size=(nf, npx)) +
                     1j * rng.normal(size=(nf, npx)), dtype=jnp.complex64)
    freqs = np.linspace(100e6, 110e6, nf)
    ref = np.asarray(rime_reduce_ref(ps[None], tau, freqs))
    out = np.asarray(rime_pallas_reduce(ps, tau, freqs, tb=128, tc=128,
                                        interpret=True))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4


def test_pallas_nonmultiple_freqs():
    """Nfreqs not a multiple of 8 exercises the row-padding path."""
    rng = np.random.default_rng(5)
    nb, nf, npx = 16, 5, 256
    tau = jnp.asarray(rng.uniform(-1e-5, 1e-5, (nb, npx)), dtype=jnp.float32)
    ps = jnp.asarray(rng.normal(size=(nf, npx)), dtype=jnp.float32)
    freqs = np.linspace(100e6, 110e6, nf)
    ref = np.asarray(rime_reduce_ref(ps[None], tau, freqs))
    out = np.asarray(rime_pallas_reduce(ps, tau, freqs, interpret=True))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4


def test_pallas_fused_grads(interpret_mode):
    """custom_vjp backward kernels (fused dtau + role-swapped dps) match
    jax.grad of the XLA reference path, real and complex psky."""
    rng = np.random.default_rng(2)
    nb, nf, npx = 24, 16, 256
    tau = jnp.asarray(rng.uniform(-1e-5, 1e-5, (nb, npx)), dtype=jnp.float32)
    freqs = np.linspace(100e6, 120e6, nf)
    ftup = tuple(freqs.tolist())
    ct = jnp.asarray(rng.normal(size=(nb, nf)) +
                     1j * rng.normal(size=(nb, nf)), dtype=jnp.complex64)

    for cplx in (False, True):
        if cplx:
            ps = jnp.asarray(rng.normal(size=(nf, npx)) +
                             1j * rng.normal(size=(nf, npx)),
                             dtype=jnp.complex64)
        else:
            ps = jnp.asarray(rng.normal(size=(nf, npx)), dtype=jnp.float32)
        for conj in (False, True):
            def loss_fused(p, t):
                out = rime_pallas.rime_fused(p, t, ftup, conj)   # (nf, nb)
                return jnp.sum(jnp.real(ct.T * out) +
                               2.0 * jnp.imag(ct.T * out))

            def loss_ref(p, t):
                out = rime_reduce_ref(p[None], t, freqs, conj=conj)
                return jnp.sum(jnp.real(ct * out) + 2.0 * jnp.imag(ct * out))

            g1 = jax.grad(loss_fused, argnums=(0, 1))(ps, tau)
            g2 = jax.grad(loss_ref, argnums=(0, 1))(ps, tau)
            for a, b, name in zip(g1, g2, ("dps", "dtau")):
                a, b = np.asarray(a), np.asarray(b)
                scale = np.abs(b).max() + 1e-30
                err = np.abs(a - b).max() / scale
                assert err < 2e-4, \
                    f"{name} cplx={cplx} conj={conj}: {err:.2e}"


def test_pallas_multipol_stack(interpret_mode):
    """(Npol, Npol, 1, Nf, Npix) psky runs on the fused kernel via row
    stacking and matches the XLA reference."""
    rng = np.random.default_rng(3)
    nb, nf, npx = 20, 8, 256
    tau = jnp.asarray(rng.uniform(-1e-5, 1e-5, (nb, npx)), dtype=jnp.float32)
    freqs = np.linspace(100e6, 110e6, nf)
    ps = jnp.asarray(rng.normal(size=(2, 2, 1, nf, npx)) +
                     1j * rng.normal(size=(2, 2, 1, nf, npx)),
                     dtype=jnp.complex64)
    ref = np.asarray(rime_reduce_ref(ps, tau, freqs))
    out = np.asarray(rime_reduce(ps, tau, freqs, use_pallas=True))
    assert out.shape == ref.shape == (2, 2, nb, nf)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4


def test_pallas_mp_idx_groups(interpret_mode):
    """Nmp > 1 with an mp_idx baseline->pair map groups baselines and
    inverse-permutes; values match the XLA reference."""
    rng = np.random.default_rng(4)
    nb, nf, npx, nmp = 21, 8, 256, 3
    tau = jnp.asarray(rng.uniform(-1e-5, 1e-5, (nb, npx)), dtype=jnp.float32)
    freqs = np.linspace(100e6, 110e6, nf)
    mp_idx = rng.integers(0, nmp, nb).astype(np.int32)
    ps = jnp.asarray(rng.normal(size=(1, 1, nmp, nf, npx)), jnp.float32)
    ref = np.asarray(rime_reduce_ref(ps, tau, freqs, mp_idx=mp_idx))
    out = np.asarray(rime_reduce(ps, tau, freqs, mp_idx=mp_idx,
                                 use_pallas=True))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4
    # gradients flow through the grouping (gather/concat/permute)
    def loss(p):
        o = rime_reduce(p, tau, freqs, mp_idx=mp_idx, use_pallas=True)
        return jnp.sum(jnp.abs(o) ** 2)
    def loss_ref(p):
        o = rime_reduce_ref(p, tau, freqs, mp_idx=mp_idx)
        return jnp.sum(jnp.abs(o) ** 2)
    g1 = np.asarray(jax.grad(loss)(ps))
    g2 = np.asarray(jax.grad(loss_ref)(ps))
    assert np.abs(g1 - g2).max() / (np.abs(g2).max() + 1e-30) < 2e-4


def test_pallas_mp_idx_device(interpret_mode):
    """A DEVICE (traced) mp_idx takes the masked-sum dispatch path
    (bl-sharded shard_map cannot bake per-shard host groupings): values
    and gradients match the host-metadata grouping exactly."""
    rng = np.random.default_rng(11)
    nb, nf, npx, nmp = 21, 8, 256, 3
    tau = jnp.asarray(rng.uniform(-1e-5, 1e-5, (nb, npx)), dtype=jnp.float32)
    freqs = np.linspace(100e6, 110e6, nf)
    mp_np = rng.integers(0, nmp, nb).astype(np.int32)
    mp_dev = jnp.asarray(mp_np)
    ps = jnp.asarray(rng.normal(size=(1, 1, nmp, nf, npx)), jnp.float32)
    out_host = np.asarray(rime_reduce(ps, tau, freqs, mp_idx=mp_np,
                                      use_pallas=True))
    out_dev = np.asarray(rime_reduce(ps, tau, freqs, mp_idx=mp_dev,
                                     use_pallas=True))
    assert np.abs(out_dev - out_host).max() / np.abs(out_host).max() < 1e-6

    def loss(p, idx):
        o = rime_reduce(p, tau, freqs, mp_idx=idx, use_pallas=True)
        return jnp.sum(jnp.abs(o) ** 2)

    g1 = np.asarray(jax.grad(loss)(ps, mp_dev))
    g2 = np.asarray(jax.grad(loss)(ps, mp_np))
    assert np.abs(g1 - g2).max() / (np.abs(g2).max() + 1e-30) < 1e-6


def test_chunk_forward_vjp_matches_xla_grad():
    """The XLA-fallback backward (chunked auto-VJP) == direct jax.grad of
    the XLA reference path."""
    rng = np.random.default_rng(2)
    nb, nf, npx = 8, 4, 64
    tau = jnp.asarray(rng.uniform(-1e-5, 1e-5, (nb, npx)))
    ps = jnp.asarray(rng.normal(size=(nf, npx)))
    freqs = np.linspace(100e6, 110e6, nf)

    def loss_ref(p, t):
        return jnp.sum(jnp.abs(rime_reduce_ref(p[None], t, freqs)) ** 2)

    def loss_chunk(p, t):
        return jnp.sum(jnp.abs(_chunk_forward(p, t, freqs, False)) ** 2)

    g1 = jax.grad(loss_ref, argnums=(0, 1))(ps, tau)
    g2 = jax.grad(loss_chunk, argnums=(0, 1))(ps, tau)
    for a, b in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_pallas_eligibility():
    ps32 = jnp.ones((1, 1, 1, 4, 64), dtype=jnp.float32)
    freqs = np.linspace(100e6, 110e6, 4)
    # forced True passes shape checks regardless of backend
    assert _pallas_eligible(ps32, None, freqs, True)
    # mp_idx now eligible (baseline grouping)
    assert _pallas_eligible(jnp.ones((1, 1, 3, 4, 64), jnp.float32),
                            np.zeros(3, np.int32), freqs, True)
    # multi-pol now eligible (row stacking)
    ps4 = jnp.ones((2, 2, 1, 4, 64), dtype=jnp.float32)
    assert _pallas_eligible(ps4, None, freqs, True)
    # per-baseline psky without mp_idx disqualifies
    assert not _pallas_eligible(jnp.ones((1, 1, 3, 4, 64), jnp.float32),
                                None, freqs, True)
    # irregular freqs disqualify
    f2 = np.asarray([1e8, 1.1e8, 1.3e8, 1.4e8])
    assert not _pallas_eligible(ps32, None, f2, True)
    # f64 disqualifies
    ps64 = jnp.ones((1, 1, 1, 4, 64), dtype=jnp.float64)
    assert not _pallas_eligible(ps64, None, freqs, True)


def test_pallas_fused_bs_grads(interpret_mode):
    """rime_fused_bs (factored blvecs @ s_c delays) matches values and
    gradients of the XLA reference, including d/dblvecs."""
    rng = np.random.default_rng(6)
    nb, nf, npx = 16, 8, 256
    blvecs = jnp.asarray(rng.uniform(-100, 100, (nb, 3)), jnp.float32)
    s_c = jnp.asarray(rng.normal(size=(3, npx)), jnp.float32) / 3e8
    freqs = np.linspace(100e6, 110e6, nf)
    ftup = tuple(freqs.tolist())
    ps = jnp.asarray(rng.normal(size=(nf, npx)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(nb, nf)) +
                     1j * rng.normal(size=(nb, nf)), jnp.complex64)

    def loss_bs(p, bv):
        out = rime_pallas.rime_fused_bs(p, bv, s_c, ftup, False)
        return jnp.sum(jnp.real(ct.T * out) + 2.0 * jnp.imag(ct.T * out))

    def loss_ref(p, bv):
        out = rime_reduce_ref(p[None], bv @ s_c, freqs)
        return jnp.sum(jnp.real(ct * out) + 2.0 * jnp.imag(ct * out))

    v1 = loss_bs(ps, blvecs)
    v2 = loss_ref(ps, blvecs)
    assert np.allclose(float(v1), float(v2), rtol=1e-4)
    g1 = jax.grad(loss_bs, argnums=(0, 1))(ps, blvecs)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(ps, blvecs)
    for a, b, name in zip(g1, g2, ("dps", "dblvecs")):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
        assert err < 2e-4, f"{name}: {err:.2e}"


def test_pallas_bs_pixel_chunking(interpret_mode, monkeypatch):
    """With a tiny tau budget the bs-form splits the pixel axis into
    chunks; values and gradients are unchanged."""
    monkeypatch.setattr(rime_pallas, "_TAU_ELEM_BUDGET", 16 * 128)
    rng = np.random.default_rng(7)
    nb, nf, npx = 16, 8, 384
    blvecs = jnp.asarray(rng.uniform(-100, 100, (nb, 3)), jnp.float32)
    s_c = jnp.asarray(rng.normal(size=(3, npx)), jnp.float32) / 3e8
    freqs = np.linspace(100e6, 110e6, nf)
    ftup = tuple(freqs.tolist())
    ps = jnp.asarray(rng.normal(size=(nf, npx)), jnp.float32)
    assert len(rime_pallas._pix_chunks(nb, npx)) > 1

    out = rime_pallas.rime_fused_bs(ps, blvecs, s_c, ftup, False)
    ref = rime_reduce_ref(ps[None], blvecs @ s_c, freqs)
    assert np.abs(np.asarray(out.T) - np.asarray(ref)).max() \
        / np.abs(ref).max() < 1e-4

    def loss(p, bv):
        o = rime_pallas.rime_fused_bs(p, bv, s_c, ftup, False)
        return jnp.sum(jnp.abs(o) ** 2)

    def loss_ref(p, bv):
        o = rime_reduce_ref(p[None], bv @ s_c, freqs)
        return jnp.sum(jnp.abs(o) ** 2)

    g1 = jax.grad(loss, argnums=(0, 1))(ps, blvecs)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(ps, blvecs)
    for a, b in zip(g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / (np.abs(b).max() + 1e-30) < 2e-4


def test_pallas_odd_large_freq_count():
    """Nfreqs whose 8-padded count is a poor power-of-two multiple
    (e.g. 1025 -> 1032) must still tile: _freq_params pads to a 128
    multiple and values match the XLA reference."""
    rng = np.random.default_rng(8)
    nb, nf, npx = 8, 1025, 128
    tau = jnp.asarray(rng.uniform(-1e-6, 1e-6, (nb, npx)), jnp.float32)
    ps = jnp.asarray(rng.normal(size=(nf, npx)), jnp.float32)
    freqs = np.linspace(100e6, 200e6, nf)
    from bayeslim_tpu.ops.rime_pallas import _freq_params
    f0, df, nf_, nfp = _freq_params(tuple(freqs.tolist()))
    assert nfp % 128 == 0 and nfp >= nf
    ref = np.asarray(rime_reduce_ref(ps[None], tau, freqs))
    out = np.asarray(rime_pallas_reduce(ps, tau, freqs, interpret=True))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-4


def test_fwd_tile_selection():
    """Padding-aware tile choice: baseline counts far from a 256
    multiple drop to a 128-lane tile (>=10% padded-work saving); near
    multiples keep the larger tile."""
    from bayeslim_tpu.ops.rime_pallas import _pick_fwd_tiles, _round_up
    from bayeslim_tpu.ops import rime_pallas as _rp
    # 630 bls: tb=256 pads to 768 (22% waste) -> choose 128 (640)
    G, tb, tc, tf = _pick_fwd_tiles(630, 6144, 1024, True)
    assert tb == 128 and tf == 1024
    # precise (default) mode: VPU-issue-bound, prefers minimal padded
    # work -> 1830 bls drops to tb=128 (measured 7% faster on v5e)
    G, tb, tc, tf = _pick_fwd_tiles(1830, 6144, 128, True)
    assert tb == 128
    # fast (single-pass) mode pipelines better with larger tiles:
    # 256->2048 is only 6.7% over 1920 -> keep 256
    _rp.PRECISE_DOTS[0] = False
    try:
        G, tb, tc, tf = _pick_fwd_tiles(1830, 6144, 128, True)
        assert tb == 256
    finally:
        _rp.PRECISE_DOTS[0] = True
    # tf always maximized first (re-streams tau otherwise)
    for nbl in (128, 630, 2000, 54615):
        G, tb, tc, tf = _pick_fwd_tiles(nbl, 6144, 128, True)
        assert tf == 128
    # complex psky fits the calibrated scoped-vmem budget too
    G, tb, tc, tf = _pick_fwd_tiles(630, 6144, 1024, False)
    scratch_bytes = 4 * 2 * G * tc * tb
    blocks = tc * tb + tf * tc * 2 + 2 * tf * tb
    assert scratch_bytes + 8 * blocks + 48 * tc * tb \
        <= int(14.5 * 2 ** 20)


def test_pallas_tb128_parity():
    """A baseline count that triggers the 128-lane tile path agrees with
    the XLA reference (interpret mode runs the same tile selection)."""
    rng = np.random.default_rng(9)
    nb, nf, npx = 140, 8, 256   # NB=256: tb=256 pads 84%, tb=128 -> 256?
    # force a genuinely small-tile case: NB=round_up(140,128)=256 either
    # way; use 300 -> NB0=384; tb=256 pads to 512 (33%), tb=128 exact
    nb = 300
    tau = jnp.asarray(rng.uniform(-1e-5, 1e-5, (nb, npx)), dtype=jnp.float32)
    ps = jnp.asarray(rng.normal(size=(nf, npx)), dtype=jnp.float32)
    freqs = np.linspace(100e6, 110e6, nf)
    from bayeslim_tpu.ops.rime_pallas import _pick_fwd_tiles, _round_up
    # NB0 = 384: the chosen tile tiles it with no padded work (128 or a
    # clamped 384 both qualify; 256 would pad to 512)
    tb = _pick_fwd_tiles(nb, npx, 8, True)[1]
    assert _round_up(384, tb) == 384, tb
    ref = np.asarray(rime_reduce_ref(ps[None], tau, freqs))
    out = np.asarray(rime_pallas_reduce(ps, tau, freqs, interpret=True))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4


def test_pallas_inner_pixel_chunks():
    """v4 inner pixel-chunk loop (FWD_KI): ki > 1 folds several pixel
    tiles into one grid step; accumulation order is chunk-sequential,
    identical to the ki == 1 grid order, so results are bit-identical,
    and both match the XLA reference."""
    rng = np.random.default_rng(7)
    nb, nf, npx = 40, 16, 1024
    tau = jnp.asarray(rng.uniform(-1e-5, 1e-5, (nb, npx)), jnp.float32)
    ps = jnp.asarray(rng.normal(size=(nf, npx)), jnp.float32)
    freqs = np.linspace(100e6, 120e6, nf)
    # tc=128 on NC=1024 -> 8 pixel tiles; _pick_ki folds them
    from bayeslim_tpu.ops.rime_pallas import _pick_ki
    assert _pick_ki(8, 128, 128, 16, 1024, True) > 1
    saved = rime_pallas.FWD_KI[0]
    try:
        rime_pallas.FWD_KI[0] = True
        out_ki = np.asarray(rime_pallas_reduce(ps, tau, freqs, tb=128,
                                               tc=128, interpret=True))
        rime_pallas.FWD_KI[0] = False
        out_1 = np.asarray(rime_pallas_reduce(ps, tau, freqs, tb=128,
                                              tc=128, interpret=True))
    finally:
        rime_pallas.FWD_KI[0] = saved
    assert np.array_equal(out_ki, out_1)
    ref = np.asarray(rime_reduce_ref(ps[None], tau, freqs))
    assert np.abs(out_ki - ref).max() / np.abs(ref).max() < 1e-4
