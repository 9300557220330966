"""Pallas fused RIME kernel: parity vs the XLA path (interpret mode on
CPU; the compiled path is exercised by bench.py on real TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayeslim_tpu.ops.rime_pallas import rime_pallas_reduce, _chunk_forward
from bayeslim_tpu.ops.rime_kernel import rime_reduce_ref, _pallas_eligible


def test_pallas_interpret_parity():
    rng = np.random.default_rng(0)
    nb, nf, npx = 48, 16, 512
    tau = jnp.asarray(rng.uniform(-1e-5, 1e-5, (nb, npx)), dtype=jnp.float32)
    ps = jnp.asarray(rng.normal(size=(nf, npx)), dtype=jnp.float32)
    freqs = np.linspace(100e6, 120e6, nf)
    ref = np.asarray(rime_reduce_ref(ps[None], tau, freqs))
    out = np.asarray(rime_pallas_reduce(ps, tau, freqs, tb=16, tc=128,
                                        interpret=True))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-4, f"pallas parity {err:.2e}"
    # conjugated
    refc = np.asarray(rime_reduce_ref(ps[None], tau, freqs, conj=True))
    outc = np.asarray(rime_pallas_reduce(ps, tau, freqs, tb=16, tc=128,
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
    out = np.asarray(rime_pallas_reduce(ps, tau, freqs, tb=16, tc=128,
                                        interpret=True))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4


def test_chunk_forward_vjp_matches_xla_grad():
    """The custom backward (chunked auto-VJP) == direct jax.grad of the
    XLA reference path."""
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
    # mp_idx disqualifies
    assert not _pallas_eligible(ps32, np.zeros(3, np.int32), freqs, True)
    # multi-pol disqualifies
    ps4 = jnp.ones((2, 2, 1, 4, 64), dtype=jnp.float32)
    assert not _pallas_eligible(ps4, None, freqs, True)
    # irregular freqs disqualify
    f2 = np.asarray([1e8, 1.1e8, 1.3e8, 1.4e8])
    assert not _pallas_eligible(ps32, None, f2, True)
    # f64 disqualifies
    ps64 = jnp.ones((1, 1, 1, 4, 64), dtype=jnp.float64)
    assert not _pallas_eligible(ps64, None, freqs, True)
