"""Tests for the core substrate: ParamDict, Module pytree, indexing utils."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayeslim_tpu.utils import (
    ParamDict, Module, model2pdict, blnum2ants, ants2blnum, make_hex,
    split_into_groups, AntposDict, white_noise, viewreal, viewcomp,
)


def test_paramdict_algebra():
    a = ParamDict({"x": jnp.arange(3.0), "y": jnp.ones((2, 2))})
    b = ParamDict({"x": jnp.ones(3), "y": 2 * jnp.ones((2, 2))})
    c = a + b * 2 - 1.0
    assert np.allclose(c["x"], np.arange(3.0) + 2 - 1)
    assert np.allclose(c["y"], 1 + 4 - 1)
    d = (-a) / 2.0
    assert np.allclose(d["x"], -np.arange(3.0) / 2)
    # ravel/unravel round trip
    flat = a.ravel()
    assert flat.shape == (7,)
    a2 = a.unravel(flat)
    for k in a:
        assert np.allclose(a[k], a2[k])


def test_paramdict_pytree():
    a = ParamDict({"x": jnp.arange(3.0), "y": jnp.ones(2)})
    out = jax.jit(lambda p: (p * 2.0))(a)
    assert isinstance(out, ParamDict)
    assert np.allclose(out["x"], 2 * np.arange(3.0))
    # grad through a ParamDict
    g = jax.grad(lambda p: jnp.sum(p["x"] ** 2) + jnp.sum(p["y"]))(a)
    assert np.allclose(g["x"], 2 * np.arange(3.0))
    assert np.allclose(g["y"], 1.0)


class Affine(Module):
    def __init__(self, w, b, tag="affine"):
        super().__init__(name=tag)
        self.w = w
        self.b = b
        self.set_param("w")

    def forward(self, x, prior_cache=None, **kwargs):
        return self.w @ x + self.b


class Chain(Module):
    def __init__(self, inner, scale):
        super().__init__(name="chain")
        self.inner = inner
        self.scale = scale  # static python float
        self.set_param("scale_arr")
        self.scale_arr = jnp.asarray(scale)

    def forward(self, x, prior_cache=None, **kwargs):
        return self.inner(x) * self.scale_arr


def test_module_pytree_jit_grad():
    m = Chain(Affine(jnp.eye(2) * 3.0, jnp.ones(2)), 2.0)
    x = jnp.asarray([1.0, 2.0])

    # model flows through jit directly
    y = jax.jit(lambda mod, xx: mod(xx))(m, x)
    assert np.allclose(y, (3 * x + 1) * 2)

    # params gather/scatter
    pd = model2pdict(m)
    assert set(pd.keys()) == {"inner.w", "scale_arr"}

    def loss(pdict):
        mm = m.updated(pdict)
        return jnp.sum(mm(x) ** 2)

    g = jax.grad(loss)(pd)
    assert g["inner.w"].shape == (2, 2)
    assert np.isfinite(np.asarray(g["scale_arr"])).all()
    # numerical check on scale gradient
    eps = 1e-6
    pd2 = pd.copy()
    pd2["scale_arr"] = pd["scale_arr"] + eps
    num = (loss(pd2) - loss(pd)) / eps
    assert np.allclose(g["scale_arr"], num, rtol=1e-4)


def test_module_dotted_access():
    m = Chain(Affine(jnp.eye(2), jnp.zeros(2)), 1.0)
    w = m["inner.w"]
    assert w.shape == (2, 2)
    m["inner.b"] = jnp.ones(2)
    assert np.allclose(m.inner.b, 1.0)
    m2 = m.updated({"inner.w": jnp.eye(2) * 5})
    assert np.allclose(m2["inner.w"], np.eye(2) * 5)
    assert np.allclose(m["inner.w"], np.eye(2))  # original untouched


def test_blnum_codec():
    assert ants2blnum((1, 2)) == 101102
    assert blnum2ants(101102) == (1, 2)
    bls = [(0, 1), (10, 230)]
    nums = ants2blnum(bls)
    assert list(nums) == [100101, 110330]
    assert blnum2ants(list(nums)) == bls


def test_make_hex():
    ants, antvecs = make_hex(3, D=15.0)
    assert len(ants) == 19  # hera19
    assert antvecs.shape == (19, 3)
    # spacing of first two ants is D
    assert np.isclose(np.linalg.norm(antvecs[1] - antvecs[0]), 15.0)


def test_antpos_dict():
    ants, antvecs = make_hex(2)
    ap = AntposDict(ants, antvecs)
    assert len(ap) == 7
    assert np.allclose(ap[ants[3]], antvecs[3])
    assert np.allclose(ap[[ants[0], ants[2]]], antvecs[[0, 2]])
    # pytree round trip
    leaves, treedef = jax.tree_util.tree_flatten(ap)
    ap2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert ap2.ants == ap.ants


def test_white_noise_and_views():
    key = jax.random.PRNGKey(0)
    z = white_noise((10000,), key=key, complex=True)
    assert np.isclose(np.var(np.asarray(z)), 1.0, atol=0.05)
    r = viewreal(z)
    assert r.shape == (10000, 2)
    z2 = viewcomp(r)
    assert np.allclose(z, z2)


def test_split_into_groups():
    g = split_into_groups(list(range(10)), Nelem=3)
    assert g == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9]]
    g = split_into_groups(list(range(10)), Ngroup=2)
    assert len(g) == 2


def test_bl_average_default_builds_reds():
    """bl_average() with reds=None auto-builds redundant groups from
    antpos (reference dataset.py:1280-1285; round-1 silently averaged
    nothing)."""
    import bayeslim_tpu as bl
    from bayeslim_tpu.utils import make_hex, AntposDict
    import jax.numpy as jnp

    ants, antvecs = make_hex(2, D=15.0)
    freqs = np.linspace(1e8, 1.1e8, 4)
    arr = bl.ArrayModel(AntposDict(ants, antvecs), freqs=freqs)
    bls = arr.get_bls(keep_autos=False)
    loc = (21.4, -30.7, 1073.0)
    T = bl.TelescopeModel(loc)

    rng = np.random.default_rng(0)
    nb = len(bls)
    data = jnp.asarray(rng.normal(size=(1, 1, nb, 2, 4)) +
                       1j * rng.normal(size=(1, 1, nb, 2, 4)))
    vd = bl.VisData()
    vd.setup_meta(T, arr.to_antpos())
    vd.setup_data(bls, np.asarray([2458168.3, 2458168.31]), freqs,
                  pol="ee", data=data)
    avg = vd.bl_average()
    # hex-7 has fewer unique redundant groups than baselines
    assert avg.data.shape[2] < nb
    nonauto = [g for g in arr.reds if g[0][0] != g[0][1]]
    assert avg.data.shape[2] == len(nonauto)
    # each group's average equals the hand computation
    blset = set(bls)
    for gi, abl in enumerate(avg.bls):
        red = next(g for g in arr.reds if tuple(abl) in g)
        members = [b for b in red if b in blset]
        idx = vd._bl2ind(members)
        want = np.asarray(data)[:, :, idx].mean(axis=2)
        got = np.asarray(avg.data)[:, :, gi]
        assert np.allclose(got, want, atol=1e-12)


def test_structured_logging_and_metrics(tmp_path):
    """Structured logging, Metrics accumulator, profiler hook and device
    memory stats (SURVEY §5 aux: replaces the reference's print-based
    verbose flags)."""
    import json
    from bayeslim_tpu.utils.logging import (get_logger, log_event, Metrics,
                                            trace_profile,
                                            device_memory_stats)

    rec = log_event("unit_test", foo=1, bar=2.5)
    assert rec["event"] == "unit_test" and rec["foo"] == 1

    m = Metrics()
    for i, v in enumerate([3.0, 2.0, 1.0]):
        m.log("loss", v, step=i)
    assert m["loss"].tolist() == [3.0, 2.0, 1.0]
    s = m.summary()["loss"]
    assert s["n"] == 3 and s["last"] == 1.0 and s["min"] == 1.0
    p = tmp_path / "metrics.jsonl"
    m.to_jsonl(p)
    lines = [json.loads(x) for x in open(p)]
    assert len(lines) == 3 and lines[-1]["value"] == 1.0

    # profiler hook is a safe no-op on CPU without a logdir
    import jax.numpy as jnp
    with trace_profile(None):
        _ = jnp.ones(4).sum()

    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1

    # Trainer integration
    import bayeslim_tpu as bl
    from bayeslim_tpu.inference import LogProb, Trainer
    from tests.test_inference import setup_NormalProb
    prob, _, _ = setup_NormalProb(N=8)
    mm = Metrics()
    tr = Trainer(prob, metrics=mm, Nreport=2, verbose=False)
    tr.train(4)
    assert len(mm["loss"]) == 4


def test_orbax_checkpointing(tmp_path):
    """TPU-native training-state checkpoints (params + optimizer state +
    step) via orbax: save/restore round trip and managed retention."""
    import optax
    from bayeslim_tpu.utils.checkpoint import (save_train_state,
                                               restore_train_state,
                                               CheckpointManager)
    pd = ParamDict({"sky.params": jnp.arange(6.0).reshape(2, 3),
                    "beam.params": jnp.ones(4) * 2.5})
    opt = optax.adam(1e-2)
    state = opt.init(dict(pd.items()))

    p = tmp_path / "ckpt"
    save_train_state(p, pd, opt_state=state, step=7)
    like = {"params": pd, "opt_state": state, "step": np.asarray(0)}
    back = restore_train_state(p, like=like)
    assert int(back["step"]) == 7
    for k in pd:
        assert np.allclose(np.asarray(back["params"][k]), np.asarray(pd[k]))

    mgr = CheckpointManager(tmp_path / "run", max_to_keep=2)
    for step in range(5):
        pd2 = pd * (1.0 + step)
        mgr.maybe_save(step, pd2, opt_state=state, every=2)
    assert mgr.latest_step == 4
    out = mgr.restore_latest(like=like)
    assert np.allclose(np.asarray(out["params"]["beam.params"]),
                       np.asarray(pd["beam.params"]) * 5.0)
    mgr.close()


def test_paramdict_operator_args_inplace():
    """operator passes extra args (dicts iterated by key) and supports
    inplace (reference paramdict.py:151-188)."""
    a = ParamDict({"x": jnp.arange(3.0), "y": jnp.ones(2)})
    b = ParamDict({"x": 2 * jnp.ones(3), "y": 3 * jnp.ones(2)})
    out = a.operator(lambda v, w: v * w, args=(b,))
    assert np.allclose(out["x"], np.arange(3.0) * 2)
    assert np.allclose(out["y"], 3)
    # scalar extra arg broadcast to every key
    out2 = a.operator(lambda v, s: v + s, args=(10.0,))
    assert np.allclose(out2["y"], 11)
    # inplace mutates and returns None
    r = a.operator(lambda v: v * 0, inplace=True)
    assert r is None and np.allclose(a["x"], 0)


def test_paramdict_read_pkl_force_cpu(tmp_path):
    """ParamDict.read_pkl static loader (reference paramdict.py:126)."""
    a = ParamDict({"m.params": jnp.arange(4.0)})
    f = str(tmp_path / "pd.pkl")
    a.write_pkl(f)
    b = ParamDict.read_pkl(f, force_cpu=True)
    assert np.allclose(b["m.params"], np.arange(4.0))
    assert list(b["m.params"].devices())[0].platform == "cpu"


def test_model2pdict_parameters_clone():
    """parameters=False gathers all array leaves; clone copies
    (reference paramdict.py:308)."""
    class M(Module):
        def __init__(self):
            super().__init__()
            self.params = jnp.ones(3)
            self.aux = jnp.zeros(2)   # array leaf, not a param
            self.set_param("params")

    m = M()
    pd = model2pdict(m)
    assert set(pd.keys()) == {"params"}
    pd_all = model2pdict(m, parameters=False)
    assert set(pd_all.keys()) == {"aux", "params"}
    pd_c = model2pdict(m, clone=True)
    assert pd_c["params"] is not m.params


def test_module_update_clobber_param():
    """update(clobber_param=True) unmarks assigned params
    (reference utils.py:1169)."""
    class M(Module):
        def __init__(self):
            super().__init__()
            self.params = jnp.ones(3)
            self.set_param("params")

    m = M()
    m.update({"params": jnp.zeros(3)}, clobber_param=True)
    assert np.allclose(m.params, 0)
    assert list(m.named_params()) == []


def test_tensor2numpy_ants2blnum_kwargs():
    from bayeslim_tpu.utils.indexing import tensor2numpy
    x = np.arange(3.0)
    y = tensor2numpy(x, clone=True)
    assert y is not x and np.allclose(y, x)
    z = tensor2numpy(jnp.arange(3.0), clone=False)
    assert np.allclose(z, x)
    t = ants2blnum((1, 2), tensor=True)
    assert isinstance(t, jax.Array) and int(t) == 101102
    t2 = ants2blnum([(1, 2), (3, 4)], tensor=True)
    assert np.allclose(np.asarray(t2), [101102, 103104])


def test_container_copy_copymeta():
    """copy(copymeta=True) re-instantiates metadata arrays
    (reference dataset.py:142)."""
    from bayeslim_tpu.data.containers import VisData
    vd = VisData()
    times = 2458168.3 + np.arange(2) * 1e-3
    freqs = np.linspace(1e8, 1.1e8, 3)
    vd.setup_data([(0, 1)], times, freqs, pol="ee",
                  data=jnp.zeros((1, 1, 1, 2, 3), complex))
    cp = vd.copy(copymeta=True)
    assert cp.times is not vd.times and np.allclose(cp.times, vd.times)
    assert cp.freqs is not vd.freqs
    cp2 = vd.copy()
    assert cp2.times is vd.times  # shallow by default


def test_arr_hash_and_pixinterp_cache():
    """arr_hash value/pointer forms (reference utils.py:1643) and
    PixInterp.get_interp's angle-hashed cache (reference :742-800)."""
    from bayeslim_tpu.utils.indexing import arr_hash
    from bayeslim_tpu.utils.interp import PixInterp

    a = np.linspace(0.0, 1.0, 11)
    assert arr_hash(a) == arr_hash(a.copy())
    assert arr_hash(a) != arr_hash(a + 0.5)
    assert arr_hash(a, pntr=True) == id(a)

    pi = PixInterp("healpix", nside=8)
    zen = np.asarray([10.0, 20.0, 30.0])
    az = np.asarray([0.0, 90.0, 180.0])
    inds, wgts = pi.get_interp(zen, az)
    assert len(pi.interp_cache) == 1
    inds2, wgts2 = pi.get_interp(zen, az)
    assert inds2 is inds and wgts2 is wgts   # cache hit
    i3, w3 = pi.precompute(zen, az)
    assert np.allclose(wgts, w3) and np.array_equal(inds, i3)
    pi.clear_cache()
    assert len(pi.interp_cache) == 0
