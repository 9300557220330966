"""Config-driven construction and persistence tests (reference io.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

import bayeslim_tpu as bl
from bayeslim_tpu.data import io
from bayeslim_tpu.data.dataset import Dataset
from bayeslim_tpu.models.sky import write_catalogue

HERA_LOC = (21.428305555, -30.72152777, 1073.0)
JD0 = 2458168.3


def _write_cat(tmp_path, telescope, n=4, seed=0):
    rng = np.random.default_rng(seed)
    ra0 = telescope.JD2RA(JD0)
    params = np.zeros((1, 1, 2, n))
    params[0, 0, 0] = rng.uniform(1, 5, n)
    params[0, 0, 1] = -2.2
    angs = np.stack([ra0 + rng.uniform(-15, 15, n),
                     HERA_LOC[1] + rng.uniform(-15, 15, n)])
    f = str(tmp_path / "cat.yaml")
    write_catalogue(f, params, angs, f0=100e6)
    return f


def test_build_prob_from_config(tmp_path):
    """io.build_prob assembles a ready LogProb from config dicts
    (reference io.py:491-538)."""
    T = io.build_telescope(location=HERA_LOC)
    catfile = _write_cat(tmp_path, T)
    from bayeslim_tpu.utils import make_hex
    ants, antvecs = make_hex(2)
    freqs = np.linspace(100e6, 110e6, 4)
    bls = [(0, 1), (0, 2), (1, 3)]
    times = [JD0]

    seq_dict = dict(
        order=["rime"], kind=["rime"],
        mdict=dict(rime=dict(
            sky=dict(catfile=catfile, freqs=freqs),
            telescope=dict(location=HERA_LOC),
            beam=dict(kind="gauss", params=np.ones((1, 1, 1, 4, 2)) * 0.5,
                      freqs=freqs, pol="e"),
            array=dict(ants=ants, antvecs=antvecs, freqs=freqs),
            sim_bls=bls, times=times, freqs=freqs,
        )),
    )

    # simulate data with the same model and write to disk
    rime = io.build_rime(**seq_dict["mdict"]["rime"])
    vd = rime.forward()
    vd.setup_meta(T, None)
    fdata = str(tmp_path / "data.h5")
    vd.write_hdf5(fdata)

    prob = io.build_prob(seq_dict=seq_dict, data=fdata)
    pd = prob.collect_main_params()
    loss = float(prob(pd))
    # model == data -> chisq is ~0
    assert abs(loss) < 1e-8


def test_model_pkl_roundtrip(tmp_path):
    from bayeslim_tpu.utils import make_hex, AntposDict
    ants, antvecs = make_hex(2)
    arr = bl.ArrayModel(AntposDict(ants, antvecs),
                        freqs=np.linspace(100e6, 110e6, 4))
    f = str(tmp_path / "arr.pkl")
    io.write_pkl(f, arr)
    arr2 = io.read_pkl(f)
    assert arr2.ants == arr.ants
    assert np.allclose(np.asarray(arr2.antvecs), np.asarray(arr.antvecs))
    assert len(arr2.reds) == len(arr.reds)


def test_dataset_indexing(tmp_path):
    rng = np.random.default_rng(0)
    vds = []
    for i in range(3):
        vd = bl.VisData()
        vd.setup_data([(0, 1)], np.asarray([float(i)]),
                      np.linspace(100e6, 110e6, 4), pol="ee",
                      data=jnp.asarray(rng.normal(size=(1, 1, 1, 1, 4)) + 0j))
        vds.append(vd)
    ds = Dataset(vds)
    assert len(ds) == 3 and ds.Nbatch == 3
    assert ds[1].times[0] == 1.0
    # lazy file paths
    files = []
    for i, vd in enumerate(vds):
        f = str(tmp_path / f"d{i}.h5")
        vd.write_hdf5(f)
        files.append(f)
    ds2 = Dataset(files)
    assert np.allclose(np.asarray(ds2[2].data), np.asarray(vds[2].data))


def test_model_description():
    T = io.build_telescope(location=HERA_LOC)
    tree, args = io.get_model_description(T)
    assert "TelescopeModel" in tree


def test_setup_uvdata_mock_obs():
    """setup_uvdata builds a mock observation (VisData) from metadata --
    baseline selection, redundancy, time/freq parsing (reference
    uvdata_interface.py:326-551, which is itself a NotImplementedError
    stub; this implementation works without pyuvdata)."""
    from bayeslim_tpu.data.uvdata_interface import (
        setup_uvdata, parse_time_params, parse_freq_params)
    from bayeslim_tpu.utils import make_hex

    ants, antvecs = make_hex(2, D=15.0)
    vd = setup_uvdata(antnums=ants, antpos=antvecs, no_autos=True,
                      Ntimes=4, start_time=2458168.3, time_cadence=10.0,
                      Nfreqs=8, start_freq=1e8, channel_width=1e5)
    n = len(ants)
    assert len(vd.bls) == n * (n - 1) // 2
    assert vd.data.shape == (1, 1, len(vd.bls), 4, 8)
    assert np.allclose(np.diff(vd.times) * 86400.0, 10.0)
    assert np.allclose(np.diff(vd.freqs), 1e5)

    # redundancy: one representative per redundant group (no autos)
    vd_red = setup_uvdata(antnums=ants, antpos=antvecs, redundancy=1.0,
                          no_autos=True, Ntimes=1, Nfreqs=2)
    import bayeslim_tpu as bl
    from bayeslim_tpu.utils import AntposDict
    arr = bl.ArrayModel(AntposDict(ants, antvecs),
                        freqs=np.asarray([1e8]))
    nonauto = [g for g in arr.reds if g[0][0] != g[0][1]]
    assert len(vd_red.bls) == len(nonauto)

    # anchor antenna selection
    vd_a = setup_uvdata(antnums=ants, antpos=antvecs, anchor_ant=0,
                        no_autos=True, Ntimes=1, Nfreqs=2)
    assert all(0 in bl_ for bl_ in vd_a.bls)

    # param parsing round trips
    t = parse_time_params({"Ntimes": 3, "start_time": 2458000.0,
                           "time_cadence": 60.0})
    assert np.allclose(np.diff(t["time_array"]) * 86400.0, 60.0)
    f = parse_freq_params({"Nfreqs": 10, "start_freq": 1.2e8,
                           "bandwidth": 1e7})
    assert np.allclose(np.diff(f["freq_array"]), 1e6)


def test_build_prob_reduce_by_redundancy(tmp_path):
    """build_prob(reduce_by_redundancy=True): config-level sufficient-
    statistics likelihood — gradients identical to the full-baseline
    solve, chi^2 exact after adding prob.chisq_const."""
    T = io.build_telescope(location=HERA_LOC)
    catfile = _write_cat(tmp_path, T)
    from bayeslim_tpu.utils import make_hex, AntposDict
    from bayeslim_tpu.models.telescope import ArrayModel
    import jax.numpy as jnp
    ants, antvecs = make_hex(2)
    freqs = np.linspace(100e6, 110e6, 4)
    arr = ArrayModel(AntposDict(ants, antvecs), freqs=freqs, redtol=0.5)
    bls = arr.get_bls(keep_autos=False)
    sim_bls = [r[0] for r in arr.reds if r[0][0] != r[0][1]]
    times = [JD0]

    def mk_seq(simlist, data_bls=None):
        return dict(
            order=["rime"], kind=["rime"],
            mdict=dict(rime=dict(
                sky=dict(catfile=catfile, freqs=freqs),
                telescope=dict(location=HERA_LOC),
                beam=dict(kind="gauss",
                          params=np.ones((1, 1, 1, 4, 2)) * 0.5,
                          freqs=freqs, pol="e"),
                array=dict(ants=ants, antvecs=antvecs, freqs=freqs,
                           redtol=0.5),
                sim_bls=simlist, times=times, freqs=freqs,
                data_bls=data_bls,
            )),
        )

    # full-baseline noisy data on disk
    rime_full = io.build_rime(**mk_seq(bls)["mdict"]["rime"])
    vd = rime_full.forward()
    rng = np.random.default_rng(0)
    vd.data = vd.data + jnp.asarray(
        rng.normal(size=vd.data.shape) * 0.1
        + 1j * rng.normal(size=vd.data.shape) * 0.1)
    vd.setup_meta(T, arr.to_antpos())
    fdata = str(tmp_path / "data_red.h5")
    vd.write_hdf5(fdata)

    # A: expansion solve; B: reduced-statistics solve
    probA = io.build_prob(seq_dict=mk_seq(sim_bls, data_bls=bls),
                          data=fdata)
    pd = probA.collect_main_params()
    vA, gA = probA.value_and_grad(pd)
    probB = io.build_prob(seq_dict=mk_seq(sim_bls), data=fdata,
                          reduce_by_redundancy=True, redtol=0.5)
    vB, gB = probB.value_and_grad(pd)
    gmax = max(float(jnp.abs(gA[k]).max()) for k in gA)
    assert max(float(jnp.abs(gA[k] - gB[k]).max()) for k in gA) < 1e-10 * gmax
    assert np.isclose(float(vA), float(vB) + probB.chisq_const, rtol=1e-10)


def test_builder_kwargs_surface_audit():
    """Every kwarg the reference's build_* functions accept is either
    accepted here or explicitly obsolete-by-design (VERDICT r2 #7)."""
    import ast
    import inspect
    from bayeslim_tpu.data import io as tio

    # kwargs obsolete on TPU (device plumbing, runtime fringe caches)
    OBSOLETE = {"device", "cache_f", "cache_f_angs", "interp_mode"}

    src = open("/root/reference/bayeslim/io.py").read()
    tree = ast.parse(src)
    ref_sigs = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and \
                node.name.startswith("build_"):
            ref_sigs[node.name] = [a.arg for a in node.args.args]

    assert len(ref_sigs) >= 7
    for name, ref_args in ref_sigs.items():
        ours = getattr(tio, name, None)
        assert ours is not None, f"{name} missing"
        sig = inspect.signature(ours)
        accepts_var = any(p.kind is p.VAR_KEYWORD
                          for p in sig.parameters.values())
        for a in ref_args:
            if a in OBSOLETE:
                continue
            ok = a in sig.parameters or accepts_var
            assert ok, f"{name} does not accept reference kwarg '{a}'"


def test_build_sky_multi_and_param_toggles(tmp_path):
    """Reference multi list-of-tuples form, comp_kwargs, set/unset_param
    and pdict-on-catalogue (reference io.py:129-199)."""
    T = io.build_telescope(location=HERA_LOC)
    cat = _write_cat(tmp_path, T)
    freqs = np.linspace(100e6, 110e6, 4)

    sky = io.build_sky(catfile=cat, freqs=freqs, unset_param="params")
    assert "params" not in sky._params
    sky2 = io.build_sky(catfile=cat, freqs=freqs, parameter=False,
                        set_param="params")
    assert "params" in sky2._params

    # pdict applied to a catalogue-built sky
    p3 = np.asarray(sky2.params) * 2
    sky3 = io.build_sky(catfile=cat, freqs=freqs,
                        pdict={"params": jnp.asarray(p3)})
    assert np.allclose(np.asarray(sky3.params), p3)

    # reference multi form: list of (name, kwargs)
    comp = io.build_sky(multi=[("a", dict(catfile=cat, freqs=freqs)),
                               ("b", dict(catfile=cat, freqs=freqs))])
    assert set(comp.models.keys()) == {"a", "b"}


def test_build_rime_reference_forms(tmp_path):
    """build_rime accepts pkl paths and get_bls dicts for its components
    (reference io.py:310-426)."""
    from bayeslim_tpu.utils import make_hex
    T = io.build_telescope(location=HERA_LOC)
    cat = _write_cat(tmp_path, T)
    ants, antvecs = make_hex(2)
    freqs = np.linspace(100e6, 110e6, 4)
    times = np.asarray([JD0, JD0 + 5e-4])

    # pickle the component models + times/freqs/bls
    sky = io.build_sky(catfile=cat, freqs=freqs)
    arr = io.build_array(ants=ants, antvecs=antvecs, freqs=freqs,
                         redtol=0.5)
    beam = io.build_beam(kind="gauss", freqs=freqs,
                         params=np.ones((1, 1, 1, len(freqs), 2)) * 0.5,
                         pol="e", powerbeam=True, fov=180.0)
    fsky = str(tmp_path / "sky.pkl")
    farr = str(tmp_path / "arr.pkl")
    fbeam = str(tmp_path / "beam.pkl")
    ftel = str(tmp_path / "tel.pkl")
    ftimes = str(tmp_path / "times.pkl")
    io.write_pkl(fsky, sky)
    io.write_pkl(farr, arr)
    io.write_pkl(fbeam, beam)
    io.write_pkl(ftel, T)
    io.write_pkl(ftimes, times)

    rime = io.build_rime(sky=fsky, telescope=ftel, beam=fbeam, array=farr,
                         sim_bls=dict(keep_autos=False), times=ftimes,
                         freqs=freqs)
    assert rime.Nbls_all == len(arr.get_bls(keep_autos=False))
    vd = rime.forward()
    assert np.isfinite(np.asarray(vd.data)).all()

    # grouped sim_bls (list of baseline groups -> Nbatch over bl groups)
    bls = arr.get_bls(keep_autos=False)
    groups = [bls[:3], bls[3:6]]
    rime2 = io.build_rime(sky=fsky, telescope=ftel, beam=fbeam,
                          array=farr, sim_bls=groups, times=times,
                          freqs=freqs)
    assert rime2.Nbl_groups == 2

    # pdict updates the built model
    pd = {"sky.params": sky.params * 3.0}
    rime3 = io.build_rime(sky=fsky, telescope=ftel, beam=fbeam,
                          array=farr, sim_bls=bls[:3], times=times,
                          freqs=freqs, pdict=pd)
    assert np.allclose(np.asarray(rime3.sky.params),
                       np.asarray(sky.params) * 3.0)


# ------------------------------------------------------ UVH5 write side

def _mock_visdata(npol=2, nbl=None, ntimes=3, nfreqs=5, seed=0):
    from bayeslim_tpu.utils import make_hex, AntposDict

    rng = np.random.default_rng(seed)
    T = bl.TelescopeModel(HERA_LOC)
    ants, antvecs = make_hex(2, D=14.7)
    antpos = AntposDict(ants, antvecs)
    bls = [(a, b) for i, a in enumerate(ants) for b in ants[i + 1:]]
    if nbl:
        bls = bls[:nbl]
    times = JD0 + np.arange(ntimes) * 5e-4
    freqs = np.linspace(100e6, 120e6, nfreqs)
    shape = (npol, npol, len(bls), ntimes, nfreqs)
    data = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    flags = rng.random(shape) < 0.1
    vd = bl.VisData()
    vd.setup_meta(T, antpos)
    vd.setup_data(bls, times, freqs, pol="ee" if npol == 1 else None,
                  data=jnp.asarray(data), flags=jnp.asarray(flags),
                  history="mock")
    return vd


@pytest.mark.parametrize("npol", [1, 2])
def test_write_uvh5_roundtrip(tmp_path, npol):
    """write_uvh5 -> read_uvh5 round-trips data, flags, baselines,
    times, freqs, ENU antenna positions and telescope location (the
    reference's run_rime_sim UVH5 output path without pyuvdata)."""
    from bayeslim_tpu.data.uvdata_interface import read_uvh5, write_uvh5

    vd = _mock_visdata(npol=npol)
    f = str(tmp_path / "mock.uvh5")
    write_uvh5(vd, f)
    with pytest.raises(FileExistsError):
        write_uvh5(vd, f)
    vd2 = read_uvh5(f)

    assert vd2.bls == vd.bls
    np.testing.assert_allclose(np.asarray(vd2.times),
                               np.asarray(vd.times), rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vd2.freqs),
                               np.asarray(vd.freqs), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vd2.data), np.asarray(vd.data),
                               rtol=1e-6)
    assert np.array_equal(np.asarray(vd2.flags), np.asarray(vd.flags))
    assert vd2.antpos.ants == vd.antpos.ants
    np.testing.assert_allclose(np.asarray(vd2.antpos.antvecs),
                               np.asarray(vd.antpos.antvecs), atol=1e-6)
    lon, lat, alt = vd2.telescope.location
    assert abs(lon - HERA_LOC[0]) < 1e-8 and abs(lat - HERA_LOC[1]) < 1e-8
    if npol == 1:
        assert vd2.pol == "ee"


def test_write_uvh5_part(tmp_path):
    """write_uvh5_part writes a (bl, time, freq) block into an existing
    file (the reference's partial_write minibatch path)."""
    from bayeslim_tpu.data.uvdata_interface import (read_uvh5, write_uvh5,
                                                    write_uvh5_part)

    vd = _mock_visdata(npol=2, ntimes=4, nfreqs=6)
    full = vd.copy()
    full.data = jnp.zeros_like(full.data)
    f = str(tmp_path / "layout.uvh5")
    write_uvh5(full, f)

    # block: last two times x middle freqs
    blk = vd.select(times=np.asarray(vd.times)[2:],
                    freqs=np.asarray(vd.freqs)[1:4], inplace=False)
    write_uvh5_part(f, blk)

    vd2 = read_uvh5(f)
    got = np.asarray(vd2.data)
    exp = np.zeros_like(got)
    exp[:, :, :, 2:, 1:4] = np.asarray(vd.data)[:, :, :, 2:, 1:4]
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_run_rime_sim_uvh5_template_and_output(tmp_path):
    """run_rime_sim drives a simulation from a UVH5 template file and
    writes the result back out as UVH5 (reference
    uvdata_interface.py:136-325) — no pyuvdata in either direction."""
    from bayeslim_tpu.data.uvdata_interface import (read_uvh5, write_uvh5,
                                                    run_rime_sim)
    from bayeslim_tpu.models.sky import PointSky, PointSkyResponse

    tmpl = _mock_visdata(npol=1, ntimes=2, nfreqs=3)
    ftmpl = str(tmp_path / "template.uvh5")
    write_uvh5(tmpl, ftmpl)

    T = bl.TelescopeModel(HERA_LOC)
    freqs = np.asarray(tmpl.freqs)
    rng = np.random.default_rng(3)
    ra0 = T.JD2RA(JD0)
    params = np.zeros((1, 1, 1, 3))
    params[0, 0, 0] = rng.uniform(1, 5, 3)
    angs = np.stack([ra0 + rng.uniform(-10, 10, 3),
                     HERA_LOC[1] + rng.uniform(-10, 10, 3)])
    sky = PointSky(jnp.asarray(params), angs,
                   R=PointSkyResponse(freqs, freq_mode="channel"))
    beam = bl.PixelBeam(jnp.ones((1, 1, 1, 1, 2)) * 14.0, freqs,
                        R=bl.beam_model.GaussResponse(), pol="e",
                        powerbeam=True, fov=180.0)

    fout = str(tmp_path / "sim.uvh5")
    out = run_rime_sim(sky, beam, ftmpl, outfname=fout)
    vd2 = read_uvh5(fout)
    assert vd2.bls == out.bls
    np.testing.assert_allclose(np.asarray(vd2.data),
                               np.asarray(out.data), rtol=1e-6)


def test_containers_are_pytrees():
    """VisData/MapData/CalData cross jit boundaries as pytrees: data
    arrays trace as leaves, metadata rides as identity-hashed aux."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bayeslim_tpu.data.containers import VisData, MapData, CalData

    times = 2458168.3 + np.arange(2) * 1e-3
    freqs = np.linspace(100e6, 110e6, 3)
    rng = np.random.default_rng(5)
    vd = VisData()
    vd.setup_data([(0, 1), (1, 2)], times, freqs, pol="ee",
                  data=jnp.asarray(rng.normal(size=(1, 1, 2, 2, 3)) + 0j))

    leaves = jax.tree_util.tree_leaves(vd)
    assert any(l is vd.data for l in leaves)

    @jax.jit
    def chi2(v):
        return jnp.sum(jnp.abs(v.data) ** 2)

    assert np.isclose(float(chi2(vd)),
                      (np.abs(np.asarray(vd.data)) ** 2).sum())

    # gradients flow through the container leaf
    g = jax.grad(lambda v: jnp.sum(jnp.abs(v.data) ** 2))(vd)
    assert isinstance(g, VisData)
    np.testing.assert_allclose(np.asarray(g.data),
                               2 * np.asarray(vd.data).conj(), atol=1e-12)

    md, cd = MapData(), CalData()
    md.setup_data(freqs, data=jnp.asarray(rng.normal(size=(1, 1, 3, 4))),
                  angs=jnp.asarray(rng.normal(size=(2, 4))))
    cd.setup_data([0, 1], times, freqs, pol="e",
                  data=jnp.asarray(rng.normal(size=(1, 1, 2, 2, 3)) + 0j))
    for obj in (md, cd):
        assert len(jax.tree_util.tree_leaves(obj)) >= 1


def test_build_calibration_and_sequential():
    """io builders (reference io.py:430-489): kind dispatch for
    calibration blocks and a Sequential assembled from build dicts."""
    import numpy as np
    import jax.numpy as jnp
    from bayeslim_tpu.data.io import build_calibration, build_sequential
    from bayeslim_tpu.models.calibration import (JonesModel, VisModel,
                                                 RedVisModel)
    from bayeslim_tpu.utils import Sequential

    rng = np.random.default_rng(6)
    gains = jnp.asarray(rng.normal(size=(1, 1, 3, 2, 4, 2)))
    J = build_calibration(kind="jones", params=gains, ants=[0, 1, 2],
                          parameter=False)
    assert isinstance(J, JonesModel)

    vis = jnp.asarray(rng.normal(size=(1, 1, 2, 2, 4))
                      + 1j * rng.normal(size=(1, 1, 2, 2, 4)))
    V = build_calibration(kind="vis", params=vis, parameter=False)
    assert isinstance(V, VisModel)
    R = build_calibration(kind="redvis", params=vis,
                          bl2red={(0, 1): 0, (1, 2): 1}, parameter=False)
    assert isinstance(R, RedVisModel)

    seq = build_sequential(
        order=["cal"], kind=["calibration"],
        mdict={"cal": dict(kind="vis", params=vis, parameter=False)})
    assert isinstance(seq, Sequential)
    assert isinstance(seq.models["cal"], VisModel)

    # nested sequential
    seq2 = build_sequential(
        order=["inner"], kind=["sequential"],
        mdict={"inner": dict(order=["cal"], kind=["calibration"],
                             mdict={"cal": dict(kind="vis", params=vis,
                                                parameter=False)})})
    assert isinstance(seq2.models["inner"], Sequential)


def test_caldata_hdf5_full_roundtrip(tmp_path):
    """CalData write_hdf5 carries cov/icov/antpos/tloc like the
    reference (dataset.py:3157-3195) and read_hdf5 accepts the
    reference's select kwargs (ants/times/freqs/read_data)."""
    from bayeslim_tpu.data.containers import CalData
    from bayeslim_tpu.utils import AntposDict
    from bayeslim_tpu.models.telescope import TelescopeModel
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.normal(1, .1, (1, 1, 3, 2, 4)) + 0j)
    cd = CalData()
    cd.setup_meta(telescope=TelescopeModel((21.4, -30.7)),
                  antpos=AntposDict([0, 1, 2], rng.normal(size=(3, 3))))
    freqs = np.linspace(1e8, 1.1e8, 4)
    cd.setup_data([0, 1, 2], np.array([2458168.1, 2458168.2]), freqs,
                  pol="jee", data=g, flags=np.zeros(g.shape, bool),
                  cov=jnp.ones(g.shape, g.real.dtype),
                  icov=jnp.ones(g.shape, g.real.dtype), history="h")
    fn = str(tmp_path / "cal.h5")
    cd.write_hdf5(fn)
    cd2 = CalData.read_hdf5(fn)
    assert np.allclose(np.asarray(cd2.data), np.asarray(g))
    assert cd2.cov is not None and cd2.icov is not None
    assert cd2.flags is not None
    assert np.allclose(np.asarray(cd2.antpos.antvecs),
                       np.asarray(cd.antpos.antvecs))
    assert np.allclose(cd2.telescope.location[:2], (21.4, -30.7))
    # selection at read time
    cd3 = CalData.read_hdf5(fn, ants=[0, 1], freqs=freqs[:2])
    assert cd3.data.shape == (1, 1, 2, 2, 2)
    assert cd3.ants == [0, 1]
    # metadata-only read
    cd4 = CalData.read_hdf5(fn, read_data=False)
    assert cd4.data is None and cd4.ants == [0, 1, 2]


def test_mapdata_hdf5_full_roundtrip(tmp_path):
    """MapData write_hdf5 carries norm/cov/icov/df/pols like the
    reference (dataset.py:2336-2375)."""
    from bayeslim_tpu.data.containers import MapData
    md = MapData()
    md.setup_meta(name="pmap")
    freqs = np.linspace(1e8, 1.1e8, 4)
    md.setup_data(freqs, df=np.full(4, 2.5e6), pols=["ee"],
                  data=jnp.ones((1, 1, 4, 12)), angs=jnp.zeros((2, 12)),
                  norm=2 * jnp.ones((1, 1, 4, 12)),
                  icov=3 * jnp.ones((1, 1, 4, 12)), history="m")
    fn = str(tmp_path / "map.h5")
    md.write_hdf5(fn)
    md2 = MapData.read_hdf5(fn)
    assert md2.name == "pmap"
    assert np.allclose(np.asarray(md2.norm), 2)
    assert np.allclose(np.asarray(md2.icov), 3)
    assert list(md2.pols) == ["ee"]
    assert np.allclose(md2.df, 2.5e6)
    assert np.allclose(md2.freqs, freqs)


def test_from_hdf5_interleave_lazy(tmp_path):
    """from_hdf5 concat options: interleave round-robins the axis,
    lazy_cat defers via CatTensor (reference dataset.py:1821)."""
    from bayeslim_tpu.data.containers import VisData
    rng = np.random.default_rng(8)
    times = 2458168.3 + np.arange(4) * 1e-3
    freqs = np.linspace(1e8, 1.1e8, 3)
    fnames = []
    parts = []
    for i in range(2):
        vd = VisData()
        d = rng.normal(size=(1, 1, 1, 2, 3)) + 0j
        vd.setup_data([(0, 1)], times[2 * i:2 * i + 2], freqs, pol="ee",
                      data=jnp.asarray(d))
        f = str(tmp_path / f"p{i}.h5")
        vd.write_hdf5(f)
        fnames.append(f)
        parts.append(d)
    cat = VisData.from_hdf5(fnames, axis="time", interleave=True)
    # round-robin: t0 of part0, t0 of part1, t1 of part0, t1 of part1
    exp = np.stack([parts[0][0, 0, 0, 0], parts[1][0, 0, 0, 0],
                    parts[0][0, 0, 0, 1], parts[1][0, 0, 0, 1]], axis=0)
    assert np.allclose(np.asarray(cat.data)[0, 0, 0], exp)
    lazy = VisData.from_hdf5(fnames, axis="time", lazy_cat=True)
    assert np.allclose(np.asarray(lazy.data[:]),
                       np.concatenate(parts, axis=3))


def test_write_catalogue_sky_form(tmp_path):
    """write_catalogue(catfile, sky, names) reference positional form
    (sky_model.py:1088-1138) round-trips through read_catalogue."""
    from bayeslim_tpu.models.sky import (PointSky, PointSkyResponse,
                                         write_catalogue, read_catalogue)
    rng = np.random.default_rng(9)
    n = 3
    params = np.zeros((1, 1, 2, n))
    params[0, 0, 0] = rng.uniform(1, 5, n)
    params[0, 0, 1] = -2.2
    angs = np.stack([rng.uniform(0, 360, n), rng.uniform(-40, -20, n)])
    R = PointSkyResponse(np.linspace(1e8, 1.1e8, 4),
                         freq_mode="powerlaw", f0=1.2e8)
    sky = PointSky(jnp.asarray(params), jnp.asarray(angs), R=R)
    f = str(tmp_path / "cat_sky.yaml")
    write_catalogue(f, sky, ["a", "b", "c"])
    out = read_catalogue(f, freqs=np.linspace(1e8, 1.1e8, 4))
    assert np.allclose(np.asarray(out[0])[0, 0, 0], params[0, 0, 0],
                       atol=1e-8)
    assert np.allclose(np.asarray(out[1]), angs, atol=1e-8)
