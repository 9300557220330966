"""
Model persistence and config-driven construction.

Reference parity: bayeslim/io.py (get_model_description :14, write_pkl
:50, read_pkl :68, build_sky :129, build_beam :~200, build_telescope,
build_array, build_rime, build_calibration, build_sequential :443,
build_prob :491, load_yaml :541).

Builders consume kwargs / YAML / pkl files and return ready model blocks,
up to a full LogProb. Entry points are Python (no CLI exists in the
reference either).
"""
from __future__ import annotations

import os
import pickle

import jax.numpy as jnp
import numpy as np
import yaml

from ..utils import Module, Sequential, ParamDict, AntposDict
from ..utils.dtypes import _float
from . import containers as dataset
from .dataset import Dataset

__all__ = [
    "get_model_description", "write_pkl", "read_pkl", "load_yaml",
    "build_sky", "build_beam", "build_telescope", "build_array",
    "build_rime", "build_calibration", "build_sequential", "build_prob",
]


def get_model_description(model, depth=0):
    """Model-tree string + nested arg dict for provenance
    (reference io.py:14-48)."""
    name = getattr(model, "name", model.__class__.__name__)
    lines = ["  " * depth + f"{model.__class__.__name__}(name={name})"]
    args = {name: {}}
    for k, v in sorted(model.__dict__.items()):
        if isinstance(v, Module):
            sub_lines, sub_args = get_model_description(v, depth + 1)
            lines.append(sub_lines)
            args[name][k] = sub_args
        elif isinstance(v, dict) and v and \
                all(isinstance(x, Module) for x in v.values()):
            for dk, x in v.items():
                sub_lines, sub_args = get_model_description(x, depth + 1)
                lines.append(sub_lines)
                args[name][f"{k}.{dk}"] = sub_args
    return "\n".join(lines), args


def write_pkl(fname, model, overwrite=False):
    """Pickle a model tree (reference io.py:50-66); jnp arrays are
    converted to numpy for portability."""
    if os.path.exists(fname) and not overwrite:
        print(f"{fname} exists, not overwriting")
        return
    import jax
    leaves, treedef = jax.tree_util.tree_flatten(model)
    with open(fname, "wb") as f:
        pickle.dump({"leaves": [np.asarray(x) for x in leaves],
                     "treedef": treedef}, f, protocol=4)


def read_pkl(fname, pdict=None, device=None):
    """Load a pickled model (reference io.py:68-116)."""
    import jax
    if isinstance(fname, str):
        with open(fname, "rb") as f:
            payload = pickle.load(f)
        if isinstance(payload, dict) and "treedef" in payload:
            leaves = [jnp.asarray(x) for x in payload["leaves"]]
            model = jax.tree_util.tree_unflatten(payload["treedef"], leaves)
        else:
            model = payload
    else:
        model = fname
    if pdict is not None:
        if isinstance(pdict, str):
            from ..utils.paramdict import read_pdict
            pdict = read_pdict(pdict)
        model.update(pdict)
    if device is not None and hasattr(model, "push"):
        model.push(device)
    return model


def load_yaml(yfile):
    with open(yfile) as f:
        return yaml.load(f, Loader=yaml.FullLoader)


def build_telescope(modfile=None, location=None, **kwargs):
    """TelescopeModel from pkl or kwargs (reference io.py)."""
    from ..models.telescope import TelescopeModel
    if isinstance(modfile, str):
        return read_pkl(modfile)
    return TelescopeModel(tuple(location), **kwargs)


def build_array(modfile=None, antpos=None, ants=None, antvecs=None,
                freqs=None, **kwargs):
    """ArrayModel from pkl / antpos dict / (ants, antvecs)."""
    from ..models.telescope import ArrayModel
    if isinstance(modfile, str):
        return read_pkl(modfile)
    if antpos is None:
        antpos = AntposDict(ants, np.asarray(antvecs))
    elif isinstance(antpos, str):
        antpos = read_pkl(antpos)
    elif isinstance(antpos, dict):
        antpos = AntposDict(list(antpos.keys()),
                            np.stack([np.asarray(v) for v in antpos.values()]))
    return ArrayModel(antpos, freqs=freqs, **kwargs)


def build_sky(multi=None, modfile=None, pdict=None, catfile=None,
              freqs=None, freq_interp="linear", parameter=True,
              set_param=None, unset_param=None, comp_kwargs=None,
              **kwargs):
    """Sky model from pkl / YAML catalogue / kwargs
    (reference io.py:129-199; full kwargs surface).

    multi: either the reference's list of (name, kwargs) 2-tuples or a
    {name: kwargs} dict — each built via build_sky and composed into a
    CompositeModel(**comp_kwargs). pdict (ParamDict or pkl path) updates
    the built model; set_param/unset_param toggle an attribute's
    trainability after construction."""
    from ..models.sky import (PointSky, PointSkyResponse, CompositeModel,
                              read_catalogue)
    if multi is not None:
        items = multi.items() if isinstance(multi, dict) else list(multi)
        models = {name: build_sky(**kw) for name, kw in items}
        return CompositeModel(models, **(comp_kwargs or {}))
    if isinstance(modfile, str):
        model = read_pkl(modfile, pdict=pdict)
    elif catfile is not None:
        params, angs, meta = read_catalogue(catfile, freqs=freqs,
                                            freq_interp=freq_interp)
        if freqs is None:
            freqs = meta.get("freqs")
        assert freqs is not None, "catalogue sky needs freqs"
        R = PointSkyResponse(freqs, freq_mode=meta["freq_mode"],
                             f0=meta.get("f0"))
        model = PointSky(params, angs, R=R, parameter=parameter,
                         name=kwargs.get("name"))
        if pdict is not None:
            if isinstance(pdict, str):
                from ..utils.paramdict import read_pdict
                pdict = read_pdict(pdict)
            model.update(pdict)
    else:
        raise ValueError("need multi, modfile or catfile")
    if set_param is not None and hasattr(model, set_param):
        model.set_param(set_param)
    if unset_param is not None and hasattr(model, unset_param):
        model.unset_param(unset_param)
    return model


def build_beam(modfile=None, pdict=None, kind="gauss", params=None,
               freqs=None, parameter=True, **kwargs):
    """Beam model from pkl or kwargs (reference io.py:~230-300)."""
    from ..models.beam import (PixelBeam, GaussResponse, AiryResponse,
                               UniformResponse, PixelResponse)
    if isinstance(modfile, str):
        return read_pkl(modfile, pdict=pdict)
    resp = {"gauss": GaussResponse, "airy": AiryResponse,
            "uniform": UniformResponse}
    rkw = kwargs.pop("response_kwargs", {})
    if kind in resp:
        R = resp[kind](**rkw)
    elif kind == "pixel":
        R = PixelResponse(freqs, **rkw)
    elif kind == "ylm":
        from ..models.beam_ylm import YlmResponse
        R = YlmResponse(freqs=freqs, **rkw)
    else:
        raise ValueError(f"unknown beam kind {kind}")
    return PixelBeam(jnp.asarray(params, dtype=_float()), freqs, R=R,
                     parameter=parameter, **kwargs)


def build_rime(modfile=None, sky=None, telescope=None, beam=None,
               array=None, sim_bls=None, times=None, freqs=None,
               time_batch=None, indexed_batching=False, redundant=False,
               **kwargs):
    """RIME from pkl or sub-build dicts (reference io.py:~300-380).

    time_batch: optional group size — split `times` into uniform
    minibatch groups. indexed_batching: enable single-executable
    indexed batching (RIME.enable_indexed_batching). redundant: simulate
    only one baseline per redundant group of the array and expand to
    `sim_bls` via the sim->data index (identical data and gradients,
    ~Nbls/Nred times less compute on a redundant array).

    Reference kwargs surface (io.py:310-426): sky/beam/telescope/array
    accept a built model, a build dict, or a pkl path; times/freqs/
    sim_bls/data_bls accept arrays/lists or pkl paths; sim_bls and
    data_bls also accept a {get_bls kwargs} dict resolved through the
    built array; sim_bls may be a list of baseline groups; pdict (or a
    pkl path) updates the built model."""
    from ..models.rime import RIME
    pdict = kwargs.pop("pdict", None)
    if isinstance(modfile, str):
        return read_pkl(modfile, pdict=pdict)
    if isinstance(sky, str):
        sky = dict(modfile=sky)
    if isinstance(sky, dict):
        sky = build_sky(**sky)
    if isinstance(telescope, str):
        telescope = dict(modfile=telescope)
    if isinstance(telescope, dict):
        telescope = build_telescope(**telescope)
    if isinstance(beam, str):
        beam = dict(modfile=beam)
    if isinstance(beam, dict):
        beam = build_beam(**beam)
    if isinstance(array, str):
        array = dict(modfile=array)
    if isinstance(array, dict):
        array = build_array(**array)
    if isinstance(times, str):
        times = read_pkl(times)
    if isinstance(freqs, str):
        freqs = read_pkl(freqs)
    if isinstance(sim_bls, str):
        sim_bls = read_pkl(sim_bls)
    elif isinstance(sim_bls, dict):
        sim_bls = array.get_bls(**sim_bls)
    data_bls = kwargs.pop("data_bls", None)
    if isinstance(data_bls, str):
        data_bls = read_pkl(data_bls)
    elif isinstance(data_bls, dict):
        data_bls = array.get_bls(**data_bls)
    if data_bls is not None:
        data_bls = [tuple(int(a) for a in bl) for bl in data_bls]
    grouped = (len(sim_bls) > 0 and not isinstance(sim_bls[0], tuple)
               and np.ndim(sim_bls[0]) > 1)
    if grouped:
        sim_bls = [[tuple(int(a) for a in bl) for bl in grp]
                   for grp in sim_bls]
    else:
        sim_bls = [tuple(int(a) for a in bl) for bl in sim_bls]
    if redundant and data_bls is None and not grouped:
        gids = sorted({array.bl2red[bl] for bl in sim_bls})
        data_bls = sim_bls
        sim_bls = [array.reds[g][0] for g in gids]
    times = np.asarray(times)
    if time_batch:
        assert len(times) % int(time_batch) == 0, \
            "time_batch must divide Ntimes for uniform groups"
        tb = int(time_batch)
        times = [times[i:i + tb] for i in range(0, len(times), tb)]
    rime = RIME(sky, telescope, beam, array, sim_bls, times,
                np.asarray(freqs), data_bls=data_bls, **kwargs)
    if indexed_batching:
        rime.enable_indexed_batching()
    if pdict is not None:
        if isinstance(pdict, str):
            from ..utils.paramdict import read_pdict
            pdict = read_pdict(pdict)
        rime.update(pdict)
    return rime


def build_calibration(modfile=None, pdict=None, kind="jones", params=None,
                      ants=None, **kwargs):
    """Calibration block from pkl or kwargs (reference io.py:~380-440)."""
    from ..models.calibration import JonesModel, VisModel, RedVisModel
    if isinstance(modfile, str):
        return read_pkl(modfile, pdict=pdict)
    params = jnp.asarray(params)
    if kind == "jones":
        return JonesModel(params, ants, **kwargs)
    if kind == "vis":
        return VisModel(params, **kwargs)
    if kind == "redvis":
        return RedVisModel(params, **kwargs)
    raise ValueError(f"unknown calibration kind {kind}")


_BUILDERS = {"sky": build_sky, "beam": build_beam,
             "telescope": build_telescope, "array": build_array,
             "rime": build_rime, "calibration": build_calibration}


def build_sequential(modfile=None, order=None, kind=None, mdict=None):
    """Sequential forward model from per-block build dicts
    (reference io.py:443-489)."""
    if isinstance(modfile, str):
        return read_pkl(modfile)
    models = {}
    for mod, k in zip(order, kind):
        if k == "sequential":
            models[mod] = build_sequential(**mdict[mod])
        else:
            models[mod] = _BUILDERS[k](**mdict[mod])
    return Sequential(models)


def build_prob(modfile=None, seq_dict=None, data=None, start_inp=None,
               prior_dict=None, compute="post", negate=True,
               reduce_by_redundancy=False, redtol=1.0, **kwargs):
    """Full LogProb from a config (reference io.py:491-538).

    reduce_by_redundancy: reduce each target VisData to its redundant-
    group sufficient statistics (VisData.reduce_by_redundancy) — exact
    posterior gradients at ~Nred/Nbls of the likelihood cost; the
    dropped chi^2 constants are recorded on the returned prob as
    `chisq_const` (add to recover exact chi^2 values). Pair with a RIME
    built without data_bls (sim_bls = group representatives)."""
    from ..inference.prob import LogProb
    if isinstance(modfile, str):
        return read_pkl(modfile)
    model = build_sequential(**seq_dict)
    targets = dataset.load_data(data)
    targets = targets if isinstance(targets, list) else [targets]
    chisq_const = 0.0
    if reduce_by_redundancy:
        reduced = []
        for t in targets:
            t, c = t.reduce_by_redundancy(redtol=redtol)
            chisq_const += c
            reduced.append(t)
        targets = reduced
    target = Dataset(targets if len(targets) > 1 else targets[0])
    if isinstance(start_inp, str):
        start_inp = read_pkl(start_inp)
    if isinstance(prior_dict, str):
        prior_dict = read_pkl(prior_dict)
    prob = LogProb(model, target, start_inp=start_inp,
                   prior_dict=prior_dict, compute=compute, negate=negate,
                   **kwargs)
    prob.chisq_const = chisq_const
    return prob
