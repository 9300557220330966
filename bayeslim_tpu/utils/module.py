"""
Pytree-registered Module base class: the functional-core / OO-shell
substrate of the framework.

Design (TPU-first, replaces reference bayeslim/utils.py:1123 Module on
torch.nn.Module):

- Every Module subclass is automatically registered as a JAX pytree.
  Attributes holding arrays / Modules / ParamDicts (or containers of them)
  are pytree *children*; everything else (strings, ints, callables, shape
  tuples) is static aux data. A whole model therefore flows through
  jit/grad/vmap directly and ``forward`` methods are written pure.

- Trainable parameters are *marked*, not wrapped: ``set_param('params')``
  records the attribute name; ``model2pdict(model)`` gathers a ParamDict of
  dotted-path -> leaf; ``model.updated(pdict)`` returns a new model with
  those leaves replaced (functional analog of the reference's in-place
  ``Module.update``, utils.py:1123-1320). The in-place ``update`` is kept
  for host-side convenience.

- Priors attach per-module exactly like the reference (set_priors /
  eval_prior with a prior_cache dict memoized per module name,
  utils.py:1215-1292). Accumulating into a python dict of traced scalars is
  jit-safe as long as the dict is consumed within the same trace.
"""
from __future__ import annotations

import copy as _copy

import jax
import jax.numpy as jnp
import numpy as np

from .paramdict import ParamDict

__all__ = ["Module", "Sequential", "model2pdict", "tree_replace",
           "HostState"]


class HostState:
    """Mutable host-side bookkeeping container for Module attributes.

    Compares and hashes by IDENTITY, so it rides through pytree
    flattening as static aux data whose mutations do NOT change the
    treedef (and therefore never trigger a jit retrace). Use it for
    host-only counters/ids that must survive across traced calls, e.g.
    the active minibatch index mirror in RIME's indexed batching.
    """

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __repr__(self):
        return f"HostState({self.__dict__!r})"


class _StaticBox:
    """Hashable wrapper for static aux values.

    Falls back to identity hashing for unhashable config objects, which at
    worst costs a recompile when an identical model is rebuilt.
    """

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __eq__(self, other):
        if not isinstance(other, _StaticBox):
            return NotImplemented
        if isinstance(self.v, np.ndarray) or isinstance(other.v, np.ndarray):
            return isinstance(self.v, np.ndarray) and \
                isinstance(other.v, np.ndarray) and \
                np.array_equal(self.v, other.v)
        try:
            return bool(self.v == other.v)
        except Exception:
            return self.v is other.v

    def __hash__(self):
        if isinstance(self.v, np.ndarray):
            return hash((self.v.shape, str(self.v.dtype)))
        try:
            return hash(self.v)
        except TypeError:
            return id(self.v)

    def __repr__(self):
        return f"_StaticBox({self.v!r})"


def _is_dynamic(v):
    """Classify an attribute value as pytree-child (True) or static aux.

    Convention: jnp arrays (jax.Array) are traced device data; plain
    numpy arrays are STATIC host metadata (frequency grids, index tables,
    blnums) embedded in the treedef. Use jnp for anything that must be
    traced/differentiated, np for configuration.
    """
    if isinstance(v, (jax.Array, Module, ParamDict)):
        return True
    if isinstance(v, (list, tuple)) and len(v) > 0:
        return all(_is_dynamic(x) for x in v)
    if isinstance(v, dict) and len(v) > 0:
        return all(_is_dynamic(x) for x in v.values())
    return False


def _flatten_module(mod):
    keys = sorted(mod.__dict__.keys())
    dyn_keys, children, static = [], [], []
    for k in keys:
        v = mod.__dict__[k]
        if _is_dynamic(v):
            dyn_keys.append(k)
            children.append(v)
        else:
            static.append((k, _StaticBox(v)))
    aux = (tuple(dyn_keys), tuple(static))
    return children, aux


def _make_unflatten(cls):
    def unflatten(aux, children):
        dyn_keys, static = aux
        obj = object.__new__(cls)
        for k, box in static:
            object.__setattr__(obj, k, box.v)
        for k, v in zip(dyn_keys, children):
            object.__setattr__(obj, k, v)
        return obj
    return unflatten


class Module:
    """Base class for all model blocks (reference: bayeslim/utils.py:1123).

    Subclasses implement ``forward(...)`` and are pure: they read
    ``self.params`` (and other leaves) and return arrays / containers,
    never mutating self inside a trace.
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node(cls, _flatten_module, _make_unflatten(cls))

    def __init__(self, name=None):
        self.name = name if name is not None else self.__class__.__name__
        self._params = ()
        self.priors_inp_params = None
        self.priors_out_params = None

    # --- forward ---------------------------------------------------------
    def forward(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    # --- dotted-path access (reference utils.py __getitem__ convention) ---
    def _resolve(self, path):
        """Return (parent_obj, last_key) for a dotted path."""
        parts = path.split(".")
        obj = self
        for p in parts[:-1]:
            if isinstance(obj, (dict,)):
                obj = obj[p]
            elif isinstance(obj, (list, tuple)):
                obj = obj[int(p)]
            else:
                obj = getattr(obj, p)
        return obj, parts[-1]

    def __getitem__(self, path):
        obj, last = self._resolve(path)
        if isinstance(obj, dict):
            return obj[last]
        if isinstance(obj, (list, tuple)):
            return obj[int(last)]
        return getattr(obj, last)

    def __setitem__(self, path, value):
        obj, last = self._resolve(path)
        if isinstance(obj, dict):
            obj[last] = value
        elif isinstance(obj, list):
            obj[int(last)] = value
        else:
            setattr(obj, last, value)

    def __contains__(self, path):
        try:
            self[path]
            return True
        except (AttributeError, KeyError, IndexError):
            return False

    # --- parameter registry ------------------------------------------------
    def set_param(self, name):
        """Mark attribute name(s) on this module as trainable parameters."""
        names = [name] if isinstance(name, str) else list(name)
        self._params = tuple(sorted(set(self._params) | set(names)))

    def unset_param(self, name):
        names = {name} if isinstance(name, str) else set(name)
        self._params = tuple(n for n in self._params if n not in names)

    def named_params(self, prefix=""):
        """Yield dotted paths of all trainable params in this subtree."""
        for n in self._params:
            yield f"{prefix}{n}" if not prefix else f"{prefix}.{n}"
        for k in sorted(self.__dict__.keys()):
            v = self.__dict__[k]
            sub_prefix = f"{prefix}.{k}" if prefix else k
            if isinstance(v, Module):
                yield from v.named_params(sub_prefix)
            elif isinstance(v, (list, tuple)):
                for i, x in enumerate(v):
                    if isinstance(x, Module):
                        yield from x.named_params(f"{sub_prefix}.{i}")
            elif isinstance(v, dict):
                for dk, x in v.items():
                    if isinstance(x, Module):
                        yield from x.named_params(f"{sub_prefix}.{dk}")

    # --- functional update ----------------------------------------------------
    def updated(self, pdict):
        """Return a new model with leaves at pdict's dotted paths replaced.

        Functional analog of the reference's in-place Module.update().
        """
        return tree_replace(self, dict(pdict.items()) if isinstance(pdict, ParamDict) else dict(pdict))

    def update(self, pdict, clobber_param=False):
        """In-place update (host-side convenience; do not use inside
        jit). clobber_param unmarks assigned leaves as trainable params
        (reference utils.py:1169 set_model_attr clobber_param)."""
        for k, v in (pdict.items() if hasattr(pdict, "items") else pdict):
            self[k] = v
            if clobber_param:
                obj, last = self._resolve(k)
                if isinstance(obj, Module):
                    obj.unset_param(last)

    # --- priors (reference utils.py:1215-1292) ------------------------------
    def set_priors(self, priors_inp_params=None, priors_out_params=None):
        """Attach priors evaluated on input params and/or response output.

        Each entry is a callable p(x) -> scalar log-prior (see
        inference.prob priors) or a list of them.
        """
        def _aslist(p):
            if p is None:
                return None
            return list(p) if isinstance(p, (list, tuple)) else [p]
        self.priors_inp_params = _aslist(priors_inp_params)
        self.priors_out_params = _aslist(priors_out_params)

    def eval_prior(self, prior_cache, inp_params=None, out_params=None):
        """Evaluate attached priors and memoize into prior_cache by name."""
        if prior_cache is None or self.name in prior_cache:
            return
        total = None
        if self.priors_inp_params is not None and inp_params is not None:
            for pr in self.priors_inp_params:
                if pr is None:
                    continue
                val = pr(inp_params)
                total = val if total is None else total + val
        if self.priors_out_params is not None and out_params is not None:
            for pr in self.priors_out_params:
                if pr is None:
                    continue
                val = pr(out_params)
                total = val if total is None else total + val
        if total is not None:
            prior_cache[self.name] = total

    # --- misc -------------------------------------------------------------
    def push(self, device):
        """Move all array leaves to a device/sharding, in place.

        Multi-process (jax.distributed): shardings spanning processes go
        through parallel.multihost.global_put (every process holds the
        same full host copy)."""
        leaves, treedef = jax.tree_util.tree_flatten(self)
        if jax.process_count() > 1 and \
                isinstance(device, jax.sharding.Sharding):
            from ..parallel.multihost import global_put
            moved = [global_put(x, device) for x in leaves]
        else:
            moved = [jax.device_put(x, device) for x in leaves]
        new = jax.tree_util.tree_unflatten(treedef, moved)
        self.__dict__.update(new.__dict__)
        return self

    def copy(self):
        return _copy.copy(self)

    def clone(self):
        leaves, treedef = jax.tree_util.tree_flatten(self)
        return jax.tree_util.tree_unflatten(treedef, [jnp.array(x) for x in leaves])

    def __repr__(self):
        subs = [k for k, v in self.__dict__.items() if isinstance(v, Module)]
        return f"{self.__class__.__name__}(name={getattr(self, 'name', None)!r}, submodules={subs})"


def tree_replace(module, updates):
    """Return a copy of `module` with dotted-path attributes replaced.

    Copies only the spine objects along each path (cheap), leaving all
    other subtrees shared.
    """
    new = _copy.copy(module)
    for path, value in updates.items():
        parts = path.split(".")
        obj = new
        # copy the spine
        for p in parts[:-1]:
            if isinstance(obj, Module):
                child = getattr(obj, p)
                child_copy = _copy.copy(child) if isinstance(child, Module) else \
                    (list(child) if isinstance(child, list) else
                     dict(child) if isinstance(child, dict) else child)
                setattr(obj, p, child_copy)
                obj = child_copy
            elif isinstance(obj, dict):
                child = obj[p]
                child_copy = _copy.copy(child) if isinstance(child, Module) else child
                obj[p] = child_copy
                obj = child_copy
            elif isinstance(obj, list):
                i = int(p)
                child = obj[i]
                child_copy = _copy.copy(child) if isinstance(child, Module) else child
                obj[i] = child_copy
                obj = child_copy
            else:
                raise TypeError(f"cannot traverse {type(obj)} at {p} in {path}")
        last = parts[-1]
        if isinstance(obj, Module):
            setattr(obj, last, value)
        elif isinstance(obj, dict):
            obj[last] = value
        elif isinstance(obj, list):
            obj[int(last)] = value
        else:
            raise TypeError(f"cannot set {last} on {type(obj)}")
    return new


def model2pdict(model, parameters=True, clone=False, prefix=""):
    """Extract a ParamDict of all trainable params in a model tree.

    Reference parity: bayeslim/paramdict.py:308 model2pdict.
    parameters=False gathers every jax.Array leaf instead of just the
    marked params; clone copies the arrays (values otherwise alias the
    model's leaves — harmless under jax immutability)."""
    if parameters:
        names = list(model.named_params(prefix))
    else:
        names = [n for n, _ in _named_arrays(model, prefix)]
    d = {p: model[p] for p in names}
    if clone:
        d = {k: jnp.array(v) for k, v in d.items()}
    return ParamDict(d)


def _named_arrays(model, prefix=""):
    """Yield (dotted path, leaf) for every jax.Array attribute in a
    Module tree (the pytree-children analog of named_params)."""
    for k in sorted(model.__dict__.keys()):
        v = model.__dict__[k]
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, Module):
            yield from _named_arrays(v, path)
        elif isinstance(v, jax.Array):
            yield path, v
        elif isinstance(v, (list, tuple)):
            for i, x in enumerate(v):
                if isinstance(x, Module):
                    yield from _named_arrays(x, f"{path}.{i}")
                elif isinstance(x, jax.Array):
                    yield f"{path}.{i}", x


class Sequential(Module):
    """Ordered chain of Modules threading input through each.

    Reference parity: bayeslim/utils.py:1323-1411. ``models`` is a dict of
    name -> Module; forward threads inp through each in insertion order.
    The first model is assumed to expose minibatching (Nbatch/batch_idx).
    """

    def __init__(self, models, name=None):
        super().__init__(name=name)
        self.models = dict(models)
        self._order = tuple(models.keys())

    def forward(self, inp=None, prior_cache=None, **kwargs):
        out = inp
        for k in self._order:
            out = self.models[k](out, prior_cache=prior_cache, **kwargs)
        return out

    def __getattr__(self, key):
        # proxy named sub-models as attributes (reference Sequential behavior)
        models = self.__dict__.get("models", None)
        if models is not None and key in models:
            return models[key]
        raise AttributeError(key)

    @property
    def Nbatch(self):
        first = self.models[self._order[0]]
        return getattr(first, "Nbatch", 1)

    @property
    def batch_idx(self):
        first = self.models[self._order[0]]
        return getattr(first, "batch_idx", 0)

    @batch_idx.setter
    def batch_idx(self, val):
        first = self.models[self._order[0]]
        if hasattr(type(first), "batch_idx") or hasattr(first, "batch_idx"):
            first.batch_idx = val
        elif val > 0:
            raise ValueError("first model in the chain is not batched")
