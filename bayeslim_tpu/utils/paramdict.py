"""
ParamDict: a pytree dict of named parameter arrays.

The currency of optimizers, samplers and Hessian code, mirroring the
reference API (bayeslim/paramdict.py:8-306) but as a JAX pytree so whole
ParamDicts flow through jit/grad/vmap.
"""
from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ParamDict", "read_pdict", "write_pdict"]


def _binary(op):
    def fn(self, other):
        if isinstance(other, ParamDict):
            return ParamDict({k: op(self[k], other[k]) for k in self})
        return ParamDict({k: op(self[k], other) for k in self})
    return fn


def _rbinary(op):
    def fn(self, other):
        return ParamDict({k: op(other, self[k]) for k in self})
    return fn


@jax.tree_util.register_pytree_node_class
class ParamDict:
    """An ordered dict of named arrays with elementwise operator algebra.

    Reference parity: bayeslim/paramdict.py ParamDict supports
    +, -, *, /, **, @, unary neg, clone/copy/detach/ones/update.
    Here keys are sorted for deterministic pytree flattening.
    """

    def __init__(self, params):
        self.params = dict(params)

    # --- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        keys = tuple(sorted(self.params.keys()))
        return tuple(self.params[k] for k in keys), keys

    @classmethod
    def tree_unflatten(cls, keys, children):
        obj = object.__new__(cls)
        obj.params = dict(zip(keys, children))
        return obj

    # --- mapping protocol -------------------------------------------------
    def __getitem__(self, key):
        return self.params[key]

    def __setitem__(self, key, val):
        self.params[key] = val

    def __delitem__(self, key):
        del self.params[key]

    def __contains__(self, key):
        return key in self.params

    def __iter__(self):
        return iter(sorted(self.params))

    def __len__(self):
        return len(self.params)

    def keys(self):
        return sorted(self.params.keys())

    def values(self):
        return [self.params[k] for k in self.keys()]

    def items(self):
        return [(k, self.params[k]) for k in self.keys()]

    def update(self, other):
        """In-place update of entries from another dict/ParamDict."""
        for k in other:
            self.params[k] = other[k]

    # --- algebra ------------------------------------------------------------
    __add__ = _binary(lambda a, b: a + b)
    __radd__ = _rbinary(lambda b, a: b + a)
    __sub__ = _binary(lambda a, b: a - b)
    __rsub__ = _rbinary(lambda b, a: b - a)
    __mul__ = _binary(lambda a, b: a * b)
    __rmul__ = _rbinary(lambda b, a: b * a)
    __truediv__ = _binary(lambda a, b: a / b)
    __rtruediv__ = _rbinary(lambda b, a: b / a)
    __pow__ = _binary(lambda a, b: a ** b)
    __matmul__ = _binary(lambda a, b: a @ b)

    def __neg__(self):
        return ParamDict({k: -v for k, v in self.items()})

    def __eq__(self, other):
        if not isinstance(other, ParamDict):
            return NotImplemented
        if self.keys() != other.keys():
            return False
        return all(bool(jnp.all(self[k] == other[k])) for k in self)

    def __hash__(self):
        return id(self)

    def operator(self, func, args=(), inplace=False):
        """Apply func to every value, returning a new ParamDict
        (reference paramdict.py:151). Extra args are passed through;
        dict/ParamDict args are iterated by the same keys. inplace
        assigns back into self and returns None."""
        def _call(k):
            extra = (a[k] if isinstance(a, (dict, ParamDict)) else a
                     for a in args)
            return func(self[k], *extra)
        if inplace:
            for k in list(self.keys()):
                self[k] = _call(k)
            return None
        return ParamDict({k: _call(k) for k in self.keys()})

    # --- convenience ---------------------------------------------------------
    def clone(self):
        return ParamDict({k: jnp.array(v) for k, v in self.items()})

    def copy(self):
        return ParamDict(dict(self.params))

    def detach(self):
        """Stop gradients through all values."""
        return self.operator(jax.lax.stop_gradient)

    def ones(self):
        return self.operator(jnp.ones_like)

    def zeros(self):
        return self.operator(jnp.zeros_like)

    def ravel(self):
        """Concatenate all values into one flat real vector."""
        return jnp.concatenate([jnp.ravel(v) for v in self.values()])

    def unravel(self, flat):
        """Inverse of ravel given this ParamDict's shapes/dtypes."""
        out, i = {}, 0
        for k, v in self.items():
            n = int(np.prod(v.shape)) if v.shape else 1
            out[k] = jnp.reshape(flat[i:i + n], v.shape).astype(v.dtype)
            i += n
        return ParamDict(out)

    def push(self, device):
        """Move all values to a device (or shard with a Sharding);
        multi-process shardings route through multihost.global_put."""
        if jax.process_count() > 1 and \
                isinstance(device, jax.sharding.Sharding):
            from ..parallel.multihost import global_put
            return self.operator(lambda v: global_put(v, device))
        return self.operator(lambda v: jax.device_put(v, device))

    def write_pkl(self, fname, overwrite=False):
        write_pdict(fname, self, overwrite=overwrite)

    @staticmethod
    def read_pkl(fname, force_cpu=False):
        """Load a pickled ParamDict (reference paramdict.py:126);
        force_cpu keeps the arrays on the host CPU device."""
        pd = read_pdict(fname)
        if force_cpu:
            cpu = jax.devices("cpu")[0]
            return pd.operator(lambda v: jax.device_put(v, cpu))
        return pd

    def __repr__(self):
        body = ", ".join(f"{k}: {tuple(np.shape(v))}" for k, v in self.items())
        return f"ParamDict({body})"


def write_pdict(fname, pdict, overwrite=False):
    """Pickle a ParamDict to file as numpy arrays (paramdict.py:111-149)."""
    import os
    if os.path.exists(fname) and not overwrite:
        raise FileExistsError(fname)
    with open(fname, "wb") as f:
        pickle.dump({k: np.asarray(v) for k, v in pdict.items()}, f)


def read_pdict(fname):
    """Load a ParamDict pickled by write_pdict."""
    with open(fname, "rb") as f:
        d = pickle.load(f)
    return ParamDict({k: jnp.asarray(v) for k, v in d.items()})
