"""
Training loop over a LogProb: epochs, loss/time history, chain tracking
and rollback.

Reference parity: bayeslim/optim.py Trainer (:1631-1833). Optimizers:
any optax GradientTransformation (adam, sgd, optax.lbfgs, ...) or the
inference.bfgs BFGS/LBFGS classes (which own their loop).
"""
from __future__ import annotations

import time

import jax
import numpy as np
import optax

from ..utils import ParamDict

__all__ = ["Trainer"]


class Trainer:
    """Epoch loop: step the optimizer against prob.value_and_grad
    (reference optim.py:1631)."""

    def __init__(self, prob, optimizer=None, track=False, track_norm=False,
                 Nreport=None, verbose=True, metrics=None, logger=None,
                 profile_dir=None):
        """metrics: optional utils.logging.Metrics accumulator; logger:
        structured logger for per-report events; profile_dir: capture a
        jax profiler trace of the training run into this directory."""
        self.prob = prob
        self.opt = optimizer if optimizer is not None else optax.adam(1e-2)
        self.pdict = prob.collect_main_params()
        self.opt_state = self.opt.init(self.pdict)
        self.loss_history = []
        self.time_history = []
        self.metrics = metrics
        self.logger = logger
        self.profile_dir = profile_dir
        self.track = track
        self.track_norm = track_norm
        self.chain = {k: [] for k in self.pdict} if track else None
        self.Nreport = Nreport
        self.verbose = verbose
        self._step = self._build_step()

    @property
    def loss(self):
        """Per-epoch losses as an array (reference optim.py:1827-1829)."""
        return np.asarray(self.loss_history)

    @property
    def times(self):
        """Per-epoch wall times [s] (reference optim.py:1831-1833)."""
        return np.asarray(self.time_history)

    def _build_step(self):
        opt = self.opt

        def step(pdict, opt_state, grads):
            updates, opt_state = opt.update(grads, opt_state, pdict)
            pdict = optax.apply_updates(pdict, updates)
            return pdict, opt_state

        return jax.jit(step)

    def set_opt(self, optimizer, reset_state=True):
        """Swap the optimizer mid-run (reference optim.py Trainer.set_opt):
        re-initializes the optax state (unless reset_state=False and the
        new transform's state is compatible) and rebuilds the jitted step."""
        self.opt = optimizer
        if reset_state:
            self.opt_state = self.opt.init(self.pdict)
        self._step = self._build_step()

    def init_chain(self, track_params=None):
        """(Re)initialize chain tracking (reference optim.py:1663):
        clears any tracked history; track_params restricts tracking to
        a subset of the main-param keys."""
        self.track = True
        keys = list(self.pdict) if track_params is None \
            else [k for k in track_params]
        self.chain = {k: [] for k in keys}

    def get_chain(self, name=None, idx=None):
        """Tracked chain history (reference optim.py:1761-1794): one
        param by name or all as a dict; idx picks a single epoch."""
        assert self.track
        if name is not None:
            c = self.chain[name]
            return np.stack(c) if idx is None else c[idx]
        if idx is None:
            return {k: np.stack(c) for k, c in self.chain.items()}
        return {k: c[idx] for k, c in self.chain.items()}

    def train(self, Nepochs=1, Nreport=None):
        """Run Nepochs of optimization (reference optim.py:1714-1790).
        Nreport overrides the constructor's reporting cadence."""
        from ..utils.logging import trace_profile, log_event
        if Nreport is None:
            Nreport = self.Nreport
        start = time.time()
        with trace_profile(self.profile_dir,
                           enabled=self.profile_dir is not None):
            for epoch in range(Nepochs):
                loss, grads = self.prob.value_and_grad(self.pdict)
                self.pdict, self.opt_state = self._step(self.pdict,
                                                        self.opt_state,
                                                        grads)
                self.loss_history.append(float(loss))
                self.time_history.append(time.time() - start)
                if self.metrics is not None:
                    self.metrics.log("loss", float(loss), step=epoch)
                    self.metrics.log("epoch_time",
                                     self.time_history[-1], step=epoch)
                if self.track:
                    for k in self.chain:
                        v = np.asarray(self.pdict[k])
                        self.chain[k].append(
                            np.linalg.norm(v) if self.track_norm
                            else v.copy())
                if Nreport and (epoch % Nreport == 0):
                    if self.logger is not None:
                        log_event("train_epoch", logger=self.logger,
                                  epoch=epoch, loss=float(loss),
                                  elapsed=self.time_history[-1])
                    elif self.verbose:
                        print(f"epoch {epoch:5d} | loss {float(loss):.6e}"
                              f" | {self.time_history[-1]:.1f}s")
        # push final params into the model
        self.prob.update(self.pdict)
        return self.loss_history

    def revert_chain(self, Nepochs):
        """Roll parameters back Nepochs from the tracked chain
        (reference optim.py:1796-1825)."""
        assert self.track and not self.track_norm, "need full chain tracking"
        assert Nepochs >= 1
        import jax.numpy as jnp
        idx = -Nepochs
        for k in self.chain:
            self.pdict[k] = jnp.asarray(self.chain[k][idx])
            self.chain[k] = self.chain[k][:idx]
        self.loss_history = self.loss_history[:idx]
        self.time_history = self.time_history[:idx]
        self.prob.update(self.pdict)
