"""Optimizers over SceneParameters (reference: src/python/python/ad/optimizers.py:6-321).

Mirrors the reference API: opt = mi.ad.Adam(lr=...); opt['key'] = value;
params.update(opt); opt.step() consumes gradients previously attached with
opt.set_grad / returned by jax.grad.  Functional twist: gradients are passed
explicitly to step() (JAX has no implicit .grad fields)."""
from __future__ import annotations

import jax.numpy as jnp


class Optimizer:
    def __init__(self, lr):
        self.lr_default = lr
        self.lr = {}
        self.variables = {}
        self.state = {}

    def __setitem__(self, key, value):
        self.variables[key] = jnp.asarray(value, jnp.float32)
        if key not in self.state:
            self._reset(key)

    def __getitem__(self, key):
        return self.variables[key]

    def __contains__(self, key):
        return key in self.variables

    def keys(self):
        return self.variables.keys()

    def items(self):
        return self.variables.items()

    def set_learning_rate(self, lr):
        """Per-parameter learning rates (reference: optimizers.py
        set_learning_rate with dict arg)."""
        if isinstance(lr, dict):
            self.lr.update(lr)
        else:
            self.lr_default = lr

    def _lr(self, key):
        return self.lr.get(key, self.lr_default)

    def _reset(self, key):
        pass

    def reset(self, key):
        self._reset(key)


class SGD(Optimizer):
    """SGD with optional momentum (reference: optimizers.py SGD)."""

    def __init__(self, lr=0.2, momentum=0.0):
        super().__init__(lr)
        self.momentum = momentum

    def _reset(self, key):
        if self.momentum != 0:
            self.state[key] = jnp.zeros_like(self.variables[key])

    def step(self, grads):
        for k, g in grads.items():
            if k not in self.variables:
                continue
            g = jnp.asarray(g, jnp.float32)
            if self.momentum != 0:
                v = self.momentum * self.state[k] + g
                self.state[k] = v
                g = v
            self.variables[k] = self.variables[k] - self._lr(k) * g
        return dict(self.variables)


class Adam(Optimizer):
    """Adam, optionally with the reference's uniform (max-reduced) second
    moment mask (reference: optimizers.py Adam, mask_updates/uniform flags)."""

    def __init__(self, lr=0.1, beta_1=0.9, beta_2=0.999, epsilon=1e-8, uniform=False):
        super().__init__(lr)
        self.beta_1 = beta_1
        self.beta_2 = beta_2
        self.epsilon = epsilon
        self.uniform = uniform
        self.t = {}

    def _reset(self, key):
        z = jnp.zeros_like(self.variables[key])
        self.state[key] = (z, z)
        self.t[key] = 0

    def step(self, grads):
        for k, g in grads.items():
            if k not in self.variables:
                continue
            g = jnp.asarray(g, jnp.float32)
            self.t[k] += 1
            t = self.t[k]
            m, v = self.state[k]
            m = self.beta_1 * m + (1 - self.beta_1) * g
            v = self.beta_2 * v + (1 - self.beta_2) * g * g
            self.state[k] = (m, v)
            lr_t = (
                self._lr(k)
                * jnp.sqrt(1 - self.beta_2**t)
                / (1 - self.beta_1**t)
            )
            denom = jnp.sqrt(jnp.max(v)) if self.uniform else jnp.sqrt(v)
            self.variables[k] = self.variables[k] - lr_t * m / (denom + self.epsilon)
        return dict(self.variables)
