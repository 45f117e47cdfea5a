"""Minimal functional module core.

Modules are *static* descriptions of computations: they hold hyperparameters
only. Learnable parameters and mutable state (e.g. BatchNorm running
statistics) live in explicit pytrees threaded through ``init`` / ``apply``.
This keeps every model a pure function — the shape JAX transforms
(``jit``/``grad``/``vmap``/``shard_map``) want — while staying close enough
to the reference's torch.nn structure that per-module numeric parity can be
checked (reference: /root/reference/reid/models/*.py).

Conventions
-----------
- ``init(rng) -> (params, state)``: both are (possibly empty) nested dicts.
- ``apply(params, state, x, *, training=False) -> (y, new_state)``:
  ``new_state`` equals ``state`` unless the module mutates running stats in
  training mode.
- Composite modules nest children under string keys; ``Sequential`` uses
  ``"0", "1", ...`` mirroring ``torch.nn.Sequential`` naming so converted
  PyTorch checkpoints map 1:1.
"""

from __future__ import annotations

import jax


class Module:
    """Base class for stateless module descriptions."""

    def init(self, rng):
        raise NotImplementedError

    def apply(self, params, state, x, *, training=False):
        raise NotImplementedError

    def __call__(self, params, state, x, *, training=False):
        return self.apply(params, state, x, training=training)


class Lambda(Module):
    """Wrap a pure elementwise function (no params, no state)."""

    def __init__(self, fn):
        self.fn = fn

    def init(self, rng):
        return {}, {}

    def apply(self, params, state, x, *, training=False):
        return self.fn(x), state


class Sequential(Module):
    """Chain of modules, children keyed ``"0".."n-1"`` like torch.nn.Sequential."""

    def __init__(self, *modules):
        self.modules = list(modules)

    def init(self, rng):
        params, state = {}, {}
        rngs = jax.random.split(rng, max(len(self.modules), 1))
        for i, m in enumerate(self.modules):
            p, s = m.init(rngs[i])
            params[str(i)] = p
            state[str(i)] = s
        return params, state

    def apply(self, params, state, x, *, training=False):
        new_state = {}
        for i, m in enumerate(self.modules):
            k = str(i)
            x, new_state[k] = m.apply(params[k], state[k], x, training=training)
        return x, new_state

    def __getitem__(self, i):
        return self.modules[i]


def init_children(rng, children):
    """Initialize a dict of named child modules.

    ``children`` is ``{name: module}``; returns ``(params, state)`` nested by
    name. Splitting is deterministic in iteration order.
    """
    params, state = {}, {}
    names = list(children.keys())
    rngs = jax.random.split(rng, max(len(names), 1))
    for r, name in zip(rngs, names):
        p, s = children[name].init(r)
        params[name] = p
        state[name] = s
    return params, state
