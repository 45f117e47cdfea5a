"""SGD with PyTorch semantics + per-group learning-rate multipliers.

The reference trains with ``torch.optim.SGD(lr, momentum=0.9,
weight_decay=5e-4, nesterov=True)`` over four param groups where the GCE
backbone gets ``lr_mult=1`` and every new module ``lr_mult=2``
(mars_train.py:94-108), and steps the base lr by ``0.1 ** (epoch // 15)``
(mars_train.py:110-114).

Implementation: optax ``add_decayed_weights`` (torch adds wd to the raw
gradient *before* momentum) + ``trace(nesterov=True)``; the final scaling by
``-lr * lr_mult`` happens explicitly so the lr can be fed per-step as a
traced scalar without re-jitting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def lr_mult_tree(params, rules, default=1.0):
    """Build a multiplier pytree: ``rules`` maps top-level path prefixes
    (joined by '/') to multipliers; longest prefix wins."""

    def mult_for(path):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        best, best_len = default, -1
        for prefix, m in rules.items():
            if (key + "/").startswith(prefix + "/") and len(prefix) > best_len:
                best, best_len = m, len(prefix)
        return best

    return jax.tree_util.tree_map_with_path(lambda path, _leaf: mult_for(path), params)


class SGD:
    """Stateful-looking wrapper around a pure optax chain.

    usage::

        opt = SGD(momentum=0.9, weight_decay=5e-4, nesterov=True)
        opt_state = opt.init(params)
        params, opt_state = opt.update(params, grads, opt_state, lr, mults)
    """

    def __init__(self, momentum=0.9, weight_decay=5e-4, nesterov=True):
        self.tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum, nesterov=nesterov),
        )

    def init(self, params):
        return self.tx.init(params)

    def update(self, params, grads, opt_state, lr, mults=None):
        updates, opt_state = self.tx.update(grads, opt_state, params)
        if mults is None:
            new_params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
        else:
            new_params = jax.tree.map(
                lambda p, u, m: p - lr * m * u, params, updates, mults
            )
        return new_params, opt_state


def step_decay_lr(base_lr, epoch, step_size=15, gamma=0.1):
    """lr = base * gamma^(epoch // step_size) (mars_train.py:110-114)."""
    return base_lr * (gamma ** (epoch // step_size))
