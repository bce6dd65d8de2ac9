"""Rectified Adam (ref: utils/optimization.py:16-176).

The reference carries RAdam/PlainRAdam implementations (Facebook-licensed
copies) that train.py never imports (SURVEY.md §2 C29); kept here as real,
selectable optimizers in optax form:

* :func:`radam` — buffered rectified Adam with the degenerated-to-SGD branch
  (variance rectification term; falls back to an un-adapted step while the
  approximated SMA length <= 4, matching the reference's ``N_sma <= 4``
  behaviour at optimization.py:60-76);
* :func:`plain_radam` — the unbuffered variant (optimization.py:103-176).

Both integrate with ``optax.inject_hyperparams`` like the default Adam, so
the plateau LR scheduler works unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RAdamState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def _radam_core(b1: float, b2: float, eps: float, degenerate_to_sgd: bool):
    def init_fn(params):
        mu = jax.tree.map(lambda p: jnp.zeros_like(p), params)
        nu = jax.tree.map(lambda p: jnp.zeros_like(p), params)
        return RAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)

        beta2_t = b2 ** t
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        bias1 = 1.0 - b1 ** t
        bias2 = 1.0 - beta2_t

        # variance rectification (optimization.py:66-70)
        rect = jnp.sqrt(
            jnp.maximum(
                (n_sma - 4.0) / (n_sma_max - 4.0)
                * (n_sma - 2.0) / n_sma
                * n_sma_max / (n_sma_max - 2.0), 0.0))

        use_adaptive = n_sma > 4.0

        def leaf_update(m, v):
            m_hat = m / bias1
            adaptive = rect * m_hat / (jnp.sqrt(v / bias2) + eps)
            sgd = m_hat if degenerate_to_sgd else jnp.zeros_like(m_hat)
            return jnp.where(use_adaptive, adaptive, sgd)

        new_updates = jax.tree.map(leaf_update, mu, nu)
        # optax convention: downstream scale(-lr) applies sign and magnitude
        return new_updates, RAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def radam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8,
          degenerate_to_sgd: bool = True) -> optax.GradientTransformation:
    """Rectified Adam (ref: optimization.py:16-100)."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            _radam_core(b1, b2, eps, degenerate_to_sgd),
            optax.scale_by_learning_rate(learning_rate),   # multiplies by -lr
        ))(learning_rate=learning_rate)


# The reference's RAdam/PlainRAdam split (optimization.py:16-100 vs 103-176)
# is purely a host-side caching detail: RAdam memoises the rectification term
# per step count, PlainRAdam recomputes it.  The update math is identical, so
# here ``plain_radam`` IS ``radam`` — the alias exists only so the CLI keeps
# the reference's ``--optimizer plain_radam`` choice.
plain_radam = radam
