"""BertAdam optimizer as an optax GradientTransformation.

Parity target: reference code/optimization.py:40-164. Exact semantics:
  * per-parameter gradient norm clip to ``max_grad_norm`` BEFORE the moment
    update (optimization.py:119-121; the torch code calls clip_grad_norm_ on
    each parameter individually),
  * Adam moments with NO bias correction (optimization.py:125-127,159-163),
  * decoupled weight decay added to the update (not the gradient)
    (optimization.py:136-137),
  * the warmup_linear schedule baked in: lr * (x/warmup) during warmup, then
    lr * max((x-1)/(warmup-1), 0) decaying to 0 at t_total
    (optimization.py:25-31).

Per-group hyperparameters (the reference's param groups: backbone low decay,
'alphas' high lr -- train2d.py:515-553) are expressed with optax.multi_transform
over a param-label pytree; see ``segtran_tpu.train.trainer.label_params``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


def warmup_linear_schedule(base_lr: float, warmup_ratio: float, t_total: int):
    """lr(step) per reference optimization.py:25-31 (x = step / t_total)."""
    def schedule(step):
        x = step / t_total
        warm = x / warmup_ratio if warmup_ratio > 0 else 1.0
        post = jnp.maximum((x - 1.0) / (warmup_ratio - 1.0), 0.0)
        return base_lr * jnp.where(x < warmup_ratio, warm, post)
    return schedule


class BertAdamState(NamedTuple):
    step: chex.Array
    m: optax.Updates
    v: optax.Updates


def bert_adam(lr: float = 2e-4,
              warmup: float = -1.0,
              t_total: int = -1,
              b1: float = 0.9,
              b2: float = 0.999,
              eps: float = 1e-6,
              weight_decay: float = 0.05,
              max_grad_norm: float = 0.05,
              ) -> optax.GradientTransformation:
    """One param group of BertAdam. Compose groups with optax.multi_transform."""

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return BertAdamState(step=jnp.zeros([], jnp.int32), m=zeros,
                             v=jax.tree_util.tree_map(jnp.zeros_like, params))

    def clip_per_param(g):
        if max_grad_norm <= 0:
            return g
        norm = jnp.sqrt(jnp.sum(jnp.square(g)))
        scale = jnp.minimum(1.0, max_grad_norm / (norm + 1e-6))
        return g * scale

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("bert_adam requires params (weight decay)")
        g = jax.tree_util.tree_map(clip_per_param, updates)
        m = jax.tree_util.tree_map(
            lambda m_, g_: m_ * b1 + g_ * (1 - b1), state.m, g)
        v = jax.tree_util.tree_map(
            lambda v_, g_: v_ * b2 + (g_ * g_) * (1 - b2), state.v, g)
        upd = jax.tree_util.tree_map(
            lambda m_, v_: m_ / (jnp.sqrt(v_) + eps), m, v)
        if weight_decay > 0:
            upd = jax.tree_util.tree_map(
                lambda u, p: u + weight_decay * p, upd, params)
        if t_total > 0:
            sched = warmup_linear_schedule(lr, warmup, t_total)
            lr_t = sched(state.step)
        else:
            lr_t = lr
        upd = jax.tree_util.tree_map(lambda u: -lr_t * u, upd)
        return upd, BertAdamState(step=state.step + 1, m=m, v=v)

    return optax.GradientTransformation(init_fn, update_fn)
