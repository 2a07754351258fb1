"""Gradient reversal as jax.custom_vjp (reference code/networks/revgrad.py:
identity forward, -alpha * grad backward)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_reversal(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    return x


def _fwd(x, alpha):
    return x, alpha


def _bwd(alpha, g):
    return (-alpha * g, None)


gradient_reversal.defvjp(_fwd, _bwd)
