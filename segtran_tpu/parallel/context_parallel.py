"""Sequence/context parallelism for the squeezed transformer.

The reference never shards a sequence across devices (SURVEY.md section 5.7);
it bounds token count algorithmically. On TPU we can ALSO shard the token axis
exactly: in the squeeze step (attractors <- tokens) the softmax runs over
tokens, so with tokens sharded over a mesh axis the attention is reproduced
exactly by a distributed softmax -- pmax of the row max, psum of the
denominator and of the partial P@V products. No ring, one psum per layer,
collectives ride ICI. The expand step (tokens <- attractors) is embarrassingly
parallel over tokens because its softmax is over the (replicated) attractors.

``sharded_cross_attention`` is the primitive (shard_map over the token axis);
``cross_attention_reference`` in kernels/squeezed_attention.py is its oracle.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.5
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sharded_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            mesh: Mesh, axis: str = "model",
                            attn_clip: float = 500.0,
                            sm_scale: Optional[float] = None) -> jnp.ndarray:
    """Exact softmax(clamp(q k^T / sqrt(d))) @ v with k/v sharded over `axis`.

    q: [G, Q, D] (replicated; e.g. attractors), k: [G, N, D], v: [G, N, F]
    (token axis N sharded). Returns [G, Q, F] replicated.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])

    def local(qb, kb, vb):
        s = jnp.einsum("gqd,gnd->gqn", qb, kb,
                       preferred_element_type=jnp.float32) * sm_scale
        s = jnp.clip(s, -attn_clip, attn_clip)
        local_max = jnp.max(s, axis=-1, keepdims=True)
        global_max = jax.lax.pmax(local_max, axis)
        p = jnp.exp(s - global_max)
        denom = jax.lax.psum(jnp.sum(p, axis=-1, keepdims=True), axis)
        part = jnp.einsum("gqn,gnf->gqf", p.astype(vb.dtype), vb,
                          preferred_element_type=jnp.float32)
        return (jax.lax.psum(part, axis) / denom).astype(vb.dtype)

    return shard_map(local, mesh=mesh,
                     in_specs=(P(), P(None, axis, None), P(None, axis, None)),
                     out_specs=P())(q, k, v)


def token_sharded_expand_attention(q: jnp.ndarray, k: jnp.ndarray,
                                   v: jnp.ndarray, mesh: Mesh,
                                   axis: str = "model",
                                   attn_clip: float = 500.0,
                                   sm_scale: Optional[float] = None
                                   ) -> jnp.ndarray:
    """The expand step: q (tokens) sharded over `axis`, k/v (attractors)
    replicated; softmax over attractors is local, so no collectives at all --
    output stays token-sharded."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])

    def local(qb, kb, vb):
        s = jnp.einsum("gqd,gkd->gqk", qb, kb,
                       preferred_element_type=jnp.float32) * sm_scale
        s = jnp.clip(s, -attn_clip, attn_clip)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("gqk,gkf->gqf", p.astype(vb.dtype), vb,
                          preferred_element_type=jnp.float32).astype(vb.dtype)

    return shard_map(local, mesh=mesh,
                     in_specs=(P(None, axis, None), P(), P()),
                     out_specs=P(None, axis, None))(q, k, v)
