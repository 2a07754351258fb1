"""Pipeline parallelism (GPipe schedule) over a mesh axis.

The reference has no pipeline parallelism (its only parallelism is DDP data
parallelism, SURVEY.md section 2.9); this is a beyond-reference TPU
capability. Stages live one-per-device along a mesh axis; activations hand
off stage-to-stage with ``lax.ppermute`` (one ICI hop per tick), and the
whole schedule is a ``lax.scan`` over M + S - 1 ticks, so it is jittable and
reverse-differentiable (backprop replays the scan and ppermutes grads
backwards automatically).

``gpipe`` is the generic primitive: stages whose params are stacked on a
leading axis (one slice per device). ``stack_translayer_params`` builds such
a stack from a Segtran params tree with uniform translayer dims
(translayer_compress_ratios all 1); ``stack_translayer_params_padded`` +
``make_hetero_translayer_stage`` serve HETEROGENEOUS dims (e.g. the REFUGE
``--layercompress 1,1,2,2`` recipe) by zero-padding params and hand-off to
the max dim and lax.switch-ing each device into a branch with its stage's
static shapes -- numerics stay exactly the sequential encoder's.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.5
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def gpipe(stage_fn: Callable, stacked_params, x: jnp.ndarray, mesh: Mesh,
          axis: str = "model", n_microbatches: int = 2) -> jnp.ndarray:
    """Run S homogeneous stages over the `axis` devices, GPipe-scheduled.

    stage_fn(params_slice, x_mb) -> y_mb with the same pytree-of-arrays
    structure and shapes (homogeneous hand-off; constants such as pos codes
    or masks simply pass through). stacked_params: pytree whose leaves have
    leading dim S == mesh.shape[axis] (one slice per stage/device). x:
    pytree of [B, ...] arrays, B divisible by n_microbatches. Returns stage
    S-1's outputs, replicated over `axis` (microbatch order preserved).

    Wall-clock per step ~ (M + S - 1)/M x the sequential cost on one device,
    with 1/S of the layer params resident per chip -- the standard GPipe
    bubble; raise n_microbatches to amortize it.
    """
    s = mesh.shape[axis]
    tmap = jax.tree_util.tree_map
    leaves = jax.tree_util.tree_leaves(x)
    b = leaves[0].shape[0]
    m = n_microbatches
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    mb = b // m
    xs = tmap(lambda l: l.reshape(m, mb, *l.shape[1:]), x)

    def local(params_local, xs_local):
        params_local = tmap(lambda l: l[0], params_local)  # drop stage axis
        idx = jax.lax.axis_index(axis)
        zero_mb = tmap(lambda l: jnp.zeros_like(l[0]), xs_local)
        fwd_perm = [(i, (i + 1) % s) for i in range(s)]

        def tick(carry, t):
            recv, outs = carry
            # stage 0 feeds microbatch t (while available); later stages
            # consume what the previous stage just sent
            inject = tmap(lambda l: jax.lax.dynamic_index_in_dim(
                l, jnp.minimum(t, m - 1), keepdims=False), xs_local)
            inp = tmap(lambda a, r: jnp.where(idx == 0, a, r), inject, recv)
            out = stage_fn(params_local, inp)
            # last stage banks its result for microbatch t - (S - 1)
            t_out = t - (s - 1)
            outs = jax.lax.cond(
                (idx == s - 1) & (t_out >= 0),
                lambda o: tmap(lambda bank, ob: (
                    jax.lax.dynamic_update_index_in_dim(
                        bank, ob, jnp.maximum(t_out, 0), 0)), o, out),
                lambda o: o, outs)
            nxt = tmap(lambda ob: jax.lax.ppermute(ob, axis, fwd_perm), out)
            return (nxt, outs), None

        outs0 = tmap(jnp.zeros_like, xs_local)
        (_, outs), _ = jax.lax.scan(
            tick, (zero_mb, outs0), jnp.arange(m + s - 1))
        # replicate the last stage's bank to every device
        keep = jnp.where(idx == s - 1, 1.0, 0.0)
        return tmap(lambda o: jax.lax.psum(o * keep.astype(o.dtype), axis),
                    outs)

    stage_specs = tmap(lambda _: P(axis), stacked_params)
    y = shard_map(local, mesh=mesh,
                  in_specs=(stage_specs, tmap(lambda _: P(), xs)),
                  out_specs=tmap(lambda _: P(), xs),
                  check_vma=False)(stacked_params, xs)
    return tmap(lambda l: l.reshape(b, *l.shape[2:]), y)


def make_translayer_stage(cfg) -> Callable:
    """stage_fn(params, (vfeat, pos_code, vmask)) running ONE fusion-encoder
    layer, deterministic (the loop body of nn/encoder.py:97-154: affine LN ->
    + pos_code_weight * pos -> non-affine LN -> * mask -> translayer).
    Requires uniform translayer dims; the (vfeat, pos, mask) triple is the
    homogeneous stage hand-off (pos/mask pass through unchanged). Dropout is
    the only train-mode difference and is layer-0-only in the reference, so
    the pipeline serves inference and deterministic eval paths."""
    from ..nn.attention import CrossAttFeatTrans, SqueezedAttFeatTrans
    from ..nn.encoder import layer_spec_from_config
    from ..ops.norm import layer_norm

    if len(set(cfg.translayer_dims)) != 1:
        raise ValueError(
            "pipeline stages must be homogeneous: use "
            f"translayer_compress_ratios of 1 (dims {cfg.translayer_dims})")
    spec = layer_spec_from_config(cfg, 0)
    if cfg.use_squeezed_transformer:
        layer = SqueezedAttFeatTrans(spec, num_attractors=cfg.num_attractors,
                                     has_FFN_in_squeeze=cfg.has_FFN_in_squeeze)
    else:
        layer = CrossAttFeatTrans(spec)
    # layer_norm (not fnn.LayerNorm) so the bf16 FastLayerNorm path matches
    # the sequential encoder bit-for-bit (nn/encoder.py:103,118)
    ln_affine = layer_norm(cfg.dtype, epsilon=cfg.ln_eps)
    ln_plain = layer_norm(cfg.dtype, epsilon=cfg.ln_eps, use_bias=False,
                          use_scale=False)
    pos_w = cfg.pos_code_weight if cfg.pos_code_type != "bias" else 0.0

    def stage(p, xt):
        vfeat, pos_code, vmask = xt
        vn = ln_affine.apply({"params": p["vfeat_norm_layers"]}, vfeat)
        if cfg.pos_code_type == "none":
            feat = vn
        else:
            feat = ln_plain.apply({"params": {}}, vn + pos_w * pos_code)
        feat = feat * vmask
        out = layer.apply({"params": p["translayers"]}, feat,
                          deterministic=True)
        return out, pos_code, vmask

    return stage


def _pad_leaf(l: jnp.ndarray, shape) -> jnp.ndarray:
    return jnp.pad(l, [(0, t - s) for s, t in zip(l.shape, shape)])


def _slice_leaf(l: jnp.ndarray, shape) -> jnp.ndarray:
    return l[tuple(slice(0, int(d)) for d in shape)]


def stack_translayer_params_padded(encoder_params: dict, num_layers: int):
    """Heterogeneous-dims variant of stack_translayer_params (e.g. the REFUGE
    ``--layercompress 1,1,2,2`` recipe, whose translayer dims shrink layer to
    layer): per-stage leaves are zero-padded to the elementwise-max shape
    before stacking, and the per-stage TRUE shapes are returned so the stage
    fn can statically slice its own parameters back out.

    Returns (stacked_padded_params, per_stage_shape_trees)."""
    tmap = jax.tree_util.tree_map

    import numpy as np

    def gather(prefix):
        trees = [encoder_params[f"{prefix}_{i}"] for i in range(num_layers)]
        # shapes ride the trees as np.ndarray leaves (tuples would be
        # flattened as pytrees by tree_map)
        maxshape = tmap(
            lambda *ls: np.array([max(s) for s in zip(*[l.shape
                                                        for l in ls])]),
            *trees)
        stacked = tmap(lambda ms, *ls: jnp.stack(
            [_pad_leaf(l, ms) for l in ls]), maxshape, *trees)
        shapes = [tmap(lambda l: np.array(l.shape), t) for t in trees]
        return stacked, shapes

    tl, tl_shapes = gather("translayers")
    vn, vn_shapes = gather("vfeat_norm_layers")
    stacked = {"translayers": tl, "vfeat_norm_layers": vn}
    shapes = [{"translayers": t, "vfeat_norm_layers": v}
              for t, v in zip(tl_shapes, vn_shapes)]
    return stacked, shapes


def make_hetero_translayer_stage(cfg, stage_shapes, axis: str = "model"
                                 ) -> Callable:
    """stage_fn for gpipe over HETEROGENEOUS translayer dims.

    The hand-off rides zero-padded to trans_in_dim (translayer dims are
    non-increasing under compression, configs/base.py derive()); each device
    selects its stage via lax.switch on its mesh index, and the selected
    branch statically slices both its params (from the padded stack built by
    stack_translayer_params_padded) and its activation slice, so the
    LayerNorm/attention numerics are exactly the sequential encoder's
    (nn/encoder.py:99-156). pos_code passes through at full trans_in_dim and
    is prefix-sliced per stage exactly as the encoder does
    (segtran_shared.py:929-932)."""
    from ..nn.attention import CrossAttFeatTrans, SqueezedAttFeatTrans
    from ..nn.encoder import layer_spec_from_config
    from ..ops.norm import layer_norm

    if cfg.pos_code_type == "bias":
        raise ValueError("pipeline stages do not serve 'bias' pos codes")
    dims = cfg.translayer_dims
    d_max = max(dims)
    if dims[0] != d_max:
        raise ValueError(
            f"expected non-increasing translayer dims, got {dims}")
    pos_w = cfg.pos_code_weight
    ln_plain = layer_norm(cfg.dtype, epsilon=cfg.ln_eps, use_bias=False,
                          use_scale=False)

    def make_branch(i):
        spec = layer_spec_from_config(cfg, i)
        if cfg.use_squeezed_transformer:
            layer = SqueezedAttFeatTrans(
                spec, num_attractors=cfg.num_attractors,
                has_FFN_in_squeeze=cfg.has_FFN_in_squeeze)
        else:
            layer = CrossAttFeatTrans(spec)
        ln_affine = layer_norm(cfg.dtype, epsilon=cfg.ln_eps)
        d_in = dims[i]

        def branch(operand):
            p, vfeat_pad, pos_code, vmask = operand
            p_i = jax.tree_util.tree_map(_slice_leaf, p, stage_shapes[i])
            x = vfeat_pad[..., :d_in]
            vn = ln_affine.apply({"params": p_i["vfeat_norm_layers"]}, x)
            if cfg.pos_code_type == "none":
                feat = vn
            else:
                feat = ln_plain.apply(
                    {"params": {}}, vn + pos_w * pos_code[..., :d_in])
            feat = feat * vmask
            out = layer.apply({"params": p_i["translayers"]}, feat,
                              deterministic=True)
            return jnp.pad(out, ((0, 0), (0, 0),
                                 (0, d_max - out.shape[-1])))

        return branch

    branches = [make_branch(i) for i in range(cfg.num_translayers)]

    def stage(p, xt):
        vfeat_pad, pos_code, vmask = xt
        idx = jax.lax.axis_index(axis)
        out = jax.lax.switch(idx, branches, (p, vfeat_pad, pos_code, vmask))
        return out, pos_code, vmask

    return stage


def stack_translayer_params(encoder_params: dict, num_layers: int) -> dict:
    """Stack the fusion encoder's per-layer params (translayers_{i} +
    vfeat_norm_layers_{i} [+ comb_norm_layers_{i}]) on a leading stage axis.
    Requires homogeneous layers: every translayer must have identical
    param shapes (translayer_compress_ratios all 1)."""
    def gather(prefix):
        trees = [encoder_params[f"{prefix}_{i}"] for i in range(num_layers)]
        return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *trees)

    # comb_norm layers are non-affine (no params); only the affine vfeat
    # norms and the translayers themselves carry weights
    return {"translayers": gather("translayers"),
            "vfeat_norm_layers": gather("vfeat_norm_layers")}
