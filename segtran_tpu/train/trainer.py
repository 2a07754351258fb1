"""Jit-compiled training step with mesh-sharded data parallelism.

Replaces the reference's training loop core (train2d.py:1134-1337):
  * loss assembly: (1-DICE_W)*BCE + DICE_W * sum_cls dice*w  (train2d.py:1228-1318)
  * class weights: ones, background 0, normalized (train2d.py:1123-1127)
  * optional global grad clip (train2d.py:1324-1325) then BertAdam param groups
    (backbone low-decay, 'alphas' high-lr -- train2d.py:515-553)
  * DDP/SyncBN/all-reduce are replaced by GSPMD: the step is jit-compiled over a
    ``jax.sharding.Mesh`` with the batch sharded on the 'data' axis and params
    replicated; XLA inserts the gradient psums, and BatchNorm statistics are
    global-batch by construction (SyncBatchNorm for free).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..ops.losses import dice_loss_indiv, weighted_bce_with_logits
from ..ops.resize import resize_linear
from .bertadam import bert_adam


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray


def label_params(params) -> Any:
    """Param-group labels mirroring reference train2d.py:515-553."""
    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        name = "/".join(str(p) for p in path)
        if "alphas" in name:
            labels[path] = "high_lr"
        elif "backbone" in name:
            labels[path] = "low_decay"
        else:
            labels[path] = "normal"
    return flax.traverse_util.unflatten_dict(labels)


def build_optimizer(lr: float = 2e-4, decay: float = 1e-4,
                    t_total: int = 10000, warmup_ratio: float = 0.05,
                    grad_clip: float = 0.1,
                    params=None) -> optax.GradientTransformation:
    """BertAdam with the reference's param groups + optional global clip."""
    groups = {
        "normal": bert_adam(lr, warmup_ratio, t_total, weight_decay=decay),
        "low_decay": bert_adam(lr, warmup_ratio, t_total,
                               weight_decay=decay * 0.1),
        "high_lr": bert_adam(lr * 100, warmup_ratio, t_total,
                             weight_decay=0.0),
    }
    tx = optax.multi_transform(groups, label_params)
    if grad_clip and grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def make_class_weights(num_classes: int, focus_class: int = -1) -> jnp.ndarray:
    w = jnp.ones(num_classes)
    w = w.at[0].set(0.0)
    if focus_class != -1 and num_classes > 2:
        w = w.at[focus_class].set(2.0)
    return w / jnp.sum(w)


def make_loss_fn(num_classes: int,
                 bce_weight: Sequence[float],
                 dice_w: float = 0.5,
                 focus_class: int = -1) -> Callable:
    """(logits [B,H,W,C], mask [B,H,W,C]) -> (loss, metrics dict)."""
    class_weights = make_class_weights(num_classes, focus_class)
    bce = jnp.asarray(bce_weight, jnp.float32)
    # rescale so the pos-weights sum to num_classes-1 (reference
    # train2d.py:814, train3d.py:516-518)
    bce = bce * (num_classes - 1) / jnp.sum(bce)
    pos_weight = bce.reshape(1, 1, 1, num_classes)

    def loss_fn(logits: jnp.ndarray, mask: jnp.ndarray):
        if logits.shape[1:3] != mask.shape[1:3]:
            logits = resize_linear(logits, mask.shape[1:3])
        probs = jax.nn.sigmoid(logits)
        ce = weighted_bce_with_logits(logits, mask, pos_weight)
        dice_total = 0.0
        dice_per_class = []
        for cls in range(1, num_classes):
            d = dice_loss_indiv(probs[..., cls], mask[..., cls])
            dice_per_class.append(d)
            dice_total = dice_total + d * class_weights[cls]
        loss = (1.0 - dice_w) * ce + dice_w * dice_total
        metrics = {"loss": loss, "ce_loss": ce, "dice_loss": dice_total}
        for i, d in enumerate(dice_per_class):
            metrics[f"dice_loss_cls{i+1}"] = d
        return loss, metrics

    return loss_fn


def make_train_step(model, tx: optax.GradientTransformation,
                    loss_fn: Callable,
                    has_batch_stats: bool = True,
                    aux_loss_fn: Optional[Callable] = None,
                    grad_accum: int = 1) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics). Jit/pjit-ready.

    aux_loss_fn(mstate, mask) -> (extra_loss, extra_metrics): optional hook
    receiving the mutated-collections dict (intermediates are requested when
    the hook is set) -- used e.g. for the 3D attention-consistency loss.

    grad_accum > 1 splits the batch into that many microbatches and runs
    them through a ``lax.scan``, averaging gradients (and metrics) before the
    single optimizer update -- effective batch sizes beyond what one chip's
    HBM can hold in a single backward (the reference has no counterpart; on
    GPU it would simply OOM, train2d.py:1134). Activation memory is that of
    ONE microbatch. For BatchNorm-free models the gradient is the exact
    full-batch mean (every microbatch loss is itself a mean over its
    samples). With BatchNorm, normalization statistics are computed per
    microbatch -- forward activations (and hence gradients) match training
    at the smaller batch size, while only the momentum-EMA running stats
    thread sequentially through the scan.
    """

    def compute_loss(params, batch_stats, batch, rng):
        variables = {"params": params}
        mutable = []
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
            mutable.append("batch_stats")
        if aux_loss_fn is not None:
            mutable.append("intermediates")
        if mutable:
            logits, new_mstate = model.apply(
                variables, batch["image"], train=True,
                rngs={"dropout": rng}, mutable=mutable)
            new_bstats = new_mstate.get("batch_stats", batch_stats)
        else:
            logits = model.apply(variables, batch["image"], train=True,
                                 rngs={"dropout": rng})
            new_mstate = {}
            new_bstats = batch_stats
        loss, metrics = loss_fn(logits, batch["mask"])
        if aux_loss_fn is not None:
            extra, extra_metrics = aux_loss_fn(new_mstate, batch["mask"])
            loss = loss + extra
            metrics.update(extra_metrics)
            metrics["loss"] = loss
        return loss, (metrics, new_bstats)

    grad_fn = jax.value_and_grad(compute_loss, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng = jax.random.fold_in(state.rng, state.step)

        if grad_accum <= 1:
            (_, (metrics, new_bstats)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((grad_accum, x.shape[0] // grad_accum)
                                    + x.shape[1:]), batch)

            def body(carry, inp):
                gsum, bstats = carry
                mb, i = inp
                (_, (m, nb)), g = grad_fn(state.params, bstats, mb,
                                          jax.random.fold_in(rng, i))
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                return (gsum, nb), m

            gzero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (gsum, new_bstats), ms = jax.lax.scan(
                body, (gzero, state.batch_stats),
                (micro, jnp.arange(grad_accum)))
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
            metrics = jax.tree_util.tree_map(lambda m: jnp.mean(m, 0), ms)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bstats,
                                  opt_state=new_opt_state)
        return new_state, metrics

    return train_step


def create_train_state(params, batch_stats, tx, rng) -> TrainState:
    # One jitted program instead of eager per-leaf dispatch: tx.init +
    # the de-alias copy are ~4 ops per param leaf, and through the remote
    # TPU tunnel eager dispatch is round-trip bound (CLAUDE.md) -- on the
    # CLI startup path this was minutes of silent wall clock.
    def build(params, batch_stats, rng):
        state = TrainState(step=jnp.zeros([], jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=tx.init(params),
                           rng=rng)
        # De-alias leaves: jax caches identical constants (e.g. the
        # optimizer's zero moments), and donating a state with two leaves
        # sharing one buffer fails ("attempt to donate the same buffer
        # twice"). Inside jit each output is a distinct allocation, and the
        # copy keeps that true if XLA ever aliases.
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                      state)

    return jax.jit(build)(params, batch_stats, rng)
