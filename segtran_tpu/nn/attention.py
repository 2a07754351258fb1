"""The Squeeze-and-Expansion transformer core.

Parity targets in the reference:
  * CrossAttFeatTrans (multi-mode QK attention)   -> segtran_shared.py:478-610
  * ExpandedFeatTrans ("expansion" V/FFN block)   -> segtran_shared.py:329-476
  * MM{Private,Shared}{Mid,Output} FFN pieces     -> segtran_shared.py:200-308
  * LearnedSoftAggregate (mode pooling)           -> segtran_shared.py:311-325
  * SqueezedAttFeatTrans (attractor squeeze)      -> segtran_shared.py:787-816
  * MultiHeadFeatTrans ablation                   -> segtran_ablation.py

Numerics replicated exactly so released reference checkpoints reach Dice parity
after weight conversion:
  * scores scaled by 1/sqrt(in_feat_dim / num_modes),
  * clamping to +-attn_clip applied ONLY when the global max exceeds the clip
    (segtran_shared.py:575-580: min-side outliers are untouched otherwise),
  * LayerNorm eps = 1e-12,
  * exact (erf) GELU, not the tanh approximation,
  * MMPrivateOutput drops its residual (segtran_shared.py:266-275 computes
    x_comb but normalizes x) -- reproduced under
    ``fix_private_output_residual=False`` (the default).

TPU-first notes: everything is channels-last einsum/matmul, shapes are static,
and the squeezed layer's two cross-attentions (N x A and A x N, A=attractors)
are plain batched matmuls that tile directly onto the MXU. A fused Pallas
kernel for the squeezed attention lives in ``segtran_tpu.kernels``; these
modules are the reference XLA path and the numerics oracle for it.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norm import layer_norm

_normal = nn.initializers.normal


def _gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def _clamp_if_exceeds(scores: jnp.ndarray, clip: float) -> jnp.ndarray:
    """Reference semantics (segtran_shared.py:575-580): clamp to [-clip, clip]
    only when the *global max* exceeds clip; otherwise pass through (even if the
    min is below -clip)."""
    max_attn = jnp.max(scores)
    return jnp.where(max_attn > clip, jnp.clip(scores, -clip, clip), scores)


@dataclasses.dataclass(frozen=True)
class TransLayerSpec:
    """Per-layer hyperparameters of one attention + expansion block. A trimmed,
    hashable view of TransformerConfig for use as a flax module field."""
    in_feat_dim: int
    feat_dim: int
    num_modes: int = 4
    qk_have_bias: bool = True
    v_has_bias: bool = False
    tie_qk_scheme: str = "shared"          # shared | loose | none
    attn_clip: float = 500.0
    has_FFN: bool = True
    has_input_skip: bool = False
    mid_type: str = "shared"               # shared | private | none
    trans_output_type: str = "private"     # shared | private
    pool_modes_feat: str = "softmax"       # softmax | max | mean | none
    attention_probs_dropout_prob: float = 0.1
    hidden_dropout_prob: float = 0.1
    base_initializer_range: float = 0.02
    query_idbias_scale: float = 10.0
    feattrans_lin1_idbias_scale: float = 10.0
    pos_code_weight: float = 1.0           # only used for 'bias' pos codes
    ablate_multihead: bool = False
    fix_private_output_residual: bool = False
    # Pallas flash-style fused QK^T+softmax+PV (kernels/squeezed_attention.py).
    # Falls back to the exact XLA path when attention dropout is active, when
    # positional biases are fed into scores, or when scores must be kept.
    use_fused_attention: bool = False
    # sow (max, pos-avg, clamped) attention stats for the trainer's periodic
    # diagnostics line (reference segtran_shared.py:569-587)
    keep_attn_diag: bool = False
    # exact matmul reassociations exploiting A << N in the squeezed layer
    # (see ExpandedFeatTrans.__call__); same math, fewer FLOPs.
    reassociate: bool = True
    # Pallas fused private-output + LayerNorm + softmax mode-pool over the
    # [B, M, N, F] mid tensor (kernels/expansion_epilogue.py). Inference-only
    # (no VJP); engages when deterministic and the [M, F, F] output weight
    # fits the kernel's VMEM budget, else the exact XLA path runs.
    use_fused_epilogue: bool = False
    ln_eps: float = 1e-12
    dtype: Any = jnp.float32

    @property
    def attention_mode_dim(self) -> int:
        return self.in_feat_dim // self.num_modes

    @property
    def att_size_allmode(self) -> int:
        return self.num_modes * self.attention_mode_dim


class LearnedSoftAggregate(nn.Module):
    """Learned softmax pooling over a group axis (reference
    segtran_shared.py:311-325)."""
    num_feat: int
    group_dim: int
    keepdim: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 score_basis: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if score_basis is None:
            score_basis = x
        scores = nn.Dense(1, name="feat2score", kernel_init=_normal(0.02),
                          bias_init=nn.initializers.zeros,
                          dtype=self.dtype)(score_basis)
        probs = jax.nn.softmax(scores, axis=self.group_dim)
        return jnp.sum(x * probs, axis=self.group_dim, keepdims=self.keepdim)


class _SharedLinear(nn.Module):
    """Parameter-compatible stand-in for the nn.Dense inside MMSharedMid /
    ExpandedFeatTrans (same scope/param names, same promote-dtype math on the
    plain path), extended with attention-reassociation entry points:

      * ``probs``: return probs @ (x W) + b computed as the cheaper
        (x W) first when x is the small attractor side -- used by the
        shared-mid reassociation (see ExpandedFeatTrans.__call__).
      * ``stage='premul'``: return x W only (no bias) for feeding a streaming
        attention kernel as its V operand.
      * ``stage='post'``: return x + b -- finish a deferred premul after the
        kernel contracted probs into x W.

    Reassociation is exact: P (X W) == (P X) W for any P (matmul
    associativity); the bias is exact because it is added AFTER the probs
    contraction in all modes.
    """
    features: int
    use_bias: bool = True
    kernel_init: Any = _normal(0.02)
    bias_init: Any = nn.initializers.zeros
    dtype: Any = jnp.float32
    in_features: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, probs: Optional[jnp.ndarray] = None,
                 stage: str = "full") -> jnp.ndarray:
        in_feat = self.in_features if stage == "post" else x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (in_feat, self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        if stage == "post":
            return x + bias.astype(self.dtype) if bias is not None else x
        if probs is None and stage == "full":
            # identical math to flax nn.Dense
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype)
            y = jax.lax.dot_general(x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
            return y + bias if bias is not None else y
        if stage == "grouped":
            # x: probs-contracted features [B, M, U1, C]; kernel [C, M*F]
            # applied per-mode: channel m*F+f of the reference's expansion
            # belongs to (mode m, feature f) -- see compute_v.
            m = x.shape[1]
            ker = kernel.astype(self.dtype).reshape(
                in_feat, m, self.features // m)
            assert bias is None, "grouped premul requires v_has_bias=False"
            return jnp.einsum("bmqc,cmf->bmqf", x.astype(self.dtype), ker,
                              preferred_element_type=self.dtype)
        xw = jnp.einsum("...kc,cf->...kf", x.astype(self.dtype),
                        kernel.astype(self.dtype),
                        preferred_element_type=self.dtype)
        if stage == "premul":
            return xw
        y = jnp.einsum("bmqk,bmkf->bmqf", probs, xw,
                       preferred_element_type=self.dtype)
        return y + bias.astype(self.dtype) if bias is not None else y


class _QKDense(nn.Module):
    """Parameter-compatible stand-in for the nn.Dense Q/K projections (same
    scope/param names + promote-dtype math on the plain path), extended with
    ``stage='kernel'`` / ``'bias'`` raw-parameter access so the score
    computation can reassociate the projection of the BIG token side through
    the small attractor side (see CrossAttFeatTrans.__call__): params must
    exist on every trace, including ones that never apply this projection
    directly."""
    features: int
    in_features: int
    use_bias: bool = True
    kernel_init: Any = _normal(0.02)
    bias_init: Any = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray] = None,
                 stage: str = "full") -> Optional[jnp.ndarray]:
        kernel = self.param("kernel", self.kernel_init,
                            (self.in_features, self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        if stage == "kernel":
            return kernel
        if stage == "bias":
            return bias
        # identical math to flax nn.Dense
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        y = jax.lax.dot_general(x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
        return y + bias if bias is not None else y


class MMPrivateLinear(nn.Module):
    """Per-mode private linear, the TPU-native equivalent of the reference's
    grouped 1x1 Conv1d (segtran_shared.py:200-218, 255-275). One einsum over a
    [M, F, F] kernel instead of a grouped convolution."""
    num_modes: int
    feat_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, M, U, F] -> [B, M, U, F]
        kernel = self.param("kernel", _normal(0.02),
                            (self.num_modes, self.feat_dim, self.feat_dim))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.num_modes, self.feat_dim))
        y = jnp.einsum("bmuf,mfg->bmug", x, kernel.astype(self.dtype),
                       preferred_element_type=self.dtype)
        return y + bias.astype(self.dtype)[None, :, None, :]


class MMSharedMid(nn.Module):
    """Shared FFN middle: Linear(F->F) + GELU + dropout
    (reference segtran_shared.py:220-251).

    ``probs`` reassociates the preceding attention contraction through the
    shared linear: gelu((P V) W + b) == gelu(P (V W) + b), so when V lives on
    the small attractor side the N-token mid matmul collapses to an
    A-attractor one. ``stage='premul'`` / ``'post'`` split the same algebra
    around a streaming attention kernel (V W fed as the kernel's V operand).
    """
    num_modes: int
    feat_dim: int
    hidden_dropout_prob: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 probs: Optional[jnp.ndarray] = None,
                 stage: str = "full") -> jnp.ndarray:
        y = _SharedLinear(self.feat_dim, name="shared_linear",
                          kernel_init=_normal(0.02),
                          bias_init=nn.initializers.zeros, dtype=self.dtype,
                          in_features=self.feat_dim)(x, probs=probs,
                                                     stage=stage)
        if stage == "premul":
            return y
        y = _gelu_exact(y)
        return nn.Dropout(self.hidden_dropout_prob)(y, deterministic=deterministic)


class MMPrivateMid(nn.Module):
    """Private (per-mode) FFN middle (reference segtran_shared.py:200-218)."""
    num_modes: int
    feat_dim: int
    hidden_dropout_prob: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = MMPrivateLinear(self.num_modes, self.feat_dim, dtype=self.dtype,
                            name="group_linear")(x)
        y = _gelu_exact(y)
        return nn.Dropout(self.hidden_dropout_prob)(y, deterministic=deterministic)


class MMSharedOutput(nn.Module):
    """Shared FFN output: Linear + residual + dropout + LayerNorm
    (reference segtran_shared.py:279-308)."""
    num_modes: int
    feat_dim: int
    hidden_dropout_prob: float = 0.1
    ln_eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, shortcut: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        y = nn.Dense(self.feat_dim, name="shared_linear",
                     kernel_init=_normal(0.02),
                     bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
        y = y + shortcut
        y = nn.Dropout(self.hidden_dropout_prob)(y, deterministic=deterministic)
        return layer_norm(self.dtype, epsilon=self.ln_eps,
                          name="resout_norm_layer")(y)


class MMPrivateOutput(nn.Module):
    """Private FFN output (reference segtran_shared.py:255-275).

    NOTE: the reference computes ``x_comb = x + shortcut`` but then reshapes
    and normalizes ``x`` -- the residual is dropped on the private path. The
    default (fix_residual=False) reproduces that exactly; set fix_residual=True
    for the corrected block when training new models.
    """
    num_modes: int
    feat_dim: int
    hidden_dropout_prob: float = 0.1
    fix_residual: bool = False
    ln_eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, shortcut: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        y = MMPrivateLinear(self.num_modes, self.feat_dim, dtype=self.dtype,
                            name="group_linear")(x)
        if self.fix_residual:
            y = y + shortcut
        y = nn.Dropout(self.hidden_dropout_prob)(y, deterministic=deterministic)
        return layer_norm(self.dtype, epsilon=self.ln_eps,
                          name="resout_norm_layer")(y)


class ExpandedFeatTrans(nn.Module):
    """The "expansion" block: private multi-mode V projection, attention-fused
    values, optional FFN, then mode pooling (reference segtran_shared.py:329-476).
    """
    spec: TransLayerSpec

    def setup(self):
        s = self.spec
        self.first_linear = _SharedLinear(
            s.feat_dim * s.num_modes, use_bias=s.v_has_bias,
            kernel_init=_normal(s.base_initializer_range),
            bias_init=nn.initializers.zeros, dtype=s.dtype, name="first_linear")
        # Used only on the no-FFN path (segtran_shared.py:452-457).
        self.first_norm_layer = layer_norm(s.dtype, epsilon=s.ln_eps,
                                           name="first_norm_layer")
        if s.pool_modes_feat == "softmax":
            self.feat_softaggr = LearnedSoftAggregate(
                s.feat_dim, group_dim=1, keepdim=False, dtype=s.dtype,
                name="feat_softaggr")
        if s.has_input_skip:
            self.input_skip_coeff = self.param(
                "input_skip_coeff", nn.initializers.ones, (1,))
        if s.has_FFN:
            if s.mid_type == "shared":
                self.intermediate = MMSharedMid(
                    s.num_modes, s.feat_dim, s.hidden_dropout_prob,
                    dtype=s.dtype, name="intermediate")
            elif s.mid_type == "private":
                self.intermediate = MMPrivateMid(
                    s.num_modes, s.feat_dim, s.hidden_dropout_prob,
                    dtype=s.dtype, name="intermediate")
            else:
                self.intermediate = None
            if s.trans_output_type == "shared":
                self.output = MMSharedOutput(
                    s.num_modes, s.feat_dim, s.hidden_dropout_prob,
                    ln_eps=s.ln_eps, dtype=s.dtype, name="output")
            elif s.trans_output_type == "private":
                self.output = MMPrivateOutput(
                    s.num_modes, s.feat_dim, s.hidden_dropout_prob,
                    fix_residual=s.fix_private_output_residual,
                    ln_eps=s.ln_eps, dtype=s.dtype, name="output")

    def compute_v(self, input_feat: jnp.ndarray) -> jnp.ndarray:
        """V projection expanded into M modes: [B, U2, in] -> [B, M, U2, F].
        The reference's channel grouping (view(B, M, F, U).transpose) assigns
        output channel m*F+f to (mode m, feature f); reshape(B,U2,M,F) +
        transpose reproduces it (last dim fastest)."""
        s = self.spec
        b, u2, _ = input_feat.shape
        v = self.first_linear(input_feat)
        return v.reshape(b, u2, s.num_modes, s.feat_dim).transpose(0, 2, 1, 3)

    def supports_mid_premul(self) -> bool:
        """Whether the V W1 push-through (see __call__ Path B) is valid for
        this spec -- used by the fused-attention branch to feed V W1 as the
        streaming kernel's V operand."""
        s = self.spec
        return (s.reassociate and not s.v_has_bias and s.has_FFN
                and s.mid_type == "shared"
                and s.trans_output_type == "private"
                and not s.fix_private_output_residual
                and s.pool_modes_feat in ("softmax", "max", "mean", "none"))

    def apply_mid_premul(self, in_key: jnp.ndarray) -> jnp.ndarray:
        """[B, U2, C] -> V W1 [B, M, U2, F] (no bias): the operand a streaming
        attention kernel contracts with P in place of V."""
        return self.intermediate(self.compute_v(in_key), stage="premul")

    def finish_from_mid_premul(self, mid_pre: jnp.ndarray,
                               deterministic: bool = True) -> jnp.ndarray:
        """Continue after the kernel: mid = dropout(gelu(mid_pre + b1)),
        private output (residual dropped per the reference quirk), pool."""
        mid = self.intermediate(mid_pre, deterministic=deterministic,
                                stage="post")
        return self._output_and_pool(mid, None, deterministic)

    def _fused_epilogue_ok(self, deterministic: bool) -> bool:
        s = self.spec
        if not (s.use_fused_epilogue and deterministic
                and not self.is_initializing()
                and s.has_FFN and s.trans_output_type == "private"
                and not s.fix_private_output_residual
                and s.pool_modes_feat == "softmax"):
            return False
        from ..kernels.expansion_epilogue import supports
        itemsize = jnp.dtype(s.dtype).itemsize
        return supports(s.num_modes, s.feat_dim, itemsize)

    def _fused_full_tier(self, deterministic: bool,
                         num_keys: int) -> Optional[str]:
        """Tier of the fully fused P->mid->output->pool path (only valid on
        the shared-mid reassociation branch that calls it): 'full' when the
        all-modes [M,F,F] W2 sits in VMEM, 'permode' when only a single
        mode's [F,F] does (the flagship's F=1792 layer 0), else None."""
        s = self.spec
        if not (s.use_fused_epilogue and deterministic
                and not self.is_initializing()
                and s.trans_output_type == "private"
                and not s.fix_private_output_residual
                and s.pool_modes_feat == "softmax"):
            return None
        from ..kernels.expansion_epilogue import (supports_full,
                                                  supports_permode)
        itemsize = jnp.dtype(s.dtype).itemsize
        if supports_full(s.num_modes, num_keys, s.feat_dim, itemsize):
            return "full"
        if supports_permode(num_keys, s.feat_dim, itemsize):
            return "permode"
        return None

    def _output_and_pool(self, mid: jnp.ndarray, shortcut,
                         deterministic: bool) -> jnp.ndarray:
        """output block + mode pooling; takes the fused Pallas epilogue
        (one HBM pass) when the spec/phase allow it."""
        s = self.spec
        if self._fused_epilogue_ok(deterministic):
            from ..kernels.expansion_epilogue import fused_private_output_pool
            ov = self.output.variables["params"]
            pv = self.feat_softaggr.variables["params"]["feat2score"]
            return fused_private_output_pool(
                mid, ov["group_linear"]["kernel"],
                ov["group_linear"]["bias"],
                ov["resout_norm_layer"]["scale"],
                ov["resout_norm_layer"]["bias"],
                pv["kernel"], pv["bias"], ln_eps=s.ln_eps)
        last = self.output(mid, shortcut, deterministic=deterministic)
        return self._pool_modes(last)

    def __call__(self, input_feat: jnp.ndarray,
                 attention_probs: Optional[jnp.ndarray] = None,
                 fused: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """input_feat: [B, U2, in_feat_dim]; attention_probs: [B, M, U1, U2]
        (or pass precomputed `fused` [B, M, U1, F] from the Pallas kernel).
        Returns [B, U1, feat_dim] (or [B, M, U1, feat_dim] if pooling 'none')."""
        s = self.spec
        if self.is_initializing():
            # Metadata for the post-init weight transforms (see nn/init.py).
            self.sow("site_meta", "expansion", jnp.array(
                [s.num_modes, s.in_feat_dim, s.feat_dim,
                 s.feattrans_lin1_idbias_scale, s.base_initializer_range],
                dtype=jnp.float32))
        if fused is None:
            u1, u2 = attention_probs.shape[2], attention_probs.shape[3]
            if s.reassociate and not s.v_has_bias and u2 > u1:
                # MXU reassociation, exact: P (X Wv) == (P X) Wv. On the
                # squeeze-in side (queries = A attractors << U2 = N tokens)
                # contracting P into the raw features first shrinks the token
                # axis from N to A before the fat Wv matmul -- ~N/A x fewer
                # FLOPs there and no [B,M,N,F] V materialization.
                px = jnp.einsum("bmqk,bkc->bmqc", attention_probs,
                                input_feat.astype(s.dtype),
                                preferred_element_type=s.dtype)
                fused = self.first_linear(px, stage="grouped")
            elif (s.reassociate and not s.v_has_bias and u2 < u1
                  and s.has_FFN and s.mid_type == "shared"
                  and s.trans_output_type == "private"
                  and not s.fix_private_output_residual):
                # Attractor-out side (queries = N >> keys = A): push the
                # shared FFN-mid weight through the tiny attractor-side V:
                # gelu((P V) W1 + b1) == gelu(P (V W1) + b1). Skips both the
                # N-token mid matmul and the [B,M,N,F] fused tensor; valid
                # because MMPrivateOutput drops its residual (the reference
                # quirk), so `fused` is never consumed downstream.
                v = self.compute_v(input_feat)
                tier = self._fused_full_tier(deterministic, u2)
                if tier is not None:
                    # Full Pallas fusion: mid is computed tile-by-tile inside
                    # the epilogue kernel from P and (V W1) -- the [B,M,N,F]
                    # mid tensor never touches HBM.
                    from ..kernels import expansion_epilogue as epi
                    fn = (epi.fused_mid_output_pool if tier == "full"
                          else epi.fused_mid_output_pool_permode)
                    vw1 = self.intermediate(v, stage="premul")
                    b1 = self.intermediate.variables[
                        "params"]["shared_linear"]["bias"]
                    ov = self.output.variables["params"]
                    pv = self.feat_softaggr.variables["params"]["feat2score"]
                    return fn(
                        attention_probs, vw1, b1,
                        ov["group_linear"]["kernel"],
                        ov["group_linear"]["bias"],
                        ov["resout_norm_layer"]["scale"],
                        ov["resout_norm_layer"]["bias"],
                        pv["kernel"], pv["bias"], ln_eps=s.ln_eps)
                mid = self.intermediate(v, deterministic=deterministic,
                                        probs=attention_probs)
                return self._output_and_pool(mid, None, deterministic)
            else:
                v = self.compute_v(input_feat)
                # Fuse values: [B,M,U1,U2] @ [B,M,U2,F] -> [B,M,U1,F].
                fused = jnp.einsum("bmqk,bmkf->bmqf", attention_probs, v,
                                   preferred_element_type=s.dtype)

        if not s.has_FFN:
            # Aggregate-only path (segtran_shared.py:452-457); used by the
            # squeeze-in attention and the Polyformer.
            out = self.feat_softaggr(fused)
            if s.has_input_skip:
                out = out + self.input_skip_coeff.astype(s.dtype) * input_feat
            return self.first_norm_layer(out)

        mid = self.intermediate(fused, deterministic=deterministic) \
            if self.intermediate is not None else _gelu_exact(fused)
        return self._output_and_pool(mid, fused, deterministic)

    def _pool_modes(self, last: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        if s.pool_modes_feat == "softmax":
            return self.feat_softaggr(last)
        if s.pool_modes_feat == "max":
            return jnp.max(last, axis=1)
        if s.pool_modes_feat == "mean":
            return jnp.mean(last, axis=1)
        return last


class CrossAttFeatTrans(nn.Module):
    """One transformer layer: multi-mode QK cross-attention feeding an
    ExpandedFeatTrans (reference segtran_shared.py:478-610)."""
    spec: TransLayerSpec
    keep_attn_scores: bool = False

    @nn.compact
    def __call__(self, in_query: jnp.ndarray,
                 in_key: Optional[jnp.ndarray] = None,
                 pos_biases: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        s = self.spec
        if self.is_initializing():
            tie_code = {"shared": 0, "loose": 1, "none": 2}[s.tie_qk_scheme]
            self.sow("site_meta", "attention", jnp.array(
                [s.num_modes, s.in_feat_dim, tie_code,
                 s.query_idbias_scale, s.base_initializer_range],
                dtype=jnp.float32))
        if in_key is None:
            in_key = in_query
        b, u1, _ = in_query.shape
        u2 = in_key.shape[1]
        m, amd = s.num_modes, s.attention_mode_dim

        c_q, c_k = in_query.shape[-1], in_key.shape[-1]
        query = _QKDense(s.att_size_allmode, in_features=c_q,
                         use_bias=s.qk_have_bias,
                         kernel_init=_normal(s.base_initializer_range),
                         bias_init=nn.initializers.zeros, dtype=s.dtype,
                         name="query")
        if s.tie_qk_scheme == "shared":
            # Q and K share one parameter set: apply the same Dense twice
            # (reference tie_qk 'shared', segtran_shared.py:528-531).
            key = query
        else:
            key = _QKDense(s.att_size_allmode, in_features=c_k,
                           use_bias=s.qk_have_bias,
                           kernel_init=_normal(s.base_initializer_range),
                           bias_init=nn.initializers.zeros, dtype=s.dtype,
                           name="key")

        def proj_q():
            return query(in_query).reshape(b, u1, m, amd).transpose(0, 2, 1, 3)

        def proj_k():
            return key(in_key).reshape(b, u2, m, amd).transpose(0, 2, 1, 3)

        fused_ok = (s.use_fused_attention and pos_biases is None
                    and not self.keep_attn_scores and not s.ablate_multihead
                    and (deterministic
                         or s.attention_probs_dropout_prob == 0.0))
        if fused_ok:
            from ..kernels.squeezed_attention import (
                fused_cross_attention_trainable)
            out_trans = ExpandedFeatTrans(s, name="out_trans")
            f = s.feat_dim
            q, k = proj_q(), proj_k()
            if u2 < u1 and out_trans.supports_mid_premul():
                # Reassociated streaming path: the kernel contracts P with
                # V W1 instead of V (gelu((P V) W1 + b1) == gelu(P (V W1) +
                # b1)), skipping the U1-token mid matmul entirely.
                vw = out_trans.apply_mid_premul(in_key)    # [B,M,U2,F]
                mid_pre = fused_cross_attention_trainable(
                    q.reshape(b * m, u1, amd), k.reshape(b * m, u2, amd),
                    vw.reshape(b * m, u2, f), s.attn_clip)
                mid_pre = mid_pre.reshape(b, m, u1, f).astype(s.dtype)
                return out_trans.finish_from_mid_premul(
                    mid_pre, deterministic=deterministic)
            v = out_trans.compute_v(in_key)                # [B,M,U2,F]
            fused = fused_cross_attention_trainable(
                q.reshape(b * m, u1, amd), k.reshape(b * m, u2, amd),
                v.reshape(b * m, u2, f), s.attn_clip)
            fused = fused.reshape(b, m, u1, f).astype(s.dtype)
            return out_trans(in_key, fused=fused,
                             deterministic=deterministic)

        # fp32 MXU accumulation always; in half precision the stored score
        # tensor follows the compute dtype (softmax still reduces in fp32
        # below) -- halves the [B,M,U1,U2] HBM footprint in bf16 mode.
        score_dt = jnp.float32 if s.dtype == jnp.float32 else s.dtype
        # Exact QK reassociation (the score-side analogue of
        # ExpandedFeatTrans's V reassociation): when one side is much bigger
        # (the squeezed layer's N tokens vs A attractors), fold the BIG
        # side's projection through the small side --
        #   (X Wq + bq)(K)^T == X (Wq K^T) + (bq K^T)   [q-fold, u1 >> u2]
        #   (Q)(X Wk + bk)^T == (Q Wk^T) X^T + (Q bk)   [k-fold, u2 >> u1]
        # -- matmul associativity, so the scores (and everything after:
        # clamp, diag, pos biases, softmax) are unchanged up to rounding.
        # The big [B, N, M*amd] Q/K tensor is never materialized and the
        # projection FLOPs shrink by ~N/A. Static win tests compare exact
        # contraction counts.
        q_fold = (s.reassociate
                  and u2 * c_q * (amd + u1) < amd * u1 * (c_q + u2))
        k_fold = (s.reassociate
                  and u1 * c_k * (amd + u2) < amd * u2 * (c_k + u1))
        if q_fold:
            k = proj_k()                                     # [B,M,U2,amd]
            wq = query(stage="kernel").astype(s.dtype).reshape(c_q, m, amd)
            wfold = jnp.einsum("cmd,bmad->bmca", wq, k,
                               preferred_element_type=s.dtype)
            scores = jnp.einsum("bqc,bmca->bmqa", in_query.astype(s.dtype),
                                wfold, preferred_element_type=score_dt)
            if s.qk_have_bias:
                bq = query(stage="bias").astype(s.dtype).reshape(m, amd)
                scores = scores + jnp.einsum(
                    "md,bmad->bma", bq, k,
                    preferred_element_type=score_dt)[:, :, None, :]
        elif k_fold:
            q = proj_q()                                     # [B,M,U1,amd]
            wk = key(stage="kernel").astype(s.dtype).reshape(c_k, m, amd)
            qfold = jnp.einsum("bmqd,cmd->bmqc", q, wk,
                               preferred_element_type=s.dtype)
            scores = jnp.einsum("bmqc,bkc->bmqk", qfold,
                                in_key.astype(s.dtype),
                                preferred_element_type=score_dt)
            if s.qk_have_bias:
                bk = key(stage="bias").astype(s.dtype).reshape(m, amd)
                scores = scores + jnp.einsum(
                    "bmqd,md->bmq", q, bk,
                    preferred_element_type=score_dt)[..., None]
        else:
            scores = jnp.einsum("bmqd,bmkd->bmqk", proj_q(), proj_k(),
                                preferred_element_type=score_dt)
        scores = scores / math.sqrt(amd)
        if s.keep_attn_diag:
            # max / positive-mean / clamped-this-call, the stats behind the
            # reference's every-500-calls print (segtran_shared.py:569-587).
            # Sown (not printed): under jit the trainer surfaces them as
            # metrics and logs on the reference's cadence.
            sg = jax.lax.stop_gradient(scores)
            cur_max = jnp.max(sg)
            pos = jnp.sum((sg > 0).astype(jnp.float32))
            cur_avg = jnp.sum(sg) / jnp.maximum(pos, 1.0)
            self.sow("intermediates", "attn_diag",
                     jnp.stack([cur_max, cur_avg,
                                (cur_max > s.attn_clip).astype(jnp.float32)]))
        scores = _clamp_if_exceeds(scores, s.attn_clip)
        if pos_biases is not None:
            scores = scores + s.pos_code_weight * pos_biases
        if self.keep_attn_scores:
            self.sow("intermediates", "attention_scores", scores)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        probs = probs.astype(s.dtype)
        probs = nn.Dropout(s.attention_probs_dropout_prob)(
            probs, deterministic=deterministic)

        if s.ablate_multihead:
            out_trans = MultiHeadFeatTrans(s, name="out_trans")
        else:
            out_trans = ExpandedFeatTrans(s, name="out_trans")
        return out_trans(in_key, probs, deterministic=deterministic)


class MultiHeadFeatTrans(nn.Module):
    """Ablation: standard multi-head attention output instead of the
    expansion block (reference segtran_ablation.py:182-253): V projected to
    feat_dim split over num_modes heads, fused per head, heads concatenated
    (channel order = (head, dim)), then ONE-mode MM mid/output blocks
    honoring mid_type / trans_output_type (incl. the private-output
    dropped-residual quirk)."""
    spec: TransLayerSpec

    @nn.compact
    def __call__(self, input_feat: jnp.ndarray, attention_probs: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        s = self.spec
        if self.is_initializing():
            self.sow("site_meta", "expansion", jnp.array(
                [1, s.in_feat_dim, s.feat_dim,
                 s.feattrans_lin1_idbias_scale, s.base_initializer_range],
                dtype=jnp.float32))
        b, u2, _ = input_feat.shape
        m = s.num_modes
        head_dim = s.feat_dim // m
        v = nn.Dense(head_dim * m, use_bias=True,
                     kernel_init=_normal(s.base_initializer_range),
                     bias_init=nn.initializers.zeros, dtype=s.dtype,
                     name="first_linear")(input_feat)
        v = v.reshape(b, u2, m, head_dim).transpose(0, 2, 1, 3)
        fused = jnp.einsum("bmqk,bmkf->bmqf", attention_probs, v,
                           preferred_element_type=s.dtype)
        # Concat heads back: [B, M, U1, hd] -> [B, 1, U1, M*hd = feat_dim]
        u1 = fused.shape[2]
        fused = fused.transpose(0, 2, 1, 3).reshape(b, 1, u1, s.feat_dim)
        if s.mid_type == "shared":
            mid = MMSharedMid(1, s.feat_dim, s.hidden_dropout_prob,
                              dtype=s.dtype, name="intermediate")(
                fused, deterministic=deterministic)
        elif s.mid_type == "private":
            mid = MMPrivateMid(1, s.feat_dim, s.hidden_dropout_prob,
                               dtype=s.dtype, name="intermediate")(
                fused, deterministic=deterministic)
        else:
            mid = _gelu_exact(fused)
        if s.trans_output_type == "shared":
            out = MMSharedOutput(1, s.feat_dim, s.hidden_dropout_prob,
                                 ln_eps=s.ln_eps, dtype=s.dtype,
                                 name="output")(mid, fused,
                                                deterministic=deterministic)
        else:
            out = MMPrivateOutput(1, s.feat_dim, s.hidden_dropout_prob,
                                  fix_residual=s.fix_private_output_residual,
                                  ln_eps=s.ln_eps, dtype=s.dtype,
                                  name="output")(mid, fused,
                                                 deterministic=deterministic)
        return out[:, 0]  # squeeze the single mode


class SqueezedAttFeatTrans(nn.Module):
    """Squeezed attention: N tokens <-> A learnable attractors, two
    cross-attentions, O(N*A) (reference segtran_shared.py:787-816)."""
    spec: TransLayerSpec
    num_attractors: int = 256
    has_FFN_in_squeeze: bool = False
    keep_attn_scores: bool = False

    @nn.compact
    def __call__(self, in_feat: jnp.ndarray,
                 pos_biases: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        s = self.spec
        # in-squeeze: single-mode, no channel compression
        # (reference segtran_shared.py:796-799).
        in_spec = dataclasses.replace(
            s, feat_dim=s.in_feat_dim, num_modes=1,
            has_FFN=self.has_FFN_in_squeeze)
        attractors = self.param(
            "attractors", _normal(1.0),
            (1, self.num_attractors, s.in_feat_dim))
        b = in_feat.shape[0]
        batch_attractors = jnp.broadcast_to(
            attractors.astype(s.dtype),
            (b, self.num_attractors, s.in_feat_dim))
        new_attractors = CrossAttFeatTrans(
            in_spec, name="in_ator_trans",
            keep_attn_scores=self.keep_attn_scores)(
                batch_attractors, in_feat, pos_biases,
                deterministic=deterministic)
        out_feat = CrossAttFeatTrans(
            s, name="ator_out_trans",
            keep_attn_scores=self.keep_attn_scores)(
                in_feat, new_attractors, pos_biases,
                deterministic=deterministic)
        return out_feat
