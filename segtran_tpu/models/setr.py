"""SETR-PUP baseline (--net setr): pure ViT encoder + progressive-upsampling
decoder.

Capability parity with the reference's vendored mmseg SETR slice -- the
reference drags a 16k-LoC mmseg tree but only uses the SETR_PUP variant
(reference train2d.py:954-974, configs/SETR/SETR_PUP_288x288_10k_fundus...).
This implements exactly that variant from the published architecture:
ViT-Large-ish encoder on 16x16 patches, PUP head = 4x (conv3x3 + BN + ReLU +
2x bilinear upsample), plus optional auxiliary heads from intermediate layers.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.vit import PatchEmbed, ViTEncoder
from ..ops.resize import resize_linear


class SETR_PUP(nn.Module):
    num_classes: int = 2
    patch: int = 16
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    head_channels: int = 256
    with_aux_heads: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        b, h, w, _ = x.shape
        tokens, (gh, gw) = PatchEmbed(self.hidden_dim, self.patch, dtype=dt,
                                      name="embeddings")(
            x, deterministic=not train)
        enc = ViTEncoder(self.num_layers, self.num_heads, self.mlp_dim,
                         keep_layer_outputs=self.with_aux_heads, dtype=dt,
                         name="encoder")(tokens, deterministic=not train)
        if self.with_aux_heads:
            enc, layer_outs = enc
        feat = enc.reshape(b, gh, gw, self.hidden_dim)

        def pup_stage(v, i):
            v = nn.Conv(self.head_channels, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=dt, name=f"pup{i}_conv")(v)
            v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=dt, name=f"pup{i}_bn")(v)
            v = nn.relu(v)
            return resize_linear(v, (v.shape[1] * 2, v.shape[2] * 2))

        v = feat
        for i in range(4):
            v = pup_stage(v, i)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                         name="cls_head")(v)
        if logits.shape[1:3] != (h, w):
            logits = resize_linear(logits, (h, w))
        logits = logits.astype(jnp.float32)
        if not self.with_aux_heads:
            return logits
        aux = []
        for i, li in enumerate((self.num_layers // 4,
                                self.num_layers // 2,
                                3 * self.num_layers // 4)):
            a = layer_outs[li - 1].reshape(b, gh, gw, self.hidden_dim)
            a = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                        name=f"aux_head_{i}")(a)
            aux.append(resize_linear(a.astype(jnp.float32), (h, w)))
        return logits, aux
