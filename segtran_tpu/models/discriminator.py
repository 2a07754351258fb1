"""Domain discriminator for adversarial DA (and the learned vCDR estimator).

Parity target: reference code/networks/discriminator.py:24-86 -- 5 stride-2
4x4 convs with BN + LeakyReLU(0.2), optional gradient-reversal first layer
(RevGrad mode) and adaptive-avg-pool head. Param scopes follow the torch
Sequential indices (which shift by one when revgrad is inserted,
discriminator.py:70-71) so checkpoints convert without special cases.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..adapt.revgrad import gradient_reversal


class Discriminator(nn.Module):
    num_classes: int = 2
    do_avgpool: bool = True
    do_revgrad: bool = True
    num_base_chan: int = 32
    revgrad_alpha: float = 1.0
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, C] -> [B, num_classes] domain logits."""
        if min(x.shape[1], x.shape[2]) < 32:
            # 5 stride-2 4x4 convs collapse anything smaller to a zero-size
            # tensor (BatchNorm over it silently yields NaN); the reference's
            # torch convs hard-error the same way ("Output size too small").
            raise ValueError(
                f"Discriminator input spatial dims {x.shape[1:3]} too small: "
                "the 5 stride-2 convs need >= 32x32 (use --adv mask, or a "
                "larger patch size, for small feature grids)")
        off = 1 if self.do_revgrad else 0
        if self.do_revgrad:
            x = gradient_reversal(x, self.revgrad_alpha)
        nb = self.num_base_chan
        chans = [nb, 2 * nb, 4 * nb, 8 * nb]
        idx = off
        for c in chans:
            x = nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        name=f"model_{idx}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.bn_axis_name,
                             name=f"model_{idx+1}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            idx += 3
        x = nn.Conv(self.num_classes, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name=f"model_{idx}")(x)
        if self.do_avgpool:
            x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1) + Flatten
        else:
            x = x.reshape(x.shape[0], -1)
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="tail_1")(x)
        return x.astype(jnp.float32)
