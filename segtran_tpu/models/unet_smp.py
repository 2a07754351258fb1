"""U-Net with a pretrained-capable encoder (--net unet).

Faithful rewrite of the reference's vendored segmentation_models_pytorch
Unet (reference code/networks/segmentation_models_pytorch/unet/, selected by
--net unet, train2d.py:933-951): an encoder 5-level pyramid feeds the SMP
UnetDecoder -- per stage: nearest 2x upsample, concat skip, then
2x (conv3x3 + BN + ReLU) (unet/decoder.py:35-42) -- and a 3x3
SegmentationHead (base/heads.py:8-12).

Encoders: our ResNet (torchvision-compatible stages, exactly the SMP
ResNetEncoder taps encoders/resnet.py:47-55: stem, maxpool+layer1,
layer2..4) or our EfficientNet endpoints. Reference SMP checkpoints with
resnet encoders import via convert.torch_import.convert_unet_smp.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.backbones.efficientnet import EfficientNetFeatures
from ..nn.backbones.resnet import ResNetFeatures
from ..ops.resize import resize_linear


def _upsample_nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate(scale_factor=2, mode='nearest') (unet/decoder.py:36)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class _DecoderBlock(nn.Module):
    """SMP DecoderBlock (unet/decoder.py:8-42), attention_type=None."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train=False):
        x = _upsample_nearest2x(x)
        if skip is not None:
            if skip.shape[1:3] != x.shape[1:3]:
                # robustness for non-divisible inputs; the reference
                # requires /32 inputs, so this never fires at parity
                skip = resize_linear(skip, x.shape[1:3])
            x = jnp.concatenate([x, skip], axis=-1)
        for i in (1, 2):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UnetSMP(nn.Module):
    num_classes: int = 2
    encoder: str = "eff-b4"
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        h, w = x.shape[1:3]
        if self.encoder.startswith("eff-"):
            # capability path (lukemelas reduction_1..5 taps; SMP's eff
            # encoder taps the stem instead -- no eff-SMP converter)
            feats = EfficientNetFeatures(variant=self.encoder, stem_stride=2,
                                         dtype=dt,
                                         name="encoder")(x, train=train)
        else:
            feats = ResNetFeatures(variant=self.encoder, do_pool1=True,
                                   stem_prepool_tap=True,
                                   dtype=dt, name="encoder")(x, train=train)
        # deepest first; skips shallower (unet/decoder.py:110-120)
        v = feats[-1]
        skips = list(feats[:-1])[::-1] + [None]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            v = _DecoderBlock(ch, dt, name=f"decoder_{i}")(v, skip, train)
        logits = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=dt, name="segmentation_head")(v)
        if logits.shape[1:3] != (h, w):
            logits = resize_linear(logits, (h, w))
        return logits.astype(jnp.float32)
