from .base import TransformerConfig, Segtran2dConfig, Segtran3dConfig, Segtran25dConfig
