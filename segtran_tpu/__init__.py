"""segtran_tpu: a TPU-native (JAX/XLA/Pallas/pjit) medical image segmentation framework.

Re-designed from scratch with the capabilities of the reference PyTorch framework
askerlee/segtran (Squeeze-and-Expansion Transformer, IJCAI'21; Polyformer, MICCAI'21):
2D/2.5D/3D segmentation models, task data pipelines, multi-device data-parallel
training on a `jax.sharding.Mesh`, batched sliding-window whole-image/whole-volume
inference, Dice/Jaccard/HD metrics, few-shot domain adaptation, and analysis tooling.

Architecture is TPU-first:
  * all compute paths are jit-compiled XLA graphs with static shapes,
  * models are `flax.linen` modules in NHWC / channels-last layout,
  * hot attention ops have fused Pallas kernels (``segtran_tpu.kernels``),
  * parallelism is expressed as shardings over a device mesh (``segtran_tpu.parallel``),
  * sliding-window inference is a batched gather -> model -> scatter-add graph,
    not a Python loop.
"""

__version__ = "0.1.0"
