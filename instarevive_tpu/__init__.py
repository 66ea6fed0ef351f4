"""InstaRevive-TPU: a TPU-native one-step blind image restoration framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of InstaRevive
(ICLR 2025, reference: EternalEvan/InstaRevive): one-step diffusion-distilled
blind image restoration built from a SwinIR stage-1 cleaner, a PixArt-style
DiT one-step generator (optionally ControlNet-conditioned), and an SD VAE,
plus the Real-ESRGAN degradation data pipeline and a distillation training
harness.

Design stance (vs. the reference, see SURVEY.md):
  * one model/nn layer (flax.linen) instead of two vendored torch stacks
  * NHWC layouts, bf16 matmul precision, static shapes, everything jit-able
  * tiling / degradation / color-fix run on-device (no Python tile loops)
  * distribution via jax.sharding Mesh + NamedSharding (data/fsdp axes)
  * hot attention paths as Pallas TPU kernels with XLA fallbacks
"""

__version__ = "0.1.0"
