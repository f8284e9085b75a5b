"""adnm_tpu — a TPU-native precipitation-nowcasting framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference PyTorch repo kanyu369/ADNM-UNet: seven nowcasting models
(flagship ADNM-UNet plus SmaAt-UNet, ConvLSTM, TrajGRU, LPTQPN,
TransUnet, SwinUnet), four rainfall losses, a meteorological evaluator
(CSI/POD/HSS/FAR + RMSE/SSIM/LPIPS), the Shanghai HDF5 radar pipeline,
and train/validate/visualize entry points.

Design conventions (TPU-first, not a port):
  * All image tensors are NHWC; sequence form (B, L, D) <-> (B, H, W, D)
    is a free reshape (the reference permutes NCHW constantly).
  * All compute paths are jit-able pure functions; models are flax.linen
    modules with a uniform ``(B, T_in, 1, H, W) -> (B, T_out, 1, H, W)``
    contract (reference: models/*.py factory functions).
  * Distribution is a jax.sharding.Mesh + NamedSharding over the batch
    axis (reference: nn.DataParallel in train.py:99-102), with optional
    sequence sharding of the SSD dual.
"""

__version__ = "0.1.0"
