"""DG-TTA TPU: a TPU-native (JAX/XLA/Pallas) framework for domain-generalized
pretraining and test-time adaptation of 3D medical image segmentation models.

Re-designed from scratch against the capabilities of multimodallearning/DG-TTA
(reference mounted at /root/reference): GIN intensity augmentation, MIND-SSC
descriptors, nnUNet-style PlainConvUNet, sliding-window inference, a per-volume
TTA optimization loop, and the `dgtta` CLI surface -- all as functional,
jit-compiled JAX programs with explicit PRNG keys instead of torch hooks and
global RNG.

Internal array layout is channels-last (B, D, H, W, C) -- the layout XLA:TPU
tiles best -- with B,C,D,H,W adapters at the user-facing API boundaries where
the reference exposed torch tensors.
"""

__version__ = "0.1.0"
