"""soft_truncation_tpu: a TPU-native (JAX/Flax/pjit/Pallas) framework for
Soft Truncation score-based diffusion models.

A ground-up rebuild of the capabilities of Kim-Dongjun/Soft-Truncation
(PyTorch/CUDA reference) designed TPU-first:

  * pure-functional SDE math with explicit PRNG keys (sde/)
  * Flax score networks: NCSN++/DDPM++/UNCSN++, DDPM, NCSNv2 (models/)
  * XLA/Pallas resampling + fused elementwise primitives (ops/)
  * one jitted, GSPMD-sharded training step with lax.scan micro-batching (train/)
  * samplers and probability-flow likelihood entirely on device (sample/, likelihood/)
  * on-device FID/KID/IS evaluation (eval/)

Reference parity notes cite /root/reference file:line in docstrings.
"""

__version__ = "0.1.0"
