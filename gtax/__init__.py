"""gtax — TPU-native (JAX/XLA/Pallas/pjit) video-diffusion world-model framework.

A from-scratch rebuild of the capabilities of ikergarcia1996/AI-Generated-GTAV
(reference mounted at /root/reference): a frozen ViT autoencoder mapping
360x640 RGB frames to 16-channel 18x32 latents, a ~0.6B-parameter
spatiotemporal DiT denoising the next frame against a sliding 5-frame context
(diffusion forcing), action conditioning, the full training stack, and an
autoregressive generation pipeline — all designed TPU-first: jitted lax.scan
sampling loops, sharded training over a jax.sharding.Mesh, Pallas attention
kernels, and bf16 compute with fp32 numerics where precision matters.
"""

__version__ = "0.1.0"

from gtax.core import constants, schedules, rope  # noqa: F401
