from gtax.models.dit import DiT_MODELS, DiTConfig, dit_apply, dit_init  # noqa: F401
from gtax.models.vae import (  # noqa: F401
    VAE_MODELS,
    VAEConfig,
    vae_decode,
    vae_encode,
    vae_init,
)
