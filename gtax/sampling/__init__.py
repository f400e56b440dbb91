from gtax.sampling.diffusion import (  # noqa: F401
    SamplerConfig,
    denoise_step,
    diffusion_forcing_loss,
    make_rollout,
    renoise_last_frame,
)
