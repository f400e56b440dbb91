"""Shared constants of the GTA-V world-model stack.

The reference scatters these as literals (e.g. the latent scaling factor
0.07843137255 appears in five places: /root/reference/generate.py:51,241,
train_dit.py:332,356, utils.py:105). Here each lives in exactly one place.
"""

# VAE latent scaling factor applied after encode / removed before decode.
# 0.07843137255 == 4/51 (reference generate.py:51).
LATENT_SCALE = 0.07843137255

# Diffusion discretisation: number of absolute noise levels
# (reference train_dit.py:290, generate.py:192).
MAX_NOISE_LEVEL = 1000

# Latent geometry of the flagship pipeline: 360x640 RGB -> patch 20 ->
# 18x32 tokens with 16 channels (reference model/vae.py:363-380).
FRAME_HEIGHT = 360
FRAME_WIDTH = 640
LATENT_CHANNELS = 16
LATENT_HEIGHT = 18
LATENT_WIDTH = 32

# Sliding temporal context of the DiT (reference model/dit.py:244).
MAX_FRAMES = 5

# Action conditioning: 25-way one-hot keyboard action per frame, VPT-style
# (reference web_dataset.py:22-38). Index 3 == "W" / drive forward
# (reference generate.py:159,181).
ACTION_DIM = 25
ACTION_FORWARD_INDEX = 3

# Latent-noise clamp used during training and rollout
# (reference configs/train_dit.yaml:28, generate.py:137).
NOISE_ABS_MAX = 20.0
