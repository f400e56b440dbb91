from gtax.io import safetensors_port, video  # noqa: F401
