from gtax.train.config import TrainingConfig  # noqa: F401
