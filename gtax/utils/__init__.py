from gtax.utils.profiling import MFUCounter, StepTimer  # noqa: F401
