from gtax.core import constants, rope, schedules  # noqa: F401
