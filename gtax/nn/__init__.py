from gtax.nn import attention, layers  # noqa: F401
