from . import attention, losses, masking  # noqa: F401
