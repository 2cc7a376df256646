from . import attention, losses, masking, quant  # noqa: F401
from .fused_joint_embed import fused_joint_embed  # noqa: F401
