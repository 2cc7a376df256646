"""msa_tpu: TPU-native multimodal sentiment analysis framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
MSA codebase (kimkyeonghun/MSA): the MMBert unified multimodal transformer,
its CMU-MOSI / CMU-MOSEI / UR_FUNNY data pipelines, joint
MLM + alignment + CPC + sentiment training, and the MISA metric suite --
data-parallel over a TPU mesh via pjit/GSPMD.
"""

__version__ = "0.1.0"

from . import configs  # noqa: F401
