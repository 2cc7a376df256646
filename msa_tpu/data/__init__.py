from .featurize import FeaturizedSplit, featurize, synthetic_split  # noqa: F401
from .dataset import MultimodalDataset, sample_pairing  # noqa: F401
from .wordpiece import Tokenizer  # noqa: F401
