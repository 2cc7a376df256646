from .bert import init_bert_params, bert_model, bert_encoder  # noqa: F401
from .mmbert import init_mmbert_params, mmbert_forward, mmbert_loss  # noqa: F401
