from .logging import get_logger, make_date_dir  # noqa: F401
from .flops import mmbert_step_flops, peak_flops  # noqa: F401
