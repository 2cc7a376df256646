from .optim import make_optimizer, decay_mask, linear_warmup_decay  # noqa: F401
from .train_state import TrainState  # noqa: F401
from .trainer import Trainer, FitResult  # noqa: F401
from .checkpoint import (  # noqa: F401
    save_checkpoint, load_checkpoint, resolve_checkpoint,
    list_epoch_checkpoints, epoch_dir,
)
