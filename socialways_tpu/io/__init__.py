from socialways_tpu.io.checkpoint import (
    checkpoint_exists,
    restore_checkpoint,
    save_checkpoint,
)
from socialways_tpu.io.dumps import dump_predictions

__all__ = ["checkpoint_exists", "restore_checkpoint", "save_checkpoint",
           "dump_predictions"]
