from vs_seg_tpu.train.trainer import (
    Trainer, make_optimizer, make_train_step, make_eval_step, init_model,
    to_device_batch,
)
from vs_seg_tpu.train.checkpoint import save_checkpoint, load_checkpoint
