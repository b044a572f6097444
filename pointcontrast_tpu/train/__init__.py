"""Training stack: optimizers/schedulers with torch-matching semantics,
train state, checkpointing with lenient transfer, and the pretrain trainers.

Replaces the reference L4 layer
(/root/reference/pretrain/pointcontrast/lib/ddp_trainer.py,
 /root/reference/downstream/semseg/lib/{solvers,train}.py) with jitted,
single-compiled-shape JAX steps.
"""

from pointcontrast_tpu.train.optim import (
    sgd,
    adam,
    make_optimizer,
    exp_lr,
    poly_lr,
    step_lr,
    squared_lr,
    make_scheduler,
)
from pointcontrast_tpu.train.state import TrainState, create_train_state
from pointcontrast_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    latest_checkpoint,
    lenient_filter,
)
from pointcontrast_tpu.train.pretrain import (
    PretrainConfig,
    PretrainTrainer,
    make_train_step,
)
