"""Training: optimizer schedule, jitted train step, checkpointing, port."""

from nope_tpu.training.optim import make_lr_schedule, make_optimizer  # noqa: F401
from nope_tpu.training.pretrain_vae import (  # noqa: F401
    VAEPretrainState,
    create_vae_pretrain_state,
    make_vae_pretrain_step,
)
from nope_tpu.training.train_state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
)
