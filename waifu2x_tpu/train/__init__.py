from waifu2x_tpu.train.train import (  # noqa: F401
    TrainConfig,
    loss_fn,
    make_train_step,
    make_sharded_train_step,
    train_loop,
)
