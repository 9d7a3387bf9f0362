from waifu2x_tpu.train.train import (  # noqa: F401
    TrainConfig,
    loss_fn,
    make_train_step,
    make_sharded_train_step,
    train_loop,
)
from waifu2x_tpu.train.qat import (  # noqa: F401
    l6_quant_gap_db,
    make_qat_l6_loss,
    stack_valid_l6fq,
)
