from dladmm_tpu.train.loop import (  # noqa: F401
    TrainState,
    loss_fn,
    make_train_step,
    evaluate,
    fit,
)
