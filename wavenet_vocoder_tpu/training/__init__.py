from wavenet_vocoder_tpu.training.train_state import (  # noqa: F401
    TrainState,
    create_train_state,
    ema_update,
    make_optimizer,
    make_train_step,
    select_criterion,
)
from wavenet_vocoder_tpu.training import checkpoint  # noqa: F401
from wavenet_vocoder_tpu.training import lrschedule  # noqa: F401
