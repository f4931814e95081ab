from wavenet_vocoder_tpu.ops import mulaw  # noqa: F401  (module, not shadowed)
from wavenet_vocoder_tpu.ops.mulaw import (  # noqa: F401
    inv_mulaw,
    inv_mulaw_quantize,
    mulaw_quantize,
)
from wavenet_vocoder_tpu.ops.mixture import (  # noqa: F401
    discretized_mix_logistic_loss,
    log_sum_exp,
    mix_gaussian_loss,
    sample_from_discretized_mix_logistic,
    sample_from_mix_gaussian,
)
