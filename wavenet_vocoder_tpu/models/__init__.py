from wavenet_vocoder_tpu.models.wavenet import (  # noqa: F401
    WaveNetSpec,
    apply_wavenet,
    init_wavenet,
    make_generation_fast,
    receptive_field_size,
    spec_from_config,
)
