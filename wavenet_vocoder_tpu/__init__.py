"""TPU-native WaveNet vocoder framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of r9y9/wavenet_vocoder for TPU:
functional param-pytree models, a single-scan autoregressive decoder, and
mesh-sharded training/synthesis.

Public surface mirrors the reference package exports
(reference: wavenet_vocoder/__init__.py:1-6).
"""
from wavenet_vocoder_tpu.version import __version__  # noqa: F401
from wavenet_vocoder_tpu.config import Config, load_config  # noqa: F401
from wavenet_vocoder_tpu.models.wavenet import (  # noqa: F401
    WaveNetSpec,
    apply_wavenet,
    init_wavenet,
    make_generation_fast,
    receptive_field_size,
    spec_from_config,
)


def __getattr__(name):  # lazy: streaming pulls in scipy/dsp
    if name == "StreamingSynthesizer":
        from wavenet_vocoder_tpu.streaming import StreamingSynthesizer
        return StreamingSynthesizer
    if name == "Synthesizer":
        from wavenet_vocoder_tpu.synthesis import Synthesizer
        return Synthesizer
    raise AttributeError(name)
