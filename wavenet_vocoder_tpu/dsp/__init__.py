from wavenet_vocoder_tpu.dsp import audio  # noqa: F401
