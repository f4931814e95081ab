from wavenet_vocoder_tpu.dsp import audio  # noqa: F401

# On-device (TPU) feature extraction lives in dsp.mel_jax
# (logmelspectrogram_jax / logmelspectrogram_pallas) — imported lazily by
# callers so the numpy-only preprocessing path never pulls in jax.
