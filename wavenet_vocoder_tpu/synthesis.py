"""Waveform synthesis library (reference: synthesis.py:42-188).

``batch_wavegen`` / ``wavegen`` generate waveforms from mel features with a
trained model, then apply the inverse transforms: inverse mu-law, optional
time-domain postprocess (e.g. inv_preemphasis), and gain unscaling
(reference: synthesis.py:66-86, 175-188).

TPU notes:
  * generation runs as the single jitted scan (ops/generate.py); ``fast=True``
    folds weight norm first (the reference's make_generation_fast_,
    synthesis.py:48-49).
  * pass a Mesh to shard independent utterances across chips — zero
    inter-chip communication (SURVEY.md section 5.8).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.dsp import audio
from wavenet_vocoder_tpu.models.wavenet import WaveNetSpec, spec_from_config
from wavenet_vocoder_tpu.ops.generate import generate
from wavenet_vocoder_tpu.ops.mulaw import inv_mulaw, inv_mulaw_quantize

Params = Dict[str, Any]


def pad_mel_context(c: np.ndarray, cin_pad: int) -> np.ndarray:
    """Replicate-pad mel by cin_pad frames on both ends at inference — the
    conditioning context the training crop provided from neighboring frames
    (reference: evaluate.py:163-164)."""
    if cin_pad <= 0:
        return c
    return np.concatenate([
        np.repeat(c[:, :1], cin_pad, axis=1),
        c,
        np.repeat(c[:, -1:], cin_pad, axis=1),
    ], axis=1)


def _decode(cfg: Config, samples: jnp.ndarray) -> np.ndarray:
    """Head samples -> float waveform (B, T)
    (reference: synthesis.py:66-86).

    Accepts one-hot (B, T, C) or integer codes (B, T) for the categorical
    head, and (B, T, 1) or (B, T) scalars for the mixture heads."""
    samples = np.asarray(samples)
    mu = cfg.quantize_channels - 1
    if cfg.is_mulaw_quantize:
        codes = samples if samples.ndim == 2 else np.argmax(samples, axis=-1)
        wav = np.asarray(inv_mulaw_quantize(codes, mu), dtype=np.float64)
    elif cfg.input_type == "mulaw":
        x = samples if samples.ndim == 2 else samples[..., 0]
        wav = np.asarray(inv_mulaw(x, mu))
    else:
        wav = samples if samples.ndim == 2 else samples[..., 0]

    if cfg.postprocess not in (None, "", "none"):
        wav = np.stack([getattr(audio, cfg.postprocess)(w) for w in wav])
    if cfg.global_gain_scale > 0:
        wav = wav / cfg.global_gain_scale
    return wav.astype(np.float32)


def batch_wavegen(params: Params, cfg: Config, *,
                  spec: Optional[WaveNetSpec] = None,
                  c: Optional[np.ndarray] = None,
                  g: Optional[np.ndarray] = None,
                  T: Optional[int] = None,
                  initial_input: Optional[jnp.ndarray] = None,
                  rng=None, fast: bool = True,
                  mesh=None, engine: str = "scan",
                  **engine_kwargs) -> np.ndarray:
    """Generate a batch of waveforms (reference: synthesis.py:42-86).

    Args:
      c: (B, T_mel, D) mel features ALREADY including cin_pad context frames
         (use :func:`pad_mel_context`); length = (T_mel - 2*cin_pad) * hop
         (reference: synthesis.py:55-57).
      g: (B,) speaker ids or (B, gin) float conditioning.
      T: explicit sample count when unconditional.
      mesh: optional jax Mesh — utterances shard over its 'data' axis.
      engine: "scan" (XLA lax.scan decoder) or "pallas" (fused TPU kernel
        with VMEM-resident weights — fastest on real TPU hardware; bf16
        weights, own PRNG stream).
      engine_kwargs: pallas-engine knobs forwarded to
        :func:`ops.pallas_generate.generate_pallas` (chunk, variant, unroll,
        weight_dtype, deterministic, interpret).
    Returns (B, T) float32 waveforms.
    """
    spec = spec or spec_from_config(cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if c is not None and T is None:
        hop = audio.get_hop_size(cfg)
        T = (c.shape[1] - 2 * cfg.cin_pad) * hop

    if engine == "pallas":
        # the pallas engine shards (and replicates weights) itself — one
        # independent fused kernel per device, zero collectives
        from wavenet_vocoder_tpu.ops.pallas_generate import generate_pallas
        if c is not None:
            c = jnp.asarray(c, jnp.float32)
        samples = generate_pallas(params, spec, rng, T=T, c=c, g=g,
                                  initial_input=initial_input,
                                  log_scale_min=cfg.log_scale_min,
                                  mesh=mesh, **engine_kwargs)
        return _decode(cfg, samples)

    if mesh is not None:
        from wavenet_vocoder_tpu.parallel import replicate, shard_batch
        params = replicate(params, mesh)
        if c is not None:
            c = shard_batch(jnp.asarray(c, jnp.float32), mesh)
        if g is not None:
            g = shard_batch(jnp.asarray(g), mesh)
    else:
        if c is not None:
            c = jnp.asarray(c, jnp.float32)
        if g is not None:
            g = jnp.asarray(g)

    if engine_kwargs:
        raise TypeError(f"engine='scan' takes no engine_kwargs, "
                        f"got {sorted(engine_kwargs)}")
    out = generate(params, spec, rng, T=T, c=c, g=g,
                   initial_input=initial_input,
                   softmax=True, quantize=True,
                   log_scale_min=cfg.log_scale_min,
                   output="samples", fold_weight_norm=fast)
    return _decode(cfg, out["samples"])


class Synthesizer:
    """Pack-once serving wrapper: fold weight norm (and pre-pack the Pallas
    kernel weights) at construction, then generate per request.

    Per-call folding/packing costs dozens of host dispatches and dominates
    the fused kernel's runtime — this is the API production serving should
    use. ``engine="pallas"`` requires a TPU; ``"scan"`` runs anywhere.
    """

    def __init__(self, params: Params, cfg: Config, *,
                 spec: Optional[WaveNetSpec] = None, engine: str = "pallas",
                 weight_dtype=jnp.bfloat16, mesh=None, **engine_kwargs):
        from wavenet_vocoder_tpu.models.wavenet import make_generation_fast
        self.cfg = cfg
        self.spec = spec or spec_from_config(cfg)
        self.engine = engine
        self._mesh = mesh
        if engine == "pallas":
            from wavenet_vocoder_tpu.ops.pallas_generate import PallasGenerator
            self._gen = PallasGenerator(params, self.spec,
                                        weight_dtype=weight_dtype,
                                        mesh=mesh,
                                        **engine_kwargs)
            self._params = self._gen.params
        elif engine == "scan":
            self._gen = None
            if mesh is not None:
                from wavenet_vocoder_tpu.parallel import replicate
                self._params = replicate(make_generation_fast(params), mesh)
            else:
                self._params = jax.device_put(make_generation_fast(params))
        else:
            raise ValueError(engine)

    def __call__(self, c: Optional[np.ndarray] = None, *,
                 g: Optional[np.ndarray] = None, T: Optional[int] = None,
                 rng=None, pad_context: bool = True) -> np.ndarray:
        """mel (B, T_mel, D) [without cin_pad context when pad_context]
        -> (B, T) float32 waveforms."""
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if c is not None and pad_context:
            c = pad_mel_context(np.asarray(c, np.float32), cfg.cin_pad)
        if self.engine == "pallas":
            samples = self._gen(rng, T=T, c=None if c is None else
                                jnp.asarray(c), g=g,
                                log_scale_min=cfg.log_scale_min)
            return _decode(cfg, samples)
        return batch_wavegen(self._params, cfg, spec=self.spec, c=c, g=g,
                             T=T, rng=rng, fast=False, mesh=self._mesh)


def _initial_input(cfg: Config, spec: WaveNetSpec,
                   initial_value: Optional[float]) -> Optional[jnp.ndarray]:
    """Reference initial-value semantics (synthesis.py:147-161): default is
    mu-law code of 0 (= 127) for categorical, 0.0 for scalar; an explicit
    value is a mu-law code for categorical models, a raw float otherwise."""
    if initial_value is None:
        return None  # generate() defaults match the reference defaults
    if cfg.is_mulaw_quantize:
        code = int(initial_value)
        assert 0 <= code < cfg.quantize_channels, code
        one_hot = np.zeros((1, spec.out_channels), np.float32)
        one_hot[0, code] = 1.0
        return jnp.asarray(one_hot)
    return jnp.full((1, 1), float(initial_value), jnp.float32)


def wavegen(params: Params, cfg: Config, *,
            spec: Optional[WaveNetSpec] = None,
            length: Optional[int] = None,
            c: Optional[np.ndarray] = None,
            g: Optional[Any] = None,
            initial_value: Optional[float] = None,
            rng=None, fast: bool = True,
            engine: str = "scan") -> np.ndarray:
    """Single-utterance generation (reference: synthesis.py:101-188).

    c: (T_mel, D) mel (WITHOUT cin_pad context — it is added here), or
       sample-resolution features when no upsample net is configured
       (feature repeat path, reference: synthesis.py:128-146).
    initial_value: first decoder input (reference: synthesis.py:147-161).
    """
    spec = spec or spec_from_config(cfg)
    init_in = _initial_input(cfg, spec, initial_value)
    if c is not None:
        c = np.asarray(c, dtype=np.float32)
        assert c.ndim == 2
        if not cfg.upsample_conditional_features:
            # repeat features to sample resolution
            # (reference: synthesis.py:128-146)
            upsample_factor = audio.get_hop_size(cfg)
            c = np.repeat(c, upsample_factor, axis=0)
            if length is not None:
                c = c[:length]
            length = c.shape[0]
            c_in = c[None]
        else:
            c_in = pad_mel_context(c[None], cfg.cin_pad)
        wav = batch_wavegen(params, cfg, spec=spec, c=c_in,
                            g=None if g is None else np.asarray([g]),
                            T=length, initial_input=init_in,
                            rng=rng, fast=fast, engine=engine)
        return wav[0]
    assert length is not None
    g_arr = None if g is None else np.asarray([g])
    wav = batch_wavegen(params, cfg, spec=spec, c=None, g=g_arr, T=length,
                        initial_input=init_in, rng=rng, fast=fast,
                        engine=engine)
    return wav[0]
