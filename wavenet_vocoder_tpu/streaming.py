"""Streaming (chunked) synthesis with persistent decoder state.

The reference can only synthesize a whole utterance at once — its
``incremental_forward`` keeps per-module Python buffers alive for one call
(reference: wavenet.py:215-343, conv.py:34-44) and ``wavegen`` requires the
full mel up front (reference: synthesis.py:101-188). A production vocoder
sits behind a TTS acoustic model that EMITS mel frames incrementally; this
module generates audio as frames arrive, holding the decoder's ring-buffer
carry (ops/generate.py) across calls on-device.

Exactness: chunked generation is bit-identical to one offline call —
  * the ring indices and the per-step PRNG both key off the ABSOLUTE step
    index, so the decoder carry resumes exactly (ops/generate.py `state`);
  * local conditioning for each emitted block is computed from a mel window
    wide enough that the upsample network's output matches the full-sequence
    computation: the context conv needs cin_pad frames each side
    (reference: upsample.py:77-81) and the per-scale smoothing convs add
    < 1 input frame of radius per scale (kernel 2s+1 at stretch s, reference:
    upsample.py:42-44), so ``cin_pad + len(scales)`` frames of lookahead
    suffice — that is the algorithmic latency of the stream;
  * the mu-law / gain / preemphasis decode chain is streamed with carried
    IIR filter state (reference decode: synthesis.py:66-86).

Verified by tests/test_streaming.py: stream == offline, elementwise.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.dsp import audio
from wavenet_vocoder_tpu.models.wavenet import (
    WaveNetSpec,
    make_generation_fast,
    spec_from_config,
    upsample_conditioning,
)
from wavenet_vocoder_tpu.ops.generate import generate
from wavenet_vocoder_tpu.ops.mulaw import inv_mulaw, inv_mulaw_quantize

Params = Dict[str, Any]


class StreamingSynthesizer:
    """Feed mel frames in, get waveform samples out, chunk by chunk.

    Usage::

        stream = StreamingSynthesizer(params, cfg, rng=key, batch=1)
        for mel_chunk in acoustic_model():        # (B, F_i, D) frames
            audio_chunk = stream.feed(mel_chunk)  # (B, n_i) float32
        tail = stream.flush()                     # final samples

    The concatenation of all returned chunks equals ``batch_wavegen`` on the
    full mel (same params, same rng) elementwise.

    Notes:
      * frames buffered but not yet emittable (the ``lookahead_frames``
        algorithmic latency) are generated at :meth:`flush`, which
        replicate-pads the mel tail exactly like offline inference
        (reference: evaluate.py:163-164).
      * each distinct emitted-block length compiles its own scan; feeding
        fixed-size chunks keeps that to O(1) compilations.
      * g (global conditioning) is fixed per stream at construction.
    """

    def __init__(self, params: Params, cfg: Config, *,
                 spec: Optional[WaveNetSpec] = None,
                 rng=None, batch: int = 1,
                 g: Optional[np.ndarray] = None,
                 dtype=None, engine: str = "scan",
                 chunk: Optional[int] = None,
                 weight_dtype=jnp.bfloat16,
                 deterministic: bool = False,
                 interpret: bool = False):
        self.cfg = cfg
        self.spec = spec or spec_from_config(cfg)
        self.params = jax.device_put(make_generation_fast(params))
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.batch = batch
        self.dtype = dtype
        self.engine = engine
        self._deterministic = deterministic
        self._interpret = interpret
        self._g = None if g is None else jnp.asarray(g)
        self.hop = audio.get_hop_size(cfg)
        s = self.spec
        if s.upsample_conditional_features:
            # conv-pipeline radius in mel frames: cin_pad for the context
            # conv + <1 frame per smoothing conv (see module docstring)
            self._extra = len(s.upsample_scales)
            self.lookahead_frames = s.cin_pad + self._extra
        else:
            self._extra = 0
            self.lookahead_frames = 0
        # jitted conditioning window (fixed-size feeds hit one compiled
        # shape; eager dispatch would cost several host round-trips per
        # segment — significant at streaming granularity)
        s_ = self.spec
        self._cond_jit = jax.jit(
            lambda params, win: upsample_conditioning(params, s_, win))
        if engine == "pallas":
            # fused-kernel streaming: the kernel's ring state carries across
            # segments (ops/pallas_generate.py `carry`); emitted blocks are
            # hop multiples, so a hop-divisor kernel chunk always divides
            import dataclasses
            from wavenet_vocoder_tpu.ops.pallas_generate import (
                PallasGenerator)
            spec_flat = self.spec
            if spec_flat.upsample_conditional_features:
                spec_flat = dataclasses.replace(
                    spec_flat, upsample_conditional_features=False,
                    cin_pad=0)
            self._pgen = PallasGenerator(
                params, spec_flat, weight_dtype=weight_dtype,
                chunk=chunk or self.hop)
        elif engine != "scan":
            raise ValueError(engine)
        self.reset()

    def reset(self) -> None:
        """Drop all buffered mel and decoder state; start a new stream."""
        self._mel: Optional[np.ndarray] = None  # padded frames accumulated
        self._n_raw = 0           # raw mel frames received
        self._emitted = 0         # output frames already generated
        self._state = None        # decoder carry (x_in, buffers, t)
        self._preemph_carry = np.zeros(self.batch, np.float64)
        self._final = False

    # ------------------------------------------------------------------
    @property
    def algorithmic_latency_samples(self) -> int:
        """Samples of right-context the stream waits for before emitting."""
        return self.lookahead_frames * self.hop

    def feed(self, mel: Optional[np.ndarray]) -> np.ndarray:
        """Add mel frames (B, F, D); return newly decodable audio (B, n)."""
        if self._final:
            raise RuntimeError("stream is finished; call reset()")
        cp = self.spec.cin_pad
        if mel is not None:
            mel = np.asarray(mel, np.float32)
            assert mel.ndim == 3 and mel.shape[0] == self.batch, mel.shape
            if self._mel is None:
                # left replicate pad, as offline pad_mel_context does
                pad = np.repeat(mel[:, :1], cp, axis=1) if cp else \
                    np.zeros((self.batch, 0, mel.shape[2]), np.float32)
                self._mel = np.concatenate([pad, mel], axis=1)
            else:
                self._mel = np.concatenate([self._mel, mel], axis=1)
            self._n_raw += mel.shape[1]
        if self._mel is None:
            return np.zeros((self.batch, 0), np.float32)
        # output frame f depends on padded frames [f - extra, f + 2*cin_pad
        # + extra]; emit only frames whose window is fully available
        avail = self._mel.shape[1]
        ready = avail - 2 * cp - self._extra
        return self._emit(max(ready, self._emitted))

    def flush(self) -> np.ndarray:
        """Right-pad the mel tail (replicate) and emit everything left."""
        if self._final:
            return np.zeros((self.batch, 0), np.float32)
        self._final = True
        if self._mel is None:
            return np.zeros((self.batch, 0), np.float32)
        cp = self.spec.cin_pad
        if cp:
            pad = np.repeat(self._mel[:, -1:], cp, axis=1)
            self._mel = np.concatenate([self._mel, pad], axis=1)
        return self._emit(self._n_raw)

    # ------------------------------------------------------------------
    def _conditioning(self, a: int, b: int) -> jnp.ndarray:
        """Exact local conditioning for output frames [a, b).

        Runs the upsample net on the padded-frame window
        [A, B) = [a - extra, b + 2*cin_pad + extra) clamped to the data;
        clamped edges coincide with the true sequence edges, where the
        smoothing convs' zero padding matches the offline computation.
        """
        spec = self.spec
        cp = spec.cin_pad
        A = max(0, a - self._extra)
        B_end = min(self._mel.shape[1], b + 2 * cp + self._extra)
        win = jnp.asarray(self._mel[:, A:B_end])
        if spec.upsample_conditional_features:
            cond = self._cond_jit(self.params, win)
            # cond frames cover [A, B_end - 2*cp)
            lo = (a - A) * self.hop
            return cond[:, lo:lo + (b - a) * self.hop]
        # no upsample net: features are already sample-rate-aligned per
        # frame-repeat (reference: synthesis.py:128-146)
        rep = jnp.repeat(win, self.hop, axis=1)
        lo = (a - A) * self.hop
        return rep[:, lo:lo + (b - a) * self.hop]

    def _emit(self, ready: int) -> np.ndarray:
        a, b = self._emitted, ready
        if b <= a:
            return np.zeros((self.batch, 0), np.float32)
        c_up = self._conditioning(a, b)
        T = (b - a) * self.hop
        if self.engine == "pallas":
            # fused kernel with ring-state carry; the SAME self.rng across
            # segments continues the offline sampling sequence exactly
            samples, self._state = self._pgen(
                self.rng, T=T, c=c_up, g=self._g, state=self._state,
                return_state=True, log_scale_min=self.cfg.log_scale_min,
                deterministic=self._deterministic,
                interpret=self._interpret)
            self._emitted = b
            return self._decode(np.asarray(samples))
        # feed upsampled conditioning directly: spec with the upsample net
        # disabled, params already applied it in _conditioning
        spec_flat = self.spec
        if spec_flat.upsample_conditional_features:
            import dataclasses
            spec_flat = dataclasses.replace(
                spec_flat, upsample_conditional_features=False, cin_pad=0)
        out = generate(self.params, spec_flat, self.rng, T=T,
                       c=c_up, g=self._g, state=self._state,
                       return_state=True, fold_weight_norm=False,
                       log_scale_min=self.cfg.log_scale_min,
                       dtype=self.dtype)
        self._state = out["state"]
        self._emitted = b
        return self._decode(np.asarray(out["samples"]))

    def _decode(self, samples: np.ndarray) -> np.ndarray:
        """Streaming version of synthesis._decode: the inverse-preemphasis
        IIR carries its one-sample state across chunks."""
        cfg = self.cfg
        mu = cfg.quantize_channels - 1
        if cfg.is_mulaw_quantize:
            codes = samples if samples.ndim == 2 else np.argmax(samples, -1)
            wav = np.asarray(inv_mulaw_quantize(codes, mu), np.float64)
        elif cfg.input_type == "mulaw":
            x = samples if samples.ndim == 2 else samples[..., 0]
            wav = np.asarray(inv_mulaw(x, mu), np.float64)
        else:
            wav = (samples if samples.ndim == 2 else samples[..., 0]
                   ).astype(np.float64)
        if cfg.postprocess == "inv_preemphasis":
            from scipy.signal import lfilter
            coef = 0.85  # dsp.audio.inv_preemphasis default (synthesis._decode
            # calls it with defaults; reference: audio.py:57-58)
            rows = []
            for i in range(self.batch):
                y, zf = lfilter([1.0], [1.0, -coef], wav[i],
                                zi=self._preemph_carry[i:i + 1] * coef)
                self._preemph_carry[i] = y[-1]
                rows.append(y)
            wav = np.stack(rows)
        elif cfg.postprocess not in (None, "", "none"):
            raise ValueError(
                f"postprocess {cfg.postprocess!r} is not streamable")
        if cfg.global_gain_scale > 0:
            wav = wav / cfg.global_gain_scale
        return wav.astype(np.float32)
