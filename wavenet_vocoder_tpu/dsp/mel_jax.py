"""On-device (TPU) log-mel feature extraction — jittable + Pallas-fused.

The host pipeline (``dsp/audio.py:logmelspectrogram``, mirroring reference
audio.py:101-156) runs numpy on CPU during offline preprocessing. This module
provides the same transform as an XLA/Pallas program so features can be
computed on-chip — e.g. for on-TPU data augmentation, eval-time feature
extraction, or analysis-synthesis loops — with MXU-friendly math:

  * the STFT is a **matmul-DFT**: the periodic Hann window is folded into
    real/imag DFT matrices, so ``frames @ W_cos`` / ``frames @ W_sin`` are two
    (F, n_fft) x (n_fft, n_bins) matmuls that tile straight onto the MXU
    (n_fft=1024 is far too small for FFT to win on TPU, and the matmul form
    fuses with the mel projection);
  * the mel filterbank is a third matmul (n_bins x n_mels);
  * magnitude + log10 are elementwise and fuse into the matmul epilogues.

The Pallas kernel additionally never materializes the framed (F, n_fft)
signal in HBM: when ``n_fft % hop == 0`` (the default 1024/256), an
overlapping frame is a concatenation of m = n_fft//hop NON-overlapping
hop-sized chunks, so ``frames @ W == sum_j chunks[f+j] @ W[j*hop:(j+1)*hop]``
— m shifted matmuls over a (F_blk + m - 1, hop) chunk view that lives in
VMEM, reading each input sample once.

Numerics match ``dsp/audio.py`` (librosa STFT conventions: center=True,
reflect padding, periodic Hann; Slaney mel bank; log10(max(S, 1e-10)))
to f32 precision (the host path computes in f64).
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.dsp import audio as _audio


# ----------------------------------------------------------------------
# Host-side constant builders (f64 numpy, cast once)
# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=8)
def _dft_mats(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Window-folded real-DFT matrices, each (n_fft, 1 + n_fft//2) f32.

    frames @ cos_mat = Re(rfft(frames * win)),
    frames @ sin_mat = Im(rfft(frames * win)).
    """
    win = _audio.hann_window(win_length)
    if win_length < n_fft:  # center the window inside the frame
        lp = (n_fft - win_length) // 2
        win = np.pad(win, (lp, n_fft - win_length - lp))
    n_bins = 1 + n_fft // 2
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    cos_mat = (np.cos(ang) * win[:, None]).astype(np.float32)
    sin_mat = (np.sin(ang) * win[:, None]).astype(np.float32)
    return cos_mat, sin_mat


@functools.lru_cache(maxsize=8)
def _mel_mat(sample_rate: int, n_fft: int, num_mels: int,
             fmin: float, fmax: float) -> np.ndarray:
    """(n_bins, num_mels) f32 — transpose of dsp.audio.mel_filterbank."""
    return _audio.mel_filterbank(
        sample_rate, n_fft, n_mels=num_mels, fmin=fmin, fmax=fmax).T.copy()


def _resolve(cfg: Config):
    n_fft = cfg.fft_size
    hop = _audio.get_hop_size(cfg)
    win_length = _audio.get_win_length(cfg)
    assert cfg.window == "hann", "jax mel path supports hann only"
    return n_fft, hop, win_length


# ----------------------------------------------------------------------
# Pure-XLA path
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length",
                                             "num_mels", "sample_rate",
                                             "fmin", "fmax"))
def _logmel_xla(y: jnp.ndarray, *, n_fft: int, hop: int, win_length: int,
                num_mels: int, sample_rate: int, fmin: float,
                fmax: float) -> jnp.ndarray:
    cos_np, sin_np = _dft_mats(n_fft, win_length)
    mel_np = _mel_mat(sample_rate, n_fft, num_mels, fmin, fmax)
    cos_m, sin_m = jnp.asarray(cos_np), jnp.asarray(sin_np)
    mel_m = jnp.asarray(mel_np)

    y = y.astype(jnp.float32)
    pad = n_fft // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    T = y.shape[-1]
    n_frames = 1 + (T - n_fft) // hop
    # framing: (..., F, n_fft) gather — XLA lowers this to a cheap
    # dynamic-slice loop / gather; the matmuls downstream dominate
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(n_fft)[None, :])  # static
    frames = y[..., idx]
    # HIGHEST: TPU matmuls default to bf16 passes — fine for NN activations,
    # not for a DFT (log-mel maxerr degrades from ~2e-4 to ~4e-2)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, cos_m, precision=hi,
                    preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, sin_m, precision=hi,
                    preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    S = jnp.matmul(mag, mel_m, precision=hi,
                   preferred_element_type=jnp.float32)
    return jnp.log10(jnp.maximum(S, 1e-10))


def logmelspectrogram_jax(y, cfg: Config) -> jnp.ndarray:
    """Jittable log10-mel, matching ``dsp.audio.logmelspectrogram``.

    y: (T,) or (B, T) float waveform. Returns (n_frames, num_mels) or
    (B, n_frames, num_mels) f32. (reference: audio.py:101-109)
    """
    n_fft, hop, win_length = _resolve(cfg)
    return _logmel_xla(jnp.asarray(y), n_fft=n_fft, hop=hop,
                       win_length=win_length, num_mels=cfg.num_mels,
                       sample_rate=cfg.sample_rate, fmin=float(cfg.fmin),
                       fmax=float(cfg.fmax))


# ----------------------------------------------------------------------
# Pallas fused kernel
# ----------------------------------------------------------------------
def _mel_kernel(main_ref, tail_ref, cos_ref, sin_ref, mel_ref, out_ref, *,
                m: int, hop: int, f_blk: int):
    """One grid step = f_blk frames.

    main_ref: (f_blk, hop) hop-sized chunk rows of this block; tail_ref:
    (m-1, hop) the next block's first rows (frame f needs chunks f..f+m-1).
    Frame f = concat(chunks[f], ..., chunks[f+m-1]); the folded-window DFT
    matmul distributes over that concat as m shifted partial matmuls, so the
    overlapped (f_blk, n_fft) frame matrix is never built.
    """
    n_bins = cos_ref.shape[1]
    chunks = jnp.concatenate([main_ref[:, :], tail_ref[:m - 1, :]], axis=0)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.zeros((f_blk, n_bins), jnp.float32)
    im = jnp.zeros((f_blk, n_bins), jnp.float32)
    for j in range(m):
        part = chunks[j:j + f_blk, :]  # (f_blk, hop), static slice
        re += jnp.dot(part, cos_ref[j * hop:(j + 1) * hop, :], precision=hi,
                      preferred_element_type=jnp.float32)
        im += jnp.dot(part, sin_ref[j * hop:(j + 1) * hop, :], precision=hi,
                      preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    S = jnp.dot(mag, mel_ref[:, :], precision=hi,
                preferred_element_type=jnp.float32)
    out_ref[:, :] = jnp.log10(jnp.maximum(S, 1e-10))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length",
                                             "num_mels", "sample_rate",
                                             "fmin", "fmax", "f_blk",
                                             "interpret"))
def _logmel_pallas(y: jnp.ndarray, *, n_fft: int, hop: int, win_length: int,
                   num_mels: int, sample_rate: int, fmin: float, fmax: float,
                   f_blk: int, interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl

    assert n_fft % hop == 0, (n_fft, hop)
    m = n_fft // hop
    cos_np, sin_np = _dft_mats(n_fft, win_length)
    mel_np = _mel_mat(sample_rate, n_fft, num_mels, fmin, fmax)

    y = y.astype(jnp.float32)
    pad = n_fft // 2
    y = jnp.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop
    blocks = -(-n_frames // f_blk)
    # pad so every block has its full (f_blk + m - 1) chunk rows
    need = (blocks * f_blk + m - 1) * hop
    y = jnp.pad(y, (0, max(0, need - y.shape[0])))
    chunks = y[:need].reshape(-1, hop)  # (blocks*f_blk + m - 1, hop)
    main = chunks[:blocks * f_blk]
    # per-block tail rows: block i also needs chunk rows
    # [(i+1)*f_blk, (i+1)*f_blk + m - 1) — duplicated into a parallel array
    # so every pallas input uses plain blocked indexing (overlapping block
    # windows aren't expressible as a BlockSpec). Padded to 8 rows per block
    # for sublane alignment; still negligible HBM (8*256*4B per 128 frames).
    t_rows = ((m - 1 + 7) // 8) * 8
    tail_idx = np.minimum(
        np.arange(1, blocks + 1)[:, None] * f_blk
        + np.arange(t_rows)[None, :],
        chunks.shape[0] - 1)                  # (blocks, t_rows), static
    tails = chunks[tail_idx.reshape(-1)]      # (blocks*t_rows, hop)

    out = pl.pallas_call(
        functools.partial(_mel_kernel, m=m, hop=hop, f_blk=f_blk),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((f_blk, hop), lambda i: (i, 0)),
            pl.BlockSpec((t_rows, hop), lambda i: (i, 0)),
            pl.BlockSpec((n_fft, cos_np.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((n_fft, sin_np.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((mel_np.shape[0], num_mels), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((f_blk, num_mels), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((blocks * f_blk, num_mels),
                                       jnp.float32),
        interpret=interpret,
    )(main, tails, jnp.asarray(cos_np), jnp.asarray(sin_np),
      jnp.asarray(mel_np))
    return out[:n_frames]


def logmelspectrogram_pallas(y, cfg: Config, *, f_blk: int = 128,
                             interpret: bool = False) -> jnp.ndarray:
    """Fused Pallas log-mel for a single (T,) waveform.

    Requires ``fft_size % hop_size == 0`` (true for every shipped preset);
    falls back to the XLA path otherwise.
    """
    n_fft, hop, win_length = _resolve(cfg)
    y = jnp.asarray(y)
    assert y.ndim == 1, y.shape
    if n_fft % hop != 0:
        return logmelspectrogram_jax(y, cfg)
    return _logmel_pallas(y, n_fft=n_fft, hop=hop, win_length=win_length,
                          num_mels=cfg.num_mels, sample_rate=cfg.sample_rate,
                          fmin=float(cfg.fmin), fmax=float(cfg.fmax),
                          f_blk=f_blk, interpret=interpret)
