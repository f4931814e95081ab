"""The WaveNet model: static spec + init/apply pure functions.

Replaces the reference ``wavenet_vocoder/wavenet.py`` WaveNet nn.Module with a
TPU-native functional design:

  * ``WaveNetSpec`` — hashable static structure (channel widths, dilations,
    conditioning flags) derived from ``Config``; closed over by jit.
  * ``init_wavenet(rng, spec)`` — param pytree of plain arrays.
  * ``apply_wavenet(params, spec, x, c, g)`` — the one-shot training graph
    (reference: wavenet.py:164-213).

The autoregressive decoder lives in ``wavenet_vocoder_tpu/ops/generate.py`` as
a single jitted ``lax.scan`` (replacing the Python sample loop, reference:
wavenet.py:215-343).

Layout: channels-last (B, T, C). Scalar input is (B, T, 1); categorical input
is one-hot (B, T, out_channels) (reference: wavenet.py:119-122).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.models import upsample as upsample_lib
from wavenet_vocoder_tpu.models.layers import (
    conv1x1,
    embedding,
    init_conv,
    init_embedding,
    init_res_block,
    remove_weight_norm,
    res_block,
)

Params = Dict[str, Any]


def receptive_field_size(total_layers: int, num_cycles: int, kernel_size: int,
                         dilation: Callable[[int], int] = lambda x: 2 ** x) -> int:
    """Receptive field in samples (reference: wavenet.py:42-60).

    e.g. 24 layers / 4 stacks / k=3 -> 505; 30/3/3 -> 6139
    (reference: tests/test_misc.py:9-11).
    """
    assert total_layers % num_cycles == 0
    layers_per_cycle = total_layers // num_cycles
    dilations = [dilation(i % layers_per_cycle) for i in range(total_layers)]
    return (kernel_size - 1) * sum(dilations) + 1


@dataclass(frozen=True)
class WaveNetSpec:
    """Static model structure. Hashable -> safe as a jit static argument."""
    out_channels: int = 256
    layers: int = 20
    stacks: int = 2
    residual_channels: int = 512
    gate_channels: int = 512
    skip_out_channels: int = 512
    kernel_size: int = 3
    dropout: float = 1 - 0.95
    cin_channels: int = -1
    gin_channels: int = -1
    n_speakers: Optional[int] = None
    upsample_conditional_features: bool = False
    upsample_net: str = "ConvInUpsampleNetwork"
    upsample_scales: Tuple[int, ...] = (4, 4, 4, 4)
    upsample_activation: str = "none"
    freq_axis_kernel_size: int = 1
    cin_pad: int = 0
    scalar_input: bool = False
    use_speaker_embedding: bool = False
    output_distribution: str = "Logistic"
    remat: bool = False
    remat_policy: str = ""
    fused_train: bool = False

    def __post_init__(self):
        assert self.layers % self.stacks == 0

    @property
    def layers_per_stack(self) -> int:
        return self.layers // self.stacks

    @property
    def dilations(self) -> Tuple[int, ...]:
        """Dilation per layer: 2**(layer % layers_per_stack)
        (reference: wavenet.py:125)."""
        return tuple(2 ** (i % self.layers_per_stack) for i in range(self.layers))

    @property
    def receptive_field(self) -> int:
        return receptive_field_size(self.layers, self.stacks, self.kernel_size)

    @property
    def in_channels(self) -> int:
        return 1 if self.scalar_input else self.out_channels

    @property
    def has_local_conditioning(self) -> bool:
        return self.cin_channels > 0

    @property
    def has_global_conditioning(self) -> bool:
        return self.gin_channels > 0

    @property
    def has_speaker_embedding(self) -> bool:
        return self.has_global_conditioning and self.use_speaker_embedding


def spec_from_config(cfg: Config) -> WaveNetSpec:
    """Build the model spec the way the reference's build_model() does
    (reference: train.py:887-918)."""
    upsample_params = dict(cfg.upsample_params)
    spec = WaveNetSpec(
        out_channels=cfg.out_channels,
        layers=cfg.layers,
        stacks=cfg.stacks,
        residual_channels=cfg.residual_channels,
        gate_channels=cfg.gate_channels,
        skip_out_channels=cfg.skip_out_channels,
        kernel_size=cfg.kernel_size,
        dropout=cfg.dropout,
        cin_channels=cfg.cin_channels,
        gin_channels=cfg.gin_channels,
        n_speakers=cfg.n_speakers,
        upsample_conditional_features=cfg.upsample_conditional_features,
        upsample_net=cfg.upsample_net,
        upsample_scales=tuple(upsample_params.get("upsample_scales", (4, 4, 4, 4))),
        upsample_activation=str(upsample_params.get("upsample_activation", "none")),
        freq_axis_kernel_size=int(upsample_params.get("freq_axis_kernel_size", 1)),
        cin_pad=cfg.cin_pad,
        scalar_input=cfg.is_scalar_input,
        use_speaker_embedding=cfg.use_speaker_embedding,
        output_distribution=cfg.output_distribution,
        remat=cfg.remat,
        remat_policy=cfg.remat_policy,
        fused_train=cfg.fused_train,
    )
    return spec


# ----------------------------------------------------------------------
# init
# ----------------------------------------------------------------------
def init_wavenet(rng, spec: WaveNetSpec) -> Params:
    """Initialize the full param pytree (reference: wavenet.py:98-156)."""
    n_keys = spec.layers + 5
    keys = jax.random.split(rng, n_keys)

    params: Params = {
        "first_conv": init_conv(keys[0], 1, spec.in_channels,
                                spec.residual_channels),
        "blocks": [
            init_res_block(
                keys[1 + i],
                residual_channels=spec.residual_channels,
                gate_channels=spec.gate_channels,
                kernel_size=spec.kernel_size,
                skip_out_channels=spec.skip_out_channels,
                cin_channels=spec.cin_channels,
                gin_channels=spec.gin_channels,
            )
            for i in range(spec.layers)
        ],
        # Output head: ReLU -> 1x1 -> ReLU -> 1x1 (reference: wavenet.py:136-141)
        "last_conv1": init_conv(keys[spec.layers + 1], 1,
                                spec.skip_out_channels, spec.skip_out_channels),
        "last_conv2": init_conv(keys[spec.layers + 2], 1,
                                spec.skip_out_channels, spec.out_channels),
    }

    if spec.has_speaker_embedding:
        assert spec.n_speakers is not None
        # std=0.1 (reference: wavenet.py:145-147)
        params["embed_speakers"] = init_embedding(
            keys[spec.layers + 3], spec.n_speakers, spec.gin_channels, std=0.1)

    if spec.upsample_conditional_features:
        init_fn, _ = upsample_lib.UPSAMPLE_NETS[spec.upsample_net]
        params["upsample_net"] = init_fn(
            keys[spec.layers + 4],
            upsample_scales=spec.upsample_scales,
            freq_axis_kernel_size=spec.freq_axis_kernel_size,
            cin_pad=spec.cin_pad,
            cin_channels=spec.cin_channels,
        )
    return params


# ----------------------------------------------------------------------
# conditioning helpers (shared by batch forward and the AR decoder)
# ----------------------------------------------------------------------
def embed_global(params: Params, spec: WaveNetSpec,
                 g: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """Global conditioning -> (B, gin_channels) float, or None.

    Accepts int speaker ids (B,) / (B,1) when a speaker embedding exists
    (reference: wavenet.py:185-190), else continuous (B, gin_channels).
    """
    if g is None:
        return None
    if spec.has_speaker_embedding and jnp.issubdtype(g.dtype, jnp.integer):
        g = embedding(params["embed_speakers"], g.reshape(g.shape[0]))
    return g.reshape(g.shape[0], -1)


def upsample_conditioning(params: Params, spec: WaveNetSpec,
                          c: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """Run the upsample net if configured; c: (B, T_mel, C) -> (B, T, C)
    (reference: wavenet.py:195-197)."""
    if c is None or not spec.upsample_conditional_features:
        return c
    _, apply_fn = upsample_lib.UPSAMPLE_NETS[spec.upsample_net]
    return apply_fn(params["upsample_net"], c,
                    upsample_scales=spec.upsample_scales,
                    cin_pad=spec.cin_pad,
                    upsample_activation=spec.upsample_activation)


# ----------------------------------------------------------------------
# apply (one-shot training graph)
# ----------------------------------------------------------------------
def apply_wavenet(params: Params, spec: WaveNetSpec, x: jnp.ndarray,
                  c: Optional[jnp.ndarray] = None,
                  g: Optional[jnp.ndarray] = None, *,
                  softmax: bool = False, train: bool = False,
                  rng=None, dtype=None, mesh=None) -> jnp.ndarray:
    """Batch forward (reference: wavenet.py:164-213).

    Args:
      x: (B, T, 1) scalar input or (B, T, out_channels) one-hot.
      c: local conditioning — (B, T_mel, C) if an upsample net is configured,
         else already sample-rate (B, T, C).
      g: global conditioning — int ids (B,)/(B,1) or floats (B, gin).
      dtype: compute dtype for the conv stack (e.g. jnp.bfloat16); params are
         f32 masters, head math returns f32.
      mesh: multi-device Mesh with a "data" axis — only needed by the
         fused_train path (Mosaic custom calls aren't GSPMD-partitionable;
         the fused stack dispatches via shard_map over the batch).
    Returns:
      (B, T, out_channels) float32 (optionally softmaxed over channels).
    """
    T = x.shape[1]

    g_vec = embed_global(params, spec, g)
    g_exp = None if g_vec is None else g_vec[:, None, :]  # (B, 1, gin)

    c = upsample_conditioning(params, spec, c)
    if c is not None:
        assert c.shape[1] == T, (c.shape, T)

    if dtype is not None:
        x = x.astype(dtype)
        c = None if c is None else c.astype(dtype)
        g_exp = None if g_exp is None else g_exp.astype(dtype)

    x = conv1x1(params["first_conv"], x)

    use_fused = spec.fused_train
    if use_fused:
        from wavenet_vocoder_tpu.ops.pallas_train import fused_train_fits
        if not fused_train_fits(spec, T):
            import warnings
            warnings.warn(
                "fused_train requested but the fused backward cannot fit "
                "one chip's VMEM at this model width (see "
                "ops/pallas_train.fused_train_fits); using the XLA layer "
                "loop instead", stacklevel=2)
            use_fused = False

    if use_fused:
        # fused residual-stack kernel: the whole layer loop per VMEM tile
        # (ops/pallas_train.py; custom VJP, grads flow to (g, v) through
        # the fold below). Interpret mode engages automatically off-TPU so
        # the same config runs in CPU tests.
        from wavenet_vocoder_tpu.ops.pallas_train import fused_res_stack
        folded_blocks = [
            {name: (remove_weight_norm(p) if "v" in p else p)
             for name, p in bp.items()}
            for bp in params["blocks"]]
        drop = spec.dropout if train else 0.0
        seed = None
        if drop > 0:
            if rng is None:
                drop = 0.0
            else:
                # one int32 seed per step; the kernel's counter-based mask
                # derives per-(b, t, layer, channel) bits from it
                seed = jax.random.randint(
                    rng, (1, 1), minval=jnp.iinfo(jnp.int32).min,
                    maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        skips = fused_res_stack(
            x, c, folded_blocks, spec,
            g=None if g_vec is None else g_vec.astype(jnp.float32),
            dtype=(dtype or jnp.float32), mesh=mesh,
            dropout=drop, seed=seed,
            interpret=jax.default_backend() not in ("tpu", "axon"))
        skips = skips * math.sqrt(1.0 / spec.layers)
        out = jax.nn.relu(skips.astype(dtype) if dtype else skips)
        out = conv1x1(params["last_conv1"], out)
        out = jax.nn.relu(out)
        out = conv1x1(params["last_conv2"], out)
        out = out.astype(jnp.float32)
        return jax.nn.softmax(out, axis=-1) if softmax else out

    skips = None
    drop_keys = (jax.random.split(rng, spec.layers)
                 if (train and spec.dropout > 0 and rng is not None) else
                 [None] * spec.layers)
    for block_p, dilation, k in zip(params["blocks"], spec.dilations, drop_keys):
        def blk(bp, x_, c_, g_, _d=dilation, _k=k):
            return res_block(bp, x_, c_, g_, dilation=_d,
                             dropout=spec.dropout if train else 0.0, rng=_k)
        if spec.remat:
            # recompute block activations in backward (jax.checkpoint):
            # O(layers) less live memory for long crops. policy="dots"
            # keeps matmul outputs and recomputes only elementwise ops —
            # the right trade for a bandwidth-bound step (bench.py roofline)
            policy = (jax.checkpoint_policies.dots_saveable
                      if spec.remat_policy == "dots" else None)
            blk = jax.checkpoint(blk, policy=policy)
        x, h = blk(block_p, x, c, g_exp)
        skips = h if skips is None else skips + h
    skips = skips * math.sqrt(1.0 / spec.layers)  # (reference: wavenet.py:205)

    out = jax.nn.relu(skips)
    out = conv1x1(params["last_conv1"], out)
    out = jax.nn.relu(out)
    out = conv1x1(params["last_conv2"], out)
    out = out.astype(jnp.float32)

    if softmax:
        out = jax.nn.softmax(out, axis=-1)
    return out


def make_generation_fast(params: Params) -> Params:
    """Strip weight norm from every conv in the pytree — the analogue of
    ``make_generation_fast_()`` (reference: wavenet.py:355-361)."""
    def fold(node):
        if isinstance(node, dict):
            if "v" in node and "g" in node:
                return remove_weight_norm(node)
            return {k: fold(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(fold(v) for v in node)
        return node
    return fold(params)
