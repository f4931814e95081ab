"""Training state + step: optax optimizer, LR schedules, EMA, masked losses.

Replaces the reference's torch engine (reference: train.py:692-849):
  * optimizer by name w/ Adam params (reference: train.py:1083-1085)
  * per-step LR schedule (reference: train.py:712-718)
  * optional global-norm grad clip (``clip_thresh``, reference: train.py:759-763)
  * EMA shadow params updated post-step (reference: train.py:322-343, 765-768)
  * the autoregressive one-sample shift: predict y[t+1] from x[<=t]
    (reference: train.py:728-729, 742-748)

The train step is a pure function (state, batch, rng) -> (state, metrics),
jitted once; under a Mesh with a sharded batch XLA inserts the psum gradient
all-reduce automatically (replacing torch DataParallel,
reference: train.py:676-689).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.models.wavenet import (
    WaveNetSpec,
    apply_wavenet,
    init_wavenet,
    spec_from_config,
)
from wavenet_vocoder_tpu.ops.losses import (
    masked_cross_entropy,
    masked_gaussian_loss,
    masked_mol_loss,
    sequence_mask,
)
from wavenet_vocoder_tpu.training.lrschedule import make_schedule


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def _make_core_optimizer(name: str, schedule, p: Dict[str, Any]):
    """Optimizer registry: torch-style names + ``optimizer_params`` keys map
    onto optax — restoring the reference's any-optimizer-by-name generality
    (``getattr(optim, hparams.optimizer)``, reference: train.py:1083-1085)."""
    eps = float(p.get("eps", 1e-8))
    weight_decay = float(p.get("weight_decay", 0.0))
    betas = p.get("betas", (0.9, 0.999))
    b1, b2 = float(betas[0]), float(betas[1])
    momentum = float(p.get("momentum", 0.0))
    key = name.lower()

    if key == "adam":
        if weight_decay > 0.0:
            return optax.adamw(schedule, b1=b1, b2=b2, eps=eps,
                               weight_decay=weight_decay)
        return optax.adam(schedule, b1=b1, b2=b2, eps=eps)
    if key == "adamw":
        return optax.adamw(schedule, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay)
    if key == "adamax":
        return optax.adamax(schedule, b1=b1, b2=b2, eps=eps)
    if key == "nadam":
        return optax.nadam(schedule, b1=b1, b2=b2, eps=eps)
    if key == "radam":
        return optax.radam(schedule, b1=b1, b2=b2, eps=eps)
    if key == "sgd":
        core = optax.sgd(schedule, momentum=momentum or None,
                         nesterov=bool(p.get("nesterov", False)))
    elif key == "rmsprop":
        core = optax.rmsprop(schedule, decay=float(p.get("alpha", 0.99)),
                             eps=eps, momentum=momentum or None,
                             centered=bool(p.get("centered", False)))
    elif key == "adagrad":
        core = optax.adagrad(schedule, eps=float(p.get("eps", 1e-10)))
    elif key == "adadelta":
        core = optax.adadelta(schedule, rho=float(p.get("rho", 0.9)), eps=eps)
    elif key == "lamb":
        return optax.lamb(schedule, b1=b1, b2=b2, eps=eps,
                          weight_decay=weight_decay)
    elif key == "adafactor":
        return optax.adafactor(schedule)
    else:
        raise ValueError(
            f"Unsupported optimizer: {name!r}; supported: Adam, AdamW, "
            "Adamax, NAdam, RAdam, SGD, RMSprop, Adagrad, Adadelta, Lamb, "
            "Adafactor (reference accepts any torch.optim name, "
            "train.py:1083-1085)")
    if weight_decay > 0.0:
        # torch-style decoupled-from-nothing L2: decay added to the gradient
        # before the update (torch SGD/RMSprop/... semantics)
        core = optax.chain(optax.add_decayed_weights(weight_decay), core)
    return core


def make_optimizer(cfg: Config):
    """Optimizer by name (+clip) with the config's schedule
    (reference: train.py:1083-1085; clip: train.py:759-763)."""
    opt_params = dict(cfg.optimizer_params)
    init_lr = float(opt_params.get("lr", 1e-3))
    schedule = make_schedule(cfg.lr_schedule, init_lr,
                             dict(cfg.lr_schedule_kwargs))
    core = _make_core_optimizer(cfg.optimizer, schedule, opt_params)

    chain = []
    if cfg.clip_thresh > 0:
        chain.append(optax.clip_by_global_norm(float(cfg.clip_thresh)))
    chain.append(core)
    return optax.chain(*chain), schedule


def create_train_state(cfg: Config, rng=None,
                       spec: Optional[WaveNetSpec] = None) -> TrainState:
    """build_model + optimizer + EMA registration
    (reference: train.py:887-918, 793-799)."""
    spec = spec or spec_from_config(cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    params = init_wavenet(rng, spec)
    tx, _ = make_optimizer(cfg)
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.copy, params) if cfg.exponential_moving_average else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, ema_params=ema)


def select_criterion(cfg: Config):
    """Loss by input_type / output_distribution (reference: train.py:781-791)."""
    if cfg.is_mulaw_quantize:
        return lambda y_hat, y, mask: masked_cross_entropy(y_hat, y, mask)
    if cfg.output_distribution == "Logistic":
        return lambda y_hat, y, mask: masked_mol_loss(
            y_hat, y, mask, num_classes=cfg.quantize_channels,
            log_scale_min=cfg.log_scale_min)
    if cfg.output_distribution == "Normal":
        return lambda y_hat, y, mask: masked_gaussian_loss(
            y_hat, y, mask, log_scale_min=cfg.log_scale_min)
    raise ValueError(
        f"Not supported: input_type={cfg.input_type}, "
        f"output_distribution={cfg.output_distribution} "
        "(reference: train.py:781-791)")


def ema_update(ema, params, decay: float):
    """shadow -= (1 - decay) * (shadow - param) (reference: train.py:329-333)."""
    return jax.tree.map(lambda s, p: s - (1.0 - decay) * (s - p), ema, params)


def sanity_check(spec: WaveNetSpec, batch: Dict[str, Any]) -> None:
    """Model-vs-batch conditioning consistency (reference: train.py:72-87):
    catch config/data mismatches with clear errors before tracing."""
    has_c = batch.get("c") is not None
    has_g = batch.get("g") is not None
    if has_c and not spec.has_local_conditioning:
        raise ValueError(
            "Batch has local conditioning but cin_channels <= 0 "
            "(reference: train.py:76-80)")
    if not has_c and spec.has_local_conditioning:
        raise ValueError(
            "cin_channels > 0 but batch has no local conditioning features")
    if has_g and not spec.has_global_conditioning:
        raise ValueError(
            "Batch has speaker ids but gin_channels <= 0 "
            "(reference: train.py:81-85)")
    if not has_g and spec.has_global_conditioning:
        raise ValueError(
            "gin_channels > 0 but batch has no global conditioning")
    if has_c and batch["c"].shape[-1] != spec.cin_channels:
        raise ValueError(
            f"conditioning feature dim {batch['c'].shape[-1]} != "
            f"cin_channels {spec.cin_channels}")


def make_train_step(cfg: Config, spec: Optional[WaveNetSpec] = None,
                    mesh=None):
    """Build the jitted (state, batch, rng) -> (state, metrics) step.

    batch dict:
      x: (B, T, C_in) model input (one-hot or scalar)
      y: (B, T) int targets (categorical) or (B, T, 1) float targets
      c: (B, T_mel, C) local conditioning or None
      g: (B,) / (B, gin) global conditioning or None
      input_lengths: (B,) valid lengths of x

    mesh: the training Mesh, required only when fused_train runs
    multi-device — the fused Pallas stack dispatches via shard_map over the
    mesh's data axis (GSPMD cannot partition Mosaic custom calls); all other
    ops shard implicitly from the batch/param shardings.
    """
    spec = spec or spec_from_config(cfg)
    tx, schedule = make_optimizer(cfg)
    criterion = select_criterion(cfg)
    dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
    ema_decay = cfg.ema_decay
    use_ema = cfg.exponential_moving_average
    stack_mesh = mesh if spec.fused_train else None

    def loss_fn(params, batch, rng, train=True):
        y_hat = apply_wavenet(
            params, spec, batch["x"], c=batch.get("c"), g=batch.get("g"),
            train=train, rng=rng, dtype=dtype, mesh=stack_mesh)
        T = batch["x"].shape[1]
        # one-sample AR shift (reference: train.py:728-729, 742-748)
        mask = sequence_mask(batch["input_lengths"], T)[:, 1:]
        return criterion(y_hat[:, :-1], _shift_targets(batch["y"]), mask)

    def _shift_targets(y):
        return y[:, 1:]

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, Any], rng
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # Per-step key derived INSIDE the jit from the step counter: callers
        # pass one base key for the whole run (per-step host-side fold_in
        # would cost an eager dispatch per step).
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (ema_update(state.ema_params, new_params, ema_decay)
                   if use_ema else None)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "lr": schedule(state.step),
        }
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt_state, ema_params=new_ema), metrics

    @jax.jit
    def eval_step(state: TrainState, batch: Dict[str, Any], rng
                  ) -> Dict[str, jnp.ndarray]:
        """Dev-set loss with the same criterion, no update, DROPOUT OFF —
        the reference runs dev phases under model.eval()
        (reference: train.py:702-709 dev phase)."""
        loss = loss_fn(state.params, batch, rng, train=False)
        return {"loss": loss}

    return train_step, eval_step
