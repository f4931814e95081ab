"""FLOP accounting sanity: the analytic matmul count must agree with XLA's
cost analysis of the actual forward graph (within the non-matmul slop), so
the MFU numbers bench.py reports are trustworthy."""
import jax
import jax.numpy as jnp
import numpy as np

from wavenet_vocoder_tpu.models.wavenet import (
    WaveNetSpec,
    apply_wavenet,
    init_wavenet,
)
from wavenet_vocoder_tpu.utils import flops as fl


def test_analytic_matches_xla_forward():
    spec = WaveNetSpec(out_channels=64, layers=4, stacks=2,
                       residual_channels=16, gate_channels=32,
                       skip_out_channels=16, cin_channels=8,
                       scalar_input=False,
                       upsample_conditional_features=False)
    params = init_wavenet(jax.random.PRNGKey(0), spec)
    B, T = 2, 256
    x = jnp.zeros((B, T, spec.in_channels))
    c = jnp.zeros((B, T, 8))

    fn = jax.jit(lambda p, x, c: apply_wavenet(p, spec, x, c=c))
    xla = fl.xla_cost_flops(fn, params, x, c)
    analytic = fl.forward_flops_per_sample(spec) * B * T
    if xla is None:  # backend without cost analysis
        return
    # XLA counts weight-norm normalization, GLU, softplus etc. on top of the
    # matmuls; the matmul core must dominate and never exceed XLA's total
    assert analytic <= xla * 1.05, (analytic, xla)
    assert analytic >= 0.5 * xla, (analytic, xla)


def test_train_flops_is_3x_forward():
    spec = WaveNetSpec(out_channels=64, layers=2, stacks=1,
                       residual_channels=8, gate_channels=16,
                       skip_out_channels=8, cin_channels=-1)
    assert fl.train_flops_per_sample(spec) == \
        3 * fl.forward_flops_per_sample(spec)


def test_device_peaks_unknown_is_none():
    class Fake:
        device_kind = "Quantum Abacus 9000"
    assert fl.device_peak_flops(Fake()) is None
    assert fl.device_peak_hbm_bw(Fake()) is None


def test_device_peaks_known():
    class V5e:
        device_kind = "TPU v5 lite"
    assert fl.device_peak_flops(V5e()) == 197e12
    assert fl.device_peak_hbm_bw(V5e()) == 819e9
