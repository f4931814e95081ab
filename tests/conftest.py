"""Test harness setup.

Forces a virtual 8-device CPU platform BEFORE jax import, so multi-chip
sharding tests run anywhere (the analogue of the reference's CPU-only CI,
reference: .travis.yml:34 — plus the multi-device coverage the reference
lacks, SURVEY.md section 4).
"""
import os
import sys

# Repo root importable without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
# f32 matmuls on CPU for tight equivalence tolerances.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "float32")
