"""Test configuration: force an 8-device virtual CPU mesh.

Tests run hardware-independently on CPU (Pallas kernels fall back to interpret
mode there); multi-device sharding tests use the 8 virtual host devices. Real-TPU
runs happen via bench.py and tools/tpu_check.py, not pytest.

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# no network in CI: skip HF hub retry storms (5 retries x backoff per load)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms to "axon,cpu"
# at interpreter start, overriding the JAX_PLATFORMS env var — override it
# back before any backend initializes so tests never claim the real TPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
