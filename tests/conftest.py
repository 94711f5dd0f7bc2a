"""Test configuration: force CPU backend with float64 before jax import.

Parity tests (vs the reference's committed golden outputs) need float64; the
virtual 8-device mesh exercises the multi-chip sharding path without TPUs.
"""

import os

# Force CPU: the session environment points JAX_PLATFORMS at the remote TPU
# tunnel ("axon"), which would route every test op over the network.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env-var alone does not win over the axon PJRT plugin registered by the
# image's sitecustomize; the config knob does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE.exists()
