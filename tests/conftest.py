"""Test config: run everything on CPU with 8 virtual devices.

Multi-chip sharding paths (chain sharding, psum likelihood reduction,
checkpoint/resume) are exercised on a virtual mesh per SURVEY.md §4; the
driver separately dry-runs the real multi-chip path via __graft_entry__.
Must run before jax initializes a backend, hence env vars at import time.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image; the
# config route does stick. Must happen before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
