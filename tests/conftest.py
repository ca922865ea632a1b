"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere. Real-TPU execution is
exercised by bench.py / the driver, not by unit tests (single-chip compiles
are 20-40s; CPU keeps the suite fast and lets us fake multi-chip meshes).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import pytest


@pytest.fixture(scope="session")
def reference_root():
    """Path to the read-only reference repo; tests that use it as a golden
    oracle skip when it is absent (e.g. CI without the mount)."""
    ref = pathlib.Path("/root/reference")
    if not ref.exists():
        pytest.skip("reference repo not mounted")
    return ref
