"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere. Real-TPU execution is
exercised by bench.py / the driver, not by unit tests (single-chip compiles
are 20-40s; CPU keeps the suite fast and lets us fake multi-chip meshes).
"""

import os

# The environment boots an 'axon' TPU-tunnel backend via sitecustomize and
# pins JAX_PLATFORMS=axon; env edits here are too late (site init already
# ran), so override through jax.config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn

# A user-exported AHA_SPEC_DECODE overrides even explicit spec_tokens
# arguments (the ops kill switch, engine.py) — which would turn the
# S=4-vs-S=1 parity tests into spec-vs-itself no-ops. Same for the fused
# frame-scoring knob. Tests that WANT the env path set it explicitly via
# monkeypatch.
os.environ.pop("AHA_SPEC_DECODE", None)
os.environ.pop("AHA_FUSED_SCORE", None)
# Acceptance-adaptive widening (spec_decode_tokens_max=8, the product
# default) compiles a SECOND spec tail into every product-path engine —
# measured >3x wall on the engine-heavy CPU test files. Tests pin the
# ceiling to the base width; the adaptive path has its own dedicated
# coverage (test_spec_generate adaptive tests, which monkeypatch-delete
# this var before building their engines).
os.environ["AHA_SPEC_MAX"] = "0"   # 0 -> clamps to spec_tokens (no widening)

import jax

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

# Persistent XLA compile cache (utils/compile_cache docstring): the slow
# tier is compile-dominated on this 1-core host — repeat runs of unchanged
# programs become disk reads. Content-addressed, so stale entries can
# never serve a changed program; AHA_COMPILE_CACHE=0 disables.
from aha_tpu.utils.compile_cache import enable as _enable_compile_cache  # noqa: E402

_enable_compile_cache()

import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="also run tests marked slow (the full ~15 min tier); "
             "default is the <2 min smoke tier",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy parity/e2e tests; skipped unless --full or AHA_FULL_TESTS=1"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full") or os.environ.get("AHA_FULL_TESTS"):
        return
    skip = pytest.mark.skip(reason="slow tier (run with --full or AHA_FULL_TESTS=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def reference_root():
    """Path to the read-only reference repo; tests that use it as a golden
    oracle skip when it is absent (e.g. CI without the mount)."""
    ref = pathlib.Path("/root/reference")
    if not ref.exists():
        pytest.skip("reference repo not mounted")
    return ref
