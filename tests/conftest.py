"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
against XLA's host-platform device emulation instead. Must be set before jax
is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var set
# above; force the CPU backend through the config API as well (must happen
# before any backend is initialized).
import jax

jax.config.update("jax_platforms", "cpu")

REFERENCE = "/root/reference"

# ---------------------------------------------------------------------------
# Per-test timeout guard (pytest-timeout is not in the image). A SIGALRM
# raises a graceful TimeoutError inside the test; a faulthandler watchdog is
# the hard backstop for stalls inside C++ (e.g. an XLA compile that never
# returns — the round-1 test_fri_device hang) so one test can never hang the
# whole suite.
# ---------------------------------------------------------------------------
import faulthandler
import signal

import pytest

SOFT_TIMEOUT_S = int(os.environ.get("SEZKP_TEST_TIMEOUT", "600"))
HARD_TIMEOUT_S = SOFT_TIMEOUT_S + 120


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (deselect with -m 'not slow')"
    )


@pytest.fixture(autouse=True)
def _test_timeout(request):
    if not hasattr(signal, "SIGALRM"):
        yield
        return

    name = request.node.nodeid

    def _on_alarm(signum, frame):
        raise TimeoutError(f"test exceeded {SOFT_TIMEOUT_S}s: {name}")

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(SOFT_TIMEOUT_S)
    faulthandler.dump_traceback_later(HARD_TIMEOUT_S, exit=True)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
        faulthandler.cancel_dump_traceback_later()


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)
