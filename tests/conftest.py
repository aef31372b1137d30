"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
without TPU hardware (the driver separately dry-runs the multi-chip path and
benchmarks on a real chip). Note: this machine's JAX build ignores the
JAX_PLATFORMS env var (an 'axon' TPU-tunnel platform is pre-wired), so the
platform must be forced through jax.config before any backend is touched.
"""
import os
import sys
from pathlib import Path

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

# pin the link-adaptive posterior materialization to the device-softmax
# branch: the auto branch measures transfer throughput, and under suite
# load the measurement can flip between two otherwise-identical calls
# (device vs host softmax differ in last ulps, breaking bit-equality
# asserts). Tests that exercise the host branch set the env themselves.
os.environ.setdefault("DEMUX_HOST_SOFTMAX", "0")

import jax

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_EXAMPLE_DATA = Path("/root/reference/examples/example_data")


def pytest_configure(config):
    config.addinivalue_line("markers", "perf: heavy quality/benchmark runs")
