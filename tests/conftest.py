"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real TPU hardware in this environment is a single chip; multi-chip sharding
logic is validated on virtual CPU devices (same XLA SPMD partitioner).
Must set flags before jax initializes its backends.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force CPU: the ambient environment points JAX_PLATFORMS at the tunneled
# TPU, which makes eager unit-test ops cross the tunnel (minutes instead of
# seconds) and would race the benchmark for the single real chip. The env
# var alone is not enough — the axon sitecustomize hook registers its PJRT
# plugin at interpreter boot with JAX_PLATFORMS=axon baked into the env —
# so override through jax.config (wins as long as no backend has
# initialized yet, which is guaranteed here: conftest runs first).
os.environ["JAX_PLATFORMS"] = "cpu"

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

_EXIT_STATUS = [0]


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (full-size model parity runs)"
    )


def pytest_sessionfinish(session, exitstatus):
    _EXIT_STATUS[0] = int(exitstatus)


@pytest.hookimpl(trylast=True)
def pytest_unconfigure(config):
    # The ambient axon TPU-tunnel plugin (registered per-process by a
    # sitecustomize hook) blocks ~2 minutes at interpreter shutdown closing
    # its session. Tests never touch the TPU; skip the teardown entirely.
    # (unconfigure/trylast = after the terminal summary has been printed.)
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_EXIT_STATUS[0])
