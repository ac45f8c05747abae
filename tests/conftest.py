"""Test configuration.

Tests run on CPU with 8 virtual devices (the documented recipe for
validating multi-chip sharding without hardware) and 64-bit floats, the
reference's JPRB precision.  Must run before jax is imported anywhere.
"""

import os
import pathlib

# force CPU even when a TPU platform (e.g. JAX_PLATFORMS=axon) is
# pre-configured: the test suite is the f64 validation path and the
# virtual 8-device mesh.  jax may already be imported by a site hook
# that captured the env, so set the config directly as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except AttributeError:  # older jax: XLA_FLAGS above covers it
    pass
jax.config.update("jax_enable_x64", True)
from cloudsc2jax.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"


@pytest.fixture(scope="session")
def state():
    from cloudsc2jax.state import Cloudsc2State

    return Cloudsc2State.load(FIXTURES / "input.h5")


@pytest.fixture(scope="session")
def inputs(state):
    return state.kernel_inputs()


@pytest.fixture(scope="session")
def reference():
    from cloudsc2jax import io as cio

    return cio.load_reference_h5(FIXTURES / "reference.h5")


@pytest.fixture(scope="session")
def nl_outputs(state, inputs):
    from cloudsc2jax.drivers import run_nl

    return run_nl(inputs, state.params)
