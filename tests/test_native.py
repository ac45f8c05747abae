"""Native host-shim tests (parity with mycpu.c + timer/energy hooks)."""

import numpy as np

from cloudsc2jax.native import hostinfo


def test_sched_getcpu():
    cpu = hostinfo.sched_getcpu()
    assert isinstance(cpu, int)
    assert cpu >= -1  # -1 only when the native lib could not be built


def test_monotonic_ns_advances():
    a = hostinfo.monotonic_ns()
    b = hostinfo.monotonic_ns()
    assert b >= a > 0


def test_expand_matches_numpy_tile():
    rng = np.random.default_rng(0)
    src = rng.standard_normal((100, 137))
    dst = np.empty((1024, 137))
    if not hostinfo.expand_f64(src, dst):
        import pytest

        pytest.skip("native lib unavailable")
    reps = -(-1024 // 100)
    expect = np.tile(src, (reps, 1))[:1024]
    np.testing.assert_array_equal(dst, expect)
