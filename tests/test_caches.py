"""Executable-cache bounding (VERDICT r1 weak-item 6 / next-round 8).

The driver-level jitted-step caches are keyed by id(params)-bearing
tuples and hold the executables alive; they must be LRU-bounded so
long-lived processes sweeping configurations don't accumulate compiled
executables forever.
"""

import numpy as np

from cloudsc2jax import drivers
from cloudsc2jax.drivers import _LRUCache, run_nl
from cloudsc2jax.state import Cloudsc2State


def test_lru_cache_bounded_and_lru_ordered():
    c = _LRUCache(maxsize=8)
    for i in range(100):
        c[("cfg", i)] = i
    assert len(c) == 8
    assert c.get(("cfg", 99)) == 99
    assert c.get(("cfg", 0)) is None
    # a get refreshes recency: key 92 survives the next insertion
    assert c.get(("cfg", 92)) == 92
    c[("cfg", 100)] = 100
    assert c.get(("cfg", 92)) == 92
    assert c.get(("cfg", 93)) is None


def test_run_nl_cache_stays_bounded_under_config_sweep():
    st = Cloudsc2State.synthetic(ngptot=8, nlev=3)
    inputs = st.kernel_inputs(dtype=np.float32)
    maxsize = drivers._NL_CACHE.maxsize
    # sweep more distinct configs (fresh params objects -> fresh keys)
    # than the cache holds
    for i in range(maxsize + 4):
        params = st.params.replace(ptsphy=3600.0 + i)
        out = run_nl(inputs, params)
        assert np.isfinite(np.asarray(out.tenl_t)).all()
    assert len(drivers._NL_CACHE) <= maxsize


def test_run_nl_cache_hit_reuses_entry():
    st = Cloudsc2State.synthetic(ngptot=8, nlev=3)
    inputs = st.kernel_inputs(dtype=np.float32)
    run_nl(inputs, st.params)
    n = len(drivers._NL_CACHE)
    run_nl(inputs, st.params)  # same params object: must hit, not grow
    assert len(drivers._NL_CACHE) == n
