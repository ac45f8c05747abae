#!/usr/bin/env python
"""Measure the achievable HBM streaming bandwidth on the current device.

The evidence behind DESIGN.md §3's "measured platform streaming ceiling
~390 GB/s" claim (v5e nominal is 819 GB/s): times a pure streaming
program — read two f32 arrays, write one (`out = a + scale * b`, the
simplest 12-bytes-per-element stream) — using the same chained-
accumulator methodology as bench.py (distinct inputs per call, scalar
probe chained on device, one host fetch), so tunnel latency and call
coalescing cannot distort it.

Prints one JSON line; feed ``attained_gbps`` to tools/roofline.py as
--hbm-gbps for the fraction-of-practical-roofline number.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    plat_env = os.environ.get("JAX_PLATFORMS")
    if plat_env:
        jax.config.update("jax_platforms", plat_env)

    import jax.numpy as jnp
    import numpy as np

    mb = int(os.environ.get("CLOUDSC2_BW_PROBE_MB", 256))  # per array
    repeats = int(os.environ.get("CLOUDSC2_BW_PROBE_REPEATS", 20))
    n = mb * 1024 * 1024 // 4

    key = jax.random.PRNGKey(0)
    a = jax.random.uniform(key, (n,), jnp.float32)
    b = jax.random.uniform(jax.random.PRNGKey(1), (n,), jnp.float32)

    @jax.jit
    def stream(a, b, s):
        out = a + s * b  # 2 reads + 1 write, zero arithmetic intensity
        return out[:2].sum() + out[-2:].sum()  # tiny probe forces the write

    # warm chain (first chained sequence in a process ramps slowly)
    acc = jnp.float32(0.0)
    for i in range(8):
        acc = acc + stream(a, b, jnp.float32(1e-7 * (i + 1)))
    assert np.isfinite(float(acc))

    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for i in range(repeats):
        acc = acc + stream(a, b, jnp.float32(1e-6 * (i + 1)))
    assert np.isfinite(float(acc))
    dt = (time.perf_counter() - t0) / repeats

    traffic = 3 * n * 4  # bytes per call
    print(
        json.dumps(
            {
                "platform": jax.devices()[0].platform,
                "array_mb": mb,
                "traffic_gb_per_call": round(traffic / 1e9, 3),
                "ms_per_call": round(dt * 1e3, 3),
                "attained_gbps": round(traffic / dt / 1e9, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
