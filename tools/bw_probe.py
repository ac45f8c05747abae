#!/usr/bin/env python
"""Measure the achievable HBM streaming bandwidth on the current device.

The evidence behind DESIGN.md §3's "measured platform streaming ceiling
~390 GB/s" claim (v5e nominal is 819 GB/s): times a pure streaming
program — read two f32 arrays, write one (`out = a + scale * b`, the
simplest 12-bytes-per-element stream) — using the same chained-
accumulator methodology as bench.py (distinct inputs per call, scalar
probe chained on device, one host fetch), so tunnel latency and call
coalescing cannot distort it.

Window-matched mode (``CLOUDSC2_BW_PROBE_WINDOWS=RxW``): a Pallas
streaming kernel with the SAME per-grid-step window structure as the
physics kernels — grid ``(nb, nlev)``, R read + W write ``(S,128)``
windows per step, trivial VPU body — so the TL (17r+19w=36 windows) and
reverse-adjoint (28r+18w=46) mixes can be judged against a ceiling that
pays the same window-issue cost at the same traffic, not against the
3-stream ideal (VERDICT r2 item 3).  ``CLOUDSC2_BW_PROBE_REV=1``
streams the level grid in reverse order (the adjoint sweep's DMA
order).  ``CLOUDSC2_BW_PROBE_NB`` sets blocks (traffic matching).

Compute-weighted mode (``CLOUDSC2_BW_PROBE_COMPUTE=T,F``, window mode
only; VERDICT r4 item 3): adds a calibrated VPU body — T transcendental
ops (tanh) + F fused multiply-adds per ELEMENT per grid step — so the
ceiling pays the physics kernels' arithmetic density, not just their
DMA shape.  Calibration against SURVEY §3.5's ZHPM accounting (~292
flops + ~10 exp/tanh per level-column): the NL body ≈ ``10,292``, the
TL sweep (primal+tangent) ≈ ``20,584``, the reverse adjoint (checkpoint
recompute + transpose) ≈ ``30,876``.  The chain is serially dependent
(each op consumes the previous result) so Mosaic cannot reassociate it
away, and its result is mixed into every output at 1e-20 scale (forced,
numerically invisible to the self-check).

Prints one JSON line; feed ``attained_gbps`` to tools/roofline.py as
--hbm-gbps for the fraction-of-practical-roofline number.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def window_probe():
    """Time a Pallas kernel streaming R read + W write (S,128) windows
    per grid step over a (nb, nlev) grid — the physics kernels' exact
    DMA shape with a trivial body.  Returns the JSON record."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r_w = os.environ["CLOUDSC2_BW_PROBE_WINDOWS"]
    R, W = (int(x) for x in r_w.lower().split("x"))
    nlev = int(os.environ.get("CLOUDSC2_BW_PROBE_NLEV", 137))
    S = int(os.environ.get("CLOUDSC2_BW_PROBE_SUBLANES", 64))
    nb = int(os.environ.get("CLOUDSC2_BW_PROBE_NB", 20))
    rev = os.environ.get("CLOUDSC2_BW_PROBE_REV", "0") == "1"
    repeats = int(os.environ.get("CLOUDSC2_BW_PROBE_REPEATS", 20))
    interpret = os.environ.get("CLOUDSC2_BW_PROBE_INTERPRET", "0") == "1" \
        or jax.devices()[0].platform != "tpu"
    compute = os.environ.get("CLOUDSC2_BW_PROBE_COMPUTE", "0,0")
    n_trans, n_flops = (int(x) for x in compute.split(","))

    blk = (1, 1, S, 128)
    # arrays are (nlev, nb, S, 128) like the physics kernels' level
    # streams — the block index must be (level, block) exactly as
    # tlad_kernel's lev_s maps (kk, b); (b, k) order would clamp k
    # against the nb-sized dim and let Mosaic elide the repeated DMA
    im = (lambda b, k: (nlev - 1 - k, b, 0, 0)) if rev \
        else (lambda b, k: (k, b, 0, 0))
    spec = pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def kernel(s_ref, *refs):
        ins, outs = refs[:R], refs[R:]
        s = s_ref[0]
        work = jnp.zeros_like(ins[0][...])
        if n_trans or n_flops:
            # serially-dependent VPU chain: T tanh + F/2 FMAs per
            # element (one FMA = 2 flops), seeded from real data and
            # re-salted from a different input every few ops so no
            # subsequence is loop-invariant
            work = ins[0][...]
            for t in range(n_trans):
                work = jnp.tanh(work + ins[t % R][...] * 1e-3)
            for f in range(max(n_flops - 2 * n_trans, 0) // 2):
                work = work * 1.0000001 + ins[f % R][...] * 1e-6
            work = work * 1e-20  # forced, numerically invisible
        for j in range(W):
            outs[j][...] = ins[j % R][...] * s + ins[(j + 1) % R][...] + work

    shape = (nlev, nb, S, 128)
    call = pl.pallas_call(
        kernel,
        grid=(nb, nlev),
        in_specs=[smem] + [spec] * R,
        out_specs=[spec] * W,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * W,
        interpret=interpret,
    )

    @jax.jit
    def step(s, *arrs):
        outs = call(s, *arrs)
        return sum(jnp.ravel(o)[:2].sum() for o in outs)

    key = jax.random.PRNGKey(0)
    arrs = [
        jax.random.uniform(jax.random.fold_in(key, i), shape, jnp.float32)
        for i in range(R)
    ]

    if interpret:
        # self-check: every (level, block) window must carry its own
        # data — catches index-map/layout bugs (a clamped index leaves
        # most windows equal to the last in-range one)
        s0 = 2.0
        outs = call(jnp.full((1,), s0, jnp.float32), *arrs)
        for j, o in enumerate(outs):
            want = arrs[j % R] * s0 + arrs[(j + 1) % R]
            np.testing.assert_allclose(np.asarray(o), np.asarray(want),
                                       rtol=1e-6)

    acc = jnp.float32(0.0)
    for i in range(8):
        acc = acc + step(jnp.full((1,), 1e-7 * (i + 1), jnp.float32), *arrs)
    assert np.isfinite(float(acc))

    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for i in range(repeats):
        acc = acc + step(jnp.full((1,), 1e-6 * (i + 1), jnp.float32), *arrs)
    assert np.isfinite(float(acc))
    dt = (time.perf_counter() - t0) / repeats

    traffic = (R + W) * nlev * nb * S * 128 * 4
    return {
        "platform": jax.devices()[0].platform,
        "mode": "windows",
        "windows": f"{R}x{W}",
        "compute_per_element": {"transcendentals": n_trans,
                                "flops": n_flops},
        "rev": rev,
        "nb": nb,
        "sublanes": S,
        "nlev": nlev,
        "traffic_gb_per_call": round(traffic / 1e9, 3),
        "ms_per_call": round(dt * 1e3, 3),
        "attained_gbps": round(traffic / dt / 1e9, 1),
    }


def main():
    import jax

    plat_env = os.environ.get("JAX_PLATFORMS")
    if plat_env:
        jax.config.update("jax_platforms", plat_env)

    if os.environ.get("CLOUDSC2_BW_PROBE_WINDOWS"):
        print(json.dumps(window_probe()))
        return

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
