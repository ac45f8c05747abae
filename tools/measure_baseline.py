#!/usr/bin/env python
"""Measure (don't estimate) reference-implementation throughput on this host.

VERDICT r1 item 6: ``bench.py``'s ``vs_baseline`` divides by a 300k
columns/s *paper estimate* of the reference's 4-thread CPU rate (derived
from its own ZHPM flop accounting at ~3 GFlop/s/core).  This tool adds a
measured anchor: it times

1. the reference's own NumPy port of the NL kernel
   (``/root/reference/src/cloudsc2_nl_gt4py/cloudsc2_py.py``, executed
   in place — never copied) on the committed 100-column input state, and
2. the framework's XLA-CPU path (f64, the JPRB validation precision) at
   a small NGPTOT,

on THIS host (a single slow core — the numbers are a lower bound for the
reference's README config, which assumes 4 strong OpenMP threads), and
writes ``BASELINE_MEASURED.json`` at the repo root.  ``bench.py`` embeds
the file as measured-provenance next to the estimate.

Usage: python tools/measure_baseline.py [--repeats 3]
"""

import argparse
import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--xla-ngptot", type=int, default=400)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import numpy as np

    sys.path.insert(0, str(REPO / "tools"))

    from cloudsc2jax import io as cio
    from make_golden import run_reference_port  # tools/ sibling

    fixtures = REPO / "tests" / "fixtures"
    fw, params = cio.load_input_h5(fixtures / "input.h5")
    fields = {k: np.moveaxis(v, 0, -1) for k, v in fw.items()}
    nlon = fields["PT"].shape[-1]

    # 1. reference NumPy port (loop-nest Fortran-in-Python, 1 core)
    run_reference_port(fields, params)  # warm (imports, allocations)
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        run_reference_port(fields, params)
    t_np = (time.perf_counter() - t0) / args.repeats
    numpy_rate = nlon / t_np

    # 2. framework XLA-CPU f64 path on the same host
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from cloudsc2jax.cache import enable_compile_cache

    enable_compile_cache()

    from cloudsc2jax.drivers import run_nl
    from cloudsc2jax.state import Cloudsc2State

    state = Cloudsc2State.load(fixtures / "input.h5", ngptot=args.xla_ngptot)
    inputs = state.kernel_inputs()
    out = run_nl(inputs, state.params)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        jax.block_until_ready(run_nl(inputs, state.params))
    t_xla = (time.perf_counter() - t0) / args.repeats
    xla_rate = args.xla_ngptot / t_xla

    result = {
        "host": "bench container (single usable CPU core)",
        "numpy_port_cols_per_s": round(numpy_rate, 1),
        "numpy_port_cols": nlon,
        "xla_cpu_f64_cols_per_s": round(xla_rate, 1),
        "xla_cpu_f64_cols": args.xla_ngptot,
        "reference_estimate_cols_per_s": 300000.0,
        "note": (
            "numpy_port = the reference repo's own cloudsc2_py.py executed "
            "in place on this host; the 300k estimate models the README's "
            "4-strong-OpenMP-thread CPU config via the reference's ZHPM "
            "flop accounting (bench.py header) and remains the vs_baseline "
            "denominator; these measurements anchor it with real numbers "
            "from available hardware"
        ),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    out_path = REPO / "BASELINE_MEASURED.json"
    out_path.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
