#!/usr/bin/env python
"""Input-stream storage-encoding study (VERDICT r1 item 9 / DESIGN.md §8).

The kernels are bandwidth-bound, so element bytes are the one remaining
perf lever (~2x if every stream halves).  This tool quantifies the
ACCURACY side: it round-trips the 100-column input state through a
candidate 2-byte storage encoding, runs the exact f64 kernel on the
decoded state, and reports each output field's relative error vs the
unquantised run — to be compared against

* the f32 working-precision path's own error vs f64 goldens (~1.6e-5),
* the on-chip validation budget (1e4 x eps32 ~ 1.19e-3),
* the reference's 10 x eps64 golden criterion (2.2e-15; any sub-f32
  storage obviously abandons this — so does the reference's own
  -DSINGLE build).

Encodings:
  bf16  raw bfloat16 storage (8-bit mantissa, ~0.4% rel)
  f16   raw IEEE float16 storage (10-bit mantissa, ~0.1% rel)
  i16   per-field PER-LEVEL affine int16 ("anomaly" encoding): for each
        field and level, offset = midrange, scale = halfrange/32767 over
        the stored columns (cyclic expansion preserves the range), i.e.
        values become 16-bit anomalies from a level-dependent reference
        profile — T becomes T - Tref(level), q a level-scaled anomaly.

Prints a JSON table; the adopt/reject decision and numbers land in
DESIGN.md §8.
"""

import json
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def quantize(name, x, scheme):
    import numpy as np

    x = np.asarray(x, np.float64)
    if scheme == "bf16":
        import jax.numpy as jnp

        return np.asarray(
            jnp.asarray(x, jnp.bfloat16).astype(jnp.float64)
        )
    if scheme == "f16":
        return x.astype(np.float16).astype(np.float64)
    if scheme == "i16":
        # x is (ncol, [nclv,] nlev): affine per trailing-level (and
        # species) index over columns
        lo = x.min(axis=0)
        hi = x.max(axis=0)
        off = 0.5 * (hi + lo)
        scale = np.maximum((hi - lo) / 65534.0, 1e-300)
        q = np.clip(np.rint((x - off) / scale), -32767, 32767)
        return q * scale + off
    raise ValueError(scheme)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from cloudsc2jax.cache import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from cloudsc2jax.drivers import run_nl
    from cloudsc2jax.state import Cloudsc2State

    state = Cloudsc2State.load(REPO / "tests" / "fixtures" / "input.h5")
    inputs = state.kernel_inputs()  # f64 (ncol, ..., nlev)
    base = run_nl(inputs, state.params)
    base = {k: np.asarray(v) for k, v in base._asdict().items()}

    results = {}
    for scheme in ("bf16", "f16", "i16"):
        q = inputs.__class__(
            *(quantize(n, v, scheme) for n, v in inputs._asdict().items())
        )
        out = run_nl(q, state.params)
        errs = {}
        for k, v in out._asdict().items():
            a, b = np.asarray(v), base[k]
            # the reference's validation relative error: sum|a-b|/sum|b|
            # (validate_mod.F90:271-284 normal regime)
            denom = np.abs(b).sum()
            errs[k] = float(np.abs(a - b).sum() / denom) if denom > 0 else 0.0
        results[scheme] = {
            "max_field_relerr": max(errs.values()),
            "per_field": {k: f"{v:.2e}" for k, v in errs.items()},
        }

    budgets = {
        "f32_path_vs_f64_golden": 1.6e-5,
        "onchip_budget_1e4_eps32": 1.19e-3,
        "reference_10eps64": 2.2e-15,
    }
    print(json.dumps({"budgets": budgets, "encodings": results}, indent=1))


if __name__ == "__main__":
    main()
