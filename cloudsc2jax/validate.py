"""Field-wise validation statistics.

Re-design of ``src/common/module/validate_mod.F90``: per-field min/max of
the result, max absolute error, average absolute error per grid point, and
relative error with the reference's three denominator regimes
(validate_mod.F90:263-296), printed as the same table
(cloudsc2_array_state_mod.F90:229-232) with ``!!!!`` flagging when the
relative error exceeds ``threshold`` × machine epsilon.

Works on process-local numpy arrays or on globally-sharded ``jax.Array``s:
reductions are expressed with jnp so that, under ``jit`` on a mesh, XLA
emits the cross-device reduction that replaces the reference's
MPI_REDUCE calls (validate_mod.F90:149-151).
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Dict, Optional

import numpy as np

__all__ = [
    "FieldErrors",
    "field_errors",
    "field_errors_jax",
    "validate",
    "print_validation",
]

_EPS = np.finfo(np.float64).eps


@dataclasses.dataclass
class FieldErrors:
    name: str
    ndim: int
    zminval: float
    zmaxval: float
    zmaxerr: float
    zerrsum: float
    zsum: float
    ngptot: int
    # machine epsilon of the run's working precision: the reference uses
    # EPSILON(1.0_JPRB), which is eps32 under -DSINGLE (validate_mod.F90:
    # 285-289 with parkind1.F90:40-44) — so f32 runs are judged in eps32
    eps: float = _EPS

    @property
    def avgpgp(self) -> float:
        return self.zerrsum / max(self.ngptot, 1)

    @property
    def relerr(self) -> float:
        """Relative error, reference regimes (validate_mod.F90:271-284)."""
        if self.zerrsum < self.eps:
            return 0.0
        if self.zsum < self.eps:
            return self.zerrsum / (1.0 + self.zsum)
        return self.zerrsum / self.zsum

    def passed(self, threshold: float = 10.0) -> bool:
        return self.relerr <= threshold * self.eps


def field_errors(name: str, result, reference, ngptot: Optional[int] = None) -> FieldErrors:
    eps = float(np.finfo(np.asarray(result).dtype).eps) \
        if np.asarray(result).dtype.kind == "f" else _EPS
    a = np.asarray(result, dtype=np.float64)
    b = np.asarray(reference, dtype=np.float64)
    ncols = a.shape[0]
    return FieldErrors(
        name=name,
        ndim=a.ndim,
        zminval=float(a.min()),
        zmaxval=float(a.max()),
        zmaxerr=float(np.abs(a - b).max()),
        zerrsum=float(np.abs(a - b).sum()),
        zsum=float(np.abs(b).sum()),
        ngptot=int(ngptot if ngptot is not None else ncols),
        eps=eps,
    )


def _stats(a, b):
    """The five validation reductions (one executable reused across all
    fields and calls — retracing per field would pay ~10 compiles per
    validation run against the CLI-startup-latency goal)."""
    import jax
    import jax.numpy as jnp

    acc = jnp.float64 if jax.config.jax_enable_x64 else a.dtype
    d = jnp.abs(a - b)
    return (
        jnp.min(a), jnp.max(a), jnp.max(d),
        jnp.sum(d.astype(acc)), jnp.sum(jnp.abs(b).astype(acc)),
    )


class _LazyJit:
    """Module-level jit that defers the jax import to first use."""

    def __init__(self, fn):
        self._fn = fn
        self._jitted = None

    def __call__(self, *args):
        if self._jitted is None:
            import jax

            self._jitted = jax.jit(self._fn)
        return self._jitted(*args)


_stats_jit = _LazyJit(_stats)


def field_errors_jax(
    name: str, result, reference, ngptot: Optional[int] = None
) -> FieldErrors:
    """Device-side field statistics: the five reductions run under one
    jit and only scalars cross the host link.  On sharded arrays XLA
    emits the cross-device reductions that replace the reference's
    MPI_REDUCE triple (validate_mod.F90:149-151) — they ride ICI, not
    the host.  Sums accumulate in float64 when x64 is enabled, else in
    the result dtype (documented f32-table mode for on-chip runs)."""
    import jax.numpy as jnp

    zmin, zmax, zmaxerr, zerrsum, zsum = [
        float(s) for s in _stats_jit(result, reference)
    ]
    return FieldErrors(
        name=name,
        ndim=np.ndim(result),
        zminval=zmin,
        zmaxval=zmax,
        zmaxerr=zmaxerr,
        zerrsum=zerrsum,
        zsum=zsum,
        ngptot=int(ngptot if ngptot is not None else np.shape(result)[0]),
        eps=float(jnp.finfo(result.dtype).eps),
    )


def validate(
    results: Dict[str, np.ndarray],
    references: Dict[str, np.ndarray],
    ngptot: Optional[int] = None,
) -> Dict[str, FieldErrors]:
    return {
        k: field_errors(k, results[k], references[k], ngptot)
        for k in results
        if k in references
    }


def print_validation(
    errors: Dict[str, FieldErrors], threshold: float = 10.0, file=None
) -> bool:
    """Print the reference validation table; returns overall pass/fail."""
    file = file or sys.stderr
    print(
        f"{'Variable':>20} {'Dim':>3} {'MinValue':>20} {'MaxValue':>20}"
        f" {'AbsMaxErr':>20} {'AvgAbsErr/GP':>20} {'MaxRelErr-%':>20}",
        file=file,
    )
    ok = True
    for e in errors.values():
        flag = ""
        if not e.passed(threshold):
            flag = "  !!!!"
            ok = False
        print(
            f"{e.name:>20} {e.ndim:>3} {e.zminval:20.13e} {e.zmaxval:20.13e}"
            f" {e.zmaxerr:20.13e} {e.avgpgp:20.13e} {100.0*e.relerr:20.13e}{flag}",
            file=file,
        )
    return ok
