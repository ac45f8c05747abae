"""Differentiation-control ops.

The reference hand-codes its tangent-linear/adjoint kernels and, under the
LREGCL switch (yomncl.F90:24-29), deliberately *damps* selected perturbation
paths without touching the nonlinear trajectory (e.g. the cloud-fraction
factor ZYYY in cloudsc2tl.F90:575-580, the 0.1 subsidence factor at :657,
the /100 autoconversion constants ZCKCODTLA/ZCKCODTIA at :323-324, and the
0.7 vapour-clipping factor at :998-1000; mirrored in cloudsc2ad.F90).

In a JAX design the single nonlinear source of truth is differentiated with
``jax.jvp``/``jax.vjp``; the regularisations become a custom-JVP identity op
whose tangent is scaled.  Because the tangent rule is linear in the tangents,
JAX can transpose it, so one definition yields mutually-consistent TL *and*
AD (the adjoint symmetry test then holds by construction, as the reference's
hand-written pair does by careful bookkeeping).
"""

from __future__ import annotations

import jax

__all__ = ["damp_tangent"]


@jax.custom_jvp
def damp_tangent(x, factor):
    """Identity on the primal; scales the tangent of ``x`` by ``factor``.

    ``factor`` is treated as trajectory data: its own tangent is discarded,
    exactly like the reference TL which computes ZYYY from the `*5`
    trajectory variables only.
    """
    del factor
    return x


@damp_tangent.defjvp
def _damp_tangent_jvp(primals, tangents):
    x, factor = primals
    dx, _ = tangents
    return x, dx * factor
