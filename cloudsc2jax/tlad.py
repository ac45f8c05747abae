"""Tangent-linear and adjoint of CLOUDSC2 via JAX autodiff.

The reference maintains ~2900 lines of hand-written TL/AD Fortran
(``src/cloudsc2_tl/cloudsc2tl.F90``, ``src/cloudsc2_ad/cloudsc2ad.F90``);
here both derive from the single nonlinear source of truth with
``jax.jvp`` / ``jax.vjp``.  The LREGCL perturbation regularisations are
reproduced inside the NL code via :func:`cloudsc2jax.ops.damp_tangent`, so
``lregcl=True`` gives the regularised operator pair (used by the adjoint
symmetry test, mirroring the entry-program setting
cloudsc2_ad/dwarf_cloudsc.F90:105) and ``lregcl=False`` the exact one
(Taylor test, cloudsc2_tl/dwarf_cloudsc.F90:103-104).

The reference AD stores the full per-level forward trajectory
(cloudsc2ad.F90:228-292) before its reverse sweep; ``jax.vjp`` makes the
same space/time trade-off automatically, and :func:`cloudsc2_ad` exposes
``remat=True`` to checkpoint the level-scan body instead (each level's
inputs and carries are stored, the body is recomputed during the reverse
sweep) when memory is tighter than FLOPs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax

from .constants import Params
from .physics.cloudsc2 import Cloudsc2Inputs, Cloudsc2Outputs, cloudsc2

__all__ = ["cloudsc2_tl", "cloudsc2_ad", "cloudsc2_vjp"]


def cloudsc2_tl(
    inputs: Cloudsc2Inputs,
    d_inputs: Cloudsc2Inputs,
    params: Params,
    *,
    lregcl: bool = False,
    ldrain1d: bool = False,
) -> Tuple[Cloudsc2Outputs, Cloudsc2Outputs]:
    """Tangent-linear CLOUDSC2: returns (outputs, d_outputs).

    Functional equivalent of CLOUDSC2TL (cloudsc2tl.F90:10-24): the
    trajectory is recomputed alongside the linear propagation, one level
    sweep, no stored trajectory.
    """
    f = partial(cloudsc2, params=params, lregcl=lregcl, ldrain1d=ldrain1d)
    return jax.jvp(f, (inputs,), (d_inputs,))


def cloudsc2_vjp(
    inputs: Cloudsc2Inputs,
    params: Params,
    *,
    lregcl: bool = False,
    ldrain1d: bool = False,
    remat: bool = False,
):
    """Linearise once, transpose many: returns (outputs, vjp_fn).

    ``remat=False`` (default) stores the forward trajectory like the
    reference AD's checkpoint-everything strategy (~40 (KLON,KLEV) arrays,
    cloudsc2ad.F90:228-292).  ``remat=True`` checkpoints the level-scan
    BODY (``remat_level`` in :func:`cloudsc2`): the reverse pass stores
    only each level's inputs and carries and recomputes the body — the
    FLOPs-for-memory trade the reference cannot make (an order of
    magnitude off peak adjoint memory at 137 levels).
    """
    f = partial(
        cloudsc2, params=params, lregcl=lregcl, ldrain1d=ldrain1d,
        remat_level=remat,
    )
    outputs, vjp_fn = jax.vjp(f, inputs)
    return outputs, vjp_fn


def cloudsc2_ad(
    inputs: Cloudsc2Inputs,
    d_outputs: Cloudsc2Outputs,
    params: Params,
    *,
    lregcl: bool = True,
    ldrain1d: bool = False,
    remat: bool = False,
) -> Tuple[Cloudsc2Outputs, Cloudsc2Inputs]:
    """Adjoint CLOUDSC2: returns (outputs, input_adjoints).

    Functional equivalent of CLOUDSC2AD (cloudsc2ad.F90:177-202) seeded
    with output adjoints ``d_outputs``; input adjoints are returned rather
    than accumulated in place.  Unlike the reference's PSUPSAT quirk
    (cloudsc2ad.F90:1733 scales the supersaturation adjoint by PTSPHY and
    overwrites instead of accumulating — harmless there because the AD
    driver zeroes that perturbation, cloudsc_driver_ad_mod.F90:139), this
    adjoint is the exact transpose of the (regularised) tangent operator.
    """
    outputs, vjp_fn = cloudsc2_vjp(
        inputs, params, lregcl=lregcl, ldrain1d=ldrain1d, remat=remat
    )
    (d_in,) = vjp_fn(d_outputs)
    return outputs, d_in
