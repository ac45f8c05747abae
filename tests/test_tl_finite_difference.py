"""Per-field, per-column finite-difference ground truth for the TL.

The reference Taylor test (cloudsc_driver_tl_mod.F90:197-311) checks a
single aggregate ratio per output field — compensating per-field or
per-column errors can hide inside the block sums.  This test pins the
tangent-linear operator field-by-field and column-by-column against a
second-order central difference of the nonlinear kernel at f64, so a wrong
derivative anywhere in the TL (a single mis-propagated term affecting one
output of one column) fails.

Runs with lregcl=False: the regularised operator is deliberately NOT the
derivative of the nonlinear kernel (its sites are pinned separately in
test_lregcl_sites.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudsc2jax.physics.cloudsc2 import cloudsc2
from cloudsc2jax.tlad import cloudsc2_tl


@pytest.fixture(scope="module")
def fd_setup(state, inputs):
    params = state.params
    # canonical 1% perturbation direction (cloudsc_driver_tl_mod.F90:156-171)
    d = jax.tree.map(lambda x: 0.01 * x, inputs)

    f = jax.jit(lambda x: cloudsc2(x, params))
    lam = 1.0e-4  # effective relative perturbation 1e-6: far below any
    # branch-flip scale for this state, truncation error O(lam^2)
    xp = jax.tree.map(lambda x, dx: x + lam * dx, inputs, d)
    xm = jax.tree.map(lambda x, dx: x - lam * dx, inputs, d)
    fd = jax.tree.map(
        lambda a, b: (np.asarray(a) - np.asarray(b)) / (2.0 * lam), f(xp), f(xm)
    )
    _, tl = cloudsc2_tl(inputs, d, params, lregcl=False)
    return fd, tl


FIELDS = [
    "tenl_t",
    "tenl_q",
    "tenl_l",
    "tenl_i",
    "pclc",
    "pfplsl",
    "pfplsn",
    "pfhpsl",
    "pfhpsn",
    "pcovptot",
]


@pytest.mark.parametrize("field", FIELDS)
def test_tl_matches_central_difference_per_column(fd_setup, field):
    """Every column of every output field: ||FD - TL|| <= tol * ||TL||,
    with the tolerance set by central-difference truncation/roundoff (the
    measured worst strong column is ~5e-7; a single wrong term shows up as
    O(1)).  Columns whose tangent norm is <1e-6 of the field's largest are
    checked in absolute terms instead (a relative test there only amplifies
    FD roundoff noise)."""
    fd, tl = fd_setup
    a = np.asarray(getattr(fd, field))
    b = np.asarray(getattr(tl, field))
    # per-column L2 comparison; fields are (ncol, nlev[+1])
    num = np.linalg.norm(a - b, axis=1)
    den = np.linalg.norm(b, axis=1)
    scale = float(np.max(den))
    if scale == 0.0:
        # pcovptot is identically zero (inactive evaporation branch) — the
        # FD must agree that the derivative is exactly zero
        assert float(np.max(np.abs(a))) == 0.0
        return
    strong = den > 1e-6 * scale
    rel = num[strong] / den[strong]
    assert float(np.max(rel)) < 1e-5, (
        f"{field}: worst strong col rel err {float(np.max(rel)):.3e}"
    )
    if (~strong).any():
        assert float(np.max(num[~strong])) < 1e-8 * scale, (
            f"{field}: weak-tangent column FD residual too large"
        )


def test_tl_fd_elementwise(fd_setup):
    """Elementwise backstop across all fields: every entry of the TL agrees
    with the central difference within a mixed tolerance anchored at each
    field's tangent scale."""
    fd, tl = fd_setup
    for field in FIELDS:
        a = np.asarray(getattr(fd, field))
        b = np.asarray(getattr(tl, field))
        scale = float(np.max(np.abs(b)))
        if scale == 0.0:
            assert float(np.max(np.abs(a))) == 0.0
            continue
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-4 * scale, err_msg=field
        )
