"""TL Taylor/gradient test (reference: cloudsc_driver_tl_mod.F90:197-311).

The tangent-linear operator comes from jax.jvp of the nonlinear kernel;
the test checks ‖(NL(x+λδx)−NL(x))/(λ·TLδx)‖ → 1 as λ → 0 with a V-shaped
error curve and the reference's penalty thresholds.
"""

import numpy as np

from cloudsc2jax.drivers import taylor_test
from cloudsc2jax.tlad import cloudsc2_tl


def test_taylor_nproma1(state, inputs):
    # reference TL configuration: 100 columns, NPROMA=1 (README.md:52-56)
    res = taylor_test(inputs, state.params, nproma=1, lregcl=False)
    assert res.passed, f"penalty={res.penalty}, norms={res.norms}"
    assert res.istart <= 4


def test_taylor_blocked(state, inputs):
    # Block statistics (NPROMA=100, a single block) must also converge to
    # ratio 1.  The strict V-shape criterion is only meaningful for the
    # reference's per-column configuration (NPROMA=1): whole-block sums of
    # signed quantities can wiggle at large lambda through cancellation.
    res = taylor_test(inputs, state.params, nproma=100, lregcl=False)
    err = np.abs(1.0 - res.norms)
    assert res.istart != 0 and res.istart <= 4
    assert err[res.istart - 1 :].min() < 1e-5


def test_tl_linearity(state, inputs):
    """TL is linear in the increments: TL(2δx) = 2 TL(δx)."""
    import jax

    d1 = jax.tree.map(lambda x: 0.01 * np.asarray(x), inputs)
    _, dy1 = cloudsc2_tl(inputs, d1, state.params)
    d2 = jax.tree.map(lambda x: 2.0 * x, d1)
    _, dy2 = cloudsc2_tl(inputs, d2, state.params)
    for a, b in zip(dy1, dy2):
        np.testing.assert_allclose(2.0 * np.asarray(a), np.asarray(b), rtol=1e-12)


def test_tl_regularisation_damps(state, inputs):
    """With LREGCL the perturbation paths are damped: the TL output norm
    must not exceed the unregularised one (cloudsc2tl.F90:575-580 etc.)."""
    import jax

    d = jax.tree.map(lambda x: 0.01 * np.asarray(x), inputs)
    _, dy = cloudsc2_tl(inputs, d, state.params, lregcl=False)
    _, dy_reg = cloudsc2_tl(inputs, d, state.params, lregcl=True)
    n = sum(float(np.sum(np.asarray(a) ** 2)) for a in dy)
    n_reg = sum(float(np.sum(np.asarray(a) ** 2)) for a in dy_reg)
    assert n_reg <= n * (1.0 + 1e-12)
    assert n_reg < n  # the synthetic state exercises the damped branches
