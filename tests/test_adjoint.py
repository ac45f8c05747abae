"""Adjoint symmetry test ⟨Mδx,Mδx⟩=⟨δx,MᵀMδx⟩ per column
(reference: cloudsc_driver_ad_mod.F90:184-293, threshold 1e4·eps64)."""

import jax
import numpy as np

from cloudsc2jax.drivers import adjoint_test
from cloudsc2jax.tlad import cloudsc2_ad, cloudsc2_tl


def test_adjoint_symmetry_regularised(state, inputs):
    # the AD entry program sets LREGCL=.TRUE. (cloudsc2_ad/dwarf_cloudsc.F90:105)
    res = adjoint_test(inputs, state.params, lregcl=True)
    assert res.passed, f"max_error={res.max_error} x eps"


def test_adjoint_symmetry_exact(state, inputs):
    res = adjoint_test(inputs, state.params, lregcl=False)
    assert res.passed, f"max_error={res.max_error} x eps"


def test_tl_ad_consistency_global(state, inputs):
    """Global dot-product identity with random output adjoints."""
    rng = np.random.default_rng(7)
    d_in = jax.tree.map(lambda x: 0.01 * np.asarray(x), inputs)
    out, dy = cloudsc2_tl(inputs, d_in, state.params, lregcl=True)
    ybar = jax.tree.map(
        lambda y: np.asarray(rng.standard_normal(np.shape(y))), out
    )
    _, xbar = cloudsc2_ad(inputs, ybar, state.params, lregcl=True)
    lhs = sum(float(np.sum(np.asarray(a) * np.asarray(b))) for a, b in zip(dy, ybar))
    rhs = sum(float(np.sum(np.asarray(a) * np.asarray(b))) for a, b in zip(d_in, xbar))
    assert abs(lhs - rhs) <= 1e-10 * max(abs(lhs), abs(rhs))


def test_adjoint_zero_seed_gives_zero(state, inputs):
    out, vjp = None, None
    from cloudsc2jax.tlad import cloudsc2_vjp

    out, vjp_fn = cloudsc2_vjp(inputs, state.params)
    zero_bar = jax.tree.map(lambda y: np.zeros_like(np.asarray(y)), out)
    (xbar,) = vjp_fn(zero_bar)
    for a in xbar:
        assert not np.any(np.asarray(a))


def test_run_tlad_consistency(state, inputs):
    """The fused NL+TL+AD work unit returns mutually consistent pieces."""
    from cloudsc2jax.drivers import run_tlad

    out, dout, adj = run_tlad(inputs, state.params, lregcl=True)
    n1 = sum(float(np.sum(np.asarray(y) ** 2)) for y in dout)
    di = jax.tree.map(lambda x: 0.01 * np.asarray(x), inputs)
    n2 = sum(
        float(np.sum(np.asarray(a) * np.asarray(b))) for a, b in zip(di, adj)
    )
    assert abs(n1 - n2) <= 1e-9 * abs(n1)


def test_remat_matches_stored(state, inputs):
    """remat=True (level-body checkpoint: reverse sweep recomputes each
    level from its inputs+carries) must agree with the stored-trajectory
    adjoint to f64 recomputation roundoff — the FLOPs-for-memory trade,
    SURVEY §5.4.  Recomputation reorders fusions, so agreement is to a
    few tens of ulps per field, not bitwise."""
    from cloudsc2jax.tlad import cloudsc2_vjp

    rng = np.random.default_rng(3)
    out1, vjp1 = cloudsc2_vjp(inputs, state.params, remat=False)
    out2, vjp2 = cloudsc2_vjp(inputs, state.params, remat=True)
    ybar = jax.tree.map(lambda y: np.asarray(rng.standard_normal(np.shape(y))), out1)
    (a1,) = vjp1(ybar)
    (a2,) = vjp2(ybar)
    for name, x, y in zip(a1._fields, a1, a2):
        x, y = np.asarray(x), np.asarray(y)
        scale = max(np.abs(x).max(), 1e-300)
        assert np.abs(x - y).max() / scale < 1e-12, name
