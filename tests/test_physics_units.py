"""Unit tests for the small physics kernels and thermo functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudsc2jax import thermo
from cloudsc2jax.constants import Params
from cloudsc2jax.ops import damp_tangent
from cloudsc2jax.physics.cuadjtqs import cuadjtqs
from cloudsc2jax.physics.satur import satur


@pytest.fixture(scope="module")
def params():
    return Params.ifs_defaults(ceta=np.linspace(0.005, 1.0, 10))


def test_foealfa_limits(params):
    thf = params.yoethf
    assert float(thermo.foealfa(jnp.asarray(200.0), thf)) == 0.0
    assert float(thermo.foealfa(jnp.asarray(300.0), thf)) == 1.0
    mid = float(thermo.foealfa(jnp.asarray(0.5 * (thf.rtice + thf.rtwat)), thf))
    assert 0.0 < mid < 1.0


def test_foeewm_matches_mix(params):
    cst, thf = params.yomcst, params.yoethf
    t = jnp.linspace(180.0, 320.0, 57)
    alfa = thermo.foealfa(t, thf)
    expect = alfa * thermo.foeeliq(t, cst, thf) + (1 - alfa) * thermo.foeeice(t, cst, thf)
    np.testing.assert_allclose(np.asarray(thermo.foeewm(t, cst, thf)), np.asarray(expect), rtol=1e-14)


def test_foe_dewm_dt_is_derivative(params):
    # FOE_DEWM_DT is the reference's *approximate* derivative of FOEEWM
    # (fcttre.func.h:17-18): it drops the d(alfa)/dT term, so it is exact
    # only outside the mixed-phase band [RTICE, RTWAT].
    cst, thf = params.yomcst, params.yoethf
    t = jnp.concatenate(
        [jnp.linspace(200.0, thf.rtice - 1.0, 12), jnp.linspace(thf.rtwat + 1.0, 310.0, 12)]
    )
    ad = jax.vmap(jax.grad(lambda x: thermo.foeewm(x, cst, thf)))(t)
    analytic = thermo.foe_dewm_dt(t, cst, thf)
    np.testing.assert_allclose(np.asarray(ad), np.asarray(analytic), rtol=1e-10)


def test_satur_clipped_at_low_pressure(params):
    # qsat is clipped at 0.5 (with RETV correction) near-vacuum
    pap = jnp.asarray([[1.0]])
    t = jnp.asarray([[260.0]])
    qs = float(satur(pap, t, params)[0, 0])
    assert qs == pytest.approx(0.5 / (1.0 - params.yomcst.retv * 0.5))


def test_satur_branches_close(params):
    """LDPHYLIN and FOEEWM branches agree (same mixed-phase formula)."""
    pap = jnp.full((4, 6), 8.0e4)
    t = jnp.linspace(230.0, 300.0, 24).reshape(4, 6)
    a = satur(pap, t, params, lphylin=True)
    b = satur(pap, t, params, lphylin=False, kflag=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_cuadjtqs_converges_to_saturation(params):
    """After two Newton iterations, q should sit near qsat(T, p)."""
    psp = jnp.full((8,), 8.5e4)
    t = jnp.full((8,), 285.0)
    q = jnp.linspace(0.011, 0.02, 8)  # supersaturated vs qsat~0.0105
    t2, q2 = cuadjtqs(psp, t, q, params, kcall=0)
    # energy conservation: cp*dT = -L*dq
    lat = params.yoethf.ralvdcp
    np.testing.assert_allclose(
        np.asarray(t2 - t), np.asarray(lat * (q - q2)), rtol=1e-12
    )
    # adjusted q close to qsat at the adjusted temperature
    qs2 = satur(psp[None], t2[None], params)[0]
    # two Newton iterations (the reference's count) leave O(0.3%) residual
    # for strongly supersaturated columns
    np.testing.assert_allclose(np.asarray(q2), np.asarray(qs2), rtol=5e-3)


def test_cuadjtqs_kcall1_condensation_only(params):
    psp = jnp.full((2,), 8.5e4)
    t = jnp.full((2,), 285.0)
    q = jnp.asarray([0.002, 0.02])  # subsaturated / supersaturated
    t2, q2 = cuadjtqs(psp, t, q, params, kcall=1)
    assert float(q2[0]) == pytest.approx(0.002)  # no evaporation allowed
    assert float(t2[0]) == pytest.approx(285.0)
    assert float(q2[1]) < 0.02  # condensation happened


def test_cuadjtqs_kcall2_evaporation_only(params):
    psp = jnp.full((2,), 8.5e4)
    t = jnp.full((2,), 285.0)
    q = jnp.asarray([0.002, 0.02])
    t2, q2 = cuadjtqs(psp, t, q, params, kcall=2)
    assert float(q2[1]) == pytest.approx(0.02)  # no condensation allowed
    assert float(q2[0]) > 0.002  # evaporation happened
    assert float(t2[0]) < 285.0


def test_damp_tangent_primal_identity():
    x = jnp.asarray(3.0)
    assert float(damp_tangent(x, 0.1)) == 3.0


def test_damp_tangent_scales_jvp_and_vjp():
    f = lambda x: damp_tangent(x * x, 0.1)
    y, dy = jax.jvp(f, (2.0,), (1.0,))
    assert float(y) == 4.0
    assert float(dy) == pytest.approx(0.4)  # 2*x*0.1
    g = jax.grad(f)(2.0)
    assert float(g) == pytest.approx(0.4)  # transpose consistent


def test_damp_tangent_factor_gets_no_gradient():
    f = lambda x: damp_tangent(x, 2.0 * x)  # factor depends on x
    # d/dx of primal(x)=x with tangent rule dx*factor(x): at x=3 -> 6
    assert float(jax.grad(f)(3.0)) == pytest.approx(6.0)


@pytest.mark.parametrize("kcall", [0, 1, 2])
def test_cuadjtqs_tl_ad_consistency(params, kcall):
    """CUADJTQSTL/CUADJTQSAD equivalents: Taylor check of both tangents
    and the dot-product identity of the adjoint, over the clamped KCALL
    branches too (the same mathematics the reference validates through
    the full-kernel drivers)."""
    from cloudsc2jax.physics.cuadjtqs import cuadjtqs_ad, cuadjtqs_tl

    rng = np.random.default_rng(7)
    n = 64
    psp = jnp.asarray(8.0e4 + 1.0e4 * rng.random(n))
    t = jnp.asarray(250.0 + 40.0 * rng.random(n))
    q = jnp.asarray(5.0e-3 * rng.random(n))
    dp, dt_, dq = 0.01 * psp, 0.01 * t, 0.01 * q

    (t2, q2), (jt, jq) = cuadjtqs_tl(psp, t, q, dp, dt_, dq, params,
                                     kcall=kcall)
    # first-order consistency: |f(x+lam dx) - f(x) - lam J dx| is
    # second-order in lam, bounded relative to the step magnitude (plus
    # f64 subtraction roundoff on ~290 K values)
    lam = 1e-5
    t2p, q2p = cuadjtqs(psp + lam * dp, t + lam * dt_, q + lam * dq, params,
                        kcall=kcall)
    for pert, base, jac in ((t2p, t2, jt), (q2p, q2, jq)):
        resid = float(jnp.abs((pert - base) - lam * jac).max())
        scale = lam * float(jnp.abs(lam * jac).max() + jnp.abs(base).max())
        assert resid < 1e-4 * scale + 1e-11, kcall

    # adjoint identity <Mdx, Mdx> == <dx, M^T M dx>
    (t3, q3), (ap, at, aq) = cuadjtqs_ad(psp, t, q, jt, jq, params,
                                         kcall=kcall)
    n1 = float(jnp.sum(jt * jt) + jnp.sum(jq * jq))
    n2 = float(jnp.sum(dp * ap) + jnp.sum(dt_ * at) + jnp.sum(dq * aq))
    assert abs(n1 - n2) / abs(n2) < 1e-12, kcall


def test_tropopause_eta_matches_fortran_scan(params):
    """The masked-max formulation must equal the reference's downward
    overwrite scan (cloudsc2.F90:314-326: last level in the
    0.1<eta<0.4 band with T inversion wins, default 0.1)."""
    from cloudsc2jax.physics.cloudsc2 import _tropopause_eta

    rng = np.random.default_rng(11)
    nlev, ncol = 31, 40
    ceta = np.sort(rng.uniform(0.01, 1.0, nlev))
    ztp1 = 200.0 + 80.0 * rng.random((ncol, nlev))

    def fortran_scan(tcol):
        ztrpaus = 0.1
        for jk in range(nlev - 1):  # DO JK=1,KLEV-1
            if 0.1 < ceta[jk] < 0.4 and tcol[jk] > tcol[jk + 1]:
                ztrpaus = ceta[jk]
        return ztrpaus

    want = np.array([fortran_scan(ztp1[j]) for j in range(ncol)])
    got = np.asarray(_tropopause_eta(jnp.asarray(ztp1), jnp.asarray(ceta)))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_crit_rel_humidity_profile(params):
    """The blended critical-RH profile against a direct transcription of
    the four regimes (cloudsc2.F90:384-399)."""
    from cloudsc2jax.physics.cloudsc2 import _crit_rel_humidity

    def direct(eta, zeta3):
        zrh1, zrh3, zdeta2 = 1.0, 1.0, 0.3
        zrh2 = (0.35 + 0.14 * ((zeta3 - 0.25) / 0.15) ** 2
                + 0.04 * min(zeta3 - 0.25, 0.0) / 0.15)
        zdeta1 = 0.09 + 0.16 * (0.4 - zeta3) / 0.3
        if eta < zeta3:
            return zrh3
        if eta < zeta3 + zdeta2:
            return zrh3 + (zrh2 - zrh3) * ((eta - zeta3) / zdeta2)
        if eta < 1.0 - zdeta1:
            return zrh2
        return zrh1 + (zrh2 - zrh1) * np.sqrt(max((1.0 - eta) / zdeta1, 0.0))

    rng = np.random.default_rng(13)
    for _ in range(200):
        eta = float(rng.uniform(0.0, 1.0))
        zeta3 = float(rng.uniform(0.1, 0.4))
        got = float(_crit_rel_humidity(jnp.float64(eta), jnp.float64(zeta3)))
        np.testing.assert_allclose(got, direct(eta, zeta3), rtol=1e-14)
