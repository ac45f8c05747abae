"""Per-site LREGCL regularisation-factor tests.

The reference hand-codes five tangent dampings under YRNCL%LREGCL; our TL/AD
derive them from :func:`cloudsc2jax.ops.damp_tangent` sites inside the
nonlinear source.  The whole-kernel property tests (Taylor, adjoint identity)
cannot catch a wrong *factor*: the Taylor test runs with lregcl=False and the
adjoint identity is invariant to any damping shared by TL and AD.  These
tests give every site an external ground truth: a crafted state activates
exactly one damped branch and the regularised/exact tangent ratio on the
affected output is pinned to the documented factor — or, where the site's
tangent mixes with an undamped path, the full tangent is pinned against an
independent hand-derived closed form (f64 numpy, written from the physics,
not from our kernel).

Sites (reference lines in src/cloudsc2_tl/cloudsc2tl.F90, mirrored in
cloudsc2ad.F90):
  1. cloud-fraction perturbation: PCLC tangent x ZYYY = min(0.3, f(zrat))
     (:574-580)
  2. compensating subsidence: ZDQC tangent x 0.1 (:651-661)
  3. liquid autoconversion: ZD tangent via ZCKCODTLA = ZCKCODTL/100
     (:323, 751-760)
  4. ice autoconversion: ZD tangent via ZCKCODTIA = ZCKCODTI/100, including
     the 0.025*ZTP1 temperature term (:324, 791-800)
  5. qv-clipping: ZDQ tangent x 0.7 (:994-1001)

The build of the reference Fortran TL/AD binaries as an executable oracle
was attempted and is environment-impossible (no Fortran frontend, no
ecbuild, zero egress) — see GROUND_TRUTH.md for the record.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudsc2jax.constants import Params
from cloudsc2jax.physics.cloudsc2 import Cloudsc2Inputs, cloudsc2
from cloudsc2jax.tlad import cloudsc2_tl

NLEV = 3
K = NLEV - 1  # the active (test) level; upper levels are inert
CETA = (0.15, 0.45, 0.8)
PTSPHY = 3600.0

# level pressures: full levels and the (nlev+1) half levels
PAP_LEV = (30000.0, 60000.0, 90000.0)
PAPH_LEV = (15000.0, 45000.0, 75000.0, 100000.0)


def _params(**yrecldp_overrides) -> Params:
    p = Params.ifs_defaults(ceta=CETA, ptsphy=PTSPHY)
    if yrecldp_overrides:
        import dataclasses

        p = p.replace(yrecldp=dataclasses.replace(p.yrecldp, **yrecldp_overrides))
    return p


def _state(ncol, *, t, pq, pqs, pl=0.0, pi=0.0, pmfu=0.0):
    """A 3-level state whose upper two levels are inert (clear, dry, no
    clipping) so every carried quantity entering level K is exactly zero and
    carries no tangent.  Per-column values may vary via arrays."""

    def full(val, lev_val):
        a = np.zeros((ncol, NLEV))
        a[:, :] = val
        a[:, K] = lev_val
        return jnp.asarray(a)

    paph = jnp.asarray(np.tile(np.asarray(PAPH_LEV), (ncol, 1)))
    pap = jnp.asarray(np.tile(np.asarray(PAP_LEV), (ncol, 1)))
    zeros = jnp.zeros((ncol, NLEV))
    return Cloudsc2Inputs(
        paph=paph,
        pap=pap,
        pq=full(1.0e-6, pq),
        pqs=full(pqs if np.ndim(pqs) else pqs, pqs),
        pt=full(t, t),
        pl=full(0.0, pl),
        pi=full(0.0, pi),
        plude=zeros,
        plu=zeros,
        pmfu=full(0.0, pmfu),
        pmfd=zeros,
        ten_t=zeros,
        ten_q=zeros,
        ten_l=zeros,
        ten_i=zeros,
        psupsat=zeros,
    )


def _seed(inputs, **fields):
    """Zero tangent everywhere except the named fields at level K."""
    d = {k: np.zeros_like(np.asarray(v)) for k, v in inputs._asdict().items()}
    for name, val in fields.items():
        d[name][:, K] = val
    return Cloudsc2Inputs(**{k: jnp.asarray(v) for k, v in d.items()})


def _tl(inputs, d_inputs, params, lregcl):
    _, dy = cloudsc2_tl(inputs, d_inputs, params, lregcl=lregcl)
    return dy


def _zscalm(k=K):
    return 0.9 * max(CETA[k] - 0.2, 1e-12) ** 0.2


def _zcrh2(params, k=K):
    """Critical-relative-humidity profile for a no-inversion column
    (ztrpaus = 0.1), hand-evaluated (cloudsc2.F90:384-399)."""
    zeta3 = 0.1
    ceta_k = CETA[k]
    zrh2 = (
        0.35
        + 0.14 * ((zeta3 - 0.25) / 0.15) ** 2
        + 0.04 * min(zeta3 - 0.25, 0.0) / 0.15
    )
    zdeta1 = 0.09 + 0.16 * (0.4 - zeta3) / 0.3
    assert ceta_k >= zeta3 + 0.3 and ceta_k >= 1.0 - zdeta1, "test level arm"
    return 1.0 + (zrh2 - 1.0) * math.sqrt((1.0 - ceta_k) / zdeta1)


# ---------------------------------------------------------------------------
# site 5: qv-clipping x0.7 (cloudsc2tl.F90:994-1001)
# ---------------------------------------------------------------------------


def test_clipping_factor_is_0p7_tl():
    """Clear-sky supersaturated column: the only active damped branch is the
    final qv clipping, and the q-tendency tangent ratio is exactly 0.7."""
    params = _params()
    # pqs inflated so the cloud-cover branch stays clear (zqt < zqcrit)
    # while the Newton clip condenses (true qsat(290K,900hPa) ~ 0.0134 < pq).
    inputs = _state(1, t=290.0, pq=0.02, pqs=0.1)
    d = _seed(inputs, pq=1.0)
    dy = _tl(inputs, d, params, lregcl=False)
    dy_reg = _tl(inputs, d, params, lregcl=True)
    t_exact = float(dy.tenl_q[0, K])
    t_reg = float(dy_reg.tenl_q[0, K])
    assert abs(t_exact) > 1e-12, "clip branch must be active"
    assert t_reg / t_exact == pytest.approx(0.7, rel=1e-12)
    # T tendency is damped by the same site through zcondl
    assert float(dy_reg.tenl_t[0, K]) / float(dy.tenl_t[0, K]) == pytest.approx(
        0.7, rel=1e-12
    )


def test_clipping_factor_is_0p7_ad():
    """The adjoint inherits the factor by transposition: the gradient of the
    q tendency w.r.t. pq shows the same exact 0.7 ratio."""
    params = _params()
    inputs = _state(1, t=290.0, pq=0.02, pqs=0.1)

    def out(x, lregcl):
        return cloudsc2(x, params, lregcl=lregcl).tenl_q[0, K]

    g_exact = jax.grad(lambda x: out(x, False))(inputs)
    g_reg = jax.grad(lambda x: out(x, True))(inputs)
    ge = float(g_exact.pq[0, K])
    gr = float(g_reg.pq[0, K])
    assert abs(ge) > 1e-12
    assert gr / ge == pytest.approx(0.7, rel=1e-12)


def test_clipping_inactive_when_subsaturated():
    """Sanity: without supersaturation the clip tangent is zero and lregcl
    has no effect (the else-branch zeroes ZDQ, cloudsc2tl.F90:1002-1004)."""
    params = _params()
    inputs = _state(1, t=290.0, pq=1e-4, pqs=0.1)
    d = _seed(inputs, pq=1.0)
    dy = _tl(inputs, d, params, lregcl=False)
    dy_reg = _tl(inputs, d, params, lregcl=True)
    np.testing.assert_allclose(
        np.asarray(dy.tenl_q), np.asarray(dy_reg.tenl_q), rtol=0, atol=0
    )


# ---------------------------------------------------------------------------
# site 2: compensating subsidence x0.1 (cloudsc2tl.F90:651-661)
# ---------------------------------------------------------------------------


def test_subsidence_factor_is_0p1():
    """Saturated warm column with rkconv=0 (autoconversion identically zero,
    tangent included) and a tangent seed on PMFU only: the liquid-water
    tendency tangent comes solely through the subsidence term, ratio 0.1."""
    params = _params(rkconv=0.0)
    inputs = _state(1, t=290.0, pq=0.012, pqs=0.01, pl=0.002)
    d = _seed(inputs, pmfu=1.0)
    dy = _tl(inputs, d, params, lregcl=False)
    dy_reg = _tl(inputs, d, params, lregcl=True)
    t_exact = float(dy.tenl_l[0, K])
    t_reg = float(dy_reg.tenl_l[0, K])
    assert abs(t_exact) > 1e-12, "subsidence branch must be active"
    assert t_reg / t_exact == pytest.approx(0.1, rel=1e-12)


def test_subsidence_min_else_branch_undamped():
    """When the subsidence term exceeds the available condensate the min
    picks ZQC and no damping applies (the reference's ELSE arm,
    cloudsc2tl.F90:662-665): lregcl must not change the tangent."""
    params = _params(rkconv=0.0)
    # large updraught flux so zdqc_sub >= zqc at the trajectory point
    inputs = _state(1, t=290.0, pq=0.012, pqs=0.01, pl=0.002, pmfu=50.0)
    d = _seed(inputs, pqs=1.0)
    # verify the else branch is really selected: tenl_l == -zl/ptsphy
    # (zqc - zdqc == 0) on the trajectory
    y = cloudsc2(inputs, params, lregcl=False)
    assert float(y.tenl_l[0, K]) == pytest.approx(-0.002 / PTSPHY, rel=1e-9)
    dy = _tl(inputs, d, params, lregcl=False)
    dy_reg = _tl(inputs, d, params, lregcl=True)
    assert float(dy.tenl_l[0, K]) == pytest.approx(
        float(dy_reg.tenl_l[0, K]), rel=1e-14
    )


# ---------------------------------------------------------------------------
# site 1: cloud-fraction ZYYY (cloudsc2tl.F90:574-580)
# ---------------------------------------------------------------------------


def _zyyy(zrat, zscalm):
    return min(
        0.3,
        3.5
        * math.sqrt(zrat * (1.0 - zscalm * (1.0 - zrat)) ** 3)
        / (1.0 - zscalm),
    )


def test_cloud_fraction_zyyy_formula_and_clamp():
    """Mid-branch (partial cloud) columns: the PCLC tangent ratio equals
    ZYYY computed independently from the trajectory.  Column 0 sits near
    saturation (zrat small -> unclamped formula value), column 1 near the
    critical threshold (formula > 0.3 -> clamped to exactly 0.3)."""
    params = _params()
    pqs = 0.01
    zcrh2 = _zcrh2(params)
    zqsat = pqs  # warm: zsupsat_fac == 1
    zqcrit = zcrh2 * zqsat
    # choose zqt strictly inside (zqcrit, zqsat)
    zqt = np.array(
        [zqsat - 1e-5, zqcrit + 0.05 * (zqsat - zqcrit)]
    )
    pl = 1.0e-4
    pq = zqt - pl
    inputs = _state(2, t=290.0, pq=pq, pqs=pqs, pl=pl)
    d = _seed(inputs, pq=1.0)
    dy = _tl(inputs, d, params, lregcl=False)
    dy_reg = _tl(inputs, d, params, lregcl=True)

    zscalm = _zscalm()
    for col in range(2):
        zqpd = zqsat - zqt[col]
        zqcd = zqsat - zqcrit
        expected = _zyyy(zqpd / zqcd, zscalm)
        t_exact = float(dy.pclc[col, K])
        t_reg = float(dy_reg.pclc[col, K])
        assert abs(t_exact) > 1e-12, "mid branch must be active"
        assert t_reg / t_exact == pytest.approx(expected, rel=1e-9)
    # column 0 exercises the open formula, column 1 the 0.3 clamp
    z0 = _zyyy((zqsat - zqt[0]) / (zqsat - zqcrit), zscalm)
    z1 = _zyyy((zqsat - zqt[1]) / (zqsat - zqcrit), zscalm)
    assert z0 < 0.29
    assert z1 == 0.3


def test_cloud_fraction_saturated_branch_undamped():
    """Fully saturated columns take the PCLC=1 branch where the reference
    applies no ZYYY damping: lregcl must leave the PCLC tangent (zero) and
    the condensate tangent path through ZQC unchanged."""
    params = _params(rkconv=0.0)
    inputs = _state(1, t=290.0, pq=0.012, pqs=0.01, pl=0.002)
    d = _seed(inputs, pqs=1.0)
    dy = _tl(inputs, d, params, lregcl=False)
    dy_reg = _tl(inputs, d, params, lregcl=True)
    assert float(dy.pclc[0, K]) == 0.0
    assert float(dy_reg.pclc[0, K]) == 0.0
    # subsidence is tangent-inert here (pmf trajectory and seed both zero),
    # so even the damped run keeps the exact condensate tangent
    assert float(dy.tenl_l[0, K]) == pytest.approx(
        float(dy_reg.tenl_l[0, K]), rel=1e-14
    )


# ---------------------------------------------------------------------------
# sites 3+4: autoconversion /100 (cloudsc2tl.F90:323-324, 751-760, 791-800)
# ---------------------------------------------------------------------------


def _autoconv_oracle(params, t, pqs_v, dpqs, dpt, lregcl):
    """Hand-derived tangent of (tenl_l, tenl_i) at level K for a saturated
    column with zero mass flux, zero detrainment and zero incoming
    precipitation.  Written from the reference TL formulas
    (cloudsc2tl.F90:741-800) independently of the kernel code."""
    cst, thf, cldp, phli = (
        params.yomcst,
        params.yoethf,
        params.yrecldp,
        params.yrephli,
    )
    zscalm = _zscalm()
    zcrh2 = _zcrh2(params)
    zckcodtl = 2.0 * cldp.rkconv * PTSPHY
    zckcodti = 5.0 * cldp.rkconv * PTSPHY
    zlcrit = 2.0 * cldp.rclcrit
    qtmst = 1.0 / PTSPHY
    factor = 0.01 if lregcl else 1.0

    # phase partition (cloudsc2.F90:343-352, LPHYLIN branch)
    if t < cst.rtt:
        th = math.tanh(0.17 * (t - phli.rlptrc))
        zfwat = 0.545 * (th + 1.0)
        dzfwat = 0.545 * 0.17 * (1.0 - th * th) * dpt
    else:
        zfwat, dzfwat = 1.0, 0.0

    # saturation humidity with ice-supersaturation factor (:401-407)
    if t < thf.rtice:
        fac = 1.8 - 3.0e-3 * t
        dzqsat = dpqs * fac + pqs_v * (-3.0e-3) * dpt
    else:
        fac = 1.0
        dzqsat = dpqs
    zqsat = pqs_v * fac

    # saturated branch condensate (:412-427)
    zqc = (1.0 - zscalm) * (zqsat - zcrh2 * zqsat)
    dzqc = (1.0 - zscalm) * (1.0 - zcrh2) * dzqsat

    zqlwc, dzqlwc = zfwat * zqc, dzfwat * zqc + zfwat * dzqc
    zqiwc, dzqiwc = (1.0 - zfwat) * zqc, -dzfwat * zqc + (1.0 - zfwat) * dzqc

    # liquid autoconversion (:741-770); pclc == 1 with zero tangent
    zcldl, dzcldl = zqlwc, dzqlwc
    e35 = math.exp(-((zcldl / zlcrit) ** 2))
    zdl5 = zckcodtl * (1.0 - e35)
    el = math.exp(-zdl5)
    dzdl = factor * zckcodtl * e35 * 2.0 * zcldl * dzcldl / zlcrit**2
    dzlnew = dzcldl * el - zcldl * el * dzdl
    dtenl_l = dzlnew * qtmst

    # ice autoconversion (:775-800); uses post-melt ztp1 (= t: no snow in)
    zcldi, dzcldi = zqiwc, dzqiwc
    e15 = math.exp(0.025 * (t - cst.rtt))
    de15 = e15 * 0.025 * dpt
    e25 = math.exp(-((zcldi / zlcrit) ** 2))
    zdi5 = zckcodti * e15 * (1.0 - e25)
    ei = math.exp(-zdi5)
    dzdi = factor * zckcodti * (
        de15 * (1.0 - e25) + e15 * e25 * 2.0 * zcldi * dzcldi / zlcrit**2
    )
    dzinew = dzcldi * ei - zcldi * ei * dzdi
    dtenl_i = dzinew * qtmst
    return dtenl_l, dtenl_i


@pytest.mark.parametrize("lregcl", [False, True])
def test_autoconversion_liquid_factor(lregcl):
    """Warm saturated column, seed on PQS: the ql-tendency tangent matches
    the hand-derived closed form, whose damped arm carries exactly the /100
    factor via ZCKCODTLA."""
    params = _params()
    inputs = _state(1, t=290.0, pq=0.012, pqs=0.01, pl=0.002)
    d = _seed(inputs, pqs=1.0)
    dy = _tl(inputs, d, params, lregcl=lregcl)
    exp_l, exp_i = _autoconv_oracle(params, 290.0, 0.01, 1.0, 0.0, lregcl)
    assert float(dy.tenl_l[0, K]) == pytest.approx(exp_l, rel=1e-9)
    assert float(dy.tenl_i[0, K]) == pytest.approx(exp_i, abs=1e-20)


def test_autoconversion_liquid_damping_observable():
    """Test power: with the chosen state the damped and exact closed forms
    differ by tens of percent, so a wrong factor cannot hide inside the
    1e-9 comparison tolerance."""
    params = _params()
    e = _autoconv_oracle(params, 290.0, 0.01, 1.0, 0.0, False)[0]
    r = _autoconv_oracle(params, 290.0, 0.01, 1.0, 0.0, True)[0]
    assert abs(r - e) > 0.1 * abs(e)


@pytest.mark.parametrize(
    "dpqs,dpt", [(1.0, 0.0), (0.0, 1.0), (1.0, 0.5)]
)
@pytest.mark.parametrize("lregcl", [False, True])
def test_autoconversion_ice_factor(lregcl, dpqs, dpt):
    """Cold saturated column: the qi-tendency tangent matches the closed
    form with ZCKCODTIA = ZCKCODTI/100, including the damped
    0.025*ZTP1 temperature term (cloudsc2tl.F90:791-795)."""
    params = _params()
    t, pqs_v = 250.0, 1.0e-3
    inputs = _state(1, t=t, pq=1.0e-3, pqs=pqs_v, pi=1.0e-4)
    d = _seed(inputs, pqs=dpqs, pt=dpt)
    dy = _tl(inputs, d, params, lregcl=lregcl)
    exp_l, exp_i = _autoconv_oracle(params, t, pqs_v, dpqs, dpt, lregcl)
    assert float(dy.tenl_i[0, K]) == pytest.approx(exp_i, rel=1e-9)
    assert float(dy.tenl_l[0, K]) == pytest.approx(exp_l, rel=1e-9)


def test_autoconversion_ice_damping_observable():
    params = _params()
    e = _autoconv_oracle(params, 250.0, 1.0e-3, 1.0, 0.0, False)[1]
    r = _autoconv_oracle(params, 250.0, 1.0e-3, 1.0, 0.0, True)[1]
    # ~8% of the tangent flows through the damped ZD term here
    assert abs(r - e) > 0.02 * abs(e)


# ---------------------------------------------------------------------------
# cross-site: the adjoint transposes every factor (site-level, not identity)
# ---------------------------------------------------------------------------


def test_ad_inherits_site_factors():
    """For each crafted single-site state, grad with lregcl=True/False shows
    the same per-site ratio as the TL — pinning the AD-side LREGCL sites
    (cloudsc2ad.F90:1057-1059, 1308, 1344, 1460, 1554) individually rather
    than only through the symmetry identity."""
    params = _params(rkconv=0.0)
    inputs = _state(1, t=290.0, pq=0.012, pqs=0.01, pl=0.002)

    def out(x, lregcl):
        return cloudsc2(x, params, lregcl=lregcl).tenl_l[0, K]

    ge = float(jax.grad(lambda x: out(x, False))(inputs).pmfu[0, K])
    gr = float(jax.grad(lambda x: out(x, True))(inputs).pmfu[0, K])
    assert abs(ge) > 1e-12
    assert gr / ge == pytest.approx(0.1, rel=1e-12)
