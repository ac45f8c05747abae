"""Constants-randomised crosscheck against the reference's NumPy NL port.

The fixed IFS defaults cannot catch a miswired constant that only
matters off-default (e.g. a swapped RCLCRIT/RLMIN, or an RPECONS that is
silently ignored).  This test draws *randomised-but-physical* values for
every constant the kernels consume — YOMCST / YOETHF (re-derived with the
SUPHEC consistency relations, yoethf.F90:79-99), the four YRECLDP
tunables (rclcrit, rkconv, rlmin, rpecons) and YREPHLI's RLPTRC — and
feeds the SAME randomised groups to our JAX kernel and to the reference's
own NumPy port (``cloudsc2_py.py``), executed from the read-only
reference tree.  A constant wired to the wrong site in either direction
now produces a mismatch.  LDRAIN1D=True rounds exercise the RPECONS
evaporation branch (cloudsc2.F90:556-591).
"""

import dataclasses
import math
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE_PY = pathlib.Path(
    "/root/reference/src/cloudsc2_nl_gt4py/cloudsc2_py.py"
)

pytestmark = pytest.mark.skipif(
    not REFERENCE_PY.exists(), reason="reference tree not mounted"
)


def randomized_params(base, seed):
    """Randomise every kernel-consumed constant, keeping the SUPHEC
    derivation relations (R5LES=R3LES*(RTT-R4LES), R5ALVCP=R5LES*RLVTT/RCPD,
    RETV=RV/RD-1, RLMLT=RLSTT-RLVTT, ...) internally consistent so the
    randomised set is still "physical" in the sense the kernels assume."""
    from cloudsc2jax.constants import Yoethf, Yomcst

    rng = np.random.default_rng(seed)
    u = lambda lo, hi: float(rng.uniform(lo, hi))

    rd = 287.06 * u(0.9, 1.1)
    rv = 461.52 * u(0.9, 1.1)
    rtt = 273.16 + u(-2.0, 2.0)
    rlvtt = 2.5008e6 * u(0.9, 1.1)
    rlstt = rlvtt * u(1.05, 1.2)  # keep sublimation heat > vaporisation
    rcpd = 3.5 * rd
    cst = Yomcst(
        rg=9.80665 * u(0.97, 1.03),
        rd=rd,
        rv=rv,
        rcpd=rcpd,
        retv=rv / rd - 1.0,
        rlvtt=rlvtt,
        rlstt=rlstt,
        rlmlt=rlstt - rlvtt,
        rtt=rtt,
    )

    restt = 611.21 * u(0.9, 1.1)
    r3les = 17.502 * u(0.95, 1.05)
    r3ies = 22.587 * u(0.95, 1.05)
    r4les = 32.19 * u(0.9, 1.1)
    r4ies = -0.7 * u(0.5, 1.5)
    r5les = r3les * (rtt - r4les)
    r5ies = r3ies * (rtt - r4ies)
    rtwat = rtt
    rtice = rtt - 23.0 * u(0.9, 1.1)
    thf = Yoethf(
        r2es=restt * rd / rv,
        r3les=r3les,
        r3ies=r3ies,
        r4les=r4les,
        r4ies=r4ies,
        r5les=r5les,
        r5ies=r5ies,
        r5alvcp=r5les * rlvtt / rcpd,
        r5alscp=r5ies * rlstt / rcpd,
        ralvdcp=rlvtt / rcpd,
        ralsdcp=rlstt / rcpd,
        ralfdcp=(rlstt - rlvtt) / rcpd,
        rtwat=rtwat,
        rtice=rtice,
        rticecu=rtice,
        rtwat_rtice_r=1.0 / (rtwat - rtice),
        rtwat_rticecu_r=1.0 / (rtwat - rtice),
        rkoop1=2.583 * u(0.9, 1.1),
        rkoop2=0.48116e-2 * u(0.9, 1.1),
        rvtmp2=0.0,
    )

    ldp = dataclasses.replace(
        base.yrecldp,
        rclcrit=0.3e-3 * u(0.5, 2.0),
        rkconv=(1.0 / 6000.0) * u(0.5, 2.0),
        rlmin=1.0e-8 * u(0.2, 5.0),
        rpecons=5.547e-5 * u(0.5, 2.0),
    )
    # SUPHLI relation: RLPTRC = RTICE + (RTT-RTICE)/sqrt(2)
    phli = dataclasses.replace(
        base.yrephli, rlptrc=rtice + (rtt - rtice) / math.sqrt(2.0)
    )
    return base.replace(yomcst=cst, yoethf=thf, yrecldp=ldp, yrephli=phli)


@pytest.mark.parametrize(
    "seed,ldrain1d", [(11, False), (22, True), (33, False), (44, True)]
)
def test_randomized_constants_match_reference_port(seed, ldrain1d):
    sys.path.insert(0, str(REPO / "tools"))
    from make_golden import run_reference_port

    from cloudsc2jax import io as cio
    from cloudsc2jax.drivers import run_nl
    from cloudsc2jax.state import Cloudsc2State

    fields, params0 = cio.synthetic_state(nlon=100, nlev=137, seed=seed)
    params = randomized_params(params0, seed)
    golden = run_reference_port(fields, params, ldrain1d=ldrain1d)

    st = Cloudsc2State(
        fields={k: np.moveaxis(v, -1, 0) for k, v in fields.items()},
        params=params, ngptot=100, klon_file=100,
    )
    out = run_nl(st.kernel_inputs(), st.params, ldrain1d=ldrain1d)
    res = st.output_dict(out)

    for name, ref_lm in golden.items():
        if name == "PQSAT":
            continue
        got = np.moveaxis(res[name], 0, -1)  # -> file order (…, nlon)
        scale = max(np.abs(ref_lm).max(), 1e-30)
        err = np.abs(got - ref_lm).max() / scale
        assert err < 1e-12, (name, seed, ldrain1d, err)


def test_randomized_constants_change_the_answer():
    """Test power: the randomised constants must actually move the
    outputs — otherwise the crosscheck above proves nothing new."""
    from cloudsc2jax import io as cio
    from cloudsc2jax.drivers import run_nl
    from cloudsc2jax.state import Cloudsc2State

    fields, params0 = cio.synthetic_state(nlon=100, nlev=137, seed=11)
    st = Cloudsc2State(
        fields={k: np.moveaxis(v, -1, 0) for k, v in fields.items()},
        params=params0, ngptot=100, klon_file=100,
    )
    base = st.output_dict(run_nl(st.kernel_inputs(), st.params))

    params = randomized_params(params0, 11)
    st2 = Cloudsc2State(
        fields={k: np.moveaxis(v, -1, 0) for k, v in fields.items()},
        params=params, ngptot=100, klon_file=100,
    )
    rand = st2.output_dict(run_nl(st2.kernel_inputs(), st2.params))

    moved = 0
    for name, a in base.items():
        b = rand[name]
        scale = max(np.abs(a).max(), 1e-30)
        if np.abs(a - b).max() / scale > 1e-3:
            moved += 1
    assert moved >= 5, f"only {moved} fields moved — randomisation too weak"
