"""LDRAIN1D=.TRUE. coverage: activates the clear-sky precipitation
evaporation branch (cloudsc2.F90:556-591) and its PCOVPTOT output — the
code path disabled in the standard driver configuration (LEVAPLS2=.FALSE.,
dwarf_cloudsc.F90:105).  Goldens come from the reference's NumPy port run
with ldrain1d=True (tools/make_golden.py --ldrain1d)."""

import numpy as np
import pytest

from cloudsc2jax import io as cio
from cloudsc2jax.constants import NCLDQI, NCLDQL
from cloudsc2jax.validate import field_errors
from conftest import FIXTURES


@pytest.fixture(scope="module")
def rain_reference():
    return cio.load_reference_h5(FIXTURES / "reference_ldrain1d.h5")


@pytest.fixture(scope="module")
def rain_outputs(state, inputs):
    import jax
    from functools import partial

    from cloudsc2jax.physics.cloudsc2 import cloudsc2

    return jax.jit(partial(cloudsc2, params=state.params, ldrain1d=True))(inputs)


_FIELDS = [
    ("tenl_t", "TENDENCY_LOC_T", None),
    ("tenl_q", "TENDENCY_LOC_Q", None),
    ("tenl_l", "TENDENCY_LOC_CLD", NCLDQL),
    ("tenl_i", "TENDENCY_LOC_CLD", NCLDQI),
    ("pfplsl", "PFPLSL", None),
    ("pfplsn", "PFPLSN", None),
    ("pcovptot", "PCOVPTOT", None),
]


@pytest.mark.parametrize("mine,refname,comp", _FIELDS)
def test_ldrain1d_matches_reference(rain_outputs, rain_reference, mine, refname, comp):
    a = np.asarray(getattr(rain_outputs, mine))
    b = rain_reference[refname] if comp is None else rain_reference[refname][:, comp]
    err = field_errors(mine, a, b)
    assert err.passed(threshold=20.0), (
        f"{mine}: relerr={err.relerr:.3e} maxabs={err.zmaxerr:.3e}"
    )


def test_evaporation_branch_active(rain_outputs):
    assert np.asarray(rain_outputs.pcovptot).max() > 0.5


def test_taylor_ldrain1d(state, inputs):
    # Beyond-reference coverage: the upstream TL driver hardcodes
    # LDRAIN1D=.FALSE. (cloudsc_driver_tl_mod.F90:72), so only convergence
    # is asserted here — the strict V-shape criterion is roughened by the
    # evaporation branch's x**0.5777 (finite-difference noise at small
    # lambda), not by a TL defect.
    from cloudsc2jax.drivers import taylor_test

    res = taylor_test(inputs, state.params, nproma=1, lregcl=False, ldrain1d=True)
    err = np.abs(1.0 - res.norms)
    assert res.istart != 0 and res.istart <= 4
    assert err[res.istart - 1 :].min() < 1e-5


def test_adjoint_ldrain1d(state, inputs):
    from cloudsc2jax.drivers import adjoint_test

    res = adjoint_test(inputs, state.params, lregcl=True, ldrain1d=True)
    assert res.passed, f"max_error={res.max_error} x eps"


def test_pallas_ldrain1d(state):
    from cloudsc2jax.pallas.cloudsc2_kernel import cloudsc2_pallas
    from cloudsc2jax.physics.cloudsc2 import cloudsc2

    inp = state.kernel_inputs(dtype=np.float32)
    ref = cloudsc2(inp, state.params, ldrain1d=True)
    out = cloudsc2_pallas(inp, state.params, ldrain1d=True, interpret=True)
    for name, a, b in zip(out._fields, out, ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-5, name
