"""Validation-statistics unit tests (validate_mod.F90 semantics)."""

import io

import jax
import numpy as np

from cloudsc2jax.validate import field_errors, print_validation, validate

EPS = np.finfo(np.float64).eps


def test_exact_match_passes():
    a = np.linspace(-1, 1, 20).reshape(4, 5)
    e = field_errors("X", a, a.copy())
    assert e.relerr == 0.0 and e.passed()


def test_zero_reference_zero_error():
    # zerrsum < eps regime (validate_mod.F90:273-275)
    z = np.zeros((3, 4))
    e = field_errors("X", z, z)
    assert e.relerr == 0.0 and e.passed()


def test_near_zero_denominator_regime():
    # zsum < eps but zerrsum >= eps: relerr = zerrsum/(1+zsum)
    a = np.full((2, 2), 1e-3)
    b = np.zeros((2, 2))
    e = field_errors("X", a, b)
    assert e.relerr == np.abs(a).sum() / 1.0
    assert not e.passed()


def test_tolerance_boundary():
    b = np.ones((10, 10))
    a = b * (1.0 + 5 * EPS)
    e = field_errors("X", a, b)
    assert e.passed(threshold=10.0)
    a = b * (1.0 + 50 * EPS)
    e = field_errors("X", a, b)
    assert not e.passed(threshold=10.0)


def test_print_validation_flags_failures():
    b = np.ones((4, 4))
    errs = validate({"GOOD": b, "BAD": b * 1.001}, {"GOOD": b, "BAD": b})
    buf = io.StringIO()
    ok = print_validation(errs, file=buf)
    text = buf.getvalue()
    assert not ok
    assert "!!!!" in text and "Variable" in text
    assert "GOOD" in text and "BAD" in text


def test_stats_fields():
    a = np.array([[1.0, -2.0], [3.0, 4.0]])
    b = np.array([[1.0, -2.0], [3.0, 5.0]])
    e = field_errors("X", a, b, ngptot=2)
    assert e.zminval == -2.0 and e.zmaxval == 4.0
    assert e.zmaxerr == 1.0
    assert e.avgpgp == 0.5


def test_field_errors_jax_matches_host(state, nl_outputs, reference):
    """Device-side statistics (field_errors_jax) must agree with the host
    numpy statistics to float rounding, and carry the working-precision
    epsilon (EPSILON(1.0_JPRB) semantics, validate_mod.F90:285-289)."""
    import jax.numpy as jnp

    from cloudsc2jax import validate as cval

    a = jnp.asarray(nl_outputs.tenl_t)
    b = jnp.asarray(reference["TENDENCY_LOC_T"])
    host = cval.field_errors("TENDENCY_LOC_T", np.asarray(a), np.asarray(b))
    dev = cval.field_errors_jax("TENDENCY_LOC_T", a, b)
    assert dev.eps == host.eps == np.finfo(np.float64).eps
    np.testing.assert_allclose(dev.zmaxerr, host.zmaxerr, rtol=1e-12)
    np.testing.assert_allclose(dev.zerrsum, host.zerrsum, rtol=1e-12)
    np.testing.assert_allclose(dev.zsum, host.zsum, rtol=1e-12)
    assert dev.passed(10.0) == host.passed(10.0)

    f32 = cval.field_errors("x", np.float32(np.asarray(a)), np.float32(np.asarray(b)))
    assert f32.eps == np.finfo(np.float32).eps


def test_validate_device_matches_host_table(state, inputs, nl_outputs, tmp_path):
    """state.validate_device and the host-side state.validate agree on
    pass/fail against the golden file."""
    import pathlib

    fixtures = pathlib.Path(__file__).parent / "fixtures"
    host_ok = state.validate(
        jax.tree.map(np.asarray, nl_outputs), fixtures / "reference.h5",
        quiet=True,
    )
    dev_ok = state.validate_device(
        nl_outputs, inputs, fixtures / "reference.h5", quiet=True
    )
    assert host_ok == dev_ok == True  # noqa: E712
