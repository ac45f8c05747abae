"""I/O layer tests: schema round-trips, expand, backend switch."""

import numpy as np
import pytest

from cloudsc2jax import io as cio
from cloudsc2jax.constants import Params
from conftest import FIXTURES


def test_input_roundtrip_h5(tmp_path):
    fields, params = cio.synthetic_state(nlon=10, nlev=17)
    path = tmp_path / "input.h5"
    cio.write_input_h5(path, fields, params)
    back, params2 = cio.load_input_h5(path)
    np.testing.assert_array_equal(back["PT"], np.moveaxis(fields["PT"], -1, 0))
    assert params2.yomcst == params.yomcst
    assert params2.yoethf.r2es == pytest.approx(params.yoethf.r2es)
    assert params2.ptsphy == params.ptsphy
    # CETA derived exactly as the entry program does (dwarf_cloudsc.F90:100-102)
    np.testing.assert_allclose(
        np.asarray(params2.ceta),
        fields["PAP"][:, 0] / fields["PAPH"][17, 0],
        rtol=1e-15,
    )


def test_input_roundtrip_npz(tmp_path):
    # the second storage backend (Serialbox-switch analogue,
    # file_io_mod.F90:13-37)
    fields, params = cio.synthetic_state(nlon=10, nlev=17)
    path = tmp_path / "input.npz"
    cio.write_input_h5(path, fields, params)
    back, params2 = cio.load_input_h5(path)
    np.testing.assert_array_equal(back["PQ"], np.moveaxis(fields["PQ"], -1, 0))
    assert params2.yrecldp.rclcrit == pytest.approx(params.yrecldp.rclcrit)


def test_expand_cyclic():
    fields, _ = cio.synthetic_state(nlon=7, nlev=5)
    out = cio.expand_columns(fields, 20)
    for k, v in out.items():
        assert v.shape[-1] == 20
        np.testing.assert_array_equal(v[..., 7:14], fields[k])
        np.testing.assert_array_equal(v[..., 14:20], fields[k][..., :6])


def test_expand_decomposition_offsets():
    # per-rank hyperslab semantics: slicing the expanded array equals
    # expanding then slicing (expand_mod.F90:30-46 invariant)
    fields, _ = cio.synthetic_state(nlon=9, nlev=4)
    full = cio.expand_columns(fields, 30)
    for k in fields:
        np.testing.assert_array_equal(full[k][..., 10:20], full[k][..., 10:20])


def test_reference_file_schema(tmp_path):
    ref = cio.load_reference_h5(FIXTURES / "reference.h5")
    assert set(cio.REFERENCE_FIELDS) <= set(ref.keys()) | {"PQSAT"}
    # columns-first framework order
    assert ref["PFPLSL"].shape == (100, 138)
    assert ref["TENDENCY_LOC_CLD"].shape == (100, 5, 137)


def test_input_file_loads_in_reference_shape():
    import h5py

    with h5py.File(FIXTURES / "input.h5", "r") as f:
        # exact upstream schema: every loader-read dataset present
        for k in [
            "KLON", "KLEV", "PTSPHY", "LDSLPHY", "LDMAINCALL",
            "PT", "PQ", "PAP", "PAPH", "PLU", "PLUDE", "PMFU", "PMFD",
            "PA", "PCLV", "PSUPSAT",
            "TENDENCY_CML_T", "TENDENCY_CML_Q", "TENDENCY_CML_CLD",
            "RG", "RD", "RCPD", "RETV", "RLVTT", "RLSTT", "RLMLT", "RTT", "RV",
            "R2ES", "R3LES", "R3IES", "R4LES", "R4IES", "R5LES", "R5IES",
            "R5ALVCP", "R5ALSCP", "RALVDCP", "RALSDCP", "RALFDCP",
            "RTWAT", "RTICE", "RTICECU", "RTWAT_RTICE_R", "RTWAT_RTICECU_R",
            "RKOOP1", "RKOOP2",
            "YRECLDP_RCLCRIT", "YRECLDP_RKCONV", "YRECLDP_RPECONS",
            "YRECLDP_RLMIN", "YREPHLI_LPHYLIN", "YREPHLI_RLPTRC",
        ]:
            assert k in f, k
        assert f["PCLV"].shape == (5, 137, 100)
        assert f["PAPH"].shape == (138, 100)


def test_device_kernel_inputs_match_host_expansion(state):
    """Device-side tiling (state.device_kernel_inputs) must equal the
    host-side expand_columns path value-for-value (expand_mod.F90
    cyclic-replication semantics)."""
    import numpy as np

    from cloudsc2jax.state import Cloudsc2State

    small = Cloudsc2State.synthetic(ngptot=100, nlev=17)
    big = Cloudsc2State.synthetic(ngptot=259, nlev=17)  # non-multiple
    host = big.kernel_inputs(dtype=np.float32)
    dev = small.device_kernel_inputs(259, dtype=np.float32)
    for name, a, b in zip(host._fields, host, dev):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
