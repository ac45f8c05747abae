"""Runtime crosscheck against the reference's own NumPy NL port.

The golden fixtures pin one state; this test draws *fresh* synthetic
states and compares our independently-written JAX kernel against the
reference implementation (``/root/reference/src/cloudsc2_nl_gt4py/
cloudsc2_py.py``, executed from the read-only reference tree) on each —
the property "for any state, the physics matches" rather than "the
fixture matches".  Skipped when the reference tree is not mounted.
"""

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


@pytest.mark.parametrize("seed,ldrain1d", [(7, False), (99, False), (7, True)])
def test_fresh_state_matches_reference_port(seed, ldrain1d):
    sys.path.insert(0, str(REPO / "tools"))
    from make_golden import run_reference_port

    from cloudsc2jax import io as cio
    from cloudsc2jax.drivers import run_nl
    from cloudsc2jax.state import Cloudsc2State

    fields, params = cio.synthetic_state(nlon=100, nlev=137, seed=seed)
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
