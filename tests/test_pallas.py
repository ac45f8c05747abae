"""Pallas fused kernel vs pure-JAX reference path (interpret mode on CPU).

The Pallas kernel re-schedules the identical math for the TPU memory
system (grid over column blocks × levels with a VMEM carry); this test
pins its semantics to the lax.scan implementation in f32.
"""

import numpy as np
import pytest

from cloudsc2jax.pallas.cloudsc2_kernel import cloudsc2_pallas
from cloudsc2jax.physics.cloudsc2 import cloudsc2


@pytest.fixture(scope="module")
def f32_inputs(state):
    return state.kernel_inputs(dtype=np.float32)


def test_pallas_matches_scan_f32(state, f32_inputs):
    ref = cloudsc2(f32_inputs, state.params)
    out = cloudsc2_pallas(f32_inputs, state.params, interpret=True)
    for name, a, b in zip(out._fields, out, ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 5e-6, name


def test_pallas_pads_arbitrary_column_counts(state):
    # 100 columns -> one padded 8x128 block; padding must not leak into
    # the first 100 columns
    small = state.kernel_inputs(dtype=np.float32)
    out_small = cloudsc2_pallas(small, state.params, interpret=True)
    assert np.asarray(out_small.pclc).shape == (100, 137)
    assert np.isfinite(np.asarray(out_small.tenl_t)).all()


def test_pallas_levels_major_matches(state, f32_inputs):
    """The zero-transpose levels-major layout is a pure re-layout."""
    ref = cloudsc2_pallas(f32_inputs, state.params, interpret=True)
    lm_in = type(f32_inputs)(*(np.ascontiguousarray(x.T) for x in f32_inputs))
    lm = cloudsc2_pallas(
        lm_in, state.params, interpret=True, levels_major=True
    )
    for a, b in zip(lm, ref):
        np.testing.assert_array_equal(np.asarray(a).T, np.asarray(b))


def test_pallas_resident_mode_matches(state, f32_inputs):
    ref = cloudsc2(f32_inputs, state.params)
    out = cloudsc2_pallas(
        f32_inputs, state.params, interpret=True, mode="resident", sublanes=2
    )
    for name, a, b in zip(out._fields, out, ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 5e-6, name


def test_pallas_blocked_path_matches(state):
    """The zero-relayout blocked path (inputs generated in kernel layout,
    outputs returned blocked) must match the standard path exactly."""
    import jax
    import numpy as np

    from cloudsc2jax.pallas.cloudsc2_kernel import unblock_outputs
    from cloudsc2jax.state import Cloudsc2State

    st = Cloudsc2State.synthetic(ngptot=100, nlev=23)
    ncol = 256
    std = st.device_kernel_inputs(ncol, dtype=np.float32)
    blk = st.device_kernel_inputs(ncol, dtype=np.float32, blocked_sublanes=1)
    ref = cloudsc2_pallas(std, st.params, sublanes=1, interpret=True)
    bout = cloudsc2_pallas(blk, st.params, blocked=True, interpret=True)
    out = unblock_outputs(bout, st.params, ncol)
    for name, a, b in zip(ref._fields, out, ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-6, name


def test_pallas_fuse_satur_matches(state):
    """In-kernel qsat (fuse_satur: SATUR + CLOUDSC2 as one sweep) matches
    the streamed-PQS path."""
    import numpy as np

    from cloudsc2jax.state import Cloudsc2State

    st = Cloudsc2State.synthetic(ngptot=100, nlev=23)
    blk = st.device_kernel_inputs(256, dtype=np.float32, blocked_sublanes=1)
    ref = cloudsc2_pallas(blk, st.params, blocked=True, interpret=True)
    fused = cloudsc2_pallas(
        blk, st.params, blocked=True, fuse_satur=True, interpret=True
    )
    for name, a, b in zip(ref._fields, fused, ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 2e-5, name


def test_pallas_rejects_lphylin_false(state):
    """The fused kernels hardcode the LPHYLIN branch; a non-LPHYLIN
    configuration must be refused, not silently diverged from
    (physics.cloudsc2 carries the FOEALFA branch)."""
    import dataclasses

    import pytest as _pytest

    from cloudsc2jax.pallas.tlad_kernel import cloudsc2_pallas_tl

    inputs = state.kernel_inputs(dtype=np.float32)
    params = dataclasses.replace(
        state.params,
        yrephli=dataclasses.replace(state.params.yrephli, lphylin=False),
    )
    with _pytest.raises(NotImplementedError):
        cloudsc2_pallas(inputs, params, interpret=True)
    with _pytest.raises(NotImplementedError):
        cloudsc2_pallas_tl(inputs, inputs, params, interpret=True)


def test_encoded_inputs_match_exact_kernel():
    """int16 per-(field, level) affine storage encoding (DESIGN.md §8
    study; measured perf-negative on v5e, kept for byte-bound hardware):
    decode-in-kernel must reproduce the exact blocked kernel within the
    study's error bound, well inside the on-chip validation budget."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from cloudsc2jax.pallas.cloudsc2_kernel import cloudsc2_pallas
    from cloudsc2jax.pallas.experiments import (
        cloudsc2_pallas_encoded,
        encode_blocked_inputs,
    )
    from cloudsc2jax.state import Cloudsc2State

    st = Cloudsc2State.synthetic(ngptot=100, nlev=17)
    blk = st.device_kernel_inputs(1024, dtype=np.float32, blocked_sublanes=2)
    exact = cloudsc2_pallas(blk, st.params, blocked=True, fuse_satur=True,
                            interpret=True)
    for keep in (("pq",), ("pq", "plu", "paph")):
        enc = encode_blocked_inputs(blk, st.params, keep_f32=keep)
        kept_f32 = sum(s.dtype == jnp.float32 for s in enc.streams)
        assert kept_f32 == len(keep)
        out = jax.jit(
            partial(cloudsc2_pallas_encoded, params=st.params, interpret=True)
        )(enc)
        for name, a, b in zip(out._fields, out, exact):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            denom = max(np.abs(b).sum(), 1e-30)
            assert np.abs(a - b).sum() / denom < 5e-4, (keep, name)


def test_window_probe_streams_distinct_windows(monkeypatch):
    """The window-matched ceiling probe (tools/bw_probe.py, VERDICT r2
    item 3) must move every (level, block) window — its in-probe
    self-check would fail if the BlockSpec index map clamped against
    the wrong dim (the (b, k) vs (k, b) ordering bug: consecutive grid
    steps then repeat a block index and Mosaic elides the DMA, inflating
    the reported ceiling).  Run it tiny, fwd and rev, in interpret."""
    import importlib

    bw_probe = importlib.import_module("tools.bw_probe")

    for rev in ("0", "1"):
        monkeypatch.setenv("CLOUDSC2_BW_PROBE_WINDOWS", "3x2")
        monkeypatch.setenv("CLOUDSC2_BW_PROBE_NLEV", "5")
        monkeypatch.setenv("CLOUDSC2_BW_PROBE_NB", "3")
        monkeypatch.setenv("CLOUDSC2_BW_PROBE_SUBLANES", "2")
        monkeypatch.setenv("CLOUDSC2_BW_PROBE_REPEATS", "1")
        monkeypatch.setenv("CLOUDSC2_BW_PROBE_INTERPRET", "1")
        monkeypatch.setenv("CLOUDSC2_BW_PROBE_REV", rev)
        rec = bw_probe.window_probe()
        assert rec["mode"] == "windows" and rec["rev"] == (rev == "1")


@pytest.mark.parametrize("seed,nlev,ncol,ldrain1d", [
    (7, 11, 97, False),     # odd ncol: tail padding inside one block
    (11, 21, 259, True),    # two padded blocks + the LDRAIN1D branch
    (13, 5, 130, False),    # shallow atmosphere, one-column tail
])
def test_pallas_matches_scan_random_states(seed, nlev, ncol, ldrain1d):
    """Fuzz the Pallas NL kernel against the lax.scan kernel on fresh
    random states at odd shapes — the fixture-state parity tests all run
    the same 100x137 state, so a masking/padding bug conditioned on the
    data or on non-standard shapes could hide there."""
    from cloudsc2jax.state import Cloudsc2State

    st = Cloudsc2State.synthetic(ngptot=ncol, nlev=nlev, seed=seed)
    inputs = st.kernel_inputs(dtype=np.float32)
    ref = cloudsc2(inputs, st.params, ldrain1d=ldrain1d)
    out = cloudsc2_pallas(inputs, st.params, ldrain1d=ldrain1d,
                          interpret=True)
    for name, a, b in zip(out._fields, out, ref):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape == (ncol, b.shape[1])
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 5e-6, (seed, nlev, ncol, name)
