#!/usr/bin/env python
"""Headline benchmark: NL grid-columns/second on one chip.

Configuration: NGPTOT=327680 (2x the README's 160k reference config,
rounded to a lane multiple — larger batches amortise the platform's
fixed per-dispatch cost, ROOFLINE.md; override with
CLOUDSC2_BENCH_NGPTOT), KLEV=137, f32 working precision (the
reference's -DSINGLE analogue; f64 is the validation path).  Prints ONE
JSON line including the batch size.  ``vs_baseline`` compares against the reference's own
per-core nominal rate derived from its ZHPM flop accounting: the dwarf
self-reports MFlop/s against ZHPM = 3 996 006 flops/100 columns
(cloudsc_driver_mod.F90:58); a strong CPU core sustains ~O(3) GFlop/s on
this kernel, i.e. ~75k columns/s/core → 4 OpenMP threads ≈ 300k cols/s
(README.md:47 config).  vs_baseline = our cols/s / 300_000.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# the reference's 4-strong-OpenMP-thread CPU estimate derived from its
# own ZHPM flop accounting (module header) — the single vs_baseline
# denominator for the headline AND chunked records (ADVICE r3)
BASELINE_COLS_PER_S = 300_000.0

# preflight outcome -> human-readable fallback cause (ADVICE r3: a
# timeout means the tunnel hangs; rc=3 means a backend answered but is
# not a TPU — e.g. the axon plugin is not registered in this context;
# conflating them mislabeled BENCH_r03)
_PREFLIGHT_NOTES = {
    "timeout": "TPU tunnel unreachable (probe timed out)",
    "no-tpu-backend": "no TPU backend registered in this context "
                      "(axon plugin absent — probe saw a non-TPU backend)",
    "crash": "TPU probe process crashed",
}


def _tpu_preflight(timeout_s: int) -> str:
    """Preflight the accelerator in a SUBPROCESS: when the axon tunnel is
    down, backend init blocks indefinitely inside make_c_api_client — a
    hang no in-process timeout can interrupt.  A throwaway probe process
    takes the risk instead; on failure the bench falls back to CPU and
    says WHY ('ok' / 'timeout' / 'no-tpu-backend' / 'crash'), rather than
    hanging the whole round."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); "
             "raise SystemExit(0 if d[0].platform=='tpu' else 3)"],
            timeout=timeout_s, capture_output=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if r.returncode == 0:
            return "ok"
        return "no-tpu-backend" if r.returncode == 3 else "crash"
    except subprocess.TimeoutExpired:
        return "timeout"
    except Exception:
        return "crash"


def main():
    import jax

    # honor JAX_PLATFORMS even when a site hook pre-selected a platform;
    # when the target is the TPU (explicitly or by default), preflight it
    # first — a downed tunnel hangs backend init unrecoverably otherwise
    plat_env = (os.environ.get("JAX_PLATFORMS") or "").strip().lower()
    wants_tpu = plat_env in ("", "axon", "tpu")
    fell_back = False
    fallback_cause = None
    if wants_tpu and os.environ.get("CLOUDSC2_BENCH_PREFLIGHT", "1") == "1":
        t = int(os.environ.get("CLOUDSC2_BENCH_PREFLIGHT_TIMEOUT", 420))
        outcome = _tpu_preflight(t)
        if outcome != "ok":
            fallback_cause = _PREFLIGHT_NOTES[outcome]
            print(f"bench.py: accelerator preflight failed within {t}s: "
                  f"{fallback_cause} — falling back to CPU", file=sys.stderr)
            plat_env, wants_tpu, fell_back = "cpu", False, True
    if plat_env:
        jax.config.update("jax_platforms", plat_env)

    # persistent compile cache shared with the CLI/tests (first-process
    # compiles through the remote AOT helper can take minutes otherwise)
    from cloudsc2jax.cache import enable_compile_cache

    enable_compile_cache()

    from cloudsc2jax.state import Cloudsc2State

    platform0 = jax.devices()[0].platform
    # headline config on accelerators: 2x the README's 160k reference
    # config (rounded to a lane multiple) — the platform carries a fixed
    # ~0.7 ms per-dispatch cost (ROOFLINE.md), so production batches as
    # large as HBM allows; the per-column metric is batch-honest and the
    # batch size is reported in the JSON.  A CPU fallback at this size
    # would take many minutes on a 1-core host — shrink there.
    default_ngptot = 327680 if platform0 == "tpu" else 8192
    ngptot = int(os.environ.get("CLOUDSC2_BENCH_NGPTOT", default_ngptot))
    repeats = int(os.environ.get("CLOUDSC2_BENCH_REPEATS", 20))
    use_pallas = os.environ.get("CLOUDSC2_BENCH_PALLAS", "1") == "1"
    # "nl" (headline) or "tlad" (fused forward+TL+AD work unit)
    variant = os.environ.get("CLOUDSC2_BENCH_VARIANT", "nl")
    platform = jax.devices()[0].platform

    if variant.startswith("chunked"):
        _bench_chunked(variant, repeats, fell_back, fallback_cause)
        return

    # expand the 100 stored columns to ngptot ON DEVICE: host-side
    # expansion + a GB-scale transfer takes minutes on a slow host CPU /
    # tunnel, device tiling is milliseconds.  Built lazily so the blocked
    # configurations never materialise the standard layout at all.
    state = Cloudsc2State.synthetic(ngptot=100, nlev=137)
    inputs = None

    from functools import partial

    if variant == "tlad":
        from cloudsc2jax.drivers import run_tlad

        sublanes = int(os.environ.get("CLOUDSC2_BENCH_SUBLANES", 64))
        if use_pallas and platform == "tpu":
            backend = "pallas_blocked"
            inputs = state.device_kernel_inputs(
                ngptot, dtype=np.float32, blocked_sublanes=sublanes
            )
        else:
            backend = "xla"
        # The recorded tlad headline sheds the 8 primal output streams
        # (write_primal=False): only δy and x̄ enter the AD driver's
        # verification norms (cloudsc_driver_ad_mod.F90:160-256).  NOTE
        # the contract asymmetry (ADVICE r4): the reference TL kernel
        # declares the trajectory outputs INTENT(OUT) and its driver
        # passes real arrays that receive them (cloudsc2tl.F90:162-176)
        # — the reference unit PAYS those writes; they are merely unused
        # downstream.  The noprim unit is therefore a contract
        # *re-design* (shed provably-unconsumed stores), not a
        # like-for-like diet; CLOUDSC2_BENCH_WRITE_PRIMAL=1 restores the
        # reference-comparable primal-emitting unit (the 4D-Var
        # trajectory+gradient shape) and both are recorded per round
        # (ONCHIP_r*: bench_tlad vs bench_tlad_noprim; measured +2.8%
        # in r4, bit-identical δy/x̄ per the on-chip variant gate).
        # Only the blocked pallas kernels can shed the streams
        # (run_tlad rejects the rest).
        wp_default = "1" if (not use_pallas or platform != "tpu") else "0"
        wp = os.environ.get("CLOUDSC2_BENCH_WRITE_PRIMAL", wp_default) == "1"
        if not wp and backend != "pallas_blocked":
            print("bench.py: CLOUDSC2_BENCH_WRITE_PRIMAL=0 needs the "
                  f"blocked pallas backend (got {backend}) — ignoring",
                  file=sys.stderr)
            wp = True
        fn = partial(run_tlad, params=state.params, lregcl=True,
                     backend=backend, sublanes=sublanes, write_primal=wp)
        # the flag only affects the blocked pallas kernels
        impl = (backend + "_noprim"
                if (not wp and backend == "pallas_blocked") else backend)
    elif use_pallas and platform == "tpu":
        from cloudsc2jax.pallas.cloudsc2_kernel import cloudsc2_pallas

        sublanes = int(os.environ.get("CLOUDSC2_BENCH_SUBLANES", 128))
        mode = os.environ.get("CLOUDSC2_BENCH_MODE", "stream")
        layout = os.environ.get("CLOUDSC2_BENCH_LAYOUT", "blocked")
        if layout == "blocked" and mode == "stream":
            # zero-relayout path: inputs generated straight into kernel
            # layout, outputs consumed blocked (see DESIGN.md §3);
            # fuse_satur folds the driver's SATUR call into the sweep
            # (the reference work unit is SATUR + CLOUDSC2 per block,
            # cloudsc_driver_mod.F90:91-107)
            fuse = os.environ.get("CLOUDSC2_BENCH_FUSE_SATUR", "1") == "1"
            inputs = state.device_kernel_inputs(
                ngptot, dtype=np.float32, blocked_sublanes=sublanes
            )
            fn = jax.jit(
                partial(cloudsc2_pallas, params=state.params, blocked=True,
                        fuse_satur=fuse)
            )
            impl = "pallas_blocked"
        else:
            fn = jax.jit(
                partial(cloudsc2_pallas, params=state.params,
                        sublanes=sublanes, mode=mode)
            )
            impl = "pallas"
    else:
        from cloudsc2jax.physics.cloudsc2 import cloudsc2

        fn = jax.jit(partial(cloudsc2, params=state.params))
        impl = "xla"

    if inputs is None:  # paths that did not build their own layout
        inputs = state.device_kernel_inputs(ngptot, dtype=np.float32)

    # Benchmark hygiene for remote-execution tunnels where
    # block_until_ready can be a no-op and identical in-flight calls may
    # coalesce: every iteration gets a *distinct* input, each call is
    # reduced to a scalar on device, the scalars are chained into an
    # accumulator, and one host fetch at the end forces the whole chain.
    import jax.numpy as jnp

    def scalar_step(v):
        out = fn(v)
        if "blocked" in impl:
            # pallas_call is an opaque custom call: consuming any slice
            # forces the whole execution without adding a full-array
            # reduction pass to the measurement.  The reverse kernel
            # scatters d(plu)/d(paph) in place (tlad_kernel
            # inplace_scatter); the only XLA op left on the adjoint
            # contract is the one-row surface add — consume THAT row so
            # it cannot be rewritten away (a [:2] slice of the
            # dynamic-update-slice would let XLA skip the update).
            extra = jnp.float32(0.0)
            if variant == "tlad":
                adj = out[2]
                extra = (jnp.sum(adj.paph[-1].astype(jnp.float32))
                         + jnp.sum(jnp.ravel(adj.plu)[:2]))
            return extra + sum(
                jnp.sum(jnp.ravel(o)[:2]) for o in jax.tree.leaves(out)
            )
        return sum(
            jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)
        )

    scalar_step = jax.jit(scalar_step)

    # time-salted bumps: never reuse input values across runs
    rng = np.random.default_rng(time.time_ns())
    variants = [
        inputs._replace(pt=inputs.pt + np.float32(1e-6 * rng.uniform(0.5, 1.5) * (i + 1)))
        for i in range(repeats)
    ]
    # compile + warm.  Measured on v5e via the axon tunnel: the first
    # *chained* (back-to-back, no host sync) sequence in a process runs
    # ~2.5x slower than steady state, and per-call blocking warm-ups do
    # NOT trigger the ramp — so the warm-up must itself be a throwaway
    # chain, fetched once.
    warm = [
        inputs._replace(pt=inputs.pt + np.float32(2e-6 * rng.uniform(0.5, 1.5) * (i + 1)))
        for i in range(10)
    ]
    acc = jnp.float32(0.0)
    for w in warm:
        acc = acc + scalar_step(w)
    assert np.isfinite(float(acc))

    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for v in variants:
        acc = acc + scalar_step(v)
    assert np.isfinite(float(acc))  # forces execution of the full chain
    dt = (time.perf_counter() - t0) / repeats

    cols_per_s = ngptot / dt
    baseline_cols_per_s = BASELINE_COLS_PER_S
    record = {
        "metric": f"{variant}_columns_per_second_{impl}_{platform}",
        "value": round(cols_per_s, 1),
        "unit": "columns/s/chip",
        "vs_baseline": round(cols_per_s / baseline_cols_per_s, 3),
        "ngptot": ngptot,
        # explicit so a tunnel-down CPU-fallback record can never be
        # mistaken for a TPU regression (vs_baseline is chip-denominated)
        "platform": platform,
    }
    # exact HBM traffic of the TIMED executable (ROOFLINE.md's roofline
    # inputs ride with every record): cost_analysis of the same jitted
    # scalar_step that was benched.  Done after timing — worst case it
    # recompiles, which cannot perturb the measurement.
    try:
        ca = scalar_step.lower(inputs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        nbytes = float(ca["bytes accessed"])
        record["ms_per_call"] = round(dt * 1e3, 3)
        record["bytes_accessed_gb"] = round(nbytes / 1e9, 3)
        record["attained_gbps"] = round(nbytes / dt / 1e9, 1)
    except Exception as e:
        print(f"bench.py: cost_analysis unavailable ({e!r})", file=sys.stderr)
    if fell_back:
        record["note"] = (f"CPU fallback ({fallback_cause} at bench time)"
                          " — not the headline chip number; see the last"
                          " on-chip BENCH_r*/ONCHIP_r* record")
    elif platform != "tpu":
        record["note"] = "deliberate non-TPU run (JAX_PLATFORMS set)"
    # measured-baseline provenance (tools/measure_baseline.py): the
    # denominator above is the 4-strong-thread ESTIMATE; these are real
    # single-core measurements of the reference's own NumPy port and the
    # XLA-CPU f64 path on this host, anchoring the estimate
    measured = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    if variant == "tlad" and os.environ.get(
            "CLOUDSC2_BENCH_F32_CHECKS", "1") == "1":
        # per-round measured f32 verdict values (TL parity vs jvp, adjoint
        # identity) at a fixed 16k-column verification config, so the CLI
        # tolerances (cli.PALLAS_*_TOL) stay anchored to a tracked
        # distribution across rounds (VERDICT r2 item 7)
        try:
            from cloudsc2jax.cli import measure_f32_verdicts

            v_ncol = min(ngptot, 16384)
            v_inputs = state.device_kernel_inputs(v_ncol, dtype=np.float32)
            fv = {
                k: (float(f"{v:.6e}") if isinstance(v, float) else v)
                for k, v in measure_f32_verdicts(state, v_inputs).items()
            }
            # the identity error scales with the dot-product length —
            # record the config so cross-round comparisons are apples-
            # to-apples even when ngptot shrinks a round
            fv["ngptot"] = v_ncol
            # tracked tolerance margins (VERDICT r3 item 5): the CLI
            # tolerances were deliberately set ~5-10x above the round-2
            # measured distribution, so the gate here is margin >= 4x —
            # a genuine regression (e.g. a broken damp site) collapses
            # the margin to <1 long before run-to-run spread can
            fv["tl_parity_margin"] = round(
                fv["tl_parity_tol"] / max(fv["tl_parity_rel_err"], 1e-30), 1)
            fv["ad_identity_margin"] = round(
                fv["ad_identity_tol"] / max(fv["ad_identity_rel_err"], 1e-30),
                1)
            fv["margin_ok"] = bool(fv["tl_parity_margin"] >= 4.0
                                   and fv["ad_identity_margin"] >= 4.0)
            if not fv["margin_ok"]:
                print("bench.py: WARNING — f32 verdict margin < 4x the "
                      f"tracked distribution: {fv}", file=sys.stderr)
            record["f32_verdicts"] = fv
        except Exception as e:
            print(f"bench.py: f32 verdict measurement failed ({e!r})",
                  file=sys.stderr)

    if os.path.exists(measured):
        try:
            with open(measured) as f:
                m = json.load(f)
            record["baseline"] = {
                "estimate_cols_per_s": baseline_cols_per_s,
                "measured_numpy_port_cols_per_s": m["numpy_port_cols_per_s"],
                "measured_xla_cpu_f64_cols_per_s": m["xla_cpu_f64_cols_per_s"],
                "provenance": "tools/measure_baseline.py (single-core host)",
            }
            # measured-denominator multiplier alongside the estimate-
            # denominated headline: our cols/s vs the REAL single-core
            # XLA-CPU f64 rate measured on this host (VERDICT r2 weak #2)
            record["vs_measured_xla_cpu_f64"] = round(
                cols_per_s / m["xla_cpu_f64_cols_per_s"], 1
            )
        except Exception as e:
            # provenance is best-effort, but never drop it silently
            print(f"bench.py: BASELINE_MEASURED.json unreadable ({e!r}); "
                  "omitting 'baseline' provenance field", file=sys.stderr)
    print(json.dumps(record))


def _bench_chunked(variant, repeats, fell_back=False, fallback_cause=None):
    """>HBM streaming benchmark: CLOUDSC2_BENCH_VARIANT=chunked (NL) or
    chunked_tlad, streaming CLOUDSC2_BENCH_NGPTOT (default 1M+) columns
    as device-generated chunks over the device mesh (run_chunked's
    per-device block generation + psum checksum; single-device when the
    platform exposes one chip).  The chunk pipeline chains through a
    device accumulator, one host fetch per pass."""
    import jax

    from cloudsc2jax import dist
    from cloudsc2jax.drivers import run_chunked
    from cloudsc2jax.state import Cloudsc2State

    platform = jax.devices()[0].platform
    inner = "tlad" if variant.endswith("tlad") else "nl"
    default_n = 1310720 if platform == "tpu" else 2048
    ngptot = int(os.environ.get("CLOUDSC2_BENCH_NGPTOT", default_n))
    # run_chunked rounds the column count UP to whole chunks — an
    # unclamped 327k default chunk on the CPU fallback would execute
    # 160x the intended work in interpret mode (hours on one core)
    default_chunk = 327680 if platform == "tpu" else min(327680, ngptot)
    chunk = int(os.environ.get("CLOUDSC2_BENCH_CHUNK", default_chunk))
    interpret = platform != "tpu"
    sublanes = os.environ.get("CLOUDSC2_BENCH_SUBLANES")
    sublanes = int(sublanes) if sublanes else (1 if interpret else None)
    mesh = (dist.column_mesh()
            if os.environ.get("CLOUDSC2_BENCH_MESH", "1") == "1" else None)

    state = Cloudsc2State.synthetic(ngptot=100, nlev=137 if not interpret
                                    else 17)
    kw = dict(variant=inner, chunk=chunk, sublanes=sublanes,
              interpret=interpret, mesh=mesh)
    # warm pass compiles the (generation+kernel+psum) step
    cols, s = run_chunked(state, ngptot, **kw)
    assert np.isfinite(s)
    t0 = time.perf_counter()
    for _ in range(repeats):
        cols, s = run_chunked(state, ngptot, **kw)
        assert np.isfinite(s)
    dt = (time.perf_counter() - t0) / repeats

    ndev = 1 if mesh is None else int(mesh.devices.size)
    cols_per_s = cols / dt
    baseline = BASELINE_COLS_PER_S
    print(json.dumps({
        "metric": f"{inner}_columns_per_second_chunked_{platform}",
        # per-chip so vs_baseline stays chip-denominated when the chunk
        # pipeline shards over a mesh; the mesh aggregate rides along
        "value": round(cols_per_s / ndev, 1),
        "unit": "columns/s/chip",
        "vs_baseline": round(cols_per_s / ndev / baseline, 3),
        "mesh_columns_per_second": round(cols_per_s, 1),
        "ngptot": cols,
        "chunk": chunk,
        "mesh_devices": ndev,
        "platform": platform,
        **({"note": f"CPU fallback ({fallback_cause} at bench time)"}
           if fell_back else
           {} if platform == "tpu" else
           {"note": "deliberate non-TPU run (JAX_PLATFORMS set)"}),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception:
        import traceback

        if os.environ.get("CLOUDSC2_BENCH_RETRY") == "1":
            raise
        # rare transient first-contact errors on this platform (e.g.
        # FAILED_PRECONDITION: TPU backend error through the tunnel)
        # poison the in-process backend: retry ONCE in a fresh process.
        traceback.print_exc()
        print("bench.py: retrying once in a fresh process", file=sys.stderr)
        os.environ["CLOUDSC2_BENCH_RETRY"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)
