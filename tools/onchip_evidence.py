#!/usr/bin/env python
"""Outage-proof on-chip evidence harness (VERDICT r3 item 2).

Round 3 built a full battery of chip-dependent deliverables and the
axon tunnel was down at the driver's single bench moment — the round
produced zero on-chip evidence.  This harness decouples evidence
capture from that moment: run it whenever the chip answers (early,
mid-round, opportunistically); it

1. preflights cheaply in a subprocess (a downed tunnel hangs backend
   init unrecoverably — bench.py:_tpu_preflight semantics), with a few
   retries + backoff;
2. runs the full battery as independent subprocess steps, each with its
   own timeout and one retry (transient FAILED_PRECONDITION /
   first-compile slowness are real on this platform);
3. checkpoints ``ONCHIP_r<N>.json`` after EVERY step (atomic replace),
   so a mid-battery outage preserves partial evidence and a re-run
   tops up only what is missing (``--resume``).

Battery (see --list): headline bench NL / tlad (emits f32_verdicts) /
tlad-noprim, the TL/AD scheduling+encoding A/B (tools/kernel_ab.py),
the streaming-ceiling probes incl. the window-matched TL/reverse mixes
and a cross-validation config proving the e60f36e index-map fix on real
Mosaic (a 2r+1w window probe must match the plain XLA 3-stream rate at
the same traffic — DMA elision would inflate it), the
CLOUDSC2_TPU_TESTS-gated parity/drift test files, the CLI tlad/nl
verification runs (post-refactor on-chip revalidation), and the
mesh-chunked >HBM streaming bench at 1.3M columns.

Usage:
    python tools/onchip_evidence.py            # preflight, run all
    python tools/onchip_evidence.py --steps bench_nl,bench_tlad
    python tools/onchip_evidence.py --resume   # only steps not yet ok
    python tools/onchip_evidence.py --list
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable


def _round_number():
    env = os.environ.get("CLOUDSC2_ROUND")
    if env:
        return int(env)
    rounds = [
        int(m.group(1))
        for f in os.listdir(HERE)
        for m in [re.match(r"BENCH_r(\d+)\.json$", f)]
        if m
    ]
    # the driver writes BENCH_r{N} at round END — while round N runs,
    # the latest file on disk is N-1's
    return (max(rounds) + 1) if rounds else 1


def _preflight(timeout_s=90, attempts=3, backoff=60):
    """'ok' | 'timeout' | 'no-tpu-backend' | 'crash' — bench.py's probe
    (one subprocess per attempt; the tunnel hang is uninterruptible
    in-process) wrapped in a retry/backoff loop."""
    sys.path.insert(0, HERE)
    from bench import _tpu_preflight

    outcome = "crash"
    for i in range(attempts):
        outcome = _tpu_preflight(timeout_s)
        if outcome == "ok":
            return outcome
        if i + 1 < attempts:
            time.sleep(backoff)
    return outcome


# ---------------------------------------------------------------- steps
# Each: name -> (argv, env-overrides, timeout_s, kind)
# kind: "json" (parse last stdout JSON line), "json_lines" (parse every
# JSON-looking stdout line), "text" (record rc + output tails).
# Timeouts allow for first-compile through the AOT tunnel (3-8 min per
# new Mosaic program; the persistent .jax_cache makes re-runs fast).

def _steps():
    # round-5 A/B focus: the in-kernel shift-scatter reverse schedule
    # (now the default) vs the round-2..4 XLA-assembly convention
    # (xscat*), on both the noprim headline contract and the
    # primal-emitting unit; noprim:128 re-checks the sublane choice
    # under the new write mix
    ab_cfgs = ["noprim:64", "xscatnp:64", "two:64", "xscat:64",
               "noprim:128"]
    return {
        # -- headline bench records (the round's chip numbers) ----------
        "bench_nl": (
            [PY, "bench.py"],
            {"CLOUDSC2_BENCH_VARIANT": "nl",
             "CLOUDSC2_BENCH_PREFLIGHT_TIMEOUT": "120"},
            1500, "json"),
        "bench_tlad": (
            [PY, "bench.py"],
            # write_primal pinned EXPLICITLY: bench.py's on-TPU default
            # flipped to the noprim contract in round 4 — without the pin
            # this step and bench_tlad_noprim would measure the same
            # workload twice and noprim_speedup_vs_tlad would degenerate
            # to ~1.0 (ADVICE r4)
            {"CLOUDSC2_BENCH_VARIANT": "tlad",
             "CLOUDSC2_BENCH_WRITE_PRIMAL": "1",
             "CLOUDSC2_BENCH_PREFLIGHT_TIMEOUT": "120"},
            1800, "json"),
        # the reference AD-driver contract (δy/x̄ only): candidate tlad
        # headline (VERDICT r3 item 3)
        "bench_tlad_noprim": (
            [PY, "bench.py"],
            {"CLOUDSC2_BENCH_VARIANT": "tlad",
             "CLOUDSC2_BENCH_WRITE_PRIMAL": "0",
             "CLOUDSC2_BENCH_F32_CHECKS": "0",
             "CLOUDSC2_BENCH_PREFLIGHT_TIMEOUT": "120"},
            1500, "json"),
        # -- scheduling / encoding A/B (VERDICT r3 item 1b, 3) ----------
        "kernel_ab": (
            [PY, "tools/kernel_ab.py"] + ab_cfgs,
            {}, 3600, "json"),
        # -- streaming ceilings (VERDICT r3 item 1c + weak 3) -----------
        "probe_stream": (  # plain XLA 3-stream, the known-bandwidth ref
            [PY, "tools/bw_probe.py"],
            {"CLOUDSC2_BW_PROBE_MB": "256"}, 900, "json"),
        "probe_xval": (   # 2r+1w window probe at ~the same traffic; if
                          # the index-map fix is wrong, Mosaic elides
                          # repeated DMAs and this number inflates past
                          # probe_stream's — the on-Mosaic validation of
                          # commit e60f36e
            [PY, "tools/bw_probe.py"],
            {"CLOUDSC2_BW_PROBE_WINDOWS": "2x1",
             "CLOUDSC2_BW_PROBE_NB": "60"}, 900, "json"),
        "probe_tl": (     # TL sweep mix: 17 read + 19 write windows
            [PY, "tools/bw_probe.py"],
            {"CLOUDSC2_BW_PROBE_WINDOWS": "17x19",
             "CLOUDSC2_BW_PROBE_NB": "20"}, 900, "json"),
        "probe_rev": (    # reverse-adjoint mix: 28r+18w, reversed grid
            [PY, "tools/bw_probe.py"],
            {"CLOUDSC2_BW_PROBE_WINDOWS": "28x18",
             "CLOUDSC2_BW_PROBE_NB": "20",
             "CLOUDSC2_BW_PROBE_REV": "1"}, 900, "json"),
        # compute-weighted ceilings (VERDICT r4 item 3): same DMA mixes
        # with the physics kernels' arithmetic density — TL ≈ 2x the NL
        # body (primal+tangent), reverse adjoint ≈ 3x (recompute +
        # transpose) — so the TLAD %-of-ceiling verdict is measured
        # against a probe that pays the recompute density too
        "probe_tl_compute": (
            [PY, "tools/bw_probe.py"],
            {"CLOUDSC2_BW_PROBE_WINDOWS": "17x19",
             "CLOUDSC2_BW_PROBE_NB": "20",
             "CLOUDSC2_BW_PROBE_COMPUTE": "20,584"}, 900, "json"),
        "probe_rev_compute": (
            [PY, "tools/bw_probe.py"],
            {"CLOUDSC2_BW_PROBE_WINDOWS": "28x18",
             "CLOUDSC2_BW_PROBE_NB": "20",
             "CLOUDSC2_BW_PROBE_REV": "1",
             "CLOUDSC2_BW_PROBE_COMPUTE": "30,876"}, 900, "json"),
        # -- gated on-chip test files (VERDICT r3 item 1d, 6) -----------
        "tpu_tests": (
            [PY, "-m", "pytest", "tests/test_tpu_kernel_variants.py",
             "tests/test_tpu_f64_drift.py", "-q", "--no-header"],
            {"CLOUDSC2_TPU_TESTS": "1"}, 5400, "text"),
        # -- CLI end-to-end revalidation on chip (VERDICT r3 item 7) ----
        "cli_tlad": (
            [PY, "-m", "cloudsc2jax", "tlad", "1", "163840", "128",
             "--dtype", "f32", "--pallas"],
            {}, 1200, "text"),
        # f32 validation budget is 1e4 working-precision epsilons
        # (1.19e-3; the -DSINGLE analogue, DESIGN.md §8) — the default
        # 10-epsilon threshold is the f64 validation-precision gate
        "cli_nl": (
            [PY, "-m", "cloudsc2jax", "nl", "1", "163840", "128",
             "--dtype", "f32", "--pallas", "--threshold", "10000"],
            {}, 1200, "text"),
        # -- mesh-chunked >HBM streaming at 1.3M cols (item 8) ----------
        "bench_chunked_tlad": (
            [PY, "bench.py"],
            {"CLOUDSC2_BENCH_VARIANT": "chunked_tlad",
             "CLOUDSC2_BENCH_NGPTOT": "1310720",
             "CLOUDSC2_BENCH_PREFLIGHT_TIMEOUT": "120"},
            2400, "json"),
    }


def _parse_json_lines(text):
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                out.append(json.loads(line))
            except ValueError:
                pass
    return out


def _run_step(name, argv, env_over, timeout_s, kind, retries=1):
    env = dict(os.environ)
    env.update(env_over)
    rec = {"name": name, "argv": argv[1:], "env": env_over,
           "attempts": 0, "ok": False}
    for attempt in range(retries + 1):
        rec["attempts"] = attempt + 1
        t0 = time.time()
        try:
            r = subprocess.run(argv, env=env, cwd=HERE, timeout=timeout_s,
                               capture_output=True, text=True)
            rc, out, err = r.returncode, r.stdout, r.stderr
        except subprocess.TimeoutExpired as e:
            rc = -1
            out = (e.stdout or b"").decode() if isinstance(
                e.stdout, bytes) else (e.stdout or "")
            err = f"TIMEOUT after {timeout_s}s"
        except Exception as e:
            rc, out, err = -2, "", f"harness error: {e!r}"
        rec["seconds"] = round(time.time() - t0, 1)
        rec["rc"] = rc
        rec["stdout_tail"] = out[-4000:]
        rec["stderr_tail"] = err[-4000:]
        rec["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        jl = _parse_json_lines(out)
        if kind == "json" and jl:
            rec["record"] = jl[-1]
        elif kind == "json_lines" and jl:
            rec["records"] = jl
        # a record that self-reports a non-TPU platform is a CPU
        # fallback (bench.py / bw_probe.py stamp 'platform') — it must
        # NOT count as captured on-chip evidence, or --resume would
        # skip the step forever and the fallback number would publish
        # as the round's chip number
        on_chip = all(
            r.get("platform", "tpu") == "tpu"
            for r in (jl if kind in ("json", "json_lines") else [])
        )
        rec["ok"] = rc == 0 and (kind == "text" or bool(jl)) and on_chip
        if rc == 0 and jl and not on_chip:
            rec["not_ok_reason"] = "record self-reports non-TPU platform"
        if rec["ok"]:
            break
        print(f"  [{name}] attempt {attempt + 1} failed "
              f"(rc={rc}); {'retrying' if attempt < retries else 'giving up'}",
              file=sys.stderr)
    return rec


def _derive(results):
    """Cross-step verdicts computed from the captured records."""
    d = {}
    xs = results.get("probe_stream", {}).get("record")
    xv = results.get("probe_xval", {}).get("record")
    if xs and xv:
        # the window probe must attain <= the plain-stream rate (same
        # traffic, extra per-window issue cost); substantially MORE
        # would mean elided DMAs — the failure mode the e60f36e fix
        # addressed.  20% grace for tunnel run-to-run variance.
        ratio = xv["attained_gbps"] / max(xs["attained_gbps"], 1e-9)
        d["probe_xval_ratio_vs_stream"] = round(ratio, 3)
        d["probe_xval_ok"] = bool(ratio <= 1.20)
    for k in ("probe_tl", "probe_rev", "probe_tl_compute",
              "probe_rev_compute"):
        rec = results.get(k, {}).get("record")
        if rec:
            d[f"{k}_attained_gbps"] = rec["attained_gbps"]
    bt = results.get("bench_tlad", {}).get("record", {})
    if "f32_verdicts" in bt:
        d["f32_verdicts"] = bt["f32_verdicts"]
    bn = results.get("bench_nl", {}).get("record")
    if bn:
        d["headline_nl_cols_per_s"] = bn.get("value")
    np_ = results.get("bench_tlad_noprim", {}).get("record")
    if bt.get("value") and np_ and np_.get("value"):
        d["noprim_speedup_vs_tlad"] = round(np_["value"] / bt["value"], 3)
    # same-invocation A/B ratios (the only comparable ones, ±10% tunnel
    # variance across invocations): in-kernel shift-scatter (default)
    # vs the XLA-assembly convention, per contract
    ab = results.get("kernel_ab", {}).get("record", {}).get("configs", {})
    for new, old, label in (("noprim:64", "xscatnp:64", "noprim"),
                            ("two:64", "xscat:64", "two")):
        ms_new = ab.get(new, {}).get("ms")
        ms_old = ab.get(old, {}).get("ms")
        if ms_new and ms_old:
            d[f"ab_scatter_speedup_{label}"] = round(ms_old / ms_new, 3)
    return d


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="skip steps already ok in the existing record")
    ap.add_argument("--no-preflight", action="store_true")
    ap.add_argument("--retries", type=int, default=1)
    ap.add_argument("--out", default=None,
                    help="output path (default ONCHIP_r<N>.json)")
    args = ap.parse_args(argv)

    steps = _steps()
    if args.list:
        for k, (cmd, env, t, kind) in steps.items():
            print(f"{k:20s} timeout={t:5d}s  {' '.join(cmd[1:])}  {env}")
        return 0

    rnd = _round_number()
    out_path = args.out or os.path.join(HERE, f"ONCHIP_r{rnd:02d}.json")
    doc = {"round": rnd, "started": time.strftime("%Y-%m-%dT%H:%M:%S"),
           "results": {}, "derived": {}}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            doc["results"] = prev.get("results", {})
            doc["started"] = prev.get("started", doc["started"])
        except ValueError:
            pass

    def save():
        doc["derived"] = _derive(doc["results"])
        doc["updated"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
        os.replace(tmp, out_path)

    if not args.no_preflight:
        pf = _preflight()
        doc["preflight"] = pf
        if pf != "ok":
            print(f"preflight: {pf} — chip not reachable; nothing run",
                  file=sys.stderr)
            save()
            return 2
        print("preflight: ok — chip answers", file=sys.stderr)

    selected = (args.steps.split(",") if args.steps else list(steps))
    unknown = [s for s in selected if s not in steps]
    if unknown:
        ap.error(f"unknown steps: {unknown}; see --list")

    n_ok = 0
    for name in selected:
        if args.resume and doc["results"].get(name, {}).get("ok"):
            print(f"[{name}] already ok — skipped (--resume)",
                  file=sys.stderr)
            n_ok += 1
            continue
        cmd, env_over, timeout_s, kind = steps[name]
        print(f"[{name}] running ({' '.join(cmd[1:])}) ...", file=sys.stderr)
        rec = _run_step(name, cmd, env_over, timeout_s, kind,
                        retries=args.retries)
        doc["results"][name] = rec
        n_ok += rec["ok"]
        save()
        print(f"[{name}] {'ok' if rec['ok'] else 'FAILED'} "
              f"in {rec['seconds']}s", file=sys.stderr)

    save()
    print(json.dumps({"onchip_evidence": out_path,
                      "steps_ok": n_ok, "steps_run": len(selected),
                      "derived": doc["derived"]}))
    return 0 if n_ok == len(selected) else 1


if __name__ == "__main__":
    raise SystemExit(main())
