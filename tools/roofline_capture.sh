#!/bin/bash
# Round-4 roofline re-capture: traffic-stamped headline benches (the
# cost_analysis stamps landed AFTER the ONCHIP_r04 battery ran) plus
# matched fwd/rev window-probe pairs so kernel rows are judged against a
# ceiling paying the same window-issue cost at the same traffic
# (ROOFLINE.md rewrite; VERDICT r3 items 1e + 4).  Each step appends one
# labelled JSON line to $OUT — incremental, outage-proof.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-ONCHIP_r05_roofline.jsonl}

step() {
  local name="$1"; shift
  # generous per-step budget: bench.py's own preflight allows 420s and a
  # cold-cache first compile through the AOT tunnel takes minutes
  # (onchip_evidence.py budgets 1500-1800s; ADVICE r4) — override per
  # call with STEP_TIMEOUT
  local tmo="${STEP_TIMEOUT:-1800}"
  echo "== $name ==" >&2
  local line
  line=$(timeout "$tmo" "$@" 2>>"$OUT.stderr" | tail -1)
  # validate before appending: a trailing non-JSON stdout line (warning,
  # fallback note) must not corrupt the JSONL, and a CPU-fallback record
  # (platform != tpu) is not roofline evidence (ADVICE r4)
  local verdict
  verdict=$(printf '%s' "$line" | python -c '
import json, sys
try:
    r = json.loads(sys.stdin.read())
except ValueError:
    print("notjson"); raise SystemExit
print("ok" if r.get("platform", "tpu") == "tpu" else "nontpu")')
  if [ "$verdict" = "ok" ]; then
    printf '{"step": "%s", "record": %s}\n' "$name" "$line" >> "$OUT"
  else
    echo "== $name: record invalid ($verdict) — recording null ==" >&2
    printf '{"step": "%s", "record": null, "why": "%s"}\n' \
      "$name" "$verdict" >> "$OUT"
  fi
}

# headline benches, now with exact cost_analysis traffic stamps.
# write_primal pinned explicitly on the primal-emitting row: bench.py's
# on-TPU default flipped to noprim in round 4 (ADVICE r4)
CLOUDSC2_BENCH_VARIANT=nl step bench_nl python bench.py
CLOUDSC2_BENCH_VARIANT=tlad CLOUDSC2_BENCH_WRITE_PRIMAL=1 \
  step bench_tlad python bench.py
CLOUDSC2_BENCH_VARIANT=tlad CLOUDSC2_BENCH_WRITE_PRIMAL=0 \
  step bench_tlad_noprim python bench.py

# matched probe pairs: same window mix fwd vs rev isolates the cost of
# the adjoint's reverse-order DMA stream; nb=40 matches the 327k-column
# bench traffic, nb=20 the 163k A/B traffic.  Mixes: TL sweep
# 17r+19w=36 windows, reverse sweep 28r+18w=46, NL 20r+9w=29.
for nb in 20 40; do
  for mix in 17x19 28x18 20x9; do
    for rev in 0 1; do
      CLOUDSC2_BW_PROBE_WINDOWS=$mix CLOUDSC2_BW_PROBE_NB=$nb \
      CLOUDSC2_BW_PROBE_REV=$rev \
        step "probe_${mix}_nb${nb}_rev${rev}" python tools/bw_probe.py
    done
  done
done

# plain 3-stream probe at two sizes for the fixed-cost + marginal-rate fit
CLOUDSC2_BW_PROBE_MB=256 step probe_stream_256 python tools/bw_probe.py
CLOUDSC2_BW_PROBE_MB=1024 step probe_stream_1024 python tools/bw_probe.py

echo "done" >&2
