#!/bin/bash
# Round-4 roofline re-capture: traffic-stamped headline benches (the
# cost_analysis stamps landed AFTER the ONCHIP_r04 battery ran) plus
# matched fwd/rev window-probe pairs so kernel rows are judged against a
# ceiling paying the same window-issue cost at the same traffic
# (ROOFLINE.md rewrite; VERDICT r3 items 1e + 4).  Each step appends one
# labelled JSON line to $OUT — incremental, outage-proof.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-ONCHIP_r04_roofline.jsonl}

step() {
  local name="$1"; shift
  echo "== $name ==" >&2
  local line
  line=$(timeout 600 "$@" 2>>"$OUT.stderr" | tail -1)
  if [ -n "$line" ]; then
    printf '{"step": "%s", "record": %s}\n' "$name" "$line" >> "$OUT"
  else
    printf '{"step": "%s", "record": null}\n' "$name" >> "$OUT"
  fi
}

# headline benches, now with exact cost_analysis traffic stamps
CLOUDSC2_BENCH_VARIANT=nl step bench_nl python bench.py
CLOUDSC2_BENCH_VARIANT=tlad step bench_tlad python bench.py
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
