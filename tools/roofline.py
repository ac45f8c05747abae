#!/usr/bin/env python
"""Roofline model for the CLOUDSC2 kernels on TPU.

Computes the per-column byte/flop/transcendental budget of the fused NL
kernel and turns a measured runtime into attained fractions of the HBM
and VPU ceilings — the quantitative version of BASELINE.md's
">=80% roofline" target.

The kernel's cost model (per column, per level, f32):
  - HBM reads: 14 level fields + paph twice (+ plu shifted, same buffer)
  - HBM writes: 8 outputs
  - ~292 "nominal" flops (the reference's own ZHPM accounting,
    cloudsc_driver_mod.F90:58) plus ~10 transcendentals (exp/tanh/sqrt
    /pow, SURVEY §3.5)

Chip numbers default to TPU v5e; override with flags for other parts.
"""

import argparse
import json

NLEV = 137

# streams in/out of the fused kernel (see pallas/cloudsc2_kernel.py);
# plu(k+1) reads the same HBM buffer as plu but is a separate DMA stream
READS_PER_LEVEL = 14 + 3
WRITES_PER_LEVEL = 8
TRANSC_PER_LEVEL = 10
FLOPS_PER_LEVEL = 292  # ZHPM / (100 cols * 137 levels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ngptot", type=int, default=163840)
    ap.add_argument("--ms", type=float, required=True, help="measured kernel ms")
    ap.add_argument("--dtype-bytes", type=int, default=4)
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="v5e nominal HBM BW; the practical ceiling is a "
                         "function of per-call traffic — measure it with "
                         "tools/bw_probe.py at the kernel's traffic size "
                         "(t ~ 1.9ms + bytes/620 GB/s on this chip, "
                         "ROOFLINE.md) and pass that attained_gbps here "
                         "for the fraction of the practical roofline")
    ap.add_argument("--vpu-gops", type=float, default=3900.0,
                    help="VPU lane-ops/s upper bound (8x128 lanes x ~0.94GHz x 4 ALUs)")
    ap.add_argument("--transc-cycles", type=float, default=8.0,
                    help="amortised VPU cycles per transcendental lane-op")
    args = ap.parse_args()

    cols = args.ngptot
    bytes_total = (
        (READS_PER_LEVEL + WRITES_PER_LEVEL) * NLEV * cols * args.dtype_bytes
    )
    flops_total = FLOPS_PER_LEVEL * NLEV * cols
    transc_total = TRANSC_PER_LEVEL * NLEV * cols

    t = args.ms * 1e-3
    bw = bytes_total / t
    hbm_time = bytes_total / (args.hbm_gbps * 1e9)
    lanes_per_s = args.vpu_gops * 1e9
    compute_time = (
        flops_total / lanes_per_s
        + transc_total * args.transc_cycles / lanes_per_s
    )
    ceiling = max(hbm_time, compute_time)

    print(
        json.dumps(
            {
                "measured_ms": args.ms,
                "cols_per_s": round(cols / t, 1),
                "hbm_traffic_gb": round(bytes_total / 1e9, 3),
                "attained_gbps": round(bw / 1e9, 1),
                "hbm_floor_ms": round(hbm_time * 1e3, 3),
                "compute_floor_ms": round(compute_time * 1e3, 3),
                "bound": "memory" if hbm_time > compute_time else "compute",
                "roofline_fraction": round(ceiling / t, 3),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
