"""Performance accounting and energy monitoring.

Re-design of ``src/common/module/timer_mod.F90`` (PERFORMANCE_TIMER) and
``ec_pmon_mod.F90``:

* the reference's per-OpenMP-thread wall clocks and core ids become
  per-device timings (device id replaces core id; the C ``mycpu.c`` shim is
  provided natively in :mod:`cloudsc2jax.native` for host-side thread
  reporting parity);
* MFlop/s is reported against the same nominal flop count
  ZHPM = 3 996 006 flops per 100 columns (cloudsc_driver_mod.F90:58) so
  numbers are directly comparable with the reference's self-reported
  metric (timer_mod.F90:128-171);
* the energy monitor reads Linux powercap/hwmon counters (the reference
  reads Cray pm_counters, ec_pmon_mod.F90:14-56) when ``EC_PMON=1``.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Dict, List, Optional

__all__ = ["ZHPM", "PerformanceTimer", "energy_probe"]

# Nominal flops per 100 columns (reference model constant).
ZHPM = 3996006.0


def _read_first(path):
    try:
        with open(path) as f:
            return f.read().strip()
    except OSError:
        return None


def energy_probe() -> Optional[Dict[str, float]]:
    """Best-effort energy/power counters when EC_PMON=1.

    The reference reads /sys/cray/pm_counters/{energy,power}
    (ec_pmon_mod.F90:14-56); on generic Linux we fall back to RAPL
    powercap. Returns None when unavailable or not requested.
    """
    if os.environ.get("EC_PMON") != "1":
        return None
    try:  # native probe first (≙ mycpu.c-style C shim; same counters)
        from .native import hostinfo

        uj = hostinfo.energy_uj()
        if uj > 0:
            return {"energy_j": uj * 1e-6, "power_w": float("nan")}
    except Exception:
        pass
    cray_e = _read_first("/sys/cray/pm_counters/energy")
    cray_p = _read_first("/sys/cray/pm_counters/power")
    if cray_e is not None:
        return {
            "energy_j": float(cray_e.split()[0]),
            "power_w": float(cray_p.split()[0]) if cray_p else float("nan"),
        }
    rapl = _read_first("/sys/class/powercap/intel-rapl:0/energy_uj")
    if rapl is not None:
        return {"energy_j": float(rapl) * 1e-6, "power_w": float("nan")}
    return None


@dataclasses.dataclass
class _Lane:
    """One execution lane (device or host thread)."""

    lane_id: int
    core_id: int = -1
    t_start: float = 0.0
    t_total: float = 0.0
    calls: int = 0
    columns: int = 0


class PerformanceTimer:
    """Global + per-lane wall clocks with columns/s and MFlop/s reporting."""

    def __init__(self):
        self._lanes: Dict[int, _Lane] = {}
        self._t0 = None
        self._t1 = None
        self._energy0 = energy_probe()

    # -- lifecycle (timer_mod.F90:56-112)
    def start(self, num_lanes: int = 1):
        self._t0 = time.perf_counter()
        for i in range(num_lanes):
            self._lanes.setdefault(i, _Lane(lane_id=i))

    def thread_start(self, lane_id: int, core_id: int = -1):
        lane = self._lanes.setdefault(lane_id, _Lane(lane_id=lane_id))
        if core_id < 0:
            try:
                from .native import hostinfo

                core_id = hostinfo.sched_getcpu()
            except Exception:
                core_id = -1
        lane.core_id = core_id
        lane.t_start = time.perf_counter()

    def thread_log(self, lane_id: int, columns: int):
        lane = self._lanes[lane_id]
        lane.calls += 1
        lane.columns += columns

    def thread_end(self, lane_id: int):
        lane = self._lanes[lane_id]
        lane.t_total += time.perf_counter() - lane.t_start

    # -- SPMD accounting: under single-controller jit all devices execute
    # the same program in lockstep, so one timed region on the host is
    # one region on every device lane (≙ the per-thread rows of
    # timer_mod.F90:124-171, with devices as lanes)
    def spmd_log(self, num_lanes: int, columns: int):
        """Attribute one SPMD execution across ``num_lanes`` device lanes;
        columns split evenly, remainder to lane 0."""
        per = columns // max(num_lanes, 1)
        rem = columns - per * num_lanes
        for d in range(num_lanes):
            lane = self._lanes.setdefault(d, _Lane(lane_id=d, core_id=d))
            lane.calls += 1
            lane.columns += per + (rem if d == 0 else 0)

    def mirror_times(self, num_lanes: int):
        """Copy lane 0's closed wall time to the other device lanes."""
        t = self._lanes[0].t_total
        for d in range(1, num_lanes):
            self._lanes.setdefault(d, _Lane(lane_id=d, core_id=d)).t_total = t

    def end(self):
        self._t1 = time.perf_counter()

    @property
    def elapsed(self) -> float:
        if self._t0 is None:
            return 0.0
        t1 = self._t1 if self._t1 is not None else time.perf_counter()
        return t1 - self._t0

    # -- reporting (timer_mod.F90:114-174)
    def print_performance(
        self, nproma: int, ngpblks: int, ngptot: int, zhpm: float = ZHPM, file=None
    ):
        file = file or sys.stderr
        print(
            f"{'NUMOMP(dev)':>12} {'NGPTOT':>10} {'#GP-cols':>10} {'#BLKS':>8}"
            f" {'NPROMA':>8} {'time(msec)':>12} {'MFlops/s':>12} {'col/s':>14}",
            file=file,
        )
        rows: List[_Lane] = sorted(self._lanes.values(), key=lambda l: l.lane_id)
        for lane in rows:
            t = max(lane.t_total, 1e-12)
            mflops = 1.0e-6 * zhpm * (lane.columns / 100.0) / t
            # per-lane block count, like the reference's per-thread rows
            # (timer_mod.F90:124-148)
            blks = -(-lane.columns // max(nproma, 1))
            print(
                f"{lane.lane_id:>12} {ngptot:>10} {lane.columns:>10} {blks:>8}"
                f" {nproma:>8} {1e3*t:>12.1f} {mflops:>12.0f} {lane.columns/t:>14.0f}",
                file=file,
            )
        t = max(self.elapsed, 1e-12)
        cols = sum(l.columns for l in rows) or ngptot
        mflops = 1.0e-6 * zhpm * (cols / 100.0) / t
        print(
            f"{'total':>12} {ngptot:>10} {cols:>10} {ngpblks:>8}"
            f" {nproma:>8} {1e3*t:>12.1f} {mflops:>12.0f} {cols/t:>14.0f}",
            file=file,
        )
        e1 = energy_probe()
        if self._energy0 is not None and e1 is not None:
            de = e1["energy_j"] - self._energy0["energy_j"]
            print(f"EC_PMON: energy={de:.1f} J over {t:.3f}s", file=file)
        return cols / t
