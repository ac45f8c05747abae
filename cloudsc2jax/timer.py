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
    # True when the wall time was copied from lane 0 rather than
    # measured on this lane (single-controller SPMD approximation) —
    # such rows are labelled in the printed table
    mirrored: bool = False
    # True when the clock came from the per-device diagnostic re-run
    # (measure_device_lanes) — a genuine per-lane measurement
    measured_lane: bool = False


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
        """Copy lane 0's closed wall time to the other device lanes.

        Under single-controller jit all devices execute the one program
        in lockstep, so lane 0's host-side wall clock is the best
        available per-device estimate — but it is NOT a per-device
        measurement (the reference's rows are genuine per-thread clocks,
        timer_mod.F90:56-112), so the copied rows are flagged and
        printed with a ``mirror`` label."""
        t = self._lanes[0].t_total
        for d in range(1, num_lanes):
            lane = self._lanes.setdefault(d, _Lane(lane_id=d, core_id=d))
            lane.t_total = t
            lane.mirrored = True

    def measure_device_lanes(self, step_fn, inputs, repeats: int = 2,
                             calls_equivalent: int = 1):
        """Replace the mirrored device-lane clocks with MEASURED ones.

        Under single-controller jit the SPMD run gives one host-side wall
        clock (``mirror_times``); the reference instead prints a genuine
        clock per execution lane (timer_mod.F90:56-112).  This diagnostic
        recovers that: each device's addressable shard of ``inputs`` is
        run through single-device ``step_fn`` ON ITS OWN DEVICE,
        sequentially, each timed with its own host clock — per-lane
        clocks for per-lane shares, exposing a slow/degraded chip that
        the lockstep SPMD number averages away.  It is a re-run of each
        share (cheap: one share is 1/ndev of the work), not a
        decomposition of the SPMD time; rows print ``(measured)``.

        ``inputs`` must be sharded arrays whose per-device shards are
        valid single-device inputs for ``step_fn`` (the column/block
        shardings used by the CLI are).  In a multi-process run each
        process measures its own LOCAL devices (``addressable_shards``
        yields only those) and the measured flag rides through the
        ``_gather_records`` collective, so the gathered perf table
        prints genuine per-lane clocks on every rank — matching the
        reference's per-thread semantics (timer_mod.F90:114-174).

        ``calls_equivalent`` is the number of executions the lane's
        logged column count represents (the CLI's ``--repeat``): the
        measured per-execution time is scaled by it so the printed
        col/s and MFlop/s stay consistent with the lane's columns.
        """
        import jax

        devices = sorted(
            {s.device for x in jax.tree.leaves(inputs)
             for s in x.addressable_shards},
            key=lambda d: d.id,
        )
        for lane_id, dev in enumerate(devices):
            local = jax.tree.map(
                lambda x: next(s.data for s in x.addressable_shards
                               if s.device == dev),
                inputs,
            )
            jax.block_until_ready(step_fn(local))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(repeats):
                jax.block_until_ready(step_fn(local))
            t = (time.perf_counter() - t0) / repeats
            lane = self._lanes.setdefault(
                lane_id, _Lane(lane_id=lane_id, core_id=dev.id)
            )
            lane.t_total = t * max(calls_equivalent, 1)
            lane.core_id = dev.id
            lane.mirrored = False
            lane.measured_lane = True

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
        self, nproma: int, ngpblks: int, ngptot: int, zhpm: float = ZHPM,
        file=None, gather: bool = False,
    ):
        """Print the perf table; ``gather=True`` in a multi-process run
        gathers every process's records to process 0 and prints per-rank
        rows + per-rank totals + a grand total, replacing the reference's
        MPI_GATHER of 5-int records (timer_mod.F90:124-171)."""
        file = file or sys.stderr
        if gather:
            import jax

            if jax.process_count() > 1:
                return self._print_gathered(nproma, ngpblks, ngptot, zhpm, file)
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
            tag = ("  (measured)" if lane.measured_lane
                   else "  (mirror)" if lane.mirrored else "")
            print(
                f"{lane.lane_id:>12} {ngptot:>10} {lane.columns:>10} {blks:>8}"
                f" {nproma:>8} {1e3*t:>12.1f} {mflops:>12.0f}"
                f" {lane.columns/t:>14.0f}{tag}",
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

    def _gather_records(self, zhpm: float):
        """All-gather each process's per-lane records + rank summary
        (≙ the ISENDBUF/IRECVBUF exchange, timer_mod.F90:128-155).

        Every process must call this (it is a collective).  Records are
        float64 rows [lane_id, core_id, columns, calls, t_ms, mflops,
        mirrored, measured]; the trailing summary row is
        [-1, rank, total_columns, total_calls, elapsed_ms, mflops, 0, 0].
        Lane counts are padded to the max across processes so the
        allgather shapes agree."""
        import jax
        import numpy as np
        from jax.experimental import multihost_utils

        lanes = sorted(self._lanes.values(), key=lambda l: l.lane_id)
        nlmax = int(
            multihost_utils.process_allgather(np.array(len(lanes))).max()
        )
        buf = np.zeros((nlmax + 1, 8))
        for i, lane in enumerate(lanes):
            t = max(lane.t_total, 1e-12)
            buf[i] = [
                lane.lane_id, lane.core_id, lane.columns, lane.calls,
                1e3 * t, 1.0e-6 * zhpm * (lane.columns / 100.0) / t,
                float(lane.mirrored), float(lane.measured_lane),
            ]
        elapsed = max(self.elapsed, 1e-12)
        cols = sum(l.columns for l in lanes)
        buf[nlmax] = [
            -1, jax.process_index(), cols, sum(l.calls for l in lanes),
            1e3 * elapsed, 1.0e-6 * zhpm * (cols / 100.0) / elapsed, 0.0,
            0.0,
        ]
        return multihost_utils.process_allgather(buf)  # (nproc, nlmax+1, 8)

    def _print_gathered(self, nproma, ngpblks, ngptot, zhpm, file):
        """Rank-0 printing of the gathered records: per-rank lane rows,
        per-rank TOTAL rows, grand total (timer_mod.F90:157-171)."""
        import jax

        rec = self._gather_records(zhpm)
        if jax.process_index() != 0:
            # collective done; only rank 0 prints (≙ IRANK==0 guard)
            summ = rec[jax.process_index(), -1]
            return summ[2] / (summ[4] * 1e-3)
        nproc = rec.shape[0]
        print(
            f"{'rank:lane':>12} {'NGPTOT':>10} {'#GP-cols':>10} {'#calls':>8}"
            f" {'NPROMA':>8} {'time(msec)':>12} {'MFlops/s':>12} {'col/s':>14}",
            file=file,
        )
        tot_cols = 0
        tot_mflops = 0.0
        tmax = 0.0
        for r in range(nproc):
            for row in rec[r, :-1]:
                if row[3] == 0 and row[2] == 0:
                    continue  # padding lane
                t = max(row[4] * 1e-3, 1e-12)
                tag = ("  (measured)" if row[7]
                       else "  (mirror)" if row[6] else "")
                print(
                    f"{f'{r}:{int(row[0])}':>12} {ngptot:>10} {int(row[2]):>10}"
                    f" {int(row[3]):>8} {nproma:>8} {row[4]:>12.1f}"
                    f" {row[5]:>12.0f} {row[2]/t:>14.0f}{tag}",
                    file=file,
                )
            summ = rec[r, -1]
            t = max(summ[4] * 1e-3, 1e-12)
            print(
                f"{f'rank{r}':>12} {ngptot:>10} {int(summ[2]):>10}"
                f" {int(summ[3]):>8} {nproma:>8} {summ[4]:>12.1f}"
                f" {summ[5]:>12.0f} {summ[2]/t:>14.0f}  TOTAL @ rank#{r}",
                file=file,
            )
            tot_cols += int(summ[2])
            tot_mflops += summ[5]
            tmax = max(tmax, t)
        print(
            f"{f'{nproc}proc':>12} {ngptot:>10} {tot_cols:>10} {ngpblks:>8}"
            f" {nproma:>8} {1e3*tmax:>12.1f} {tot_mflops:>12.0f}"
            f" {tot_cols/tmax:>14.0f}  TOTAL",
            file=file,
        )
        return tot_cols / tmax
