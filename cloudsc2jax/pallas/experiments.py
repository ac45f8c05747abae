"""Measured-negative kernel-schedule experiments, kept as recorded
evidence (DESIGN.md §8) — NOT wired into any driver.

The production schedules live in :mod:`.cloudsc2_kernel` (NL) and
:mod:`.tlad_kernel` (TL/AD two-kernel work unit); this module carries
the quantified alternatives that LOST (or tied) on v5e, so the hot
files hold only what runs in production while the experiments stay
buildable, tested (tests/test_pallas.py, tests/test_pallas_tlad.py,
tests/test_tpu_kernel_variants.py) and benchable (tools/kernel_ab.py,
tools/encoding_study.py):

* **int16 affine-encoded NL sweep** (:func:`cloudsc2_pallas_encoded`,
  with :func:`encode_blocked_inputs` / :class:`EncodedInputs`) — the
  storage-encoding study: halved stream bytes lose on the
  pipeline-latency-bound NL sweep (exact f32 5.56 ms vs 5.77–8.5 ms
  for every encoded variant at 163 840 columns).
* **single-kernel fused TL+AD** (:func:`cloudsc2_pallas_tlad_fused`) —
  VMEM-resident checkpoints+seeds delete 17% of the HBM bytes and lose
  18% (25.3 ms vs 21.4): dynamic per-level VMEM indexing defeats
  Mosaic's cross-step pipelining.
* **int16-encoded TL+AD work unit** (:func:`cloudsc2_pallas_tl_encoded`
  / :func:`cloudsc2_pallas_ad_encoded`) — the byte diet applied to the
  byte-heavy TL/AD mixes (VERDICT r2 item 2); A/B via
  ``tools/kernel_ab.py enc:<S> encnp:<S>``.

They reuse the production kernel bodies (``_stream_kernel`` /
``_tl_kernel`` / ``_rev_kernel`` accept ``encoded=`` operands), so the
physics stays single-sourced; only the wrappers/scheduling live here.
The ``chunk_levels`` grid-chunking experiment remains a parameter of
the production TL/AD kernels (it shares their operand plumbing —
extracting it would mean duplicating the kernels, not moving them).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import Params
from ..physics.cloudsc2 import Cloudsc2Inputs, _ZEPS1, _ZSCAL
from .cloudsc2_kernel import (
    Cloudsc2BlockedOutputs,
    N_LEVEL_FIELDS,
    N_OUTPUTS,
    _LEVEL_FIELDS,
    _Layout,
    _level_index_maps,
    _level_physics,
    _stream_kernel,
    _tropopause_eta_lm,
    _vmem_kw,
    enc_table_rows,
)
from .tlad_kernel import _NF, _rev_kernel, _tl_kernel

__all__ = [
    "EncodedInputs",
    "encode_blocked_inputs",
    "cloudsc2_pallas_encoded",
    "cloudsc2_pallas_tlad_fused",
    "cloudsc2_pallas_tl_encoded",
    "cloudsc2_pallas_ad_encoded",
]


# ----------------------------------------------------- encoded-input path
class EncodedInputs(NamedTuple):
    """Blocked kernel operands with int16 affine-encoded streams.

    Produced by :func:`encode_blocked_inputs`; consumed by
    :func:`cloudsc2_pallas_encoded`.  ``streams`` follows the kernel's
    operand order (level fields [pqs dropped when ``fuse_satur``], then
    plu, paph); ``enc`` is the ``(n_streams+1, nlev+1, 2)`` float32
    [scale, offset] table (one row per operand incl. the duplicated
    paph(k+1) read); ``ztrpaus``/``paphsfc`` are the per-column f32
    operands, precomputed before quantisation.
    """

    streams: tuple
    enc: jax.Array
    ztrpaus: jax.Array
    paphsfc: jax.Array

    @property
    def fuse_satur(self) -> bool:
        # inferred from the static stream count so EncodedInputs stays a
        # pure array pytree (jit-safe): level fields (pqs dropped when
        # fused) + plu + paph
        return len(self.streams) == N_LEVEL_FIELDS + 1


def encode_blocked_inputs(
    inputs: Cloudsc2Inputs,
    params: Params,
    *,
    keep_f32=("pq", "plu", "paph"),
    fuse_satur: bool = True,
    payload_dtype=jnp.int16,
) -> EncodedInputs:
    """Quantise blocked input streams to int16 per-(field, level) affine
    anomalies (DESIGN.md §8 storage-encoding study).

    For each stream and level, ``offset`` is the midrange and ``scale``
    the halfrange/32767 over all columns — i.e. temperature is stored as
    a 16-bit anomaly from a level-dependent reference profile, humidity
    as a level-scaled anomaly, etc.  Streams named in ``keep_f32`` stay
    float32; the default keeps pq (dominates the quantisation error at
    ~8e-5 in the sensitivity sweep; everything else contributes <=2e-5)
    plus plu and paph, whose f32 passthrough selects the measured-fastest
    single-decode-window kernel configuration (DESIGN.md §8).  Raw bf16/f16
    storage is NOT offered: measured NaN/overflow (f16 cannot even hold
    pressure) — see tools/encoding_study.py.

    The decode table and the tropopause/surface column operands are
    computed from the exact f32 inputs here, outside the hot loop.
    """
    arrs = inputs._asdict()
    nlev = arrs["pt"].shape[0]
    names = [n for n in _LEVEL_FIELDS if not (fuse_satur and n == "pqs")]
    order = names + ["plu", "paph"]

    enc = jnp.zeros((len(order) + 1, nlev + 1, 2), jnp.float32)
    enc = enc.at[:, :, 0].set(1.0)
    streams = []
    for i, name in enumerate(order):
        x = jnp.asarray(arrs[name], jnp.float32)
        if name in keep_f32:
            streams.append(x)
            continue
        lo = x.min(axis=(1, 2, 3))
        hi = x.max(axis=(1, 2, 3))
        off = 0.5 * (hi + lo)
        scale = jnp.maximum((hi - lo) / 65534.0, jnp.float32(1e-30))
        payload = jnp.clip(
            jnp.rint((x - off[:, None, None, None]) / scale[:, None, None, None]),
            -32767, 32767,
        )
        # int16 is the accuracy-bearing payload (uniform 16-bit anomaly);
        # bfloat16 payload is the convert-cost control experiment
        # (DESIGN.md §8 study): same bytes, cheap convert, 64x coarser
        q = payload.astype(payload_dtype)
        streams.append(q)
        enc = enc.at[i, : x.shape[0], 0].set(scale)
        enc = enc.at[i, : x.shape[0], 1].set(off)
    # the paph(k+1) operand re-reads the paph buffer: duplicate its row
    # at the extra trailing slot so in-kernel i == n_streams-1+1 maps
    enc = enc.at[len(order)].set(enc[len(order) - 1])

    ztp1 = (jnp.asarray(arrs["pt"], jnp.float32)
            + params.ptsphy * jnp.asarray(arrs["ten_t"], jnp.float32))
    ceta = jnp.asarray(params.ceta, jnp.float32)
    ztrpaus = _tropopause_eta_lm(ztp1, ceta)
    paphsfc = jnp.asarray(arrs["paph"], jnp.float32)[nlev]
    return EncodedInputs(
        streams=tuple(streams), enc=enc, ztrpaus=ztrpaus, paphsfc=paphsfc,
    )


def cloudsc2_pallas_encoded(
    enc_inputs: EncodedInputs,
    params: Params,
    *,
    ldrain1d: bool = False,
    interpret: bool = False,
) -> Cloudsc2BlockedOutputs:
    """Blocked NL sweep over int16 affine-encoded input streams.

    Identical schedule to ``cloudsc2_pallas(blocked=True)``; each int16
    stream moves HALF the HBM bytes and is decoded in-register
    (convert + FMA).  Accuracy vs the exact f32 path is bounded by the
    study in tools/encoding_study.py (~1e-4 max field error; on-chip
    validation budget is 1.19e-3).  Outputs are exact f32 streams.

    **Measured negative result (DESIGN.md §8, v5e round 2): NOT the
    default.**  The byte diet does not pay on this chip — the sweep is
    bound by per-grid-step pipeline latency, not stream bytes: exact f32
    5.56 ms; int16 (+3 decode windows) 6.02 ms; bf16 payload (same
    bytes, cheap convert) 6.00 ms; int16 with a single decode window
    5.77 ms; the all-f32 control through the same plumbing 6.57 ms
    (163 840 columns, chained-accumulator timing).  Kept in-tree as the
    measured experiment and for byte-bound hardware generations.
    """
    if not (bool(params.yrephli.lphylin) or ldrain1d):
        raise NotImplementedError(
            "cloudsc2_pallas_encoded implements the LPHYLIN=True "
            "configuration only"
        )
    fuse_satur = enc_inputs.fuse_satur
    streams = enc_inputs.streams
    nlev, nb, sublanes, _ = streams[0].shape
    dtype = jnp.float32

    ceta = jnp.asarray(params.ceta, dtype)
    zscalm = (_ZSCAL * jnp.maximum(ceta - 0.2, _ZEPS1) ** 0.2).astype(dtype)
    notlast = (jnp.arange(nlev) < nlev - 1).astype(jnp.int32)

    blk = (1, 1, sublanes, 128)
    lev, plu, hi = _level_index_maps(nlev, rev=False)
    mk = lambda im: pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
    col_s = pl.BlockSpec(
        (1, sublanes, 128), lambda b, k: (b, 0, 0), memory_space=pltpu.VMEM
    )
    smem_s = pl.BlockSpec(memory_space=pltpu.SMEM)

    n_names = len(streams) - 2  # level fields; then plu, paph
    nf = n_names + 3

    enc_lev = enc_table_rows(enc_inputs.enc, nlev)  # (nlev+1, 2*nf, 128)
    enclev_s = pl.BlockSpec(
        (1, 2 * nf, 128), lambda b, k: (k, 0, 0), memory_space=pltpu.VMEM
    )
    # when plu and paph stay f32 (the default: the window-count study in
    # DESIGN.md §8 — extra per-step windows cost more than halved bytes
    # save), only the one level-mapped decode window is fetched
    lev_only = (streams[-2].dtype == jnp.float32
                and streams[-1].dtype == jnp.float32)
    enc_ops, enc_specs = [enc_lev], [enclev_s]
    if not lev_only:
        enc_ops += [
            enc_lev[:, 2 * (nf - 3) : 2 * (nf - 3) + 2, :],
            enc_lev[:, 2 * (nf - 1) : 2 * (nf - 1) + 2, :],
        ]
        enc_specs += [
            pl.BlockSpec(
                (1, 2, 128), lambda b, k: (jnp.minimum(k + 1, nlev - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, 128), lambda b, k: (k + 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]

    in_specs = (
        [smem_s] * 3
        + enc_specs
        + [mk(lev)] * n_names
        + [mk(plu), mk(lev), mk(hi)]
        + [col_s] * 2
    )
    operands = (*enc_ops,
                *streams, streams[-1],  # paph twice: (k) and (k+1) reads
                enc_inputs.ztrpaus, enc_inputs.paphsfc)

    kernel = functools.partial(
        _stream_kernel, params=params, ldrain1d=ldrain1d,
        fuse_satur=fuse_satur, encoded="lev" if lev_only else "full",
    )
    out_shape = jax.ShapeDtypeStruct((nlev, nb, sublanes, 128), dtype)
    n_ops = len(streams) + 1
    # per-FETCH traffic: each operand window moves one block per grid
    # step (nb*nlev fetches), so paph's nlev+1 stored levels still cost
    # nlev*nb blocks per read site (it appears twice: k and k+1 maps);
    # the lane-broadcast decode windows add their ~19 KB/step DMA too
    in_bytes = sum(
        s.dtype.itemsize * nlev * nb * sublanes * 128 for s in streams
    ) + streams[-1].dtype.itemsize * nlev * nb * sublanes * 128
    in_bytes += sum(op.shape[1] for op in enc_ops) * 128 * 4 * nlev * nb
    cost = pl.CostEstimate(
        flops=(292 + 3 * n_ops) * nlev * nb * sublanes * 128,
        bytes_accessed=in_bytes + N_OUTPUTS * nlev * nb * sublanes * 128 * 4,
        transcendentals=(12 if fuse_satur else 10) * nlev * nb * sublanes * 128,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nb, nlev),
        in_specs=in_specs,
        out_specs=[mk(lev)] * N_OUTPUTS,
        out_shape=[out_shape] * N_OUTPUTS,
        scratch_shapes=[pltpu.VMEM((sublanes, 128), dtype)] * 3,
        cost_estimate=cost,
        interpret=interpret,
    )(
        ceta.reshape(nlev, 1), zscalm.reshape(nlev, 1),
        notlast.reshape(nlev, 1), *operands,
    )
    return Cloudsc2BlockedOutputs(*outs)


# ---------------------------------------------------------- fused TL+AD
def _fused_tlad_kernel(*refs, params: Params, ldrain1d: bool, lregcl: bool,
                       nlev: int, dscale: float, seed_scales):
    """ONE grid ``(nb, 2*nlev)``: steps ``k < nlev`` run the TL sweep
    ascending, steps ``k >= nlev`` the adjoint sweep descending — per
    column block, so the reverse phase starts right after its forward
    phase and every cross-phase quantity stays ON CHIP:

    * the 3 primal carry checkpoints live in ``(nlev, 3, S, 128)`` VMEM
      scratch (they never touch HBM — the two-kernel path streams them
      out and back, cloudsc2ad.F90's (KLON,KLEV) stores);
    * the 8 tangent output streams are ALSO kept resident in
      ``(nlev, 8, S, 128)`` scratch as they are produced, so the
      reverse phase reads its seeds from VMEM instead of re-fetching
      the dout streams from HBM (they still stream out once, the
      work-unit contract).

    Net vs the two-kernel work unit: 14 HBM stream-sweeps deleted
    (3 ckpt writes + 3 ckpt reads + 8 seed reads) with NO extra
    compute.  Requires ``vmem_limit_bytes`` ≳ 64 MB at S=64 (the two
    resident planes alone are 11*nlev*S*128*4 B ≈ 49 MB).

    **MEASURED NEGATIVE RESULT (v5e, round 2)** — kept as the recorded
    experiment, not wired into any driver.  164k cols, chained
    methodology, same-day two-kernel baseline 21.4-21.8 ms: this
    variant 25.3 ms at S=64; a first cut that instead REBUILT the
    tangent in the reverse phase with ``jax.linearize`` (no dout plane,
    +0.5 body evaluations) 25.5 ms, S=32 28.8 ms.  Deleting 17% of the
    HBM bytes LOSES 18%: the per-level dynamic VMEM scratch indexing
    (``ckpt_p[kk]``) defeats Mosaic's cross-step pipelining, the same
    mechanism that sank the round-1 resident-mode NL kernel.  On this
    compiler generation the revolving-window streaming schedule beats
    every VMEM-residency trade.  Numerically the fusion is exact: on
    chip (compiled, not interpret) the fused outputs match the
    two-kernel work unit to 0.0 max rel over every contract leaf — the
    pinned-window discipline holds under real Mosaic flush semantics.

    Output-window discipline: ``out``/``dout`` belong to the TL phase —
    during the reverse phase their index maps PIN to the last-written
    block (no index change → no writeback, the stale-flush trap);
    the 17 adjoint streams pin to block nlev-1 during the TL phase and
    are written descending by the reverse phase.  ``dpaphsfc``
    accumulates in its (b)-mapped window exactly as in ``_rev_kernel``.
    """
    ceta_ref, zscalm_ref, notlast_ref, *rest = refs
    lev_refs, rest = rest[:_NF], rest[_NF:]
    ztrpaus_ref, paphsfc_ref = rest[:2]
    rest = rest[2:]
    out_refs = rest[:2 * N_OUTPUTS]
    dout_refs = rest[2 * N_OUTPUTS : 2 * N_OUTPUTS + _NF]
    dpaphsfc_ref = rest[2 * N_OUTPUTS + _NF]
    scr = rest[2 * N_OUTPUTS + _NF + 1 :]
    (rfl_s, sfl_s, cov_s, drfl_s, dsfl_s, dcov_s,
     arfl_s, asfl_s, acov_s, ckpt_p, dout_vmem) = scr

    k = pl.program_id(1)
    tl_phase = k < nlev
    kk = jnp.where(tl_phase, k, 2 * nlev - 1 - k)

    @pl.when(k == 0)
    def _init_tl():
        for s in (rfl_s, sfl_s, cov_s, drfl_s, dsfl_s, dcov_s):
            s[...] = jnp.zeros_like(s)

    @pl.when(k == nlev)
    def _init_rev():
        for s in (arfl_s, asfl_s, acov_s):
            s[...] = jnp.zeros_like(s)
        dpaphsfc_ref[0] = jnp.zeros_like(dpaphsfc_ref[0])

    scalars = (ceta_ref[kk, 0], zscalm_ref[kk, 0], notlast_ref[kk, 0] > 0)
    fields = tuple(r[0, 0] for r in lev_refs)
    ztrpaus = ztrpaus_ref[0]
    cols = (ztrpaus, paphsfc_ref[0])
    dfields = tuple(dscale * x for x in fields)
    dcols = (jnp.zeros_like(ztrpaus), dscale * paphsfc_ref[0])

    def f(fl, co, ca):
        return _level_physics(params, ldrain1d, scalars, fl, co, ca,
                              lregcl=lregcl)

    @pl.when(tl_phase)
    def _tl():
        carry = (rfl_s[...], sfl_s[...], cov_s[...])
        dcarry = (drfl_s[...], dsfl_s[...], dcov_s[...])
        ckpt_p[kk] = jnp.stack(carry)
        (outs, newc), (douts, dnewc) = jax.jvp(
            f, (fields, cols, carry), (dfields, dcols, dcarry)
        )
        for r, v in zip(out_refs[:N_OUTPUTS], outs):
            r[0, 0] = v
        for r, v in zip(out_refs[N_OUTPUTS:], douts):
            r[0, 0] = v
        dout_vmem[kk] = jnp.stack(douts)
        rfl_s[...], sfl_s[...], cov_s[...] = newc
        drfl_s[...], dsfl_s[...], dcov_s[...] = dnewc

    @pl.when(jnp.logical_not(tl_phase))
    def _rev():
        carry_in = tuple(ckpt_p[kk])
        _, vjp_fn = jax.vjp(f, fields, cols, carry_in)
        douts = tuple(dout_vmem[kk])
        srfl, ssfl = seed_scales
        seeds = douts[:6] + (douts[6] * srfl, douts[7] * ssfl)
        dcarry = (arfl_s[...], asfl_s[...], acov_s[...])
        dflds, dcls, dcarry_in = vjp_fn((seeds, dcarry))
        for r, v in zip(dout_refs, dflds):
            r[0, 0] = v
        arfl_s[...], asfl_s[...], acov_s[...] = dcarry_in
        # d_ztrpaus is exactly zero through the stop-gradient masked max
        dpaphsfc_ref[0] = dpaphsfc_ref[0] + dcls[1]


def cloudsc2_pallas_tlad_fused(
    inputs: Cloudsc2Inputs,
    params: Params,
    *,
    lregcl: bool = True,
    ldrain1d: bool = False,
    sublanes: int = 64,
    dscale: float = 0.01,
    vmem_limit_bytes: int | None = 100 * 1024 * 1024,
    interpret: bool = False,
):
    """Single-kernel fused NL+TL+AD work unit (blocked layout only).

    Returns ``(out, dout, adj)`` with the same contracts as the
    two-kernel ``run_tlad`` pallas_blocked path (``Cloudsc2BlockedOutputs``
    twice + blocked input adjoints); see :func:`_fused_tlad_kernel` for
    the schedule and its HBM byte diet."""
    if not (bool(params.yrephli.lphylin) or ldrain1d):
        raise NotImplementedError(
            "the fused TL+AD kernel implements LPHYLIN=True only"
        )
    lay = _Layout(inputs, params, sublanes, False, blocked=True)
    nlev = lay.nlev
    _, _, _, col_s, smem_s = lay.specs(rev=False)
    blk = (1, 1, lay.sublanes, 128)
    mk = lambda im: pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)

    def w(im):  # two-phase index maps; kk = physical level of step k
        return mk(lambda b, k: im(b, jnp.where(k < nlev, k, 2 * nlev - 1 - k)))

    lev_s = w(lambda b, kk: (kk, b, 0, 0))
    plu_s = w(lambda b, kk: (jnp.minimum(kk + 1, nlev - 1), b, 0, 0))
    hi_s = w(lambda b, kk: (kk + 1, b, 0, 0))
    # TL-owned outputs: pin to the last-written block during the reverse
    # phase (constant index -> no writeback of the stale window)
    tl_out_s = mk(lambda b, k: (jnp.minimum(k, nlev - 1), b, 0, 0))
    # adjoint outputs: pin to the reverse phase's first block during TL
    rev_out_s = mk(
        lambda b, k: (jnp.where(k < nlev, nlev - 1, 2 * nlev - 1 - k),
                      b, 0, 0)
    )

    in_specs = (
        [smem_s] * 3
        + [lev_s] * N_LEVEL_FIELDS + [plu_s, lev_s, hi_s]
        + [col_s] * 2
    )
    kernel = functools.partial(
        _fused_tlad_kernel, params=params, ldrain1d=ldrain1d,
        lregcl=lregcl, nlev=nlev, dscale=float(dscale),
        seed_scales=(1.0 + float(params.yomcst.rlvtt) ** 2,
                     1.0 + float(params.yomcst.rlstt) ** 2),
    )
    cost = pl.CostEstimate(
        flops=(2 + 3) * 292 * nlev * lay.nb * lay.bc,
        bytes_accessed=(2 * _NF + 2 * N_OUTPUTS + _NF + 1)
        * nlev * lay.nb * lay.bc * lay.dtype.itemsize,
        transcendentals=2 * 2 * 10 * nlev * lay.nb * lay.bc,
    )
    scratch = lay.scratch(9) + [
        pltpu.VMEM((nlev, 3, lay.sublanes, 128), lay.dtype),
        pltpu.VMEM((nlev, N_OUTPUTS, lay.sublanes, 128), lay.dtype),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(lay.nb, 2 * nlev),
        in_specs=in_specs,
        out_specs=[tl_out_s] * (2 * N_OUTPUTS) + [rev_out_s] * _NF
        + [col_s],
        out_shape=[lay.out_shape()] * (2 * N_OUTPUTS + _NF)
        + [lay.col_shape()],
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=interpret,
        **_vmem_kw(vmem_limit_bytes),
    )(*lay.scalar_args(), *lay.level_operands(lay.arrs),
      lay.ztrpaus_b, lay.paphsfc_b)

    out_b = Cloudsc2BlockedOutputs(*outs[:N_OUTPUTS])
    dout_b = Cloudsc2BlockedOutputs(*outs[N_OUTPUTS : 2 * N_OUTPUTS])
    rev = outs[2 * N_OUTPUTS :]
    dlev = list(rev[:_NF])
    d_plu_k1, d_paph_lo, d_paph_hi = dlev[N_LEVEL_FIELDS:]
    dpaphsfc = rev[_NF]
    zrow = jnp.zeros((1,) + d_plu_k1.shape[1:], lay.dtype)
    d = dict(zip(_LEVEL_FIELDS, dlev[:N_LEVEL_FIELDS]))
    d["plu"] = jnp.concatenate([zrow, d_plu_k1[:-1]], axis=0)
    d["paph"] = (
        jnp.concatenate([d_paph_lo, zrow], axis=0)
        + jnp.concatenate([zrow, d_paph_hi], axis=0)
    ).at[nlev].add(dpaphsfc)
    d_in = Cloudsc2Inputs(
        paph=d["paph"], pap=d["pap"], pq=d["pq"], pqs=d["pqs"], pt=d["pt"],
        pl=d["pl"], pi=d["pi"], plude=d["plude"], plu=d["plu"],
        pmfu=d["pmfu"], pmfd=d["pmfd"], ten_t=d["ten_t"], ten_q=d["ten_q"],
        ten_l=d["ten_l"], ten_i=d["ten_i"], psupsat=d["psupsat"],
    )
    return out_b, dout_b, d_in


# --------------------------------------------- encoded-stream work unit
# The byte-diet experiment prescribed by the round-2 review: the fused
# TL+AD unit moves ~9.2 GB/call at ~86% of its ceiling and re-reads the
# 17 raw level streams in BOTH sweeps (≙ the trajectory-byte problem of
# cloudsc2ad.F90:228-292), so — unlike the latency-bound NL sweep, where
# int16 encoding measured as a quantified negative (DESIGN.md §8) — the
# TL/AD mixes are the one place halved stream bytes could still pay.
# These wrappers run the SAME _tl_kernel/_rev_kernel schedules over
# int16 affine-encoded level streams (encode_blocked_inputs with
# fuse_satur=False, keep_f32 pq/plu/paph), decoded in-register.


class _EncGeometry:
    """Spec/scalar factory for the encoded blocked layout (the subset of
    _Layout the encoded path needs, built WITHOUT the f32 arrays so the
    timed program never touches them)."""

    def __init__(self, enc_inputs, params):
        from .cloudsc2_kernel import _ZEPS1, _ZSCAL

        streams = enc_inputs.streams
        if len(streams) != N_LEVEL_FIELDS + 2:
            # a contract violation, not a debug check: under `python -O`
            # a bare assert would vanish and a fuse_satur=True encoding
            # would silently misalign the 16-stream operand order
            raise ValueError(
                "encoded TL/AD needs fuse_satur=False encoding (pqs kept)"
            )
        for name, s in (("pq", streams[1]), ("plu", streams[-2]),
                        ("paph", streams[-1])):
            if s.dtype != jnp.float32:
                raise ValueError(f"encoded TL/AD keeps {name} f32 "
                                 "(lev-only decode window)")
        self.nlev, self.nb, self.sublanes, _ = streams[0].shape
        self.bc = self.sublanes * 128
        self.dtype = jnp.float32
        nlev = self.nlev

        ceta = jnp.asarray(params.ceta, self.dtype)
        self.ceta = ceta
        self.zscalm = (
            _ZSCAL * jnp.maximum(ceta - 0.2, _ZEPS1) ** 0.2
        ).astype(self.dtype)
        self.notlast = (jnp.arange(nlev) < nlev - 1).astype(jnp.int32)

        # operand order = _Layout.level_operands: 14 fields, plu(k+1),
        # paph(k), paph(k+1) — paph stream passed twice
        self.operands = (*streams[:N_LEVEL_FIELDS], streams[-2],
                         streams[-1], streams[-1])
        from .cloudsc2_kernel import enc_table_rows

        self.enclev = enc_table_rows(enc_inputs.enc, nlev)
        self.ztrpaus_b = enc_inputs.ztrpaus
        self.paphsfc_b = enc_inputs.paphsfc

    def scalar_args(self):
        n = self.nlev
        return (self.ceta.reshape(n, 1), self.zscalm.reshape(n, 1),
                self.notlast.reshape(n, 1))

    def specs(self, rev: bool):
        from .cloudsc2_kernel import _level_index_maps

        blk = (1, 1, self.sublanes, 128)
        nlev = self.nlev
        lev, plu, hi = _level_index_maps(nlev, rev)
        # decode-table window: same level walk, no block axis
        enc = ((lambda b, k: (nlev - 1 - k, 0, 0)) if rev
               else (lambda b, k: (k, 0, 0)))
        mk = lambda im: pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
        lev_s = [mk(lev)] * N_LEVEL_FIELDS + [mk(plu), mk(lev), mk(hi)]
        col_s = pl.BlockSpec(
            (1, self.sublanes, 128), lambda b, k: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        smem_s = pl.BlockSpec(memory_space=pltpu.SMEM)
        enclev_s = pl.BlockSpec(
            (1, 2 * _NF, 128), enc, memory_space=pltpu.VMEM
        )
        return lev_s, col_s, smem_s, enclev_s

    def out_shape(self):
        return jax.ShapeDtypeStruct(
            (self.nlev, self.nb, self.sublanes, 128), self.dtype
        )

    def col_shape(self):
        return jax.ShapeDtypeStruct(
            (self.nb, self.sublanes, 128), self.dtype
        )

    def scratch(self, n):
        return [pltpu.VMEM((self.sublanes, 128), self.dtype)] * n

    def bytes_accessed(self, n_f32_windows):
        """Exact per-call traffic: encoded streams at 2 B, f32 at 4 B,
        plus the decode window."""
        cell = self.nlev * self.nb * self.bc
        enc_bytes = sum(
            s.dtype.itemsize * cell for s in self.operands
        )
        enc_bytes += 2 * _NF * 128 * 4 * self.nlev * self.nb  # decode rows
        return enc_bytes + n_f32_windows * cell * 4


def cloudsc2_pallas_tl_encoded(
    enc_inputs,
    params: Params,
    *,
    dscale: float,
    lregcl: bool = True,
    ldrain1d: bool = False,
    save_checkpoints: bool = True,
    write_primal: bool = True,
    vmem_limit_bytes: int | None = None,
    interpret: bool = False,
):
    """Blocked dscale TL sweep over int16-encoded level streams.

    Same schedule as ``cloudsc2_pallas_tl(blocked=True, dscale=...)``
    with the 11 encodable level streams moving half the HBM bytes
    (decode = convert + FMA in-register).  Tangents are formed from the
    DECODED trajectory, so the TL is the exact tangent of the quantised
    primal.  Returns (outputs, d_outputs[, checkpoints]) blocked."""
    if not (bool(params.yrephli.lphylin) or ldrain1d):
        raise NotImplementedError("LPHYLIN=True only (see cloudsc2_pallas_tl)")
    g = _EncGeometry(enc_inputs, params)
    lev_s, col_s, smem_s, enclev_s = g.specs(rev=False)
    nprim = N_OUTPUTS if write_primal else 0
    nout = nprim + N_OUTPUTS + (3 if save_checkpoints else 0)
    out_spec = lev_s[0]
    kernel = functools.partial(
        _tl_kernel, params=params, ldrain1d=ldrain1d, lregcl=lregcl,
        save_ckpt=save_checkpoints, dscale=float(dscale), chunk=1,
        nlev=g.nlev, encoded=True, write_primal=write_primal,
    )
    cost = pl.CostEstimate(
        flops=(2 * 292 + 3 * _NF) * g.nlev * g.nb * g.bc,
        bytes_accessed=g.bytes_accessed(nout),
        transcendentals=2 * 10 * g.nlev * g.nb * g.bc,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(g.nb, g.nlev),
        in_specs=[smem_s] * 3 + [enclev_s] + lev_s + [col_s] * 2,
        out_specs=[out_spec] * nout,
        out_shape=[g.out_shape()] * nout,
        scratch_shapes=g.scratch(6),
        cost_estimate=cost,
        interpret=interpret,
        **_vmem_kw(vmem_limit_bytes),
    )(*g.scalar_args(), g.enclev, *g.operands, g.ztrpaus_b, g.paphsfc_b)
    out_b = (Cloudsc2BlockedOutputs(*outs[:N_OUTPUTS]) if write_primal
             else None)
    dout_b = Cloudsc2BlockedOutputs(*outs[nprim : nprim + N_OUTPUTS])
    if save_checkpoints:
        return out_b, dout_b, tuple(outs[nprim + N_OUTPUTS :])
    return out_b, dout_b


def cloudsc2_pallas_ad_encoded(
    enc_inputs,
    d_outputs,
    params: Params,
    *,
    checkpoints,
    lregcl: bool = True,
    ldrain1d: bool = False,
    fold_seeds: bool = True,
    vmem_limit_bytes: int | None = None,
    interpret: bool = False,
):
    """Reverse adjoint sweep over int16-encoded level streams.

    Requires the per-level carry checkpoints from
    :func:`cloudsc2_pallas_tl_encoded` (the fused-unit contract — the
    forward sweep is never rerun).  ``d_outputs`` is the blocked 8-stream
    cotangent (f32; produced on-device, never stored encoded).
    Returns (None, input_adjoints) blocked."""
    if not (bool(params.yrephli.lphylin) or ldrain1d):
        raise NotImplementedError("LPHYLIN=True only (see cloudsc2_pallas_ad)")
    g = _EncGeometry(enc_inputs, params)
    lev_rev, col_s, smem_s, enclev_rev = g.specs(rev=True)
    rev_spec = lev_rev[0]
    seeds = tuple(jnp.asarray(s, g.dtype) for s in d_outputs)
    rev = pl.pallas_call(
        functools.partial(
            _rev_kernel, params=params, ldrain1d=ldrain1d, lregcl=lregcl,
            nlev=g.nlev, chunk=1, encoded=True,
            seed_scales=(
                (1.0 + float(params.yomcst.rlvtt) ** 2,
                 1.0 + float(params.yomcst.rlstt) ** 2)
                if fold_seeds else None
            ),
        ),
        grid=(g.nb, g.nlev),
        in_specs=[smem_s] * 3 + [enclev_rev] + lev_rev + [rev_spec] * 3
        + [rev_spec] * N_OUTPUTS + [col_s] * 2,
        out_specs=[rev_spec] * _NF + [col_s],
        out_shape=[g.out_shape()] * _NF + [g.col_shape()],
        scratch_shapes=g.scratch(3),
        cost_estimate=pl.CostEstimate(
            flops=(3 * 292 + 3 * _NF) * g.nlev * g.nb * g.bc,
            bytes_accessed=g.bytes_accessed(3 + N_OUTPUTS + _NF + 1),
            transcendentals=2 * 10 * g.nlev * g.nb * g.bc,
        ),
        interpret=interpret,
        **_vmem_kw(vmem_limit_bytes),
    )(*g.scalar_args(), g.enclev, *g.operands, *tuple(checkpoints), *seeds,
      g.ztrpaus_b, g.paphsfc_b)

    dlev = list(rev[:_NF])
    d_plu_k1, d_paph_lo, d_paph_hi = dlev[N_LEVEL_FIELDS:]
    dpaphsfc = rev[_NF]  # (nb, S, 128)
    zrow = jnp.zeros((1,) + d_plu_k1.shape[1:], g.dtype)
    d = dict(zip(_LEVEL_FIELDS, dlev[:N_LEVEL_FIELDS]))
    # shifted-view scatter: same assembly as cloudsc2_pallas_ad(blocked)
    d["plu"] = jnp.concatenate([zrow, d_plu_k1[:-1]], axis=0)
    d["paph"] = (
        jnp.concatenate([d_paph_lo, zrow], axis=0)
        + jnp.concatenate([zrow, d_paph_hi], axis=0)
    ).at[g.nlev].add(dpaphsfc)
    d_in = Cloudsc2Inputs(
        paph=d["paph"], pap=d["pap"], pq=d["pq"], pqs=d["pqs"], pt=d["pt"],
        pl=d["pl"], pi=d["pi"], plude=d["plude"], plu=d["plu"],
        pmfu=d["pmfu"], pmfd=d["pmfd"], ten_t=d["ten_t"], ten_q=d["ten_q"],
        ten_l=d["ten_l"], ten_i=d["ten_i"], psupsat=d["psupsat"],
    )
    return None, d_in
