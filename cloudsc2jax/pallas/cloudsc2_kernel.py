"""Fused Pallas TPU kernels for the nonlinear CLOUDSC2 sweep.

Schedule (cf. SURVEY §7 step 5 and the Pallas TPU guide):

* Columns are tiled ``(S, 128)`` — whole VPU tiles.  The grid is
  ``(column_blocks, nlev)`` with the **level axis innermost**: TPU grids
  execute sequentially, so the vertical recurrence (rain/snow fluxes +
  max-overlap fraction, cloudsc2.F90:339,475-481,720-723) is carried in
  VMEM scratch across level steps, while the Pallas pipeline
  double-buffers every level tile HBM→VMEM.
* The *raw* model fields stream straight into the kernel — the
  first-guess state, layer thickness and latent-heat factors are computed
  in-register (cloudsc2.F90:253-277), and the off-level reads PAPH(k+1) /
  PLU(k+1) (:272, :435) are expressed as shifted BlockSpec index maps on
  the same HBM buffers, so no derived field is ever materialised.
* ``levels_major=True`` accepts fields laid out ``(nlev, ncol)`` — the
  HDF5 storage order (SURVEY Appendix A) — in which case blocking is a
  pure reshape and the XLA pre/post passes contain no transposes at all.
* An optional ``"resident"`` mode keeps all levels of a column block in
  VMEM and loops in-kernel; measured slower than the streaming schedule
  on v5e (fewer, larger blocks pipeline worse), kept for study.

This is the f32 performance path (the -DSINGLE analogue,
parkind1.F90:40-44); f64 validation uses the pure-JAX kernel.  Semantics
are identical to :func:`cloudsc2jax.physics.cloudsc2.cloudsc2` — one
source of truth for the math; this file only re-schedules it.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import Params
from ..ops import damp_tangent
from ..physics.satur import satur
from ..physics.cloudsc2 import (
    Cloudsc2Inputs,
    Cloudsc2Outputs,
    _ZEPS1,
    _ZEPS2,
    _ZQMAX,
    _ZSCAL,
    _crit_rel_humidity,
)

__all__ = [
    "cloudsc2_pallas",
    "Cloudsc2BlockedOutputs",
    "unblock_outputs",
]

# raw per-level streams fed to the kernel, in order
_LEVEL_FIELDS = (
    "pt", "pq", "pqs", "pap", "pl", "pi", "plude", "pmfu", "pmfd",
    "ten_t", "ten_q", "ten_l", "ten_i", "psupsat",
)
N_LEVEL_FIELDS = len(_LEVEL_FIELDS)  # + plu(k+1), paph(k), paph(k+1)
N_OUTPUTS = 8  # tent, tenq, tenl, teni, pclc, pcov, rfln, sfln


def _vmem_kw(vmem_limit_bytes):
    """pallas_call kwargs raising Mosaic's scoped-VMEM budget (the
    default ~16 MB rejects S=128 blocks for the TL/AD kernels; v5e
    carries 128 MB of physical VMEM)."""
    if vmem_limit_bytes is None:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=int(vmem_limit_bytes))}


def _level_physics(
    params: Params, ldrain1d: bool, scalars, fields, cols, carry,
    lregcl: bool = False,
):
    """One level of CLOUDSC2 on an (S, 128) column tile.

    ``scalars`` = (ceta_k, zscalm_k, not_last); ``fields`` = the 14 raw
    level tiles + (plu_k1, paph_lo, paph_hi); ``cols`` = (ztrpaus,
    paph_sfc); ``carry`` = (zrfl, zsfl, zcovptot).  Returns
    (outputs, new_carry).  Line references cite
    src/cloudsc2_nl/cloudsc2.F90.

    ``lregcl`` injects the reference's TL/AD perturbation regularisations
    (identity on this nonlinear trajectory; rescales tangents/adjoints
    when the body is differentiated by the fused TL/AD kernels in
    :mod:`cloudsc2jax.pallas.tlad_kernel`) at the same five sites as the
    pure-JAX kernel: the ZYYY cloud-cover damp (cloudsc2tl.F90:574-580),
    0.1x subsidence (:657), the two 1/100 autoconversion damps
    (:323-324 with :754 and :794) and 0.7x vapour clipping (:994-1001).
    """
    cst, thf = params.yomcst, params.yoethf
    cldp, phli, phnc = params.yrecldp, params.yrephli, params.yophnc
    ptsphy = params.ptsphy

    ceta_k, zscalm_k, not_last = scalars
    (pt, pq, pqs, pap, pl_, pi_, plude, pmfu, pmfd,
     ten_t, ten_q, ten_l, ten_i, psupsat, plu_k1, paph_lo, paph_hi) = fields
    ztrpaus, paph_sfc = cols
    zrfl, zsfl, zcovptot = carry

    one = jnp.asarray(1.0, pt.dtype)
    reg = damp_tangent if lregcl else (lambda x, factor: x)

    zckcodtl = 2.0 * cldp.rkconv * ptsphy
    zckcodti = 5.0 * cldp.rkconv * ptsphy
    zcons2 = 1.0 / (ptsphy * cst.rg)
    zcons3 = cst.rlvtt / cst.rcpd
    zmeltp2 = cst.rtt + 2.0
    zqtmst = 1.0 / ptsphy

    # first-guess state (:253-260) and layer thickness (:272)
    ztp1 = pt + ptsphy * ten_t
    zqp1 = pq + ptsphy * ten_q + psupsat
    zl = pl_ + ptsphy * ten_l
    zi = pi_ + ptsphy * ten_i
    zdp = paph_hi - paph_lo

    # latent-heat factors (:272-277)
    zzz = 1.0 / (cst.rcpd + cst.rcpd * thf.rvtmp2 * zqp1)
    zlfdcp = cst.rlmlt * zzz
    zlsdcp = cst.rlstt * zzz
    zlvdcp = cst.rlvtt * zzz

    # --- 3.1 dqs/dT (LPHYLIN branch, :349-364)
    zoealfaw = 0.545 * (jnp.tanh(0.17 * (ztp1 - phli.rlptrc)) + 1.0)
    cold = ztp1 < cst.rtt
    zfwat = jnp.where(cold, zoealfaw, one)
    z3es = jnp.where(cold, thf.r3ies, thf.r3les)
    z4es = jnp.where(cold, thf.r4ies, thf.r4les)
    zfoeew = thf.r2es * jnp.exp(z3es * (ztp1 - cst.rtt) / (ztp1 - z4es))
    zesdp = jnp.minimum(zfoeew / pap, _ZQMAX)
    zfacw = thf.r5les / (ztp1 - thf.r4les) ** 2
    zfaci = thf.r5ies / (ztp1 - thf.r4ies) ** 2
    zfac = zfwat * zfacw + (1.0 - zfwat) * zfaci
    zcor = 1.0 / (1.0 - cst.retv * zesdp)
    zdqsdtemp = zfac * zcor * pqs
    zcorqs = 1.0 + zcons3 * zdqsdtemp
    zqlim = jnp.where(zqp1 > pqs, pqs, zqp1)

    zcrh2 = _crit_rel_humidity(ceta_k, ztrpaus)
    zsupsat_fac = jnp.where(ztp1 < thf.rtice, 1.8 - 3.0e-3 * ztp1, one)
    zqsat = pqs * zsupsat_fac
    zqcrit = zcrh2 * zqsat

    # --- cloud cover (:412-427)
    zqt = zqp1 + zl + zi
    zqpd = zqsat - zqt
    zqcd = zqsat - zqcrit
    mid = (zqt > zqcrit) & (zqt < zqsat)
    denom = zqcd - zscalm_k * (zqt - zqcrit)
    denom_safe = jnp.where(mid, denom, one)
    ratio = jnp.where(mid, zqpd, denom_safe) / denom_safe
    pclc_mid = 1.0 - jnp.sqrt(jnp.maximum(ratio, 0.0))
    if lregcl:
        # ZYYY cloud-fraction perturbation damp (cloudsc2tl.F90:574-580)
        zqcd_safe = jnp.where(mid, zqcd, one)
        zrat = jnp.clip(zqpd / zqcd_safe, 0.0, 1.0)
        zyyy = jnp.minimum(
            0.3,
            3.5 * jnp.sqrt(zrat * (1.0 - zscalm_k * (1.0 - zrat)) ** 3)
            / (1.0 - zscalm_k),
        )
        pclc_mid = damp_tangent(pclc_mid, zyyy)
    zqc_mid = (zscalm_k * zqpd + (1.0 - zscalm_k) * zqcd) * pclc_mid**2
    saturated = zqt >= zqsat
    pclc = jnp.where(mid, pclc_mid, jnp.where(saturated, one, 0.0))
    zqc = jnp.where(
        mid, zqc_mid, jnp.where(saturated, (1.0 - zscalm_k) * zqcd, 0.0)
    )

    # --- convective detrainment (:431-444)
    zgdp = cst.rg / zdp
    zlude = plude * ptsphy * zgdp
    llo1 = not_last & (zlude >= cldp.rlmin) & (plu_k1 >= _ZEPS2)
    plu_safe = jnp.where(llo1, plu_k1, one)
    pclc = jnp.where(
        llo1, pclc + (1.0 - pclc) * (1.0 - jnp.exp(-zlude / plu_safe)), pclc
    )
    zqc = jnp.where(llo1, zqc + zlude, zqc)

    # --- compensating subsidence (:448-460)
    zrho = pap / (cst.rd * ztp1)
    zrodqsdp = -zrho * pqs / (pap - cst.retv * zfoeew)
    zldcp = zfwat * zlvdcp + (1.0 - zfwat) * zlsdcp
    zfac3 = 1.0 / (1.0 + zldcp * zdqsdtemp)
    dtdzmo = cst.rg * (1.0 / cst.rcpd - zldcp * zrodqsdp) * zfac3
    zdqsdz = zdqsdtemp * dtdzmo - cst.rg * zrodqsdp
    zdqc_sub = zdqsdz * (pmfu + pmfd) * ptsphy / zrho
    # MIN tie convention + 0.1x subsidence tangent damp under LREGCL
    # (cloudsc2tl.F90:651-661)
    zqc = zqc - jnp.where(zdqc_sub < zqc, reg(zdqc_sub, 0.1), zqc)

    # --- condensation rates (:464-469)
    zqlwc = zqc * zfwat
    zqiwc = zqc * (1.0 - zfwat)
    zcondl = (zqlwc - zl) * zqtmst
    zcondi = (zqiwc - zi) * zqtmst

    # --- precip overlap (:475-481)
    zcovptot = jnp.maximum(zcovptot, pclc)
    zcovpclr = jnp.maximum(zcovptot - pclc, 0.0)

    # --- snow melt (:487-498)
    zcons = zcons2 * zdp / zlfdcp
    zsnmlt = jnp.minimum(zsfl, zcons * jnp.maximum(0.0, ztp1 - zmeltp2))
    zrfln = zrfl + zsnmlt
    zsfln = zsfl - zsnmlt
    ztp1 = ztp1 - zsnmlt / zcons

    # --- autoconversion (:504-534)
    levapls2 = bool(phnc.levapls2)
    active = pclc > _ZEPS2
    pclc_safe = jnp.where(active, pclc, one)
    zlcrit_l = 1.9 * cldp.rclcrit if (levapls2 or ldrain1d) else 2.0 * cldp.rclcrit
    zcldl = zqlwc / pclc_safe
    zdl = zckcodtl * (1.0 - jnp.exp(-((zcldl / zlcrit_l) ** 2)))
    zdl = reg(zdl, 0.01)  # ZCKCODTLA=ZCKCODTL/100 (cloudsc2tl.F90:323,751-760)
    zlnew = pclc * zcldl * jnp.exp(-zdl)
    zprr = jnp.where(active, zqlwc - zlnew, 0.0)
    zqlwc = zqlwc - zprr

    zlcrit_i = 1.0e-4 if (levapls2 or ldrain1d) else 2.0 * cldp.rclcrit
    zcldi = zqiwc / pclc_safe
    zdi = (
        zckcodti
        * jnp.exp(0.025 * (ztp1 - cst.rtt))
        * (1.0 - jnp.exp(-((zcldi / zlcrit_i) ** 2)))
    )
    zdi = reg(zdi, 0.01)  # (cloudsc2tl.F90:324, 791-800)
    zinew = pclc * zcldi * jnp.exp(-zdi)
    zprs = jnp.where(active, zqiwc - zinew, 0.0)
    zqiwc = zqiwc - zprs

    # --- freezing split (:538-552)
    zdr = zcons2 * zdp * (zprr + zprs)
    cold = ztp1 < cst.rtt
    zrfreeze = jnp.where(cold, zcons2 * zdp * zprr, 0.0)
    zfwatr = jnp.where(cold, 0.0, one)
    zrfln = zrfln + zfwatr * zdr
    zsfln = zsfln + (1.0 - zfwatr) * zdr

    # --- clear-sky precip evaporation (:556-591)
    zprtot = zrfln + zsfln
    if levapls2 or ldrain1d:
        llo2 = (zprtot > _ZEPS2) & (zcovpclr > _ZEPS2)
        covptot_safe = jnp.where(llo2, zcovptot, one)
        covpclr_safe = jnp.where(llo2, zcovpclr, one)
        one_m_clc = jnp.where(llo2, (1.0 - pclc) ** 2, one)
        zpreclr = zprtot * zcovpclr / covptot_safe
        zqe = pqs - (pqs - zqlim) * zcovpclr / one_m_clc
        zbeta_arg = jnp.where(
            llo2,
            jnp.sqrt(pap / paph_sfc) / 5.09e-3 * zpreclr / covpclr_safe,
            one,
        )
        zbeta = cst.rg * cldp.rpecons * zbeta_arg**0.5777
        zb = ptsphy * zbeta * (pqs - zqe) / (1.0 + zbeta * ptsphy * zcorqs)
        zdtgdp = ptsphy * cst.rg / zdp
        zdpr = jnp.minimum(zcovpclr * zb / zdtgdp, zpreclr)
        zpreclr2 = zpreclr - zdpr
        zcovptot_new = jnp.where(zpreclr2 <= 0.0, pclc, zcovptot)
        zcovptot = jnp.where(llo2, zcovptot_new, zcovptot)
        pcov = jnp.where(llo2, zcovptot, 0.0)
        prtot_safe = jnp.where(llo2, zprtot, one)
        zevapr = jnp.where(llo2, zdpr * zrfln / prtot_safe, 0.0)
        zevaps = jnp.where(llo2, zdpr * zsfln / prtot_safe, 0.0)
        zrfln = zrfln - zevapr
        zsfln = zsfln - zevaps
    else:
        pcov = jnp.zeros_like(zprtot)
        zevapr = jnp.zeros_like(zprtot)
        zevaps = jnp.zeros_like(zprtot)

    # --- tendencies + first guess (:601-618)
    def tend(condl, condi, rfreeze):
        dqdt = -(condl + condi) + (plude + zevapr + zevaps) * zgdp
        dtdt = (
            zlvdcp * condl
            + zlsdcp * condi
            - (
                zlvdcp * zevapr
                + zlsdcp * zevaps
                + plude * (zfwat * zlvdcp + (1.0 - zfwat) * zlsdcp)
                - (zlsdcp - zlvdcp) * rfreeze
            )
            * zgdp
        )
        return dqdt, dtdt

    zdqdt, zdtdt = tend(zcondl, zcondi, zrfreeze)
    ztp1 = ztp1 + ptsphy * zdtdt
    zqp1 = zqp1 + ptsphy * zdqdt
    zqold = zqp1

    # --- inlined saturation adjustment (:628-669)
    liquid = ztp1 > cst.rtt
    z3es = jnp.where(liquid, thf.r3les, thf.r3ies)
    z4es = jnp.where(liquid, thf.r4les, thf.r4ies)
    z5alcp = jnp.where(liquid, thf.r5alvcp, thf.r5alscp)
    zaldcp = jnp.where(liquid, thf.ralvdcp, thf.ralsdcp)
    zqp = 1.0 / pap
    for _ in range(2):
        foeew_a = thf.r2es * jnp.exp(z3es * (ztp1 - cst.rtt) / (ztp1 - z4es))
        qsat_a = jnp.minimum(zqp * foeew_a, _ZQMAX)
        cor_a = 1.0 / (1.0 - cst.retv * qsat_a)
        qsat_a = qsat_a * cor_a
        z2s = z5alcp / (ztp1 - z4es) ** 2
        cond1 = (zqp1 - qsat_a) / (1.0 + qsat_a * cor_a * z2s)
        ztp1 = ztp1 + zaldcp * cond1
        zqp1 = zqp1 - cond1

    # --- post-adjustment accounting (:672-692); clipping tangent damped
    # by 0.7 under LREGCL (cloudsc2tl.F90:994-1001)
    diff = zqold - zqp1
    zdq = jnp.where(diff >= 0.0, reg(diff, 0.7), jnp.zeros_like(diff))
    zdr2 = zcons2 * zdp * zdq
    cold2 = ztp1 < cst.rtt
    zrfreeze2 = jnp.where(cold2, zfwat * zdr2, 0.0)
    zfwatr = jnp.where(cold2, 0.0, one)
    zcondl = zcondl + zfwatr * zdq * zqtmst
    zcondi = zcondi + (1.0 - zfwatr) * zdq * zqtmst
    zrfln = zrfln + zfwatr * zdr2
    zsfln = zsfln + (1.0 - zfwatr) * zdr2
    zrfreeze = zrfreeze + zrfreeze2

    zdqdt, zdtdt = tend(zcondl, zcondi, zrfreeze)

    outputs = (
        zdtdt,
        zdqdt,
        (zqlwc - zl) * zqtmst,
        (zqiwc - zi) * zqtmst,
        pclc,
        pcov,
        zrfln,
        zsfln,
    )
    return outputs, (zrfln, zsfln, zcovptot)


def _stream_kernel(*refs, params: Params, ldrain1d: bool,
                   fuse_satur: bool = False, encoded: bool = False):
    """Grid (nb, nlev): one level tile per step, carry in VMEM scratch.

    ``encoded=True`` adds three VMEM operands — lane-broadcast rows of
    the per-(stream, level) affine decode table of
    :func:`.experiments.encode_blocked_inputs`, fetched at the same level indices as
    the streams they decode (k / min(k+1, nlev-1) / k+1) — and upcasts
    int16 streams in-register on load (``x*scale + offset``); the decode
    is a VPU convert+FMA per element, fully hidden behind the halved DMA
    stream.  (The compact table exceeds the 1 MB SMEM budget once
    scalar-expanded, hence VMEM rows.)
    """
    if encoded == "full":
        (ceta_ref, zscalm_ref, notlast_ref,
         enclev_ref, encplu_ref, enchi_ref, *rest) = refs
    elif encoded:  # "lev": only level-mapped streams are encoded
        (ceta_ref, zscalm_ref, notlast_ref, enclev_ref, *rest) = refs
        encplu_ref = enchi_ref = None
    else:
        (ceta_ref, zscalm_ref, notlast_ref, *rest) = refs
    nf = N_LEVEL_FIELDS + 3 - (1 if fuse_satur else 0)
    lev_refs = rest[:nf]
    ztrpaus_ref, paphsfc_ref = rest[nf : nf + 2]
    out_refs = rest[nf + 2 : nf + 2 + N_OUTPUTS]
    rfl_s, sfl_s, cov_s = rest[nf + 2 + N_OUTPUTS :]

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        rfl_s[...] = jnp.zeros_like(rfl_s)
        sfl_s[...] = jnp.zeros_like(sfl_s)
        cov_s[...] = jnp.zeros_like(cov_s)

    scalars = (ceta_ref[k, 0], zscalm_ref[k, 0], notlast_ref[k, 0] > 0)
    if encoded:
        def dec(i, r):
            x = r[0, 0]
            if r.dtype == jnp.float32:
                return x
            if i == nf - 3:  # plu(k+1) stream
                if encplu_ref is None:
                    raise ValueError("encoded='lev' requires f32 plu")
                sc, off = encplu_ref[0, 0, :], encplu_ref[0, 1, :]
            elif i == nf - 1:  # paph(k+1) stream
                if enchi_ref is None:
                    raise ValueError("encoded='lev' requires f32 paph")
                sc, off = enchi_ref[0, 0, :], enchi_ref[0, 1, :]
            else:
                sc, off = enclev_ref[0, 2 * i, :], enclev_ref[0, 2 * i + 1, :]
            return x.astype(jnp.float32) * sc + off

        fields = tuple(dec(i, r) for i, r in enumerate(lev_refs))
    else:
        fields = tuple(r[0, 0] for r in lev_refs)
    if fuse_satur:
        # stream order without pqs: pt, pq, pap, ... — rebuild the full
        # tuple with qsat computed in-register from the validated SATUR
        # (the driver's SATUR-then-CLOUDSC2 work unit as one sweep,
        # cloudsc_driver_mod.F90:91-107); pure jnp, traceable in-kernel
        pqs = satur(fields[2], fields[0], params, lphylin=True, kflag=2)
        fields = fields[:2] + (pqs,) + fields[2:]
    cols = (ztrpaus_ref[0], paphsfc_ref[0])
    carry = (rfl_s[...], sfl_s[...], cov_s[...])

    outputs, (zrfln, zsfln, zcovptot) = _level_physics(
        params, ldrain1d, scalars, fields, cols, carry
    )
    for r, val in zip(out_refs, outputs):
        r[0, 0] = val
    rfl_s[...] = zrfln
    sfl_s[...] = zsfln
    cov_s[...] = zcovptot


def _resident_kernel(*refs, params: Params, ldrain1d: bool, nlev: int):
    """Grid (nb,): all levels VMEM-resident, fori_loop over levels.

    Measured slower than the streaming schedule on v5e; retained for
    block-size studies.
    """
    (ceta_ref, zscalm_ref, notlast_ref, *rest) = refs
    nf = N_LEVEL_FIELDS
    lev_refs = rest[:nf]
    plu_ref, paph_ref = rest[nf : nf + 2]
    ztrpaus_ref, paphsfc_ref = rest[nf + 2 : nf + 4]
    out_refs = rest[nf + 4 : nf + 4 + N_OUTPUTS]

    cols = (ztrpaus_ref[0], paphsfc_ref[0])
    shape = ztrpaus_ref.shape[1:]  # (S, 128)
    zero = jnp.zeros(shape, ztrpaus_ref.dtype)

    def body(k, carry):
        scalars = (ceta_ref[k, 0], zscalm_ref[k, 0], notlast_ref[k, 0] > 0)
        k1 = jnp.minimum(k + 1, nlev - 1)
        fields = tuple(r[k, 0] for r in lev_refs) + (
            plu_ref[k1, 0],
            paph_ref[k, 0],
            paph_ref[k + 1, 0],
        )
        outputs, new_carry = _level_physics(
            params, ldrain1d, scalars, fields, cols, carry
        )
        for r, val in zip(out_refs, outputs):
            r[k, 0] = val
        return new_carry

    jax.lax.fori_loop(0, nlev, body, (zero, zero, zero))


def _tropopause_eta_lm(ztp1_lm, ceta):
    """Tropopause eta, levels leading: ``(nlev, ...)`` any trailing shape
    (cloudsc2.F90:314-326)."""
    tail = (None,) * (ztp1_lm.ndim - 1)
    sl = (slice(None),) + tail
    mask = (
        (ceta[:-1] > 0.1)[sl]
        & (ceta[:-1] < 0.4)[sl]
        & (ztp1_lm[:-1] > ztp1_lm[1:])
    )
    cand = jnp.where(mask, jax.lax.stop_gradient(ceta[:-1])[sl], 0.1)
    return jnp.max(cand, axis=0)


class Cloudsc2BlockedOutputs(NamedTuple):
    """Raw kernel output streams in blocked layout ``(nlev, nb, S, 128)``.

    The zero-copy fast path: reshaping blocked streams back to
    ``(ncol, nlev)`` is a physical relayout on TPU (tiled layouts), which
    costs more than the kernel itself at 160k columns — callers that can
    consume blocked data (benchmarks, device-side validation, downstream
    blocked ops) should.  ``unblock_outputs`` converts to the standard
    :class:`Cloudsc2Outputs` contract (flux top row + enthalpy fluxes,
    cloudsc2.F90:694-735).
    """

    tenl_t: jax.Array
    tenl_q: jax.Array
    tenl_l: jax.Array
    tenl_i: jax.Array
    pclc: jax.Array
    pcovptot: jax.Array
    rfln: jax.Array
    sfln: jax.Array


def unblock_outputs(
    out: Cloudsc2BlockedOutputs, params: Params, ncol: int,
    levels_major: bool = False,
) -> Cloudsc2Outputs:
    """Blocked streams -> standard Cloudsc2Outputs (slow relayout path)."""
    def from_blocks(x):
        return x.reshape(x.shape[0], -1)[:, :ncol]

    tent, tenq, tenl, teni, pclc, pcov, rfln, sfln = [
        from_blocks(o) for o in out
    ]
    top = jnp.zeros((1, ncol), rfln.dtype)
    pfplsl = jnp.concatenate([top, rfln], axis=0)
    pfplsn = jnp.concatenate([top, sfln], axis=0)
    res = Cloudsc2Outputs(
        tenl_t=tent, tenl_q=tenq, tenl_l=tenl, tenl_i=teni, pclc=pclc,
        pfplsl=pfplsl, pfplsn=pfplsn,
        pfhpsl=-pfplsl * params.yomcst.rlvtt,
        pfhpsn=-pfplsn * params.yomcst.rlstt,
        pcovptot=pcov,
    )
    if not levels_major:
        res = Cloudsc2Outputs(*(x.T for x in res))
    return res


# ------------------------------------------------------------------ layout
def _level_index_maps(nlev: int, rev: bool):
    """The (level, block) BlockSpec index maps shared by EVERY blocked
    sweep (NL, TL, AD, encoded): the plain level window, the clamped
    plu(k+1) shift, and the paph(k+1) high-edge window — forward, or
    with the level axis reversed (DO JK=KLEV,1,-1).  One definition so a
    clamp fix propagates to all sweeps at once."""
    if rev:
        lev = lambda b, k: (nlev - 1 - k, b, 0, 0)
        plu = lambda b, k: (jnp.minimum(nlev - k, nlev - 1), b, 0, 0)
        hi = lambda b, k: (nlev - k, b, 0, 0)
    else:
        lev = lambda b, k: (k, b, 0, 0)
        plu = lambda b, k: (jnp.minimum(k + 1, nlev - 1), b, 0, 0)
        hi = lambda b, k: (k + 1, b, 0, 0)
    return lev, plu, hi


def enc_table_rows(table, nlev: int):
    """Lane-broadcast decode rows (see _stream_kernel docstring): the
    compact (nf, nlev+1, 2) affine table becomes (nlev+1, 2*nf, 128) so
    kernels read whole (128,) scale/offset lanes — a ~19 KB/step DMA,
    ~3% of the halved stream bytes."""
    nf = table.shape[0]
    return jnp.broadcast_to(
        jnp.transpose(table, (1, 0, 2)).reshape(nlev + 1, 2 * nf)[..., None],
        (nlev + 1, 2 * nf, 128),
    )


class _Layout:
    """Blocked levels-major layout shared by the NL and TL/AD wrappers:
    transpose to
    ``(nlev, ncol)`` unless ``levels_major``, pad columns to a multiple of
    ``sublanes*128`` (replicating column 0 — inputs are tile-replicated
    upstream anyway, expand_mod.F90 semantics), reshape to
    ``(L, nb, S, 128)`` blocks.
    """

    def __init__(self, inputs: Cloudsc2Inputs, params: Params,
                 sublanes: int, levels_major: bool, blocked: bool = False):
        arrs = {k: jnp.asarray(v) for k, v in inputs._asdict().items()}
        self.blocked = blocked
        if blocked:
            # operands already in kernel layout (nlev[,+1], nb, S, 128):
            # the zero-relayout fast path (see cloudsc2_kernel docstring)
            self.nlev, self.nb, self.sublanes, _ = arrs["pt"].shape
            self.ncol = None
            self.bc = self.sublanes * 128
            self.npad = 0
        else:
            if not levels_major:
                arrs = {k: v.T for k, v in arrs.items()}
            self.nlev, self.ncol = arrs["pt"].shape
            self.sublanes = sublanes
            self.bc = sublanes * 128
            self.nb = max(1, math.ceil(self.ncol / self.bc))
            self.npad = self.nb * self.bc - self.ncol
        self.arrs = arrs
        self.dtype = arrs["pt"].dtype

        ceta = jnp.asarray(params.ceta, self.dtype)
        self.ceta = ceta
        self.zscalm = (_ZSCAL * jnp.maximum(ceta - 0.2, _ZEPS1) ** 0.2).astype(
            self.dtype
        )
        self.notlast = (jnp.arange(self.nlev) < self.nlev - 1).astype(jnp.int32)

        ztp1 = arrs["pt"] + params.ptsphy * arrs["ten_t"]
        self.ztrpaus_b = self.colblocks(_tropopause_eta_lm(ztp1, ceta))
        self.paphsfc_b = self.colblocks(arrs["paph"][self.nlev])

    def padcols(self, x):
        if self.npad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[..., :1], x.shape[:-1] + (self.npad,))], -1
        )

    def to_blocks(self, x):  # (L, ncol) -> (L, nb, S, 128)
        if self.blocked:
            return x
        return self.padcols(x).reshape(x.shape[0], self.nb, self.sublanes, 128)

    def colblocks(self, x):  # (ncol,) -> (nb, S, 128)
        if self.blocked:
            return x  # already (nb, S, 128)
        return self.padcols(x).reshape(self.nb, self.sublanes, 128)

    def from_blocks(self, x):  # (L, nb, S, 128) -> (L, ncol)
        if self.blocked:
            return x
        return x.reshape(x.shape[0], self.nb * self.bc)[:, : self.ncol]

    def level_operands(self, arrs):
        """The 17 primal-ordered streams: 14 level fields + plu, paph x2."""
        blocks = [self.to_blocks(arrs[name]) for name in _LEVEL_FIELDS]
        return (*blocks, self.to_blocks(arrs["plu"]),
                self.to_blocks(arrs["paph"]), self.to_blocks(arrs["paph"]))

    # BlockSpecs.  ``rev`` runs the level axis backwards (DO JK=KLEV,1,-1).
    def specs(self, rev: bool):
        blk = (1, 1, self.sublanes, 128)
        lev, plu, hi = _level_index_maps(self.nlev, rev)
        mk = lambda im: pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
        lev_s, plu_s, hi_s = mk(lev), mk(plu), mk(hi)
        col_s = pl.BlockSpec(
            (1, self.sublanes, 128), lambda b, k: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        smem_s = pl.BlockSpec(memory_space=pltpu.SMEM)
        return lev_s, plu_s, hi_s, col_s, smem_s

    def field_specs(self, rev: bool):
        lev_s, plu_s, hi_s, _, _ = self.specs(rev)
        return [lev_s] * N_LEVEL_FIELDS + [plu_s, lev_s, hi_s]

    # Specs for the in-place shift-scatter reverse sweep
    # (tlad_kernel._rev_kernel inplace_scatter): the grid gains one FLUSH
    # step (k == nlev), so every input map must stay valid there — the
    # plain level map is clamped at 0 (revisiting step nlev-1's block:
    # Mosaic elides the DMA and untouched output buffers keep their
    # values); the plu(k+1)/paph(k+1) reversed maps already land on valid
    # blocks at k == nlev.
    def flush_field_specs(self):
        """(17 input specs, the clamped plain spec for ckpt/seed/plain-
        adjoint streams, the d_plu out spec, the d_paph out spec)."""
        n = self.nlev
        _, plu, hi = _level_index_maps(n, rev=True)
        lev = lambda b, k: (jnp.maximum(n - 1 - k, 0), b, 0, 0)
        blk = (1, 1, self.sublanes, 128)
        mk = lambda im: pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
        lev_s = mk(lev)
        in_specs = [lev_s] * N_LEVEL_FIELDS + [mk(plu), lev_s, mk(hi)]
        # output maps write slot kr+1 = nlev-k at compute steps and slot
        # 0 at the flush step; d_plu has nlev rows so its first write
        # (k=0, the exactly-zero last-level cotangent) clamps onto slot
        # nlev-1 and is overwritten by the next (consecutive) step
        dplu_s = mk(lambda b, k: (jnp.minimum(n - k, n - 1), b, 0, 0))
        dpaph_s = mk(lambda b, k: (n - k, b, 0, 0))
        return in_specs, lev_s, dplu_s, dpaph_s

    def paph_shape(self):
        return jax.ShapeDtypeStruct(
            (self.nlev + 1, self.nb, self.sublanes, 128), self.dtype
        )

    # C-level chunk variant (the per-step window-issue-latency
    # experiment, DESIGN.md §8): each grid step moves a (C,1,S,128)
    # block of every stream and loops the level body C times
    # in-register, so the grid has ceil(nlev/C) level steps.  The
    # single-level shifted views plu(k+1)/paph(k+1) become slot c+1 of
    # the same chunk, or slot 0 of the NEIGHBOUR chunk (the ``*_nxt``
    # operands) at the chunk boundary — index maps stay block-aligned.
    def chunk_field_specs(self, C: int, rev: bool):
        """Returns (in_specs for 14 lev + plu/plu_nxt + paph/paph_nxt,
        the chunk lev spec for outputs, nchunks)."""
        nch = -(-self.nlev // C)
        nch_paph = -(-(self.nlev + 1) // C)
        blk = (C, 1, self.sublanes, 128)
        if rev:
            cm = lambda b, k: (nch - 1 - k, b, 0, 0)
            nx = lambda lim: (
                lambda b, k: (jnp.minimum(nch - k, lim), b, 0, 0)
            )
        else:
            cm = lambda b, k: (k, b, 0, 0)
            nx = lambda lim: (
                lambda b, k: (jnp.minimum(k + 1, lim), b, 0, 0)
            )
        mk = lambda im: pl.BlockSpec(blk, im, memory_space=pltpu.VMEM)
        lev_s = mk(cm)
        specs = [lev_s] * N_LEVEL_FIELDS + [
            lev_s, mk(nx(nch - 1)), lev_s, mk(nx(nch_paph - 1)),
        ]
        return specs, lev_s, nch

    def chunk_operands(self, arrs):
        """The chunked stream order: 14 level fields, then plu twice
        (chunk + neighbour chunk) and paph twice (same)."""
        blocks = [self.to_blocks(arrs[name]) for name in _LEVEL_FIELDS]
        plu = self.to_blocks(arrs["plu"])
        paph = self.to_blocks(arrs["paph"])
        return (*blocks, plu, plu, paph, paph)

    def out_shape(self):
        return jax.ShapeDtypeStruct(
            (self.nlev, self.nb, self.sublanes, 128), self.dtype
        )

    def col_shape(self):
        return jax.ShapeDtypeStruct((self.nb, self.sublanes, 128), self.dtype)

    def scalar_args(self):
        n = self.nlev
        return (self.ceta.reshape(n, 1), self.zscalm.reshape(n, 1),
                self.notlast.reshape(n, 1))

    def scratch(self, n):
        return [pltpu.VMEM((self.sublanes, 128), self.dtype)] * n



def cloudsc2_pallas(
    inputs: Cloudsc2Inputs,
    params: Params,
    *,
    ldrain1d: bool = False,
    sublanes: int = 128,
    mode: str = "stream",
    levels_major: bool = False,
    blocked: bool = False,
    fuse_satur: bool = False,
    vmem_limit_bytes: int | None = None,
    interpret: bool = False,
) -> Cloudsc2Outputs:
    """Fused-kernel CLOUDSC2; drop-in for :func:`cloudsc2` (f32 path).

    ``fuse_satur=True`` (stream mode) computes qsat in-kernel from the
    streamed PT/PAP instead of reading a PQS stream — the reference
    driver's SATUR + CLOUDSC2 work unit as ONE sweep, one less HBM
    stream (``inputs.pqs`` is then ignored).

    ``levels_major=True`` expects each input field shaped ``(nlev, ncol)``
    (HDF5 storage order) and returns outputs in the same layout — the
    zero-transpose fast path.  Default accepts/returns the framework's
    ``(ncol, nlev)`` layout.  Columns are padded to a multiple of
    ``sublanes*128`` (padding replicates column 0 — inputs are
    tile-replicated upstream anyway, expand_mod.F90 semantics).

    ``blocked=True`` is the zero-RELAYOUT fast path: inputs arrive
    already in kernel layout ``(nlev[,+1], nb, S, 128)`` (e.g. from
    ``Cloudsc2State.device_kernel_inputs(..., blocked_sublanes=S)``) and
    the raw output streams are returned as
    :class:`Cloudsc2BlockedOutputs` without reshaping.  Measured on v5e:
    the (nlev, ncol) <-> blocked reshape is a physical tiled-layout copy
    that costs more than the whole kernel at 160k columns — this path
    runs the sweep at the streaming-pipeline speed of light (~390 GB/s).
    """
    if mode not in ("stream", "resident"):
        raise ValueError(f"unknown mode {mode!r}")
    if blocked and mode != "stream":
        raise ValueError("blocked layout supports mode='stream' only")
    if fuse_satur and mode != "stream":
        raise ValueError("fuse_satur supports mode='stream' only")
    if not (bool(params.yrephli.lphylin) or ldrain1d):
        # the fused kernels hardcode the LPHYLIN dqs/dT branch (the
        # reference entry programs force LPHYLIN=.TRUE.,
        # dwarf_cloudsc.F90:107); the FOEALFA branch lives only in the
        # pure-JAX kernel — refuse rather than silently diverge
        raise NotImplementedError(
            "cloudsc2_pallas implements the LPHYLIN=True configuration "
            "only; use physics.cloudsc2 for lphylin=False"
        )

    lay = _Layout(inputs, params, sublanes, levels_major, blocked=blocked)
    nlev, nb, sublanes = lay.nlev, lay.nb, lay.sublanes

    names = [
        n for n in _LEVEL_FIELDS if not (fuse_satur and n == "pqs")
    ]
    lev_blocks = [lay.to_blocks(lay.arrs[name]) for name in names]
    plu_b = lay.to_blocks(lay.arrs["plu"])
    paph_b = lay.to_blocks(lay.arrs["paph"])  # (nlev+1, nb, S, 128)

    lev_spec, plu_spec, paph_hi_spec, col_spec, smem_spec = lay.specs(rev=False)

    if mode == "stream":
        out_spec = lev_spec
        grid = (nb, nlev)
        kernel = functools.partial(
            _stream_kernel, params=params, ldrain1d=ldrain1d,
            fuse_satur=fuse_satur,
        )
        scratch = lay.scratch(3)
        in_specs = (
            [smem_spec] * 3
            + [lev_spec] * len(lev_blocks)
            + [plu_spec, lev_spec, paph_hi_spec]
            + [col_spec] * 2
        )
        operands = (*lev_blocks, plu_b, paph_b, paph_b,
                    lay.ztrpaus_b, lay.paphsfc_b)
    else:  # resident
        lev_spec = pl.BlockSpec(
            (nlev, 1, sublanes, 128), lambda b: (0, b, 0, 0), memory_space=pltpu.VMEM
        )
        plu_spec = lev_spec
        paph_spec = pl.BlockSpec(
            (nlev + 1, 1, sublanes, 128), lambda b: (0, b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        col_spec = pl.BlockSpec(
            (1, sublanes, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = lev_spec
        grid = (nb,)
        kernel = functools.partial(
            _resident_kernel, params=params, ldrain1d=ldrain1d, nlev=nlev
        )
        scratch = []
        in_specs = (
            [smem_spec] * 3
            + [lev_spec] * N_LEVEL_FIELDS
            + [plu_spec, paph_spec]
            + [col_spec] * 2
        )
        operands = (*lev_blocks, plu_b, paph_b, lay.ztrpaus_b, lay.paphsfc_b)

    flops_per_level_col = 292  # SURVEY §3.5
    cost = pl.CostEstimate(
        flops=flops_per_level_col * nlev * nb * lay.bc,
        bytes_accessed=(len(lev_blocks) + 3 + N_OUTPUTS)
        * nlev * nb * lay.bc * lay.dtype.itemsize,
        transcendentals=(12 if fuse_satur else 10) * nlev * nb * lay.bc,
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * N_OUTPUTS,
        out_shape=[lay.out_shape()] * N_OUTPUTS,
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=interpret,
        **_vmem_kw(vmem_limit_bytes),
    )(*lay.scalar_args(), *operands)

    if blocked:
        return Cloudsc2BlockedOutputs(*outs)
    return unblock_outputs(
        Cloudsc2BlockedOutputs(*outs), params, lay.ncol, levels_major
    )
