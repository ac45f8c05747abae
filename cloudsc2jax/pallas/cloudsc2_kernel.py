"""Fused Pallas TPU kernel for the nonlinear CLOUDSC2 sweep.

Design (cf. SURVEY §7 step 5, and the tiling rules of the Pallas TPU
guide):

* Columns are reshaped to ``(NB, S, 128)`` — S×128 columns per block fill
  whole VPU tiles (8×128 for f32).  The kernel grid is ``(NB, nlev)`` with
  the **level axis innermost**: TPU grids execute sequentially, so the
  vertical recurrence (rain/snow fluxes + max-overlap fraction,
  cloudsc2.F90:339,475-481,720-723) is carried in VMEM scratch across
  level steps — the TPU-native analogue of the Fortran level loop, with
  every per-level field streamed HBM→VMEM once and double-buffered by the
  Pallas pipeline.
* Everything level-local that XLA fuses well (first-guess state, dp,
  latent-heat factors, the tropopause scan) is computed *outside* the
  kernel; the kernel body holds only the transcendental-heavy per-level
  physics.
* The kernel is the f32 performance path (the -DSINGLE analogue,
  parkind1.F90:40-44).  f64 validation runs use the pure-JAX kernel; the
  two are cross-checked in tests (interpret mode on CPU).

The kernel computes identical math to
:func:`cloudsc2jax.physics.cloudsc2.cloudsc2` — one source of truth for
semantics, this file only re-schedules it for the MXU/VPU memory system.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import Params
from ..physics.cloudsc2 import (
    Cloudsc2Inputs,
    Cloudsc2Outputs,
    _ZEPS1,
    _ZEPS2,
    _ZQMAX,
    _ZSCAL,
    _crit_rel_humidity,
    _tropopause_eta,
)

__all__ = ["cloudsc2_pallas"]


def _level_kernel(
    # per-level scalars (SMEM)
    ceta_ref, zscalm_ref, notlast_ref,
    # level-varying blocks (VMEM, one level per step)
    ztp1_ref, zqp1_ref, zl_ref, zi_ref, pap_ref, pqs_ref, plude_ref,
    plunext_ref, pmfu_ref, pmfd_ref, zdp_ref,
    # column-constant blocks
    ztrpaus_ref, paphsfc_ref,
    # outputs
    tent_ref, tenq_ref, tenl_ref, teni_ref, pclc_ref, pcov_ref,
    rfln_ref, sfln_ref,
    # carry scratch
    rfl_s, sfl_s, cov_s,
    *,
    params: Params,
    ldrain1d: bool,
):
    cst, thf = params.yomcst, params.yoethf
    cldp, phli, phnc = params.yrecldp, params.yrephli, params.yophnc
    ptsphy = params.ptsphy

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        rfl_s[...] = jnp.zeros_like(rfl_s)
        sfl_s[...] = jnp.zeros_like(sfl_s)
        cov_s[...] = jnp.zeros_like(cov_s)

    f32 = ztp1_ref.dtype
    one = jnp.asarray(1.0, f32)

    zckcodtl = 2.0 * cldp.rkconv * ptsphy
    zckcodti = 5.0 * cldp.rkconv * ptsphy
    zcons2 = 1.0 / (ptsphy * cst.rg)
    zcons3 = cst.rlvtt / cst.rcpd
    zmeltp2 = cst.rtt + 2.0
    zqtmst = 1.0 / ptsphy

    # full (nlev, 1) arrays live in SMEM; pick this step's level scalar
    ceta_k = ceta_ref[k, 0]
    zscalm_k = zscalm_ref[k, 0]
    not_last = notlast_ref[k, 0] > 0

    ztp1 = ztp1_ref[0, 0]
    zqp1 = zqp1_ref[0, 0]
    zl = zl_ref[0, 0]
    zi = zi_ref[0, 0]
    pap = pap_ref[0, 0]
    pqs = pqs_ref[0, 0]
    plude = plude_ref[0, 0]
    plu_k1 = plunext_ref[0, 0]
    pmfu = pmfu_ref[0, 0]
    pmfd = pmfd_ref[0, 0]
    zdp = zdp_ref[0, 0]
    ztrpaus = ztrpaus_ref[0]
    paph_sfc = paphsfc_ref[0]

    zrfl = rfl_s[...]
    zsfl = sfl_s[...]
    zcovptot = cov_s[...]

    # latent-heat factors (cloudsc2.F90:272-277)
    zzz = 1.0 / (cst.rcpd + cst.rcpd * thf.rvtmp2 * zqp1)
    zlfdcp = cst.rlmlt * zzz
    zlsdcp = cst.rlstt * zzz
    zlvdcp = cst.rlvtt * zzz

    # --- 3.1 dqs/dT (LPHYLIN branch: cloudsc2.F90:349-364)
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

    # --- cloud cover (cloudsc2.F90:412-427)
    zqt = zqp1 + zl + zi
    zqpd = zqsat - zqt
    zqcd = zqsat - zqcrit
    mid = (zqt > zqcrit) & (zqt < zqsat)
    denom = zqcd - zscalm_k * (zqt - zqcrit)
    denom_safe = jnp.where(mid, denom, one)
    ratio = jnp.where(mid, zqpd, 0.0) / denom_safe
    pclc_mid = 1.0 - jnp.sqrt(jnp.maximum(ratio, 0.0))
    zqc_mid = (zscalm_k * zqpd + (1.0 - zscalm_k) * zqcd) * pclc_mid**2
    saturated = zqt >= zqsat
    pclc = jnp.where(mid, pclc_mid, jnp.where(saturated, one, 0.0))
    zqc = jnp.where(
        mid, zqc_mid, jnp.where(saturated, (1.0 - zscalm_k) * zqcd, 0.0)
    )

    # --- convective detrainment (cloudsc2.F90:431-444)
    zgdp = cst.rg / zdp
    zlude = plude * ptsphy * zgdp
    llo1 = not_last & (zlude >= cldp.rlmin) & (plu_k1 >= _ZEPS2)
    plu_safe = jnp.where(llo1, plu_k1, one)
    pclc = jnp.where(
        llo1, pclc + (1.0 - pclc) * (1.0 - jnp.exp(-zlude / plu_safe)), pclc
    )
    zqc = jnp.where(llo1, zqc + zlude, zqc)

    # --- compensating subsidence (cloudsc2.F90:448-460)
    zrho = pap / (cst.rd * ztp1)
    zrodqsdp = -zrho * pqs / (pap - cst.retv * zfoeew)
    zldcp = zfwat * zlvdcp + (1.0 - zfwat) * zlsdcp
    zfac3 = 1.0 / (1.0 + zldcp * zdqsdtemp)
    dtdzmo = cst.rg * (1.0 / cst.rcpd - zldcp * zrodqsdp) * zfac3
    zdqsdz = zdqsdtemp * dtdzmo - cst.rg * zrodqsdp
    zdqc_sub = zdqsdz * (pmfu + pmfd) * ptsphy / zrho
    zqc = zqc - jnp.where(zdqc_sub < zqc, zdqc_sub, zqc)

    # --- condensation rates (cloudsc2.F90:464-469)
    zqlwc = zqc * zfwat
    zqiwc = zqc * (1.0 - zfwat)
    zcondl = (zqlwc - zl) * zqtmst
    zcondi = (zqiwc - zi) * zqtmst

    # --- precip overlap (cloudsc2.F90:475-481)
    zcovptot = jnp.maximum(zcovptot, pclc)
    zcovpclr = jnp.maximum(zcovptot - pclc, 0.0)

    # --- snow melt (cloudsc2.F90:487-498)
    zcons = zcons2 * zdp / zlfdcp
    zsnmlt = jnp.minimum(zsfl, zcons * jnp.maximum(0.0, ztp1 - zmeltp2))
    zrfln = zrfl + zsnmlt
    zsfln = zsfl - zsnmlt
    ztp1 = ztp1 - zsnmlt / zcons

    # --- autoconversion (cloudsc2.F90:504-534)
    levapls2 = bool(phnc.levapls2)
    active = pclc > _ZEPS2
    pclc_safe = jnp.where(active, pclc, one)
    zlcrit_l = 1.9 * cldp.rclcrit if (levapls2 or ldrain1d) else 2.0 * cldp.rclcrit
    zcldl = zqlwc / pclc_safe
    zdl = zckcodtl * (1.0 - jnp.exp(-((zcldl / zlcrit_l) ** 2)))
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
    zinew = pclc * zcldi * jnp.exp(-zdi)
    zprs = jnp.where(active, zqiwc - zinew, 0.0)
    zqiwc = zqiwc - zprs

    # --- freezing split (cloudsc2.F90:538-552)
    zdr = zcons2 * zdp * (zprr + zprs)
    cold = ztp1 < cst.rtt
    zrfreeze = jnp.where(cold, zcons2 * zdp * zprr, 0.0)
    zfwatr = jnp.where(cold, 0.0, one)
    zrfln = zrfln + zfwatr * zdr
    zsfln = zsfln + (1.0 - zfwatr) * zdr

    # --- clear-sky precip evaporation (cloudsc2.F90:556-591)
    zprtot = zrfln + zsfln
    if levapls2 or ldrain1d:
        llo2 = (zprtot > _ZEPS2) & (zcovpclr > _ZEPS2)
        covptot_safe = jnp.where(llo2, zcovptot, one)
        covpclr_safe = jnp.where(llo2, zcovpclr, one)
        one_m_clc = jnp.where(llo2, (1.0 - pclc) ** 2, one)
        zpreclr = zprtot * zcovpclr / covptot_safe
        zqe = pqs - (pqs - zqlim) * zcovpclr / one_m_clc
        zbeta = (
            cst.rg
            * cldp.rpecons
            * (jnp.sqrt(pap / paph_sfc) / 5.09e-3 * zpreclr / covpclr_safe)
            ** 0.5777
        )
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

    # --- tendencies + first guess (cloudsc2.F90:601-618)
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

    # --- inlined saturation adjustment (cloudsc2.F90:628-669)
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

    # --- post-adjustment accounting (cloudsc2.F90:672-692)
    zdq = jnp.maximum(0.0, zqold - zqp1)
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

    # --- outputs + carry (cloudsc2.F90:694-723)
    tent_ref[0, 0] = zdtdt
    tenq_ref[0, 0] = zdqdt
    tenl_ref[0, 0] = (zqlwc - zl) * zqtmst
    teni_ref[0, 0] = (zqiwc - zi) * zqtmst
    pclc_ref[0, 0] = pclc
    pcov_ref[0, 0] = pcov
    rfln_ref[0, 0] = zrfln
    sfln_ref[0, 0] = zsfln
    rfl_s[...] = zrfln
    sfl_s[...] = zsfln
    cov_s[...] = zcovptot


def cloudsc2_pallas(
    inputs: Cloudsc2Inputs,
    params: Params,
    *,
    ldrain1d: bool = False,
    sublanes: int = 8,
    interpret: bool = False,
) -> Cloudsc2Outputs:
    """Fused-kernel CLOUDSC2; drop-in for :func:`cloudsc2` (f32 path).

    Columns are padded to a multiple of ``sublanes*128`` (padding columns
    replicate column 0, then are stripped — inputs are tile-replicated
    upstream anyway, expand_mod.F90 semantics).
    """
    # note: field names pl/pi would shadow `pallas as pl` — suffix them
    (paph, pap, pq, pqs, pt, pl_, pi_, plude, plu, pmfu, pmfd,
     ten_t, ten_q, ten_l, ten_i, psupsat) = [jnp.asarray(x) for x in inputs]
    dtype = pt.dtype
    ncol, nlev = pt.shape
    ptsphy = params.ptsphy

    bc = sublanes * 128
    nb = max(1, math.ceil(ncol / bc))
    npad = nb * bc - ncol

    def padcols(x):
        if npad == 0:
            return x
        return jnp.concatenate([x, jnp.broadcast_to(x[:1], (npad,) + x.shape[1:])], 0)

    # ---- precompute level-local derived fields (XLA-fused elementwise)
    ztp1 = pt + ptsphy * ten_t
    zqp1 = pq + ptsphy * ten_q + psupsat
    zl = pl_ + ptsphy * ten_l
    zi = pi_ + ptsphy * ten_i
    zdp = paph[:, 1:] - paph[:, :-1]
    plu_next = jnp.concatenate([plu[:, 1:], jnp.zeros((ncol, 1), dtype)], axis=1)
    ceta = jnp.asarray(params.ceta, dtype)
    ztrpaus = _tropopause_eta(ztp1, ceta)
    paph_sfc = paph[:, nlev]
    zscalm = (_ZSCAL * jnp.maximum(ceta - 0.2, _ZEPS1) ** 0.2).astype(dtype)
    notlast = (jnp.arange(nlev) < nlev - 1).astype(jnp.int32)

    def to_blocks(x):  # (ncol, nlev) -> (nlev, nb, S, 128)
        x = padcols(x)
        return x.T.reshape(nlev, nb, sublanes, 128)

    lev_fields = [ztp1, zqp1, zl, zi, pap, pqs, plude, plu_next, pmfu, pmfd, zdp]
    lev_blocks = [to_blocks(x) for x in lev_fields]
    ztrpaus_b = padcols(ztrpaus).reshape(nb, sublanes, 128)
    paphsfc_b = padcols(paph_sfc).reshape(nb, sublanes, 128)

    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)  # whole (nlev,1) array
    lev_spec = pl.BlockSpec(
        (1, 1, sublanes, 128), lambda b, k: (k, b, 0, 0), memory_space=pltpu.VMEM
    )
    col_spec = pl.BlockSpec(
        (1, sublanes, 128), lambda b, k: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, 1, sublanes, 128), lambda b, k: (k, b, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((nlev, nb, sublanes, 128), dtype)

    flops_per_level_col = 292  # SURVEY §3.5
    cost = pl.CostEstimate(
        flops=flops_per_level_col * nlev * nb * bc,
        bytes_accessed=(len(lev_fields) + 8) * nlev * nb * bc * dtype.itemsize,
        transcendentals=10 * nlev * nb * bc,
    )

    kernel = functools.partial(_level_kernel, params=params, ldrain1d=ldrain1d)
    outs = pl.pallas_call(
        kernel,
        grid=(nb, nlev),
        in_specs=[smem_spec] * 3 + [lev_spec] * len(lev_blocks) + [col_spec] * 2,
        out_specs=[out_spec] * 8,
        out_shape=[out_shape] * 8,
        scratch_shapes=[pltpu.VMEM((sublanes, 128), dtype)] * 3,
        cost_estimate=cost,
        interpret=interpret,
    )(
        ceta.reshape(nlev, 1), zscalm.reshape(nlev, 1), notlast.reshape(nlev, 1),
        *lev_blocks, ztrpaus_b, paphsfc_b,
    )

    def from_blocks(x):  # (nlev, nb, S, 128) -> (ncol, nlev)
        return x.reshape(nlev, nb * bc).T[:ncol]

    tent, tenq, tenl, teni, pclc, pcov, rfln, sfln = [from_blocks(o) for o in outs]

    top = jnp.zeros((ncol, 1), dtype)
    pfplsl = jnp.concatenate([top, rfln], axis=1)
    pfplsn = jnp.concatenate([top, sfln], axis=1)
    return Cloudsc2Outputs(
        tenl_t=tent,
        tenl_q=tenq,
        tenl_l=tenl,
        tenl_i=teni,
        pclc=pclc,
        pfplsl=pfplsl,
        pfplsn=pfplsn,
        pfhpsl=-pfplsl * params.yomcst.rlvtt,
        pfhpsn=-pfplsn * params.yomcst.rlstt,
        pcovptot=pcov,
    )
