"""Physics constants and configuration groups.

TPU-native re-design of the reference parameter modules
(``src/common/module/yomcst.F90``, ``yoethf.F90``, ``yoecldp.F90``,
``yoephli.F90``, ``yoecld.F90``, ``yophnc.F90``, ``yomncl.F90``): each Fortran
module becomes a frozen dataclass; the ``*_LOAD_PARAMETERS`` HDF5 readers
(e.g. ``yomcst.F90:167-177``, ``yoethf.F90:79-99``) become ``from_h5``
constructors, and — because the upstream ``input.h5`` artifact is not shipped
with the reference snapshot — every group also has an ``ifs_defaults``
constructor carrying the standard IFS values (SUCST/SUPHEC/SUCLDP/SUPHLI
initialisations, cross-checked against the formulas used by
``src/common/include/fcttre.func.h``).

All groups are hashable pytree-static dataclasses so they can be closed over
by ``jax.jit`` without retracing on value identity.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Optional, Tuple

__all__ = [
    "Yomcst",
    "Yoethf",
    "Yrecldp",
    "Yrephli",
    "Yophnc",
    "Yomncl",
    "Params",
    "NCLV",
    "NCLDQL",
    "NCLDQI",
    "NCLDQR",
    "NCLDQS",
    "NCLDQV",
]

# Microphysics species indices (reference: yoecldp.F90:86-91; 0-based here).
NCLV = 5
NCLDQL = 0  # liquid
NCLDQI = 1  # ice
NCLDQR = 2  # rain
NCLDQS = 3  # snow
NCLDQV = 4  # vapour


def _freeze(cls):
    return dataclass(frozen=True)(cls)


@_freeze
class Yomcst:
    """Fundamental constants (reference: yomcst.F90, loaded at :167-177)."""

    rg: float = 9.80665
    rd: float = 287.0596736665907
    rv: float = 461.5249933083879
    rcpd: float = 1004.7088578330674
    retv: float = 0.6077667316114637
    rlvtt: float = 2.5008e6
    rlstt: float = 2.8345e6
    rlmlt: float = 0.3337e6
    rtt: float = 273.16

    @classmethod
    def ifs_defaults(cls) -> "Yomcst":
        # SUCST: derived from Boltzmann/Avogadro and molar masses.
        rkbol = 1.380658e-23
        rnavo = 6.0221367e23
        r = rnavo * rkbol
        rmd = 28.9644
        rmv = 18.0153
        rd = 1000.0 * r / rmd
        rv = 1000.0 * r / rmv
        rlvtt = 2.5008e6
        rlstt = 2.8345e6
        return cls(
            rg=9.80665,
            rd=rd,
            rv=rv,
            rcpd=3.5 * rd,
            retv=rv / rd - 1.0,
            rlvtt=rlvtt,
            rlstt=rlstt,
            rlmlt=rlstt - rlvtt,
            rtt=273.16,
        )

    @classmethod
    def from_h5(cls, f) -> "Yomcst":
        g = lambda k: float(f[k][0])
        return cls(
            rg=g("RG"),
            rd=g("RD"),
            rv=g("RV"),
            rcpd=g("RCPD"),
            retv=g("RETV"),
            rlvtt=g("RLVTT"),
            rlstt=g("RLSTT"),
            rlmlt=g("RLMLT"),
            rtt=g("RTT"),
        )

    def h5_items(self):
        return {
            "RG": self.rg,
            "RD": self.rd,
            "RV": self.rv,
            "RCPD": self.rcpd,
            "RETV": self.retv,
            "RLVTT": self.rlvtt,
            "RLSTT": self.rlstt,
            "RLMLT": self.rlmlt,
            "RTT": self.rtt,
        }


@_freeze
class Yoethf:
    """Saturation-curve constants (reference: yoethf.F90, loaded at :79-99)."""

    r2es: float = 380.16
    r3les: float = 17.502
    r3ies: float = 22.587
    r4les: float = 32.19
    r4ies: float = -0.7
    # R5* and R5AL*CP are SUPHEC derivations (R5LES = R3LES*(RTT-R4LES),
    # R5ALVCP = R5LES*RLVTT/RCPD, ...); these literals must stay equal to
    # what ifs_defaults() computes — from_h5 overrides them from file
    r5les: float = 4217.45694
    r5ies: float = 6185.67582
    r5alvcp: float = 10497584.68169531
    r5alscp: float = 17451123.253362577
    ralvdcp: float = 2489.08
    ralsdcp: float = 2821.21
    ralfdcp: float = 332.14
    rtwat: float = 273.16
    rtice: float = 250.16
    rticecu: float = 250.16
    rtwat_rtice_r: float = 1.0 / 23.0
    rtwat_rticecu_r: float = 1.0 / 23.0
    rkoop1: float = 2.583
    rkoop2: float = 0.48116e-2
    rvtmp2: float = 0.0

    @classmethod
    def ifs_defaults(cls, cst: Yomcst) -> "Yoethf":
        # SUPHEC / su_yoethf derivations.
        restt = 611.21
        r3les, r3ies = 17.502, 22.587
        r4les, r4ies = 32.19, -0.7
        r5les = r3les * (cst.rtt - r4les)
        r5ies = r3ies * (cst.rtt - r4ies)
        rtwat = cst.rtt
        rtice = cst.rtt - 23.0
        return cls(
            r2es=restt * cst.rd / cst.rv,
            r3les=r3les,
            r3ies=r3ies,
            r4les=r4les,
            r4ies=r4ies,
            r5les=r5les,
            r5ies=r5ies,
            r5alvcp=r5les * cst.rlvtt / cst.rcpd,
            r5alscp=r5ies * cst.rlstt / cst.rcpd,
            ralvdcp=cst.rlvtt / cst.rcpd,
            ralsdcp=cst.rlstt / cst.rcpd,
            ralfdcp=cst.rlmlt / cst.rcpd,
            rtwat=rtwat,
            rtice=rtice,
            rticecu=rtice,
            rtwat_rtice_r=1.0 / (rtwat - rtice),
            rtwat_rticecu_r=1.0 / (rtwat - rtice),
            rkoop1=2.583,
            rkoop2=0.48116e-2,
            # The reference's GT4Py driver pins RVTMP2 to zero
            # (cloudsc2_inputs.py:110); IFS does the same in SUPHEC.
            rvtmp2=0.0,
        )

    @classmethod
    def from_h5(cls, f) -> "Yoethf":
        g = lambda k: float(f[k][0])
        return cls(
            r2es=g("R2ES"),
            r3les=g("R3LES"),
            r3ies=g("R3IES"),
            r4les=g("R4LES"),
            r4ies=g("R4IES"),
            r5les=g("R5LES"),
            r5ies=g("R5IES"),
            r5alvcp=g("R5ALVCP"),
            r5alscp=g("R5ALSCP"),
            ralvdcp=g("RALVDCP"),
            ralsdcp=g("RALSDCP"),
            ralfdcp=g("RALFDCP"),
            rtwat=g("RTWAT"),
            rtice=g("RTICE"),
            rticecu=g("RTICECU"),
            rtwat_rtice_r=g("RTWAT_RTICE_R"),
            rtwat_rticecu_r=g("RTWAT_RTICECU_R"),
            rkoop1=g("RKOOP1"),
            rkoop2=g("RKOOP2"),
            rvtmp2=0.0,
        )

    def h5_items(self):
        return {
            "R2ES": self.r2es,
            "R3LES": self.r3les,
            "R3IES": self.r3ies,
            "R4LES": self.r4les,
            "R4IES": self.r4ies,
            "R5LES": self.r5les,
            "R5IES": self.r5ies,
            "R5ALVCP": self.r5alvcp,
            "R5ALSCP": self.r5alscp,
            "RALVDCP": self.ralvdcp,
            "RALSDCP": self.ralsdcp,
            "RALFDCP": self.ralfdcp,
            "RTWAT": self.rtwat,
            "RTICE": self.rtice,
            "RTICECU": self.rticecu,
            "RTWAT_RTICE_R": self.rtwat_rtice_r,
            "RTWAT_RTICECU_R": self.rtwat_rticecu_r,
            "RKOOP1": self.rkoop1,
            "RKOOP2": self.rkoop2,
            "RVTMP2": self.rvtmp2,
        }


@_freeze
class Yrecldp:
    """Cloud-scheme tunables (reference: yoecldp.F90, loaded at :242-370).

    CLOUDSC2 itself consumes only RCLCRIT, RKCONV, RPECONS and RLMIN
    (cloudsc2.F90:222-224); the remaining members are carried for schema
    parity with the reference input file.
    """

    rclcrit: float = 0.3e-3
    rclcrit_sea: float = 0.25e-3
    rclcrit_land: float = 0.55e-3
    rkconv: float = 1.0 / 6000.0
    rpecons: float = 5.547e-5
    rtaumel: float = 1.1880e4
    ramin: float = 1.0e-8
    rlmin: float = 1.0e-8
    rasmice: float = 0.252e-9
    rbsmice: float = 0.837

    @classmethod
    def ifs_defaults(cls) -> "Yrecldp":
        # SUCLDP standard values: critical cloud water 0.3 g/kg, Sundqvist
        # conversion time-scale 6000 s, Kessler evaporation constant such
        # that RG*RPECONS = 5.44e-4.
        return cls()

    @classmethod
    def from_h5(cls, f) -> "Yrecldp":
        def g(key, default):
            h5key = "YRECLDP_" + key.upper()
            return float(f[h5key][0]) if h5key in f else default

        d = cls()
        return cls(
            **{
                fld.name: g(fld.name, getattr(d, fld.name))
                for fld in dataclasses.fields(cls)
            }
        )

    def h5_items(self):
        return {
            "YRECLDP_" + fld.name.upper(): getattr(self, fld.name)
            for fld in dataclasses.fields(self)
        }


@_freeze
class Yrephli:
    """Linearised-physics switches (reference: yoephli.F90, loaded :79-97).

    The entry programs force LPHYLIN=.TRUE. (dwarf_cloudsc.F90:107).
    RLPTRC is the mixed-phase transition temperature used by the tanh
    water-fraction approximation (cloudsc2.F90:350); SUPHLI sets it to
    RTICE + (RTT-RTICE)/sqrt(2).
    """

    lphylin: bool = True
    ltlevol: bool = False
    rlptrc: float = 266.425
    rlpal1: float = 0.15
    rlpal2: float = 20.0

    @classmethod
    def ifs_defaults(cls) -> "Yrephli":
        rtt, rtice = 273.16, 250.16
        return cls(rlptrc=rtice + (rtt - rtice) / math.sqrt(2.0))

    @classmethod
    def from_h5(cls, f) -> "Yrephli":
        def g(key, default, cast=float):
            h5key = "YREPHLI_" + key.upper()
            return cast(f[h5key][0]) if h5key in f else default

        return cls(
            lphylin=True,  # forced by the entry program, as in the reference
            ltlevol=g("ltlevol", False, lambda v: bool(int(v))),
            rlptrc=g("rlptrc", 266.425),
            rlpal1=g("rlpal1", 0.15),
            rlpal2=g("rlpal2", 20.0),
        )

    def h5_items(self):
        return {
            "YREPHLI_LPHYLIN": int(self.lphylin),
            "YREPHLI_LTLEVOL": int(self.ltlevol),
            "YREPHLI_RLPTRC": self.rlptrc,
            "YREPHLI_RLPAL1": self.rlpal1,
            "YREPHLI_RLPAL2": self.rlpal2,
        }


@_freeze
class Yophnc:
    """Non-conservation / evaporation switches (reference: yophnc.F90).

    The entry programs allocate YRPHNC with LEVAPLS2=.FALSE.
    (dwarf_cloudsc.F90:104-105), disabling the clear-sky precipitation
    evaporation branch unless LDRAIN1D is set (cloudsc2.F90:557).
    """

    levapls2: bool = False

    @classmethod
    def ifs_defaults(cls) -> "Yophnc":
        return cls()


@_freeze
class Yomncl:
    """TL/AD regularisation switch (reference: yomncl.F90:24-29).

    LREGCL=.FALSE. for the Taylor (TL) test and .TRUE. for the adjoint
    test, mirroring the entry-program diff
    (cloudsc2_tl/dwarf_cloudsc.F90:103-105 vs cloudsc2_ad/...:105).
    """

    lregcl: bool = False

    @classmethod
    def ifs_defaults(cls) -> "Yomncl":
        return cls()


@_freeze
class Params:
    """Aggregate of every constant group consumed by the physics kernels.

    ``ceta`` — the eta coordinate of each full level (reference: YRECLD%CETA,
    built by the entry program as PAP(1,:,1)/PAPH(1,KLEV+1,1),
    dwarf_cloudsc.F90:100-102) — is a *tuple* so the whole Params object
    stays hashable / jit-static.
    """

    yomcst: Yomcst
    yoethf: Yoethf
    yrecldp: Yrecldp
    yrephli: Yrephli
    yophnc: Yophnc
    yomncl: Yomncl
    ceta: Tuple[float, ...]
    ptsphy: float = 3600.0

    @classmethod
    def ifs_defaults(cls, ceta, ptsphy: float = 3600.0) -> "Params":
        cst = Yomcst.ifs_defaults()
        return cls(
            yomcst=cst,
            yoethf=Yoethf.ifs_defaults(cst),
            yrecldp=Yrecldp.ifs_defaults(),
            yrephli=Yrephli.ifs_defaults(),
            yophnc=Yophnc.ifs_defaults(),
            yomncl=Yomncl.ifs_defaults(),
            ceta=tuple(float(c) for c in ceta),
            ptsphy=float(ptsphy),
        )

    def replace(self, **kw) -> "Params":
        return dataclasses.replace(self, **kw)

    @property
    def nlev(self) -> int:
        return len(self.ceta)
