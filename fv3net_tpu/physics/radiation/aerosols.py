"""Climatological tropospheric/stratospheric aerosol optics.

TPU re-derivation of the GFS radiation aerosol scheme's *algorithm*
(reference: external/radiation/radiation/radiation_aerosols.py —
``AerosolClass.setaer``/``aer_property``/``radclimaer``, WMO WCP-112
climatology): each layer is assigned one of five vertical domains
(mixing layer, mineral-transport layer, free troposphere, stratosphere,
upper stratosphere); tropospheric layers mix up to six OPAC-style
components, three RH-independent (insoluble/dust, soot, mineral) and
three hygroscopic (water-soluble, sea-salt accumulation + coarse) whose
band optical properties are linearly interpolated over the reference's
eight relative-humidity classes (``rhlev`` = 0, .5, .7, .8, .9, .95,
.98, .99 — radiation_aerosols.py:344); per-band aggregation follows the
reference exactly (radclimaer):

    ext = sum_c m_c ext_c         tau = ext * denn * dz[km]
    ssa = sum_c m_c ssa_c ext_c / ext
    asy = sum_c m_c asy_c sca_c / sca

The reference's measured OPAC tables live behind unreachable GCS data
files (`aerosol.dat`), so — exactly as with the RRTMG k-distributions
(rrtmg/tables.py) — ``make_aerosol_tables`` fabricates
documented-shape, climate-calibrated stand-ins (Angstrom spectral
slopes, OPAC-like single-scattering albedos, hygroscopic-growth curves);
real OPAC data can be dropped into the same dict layout.  The
horizontal composition climatology (``component_mixing``) is analytic
(land/ocean/latitude structure) instead of the reference's monthly
GOCART maps, which are likewise data-file-bound.

Everything is batched z-last JAX; the RH-class interpolation is a
one-hot weighted contraction (no gathers — CLAUDE.md TPU lesson).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from fv3net_tpu.ops import zscan
import numpy as np

from fv3net_tpu.physics.radiation.rrtmg.lw import _acc, _sdt

# the reference's RH classes (radiation_aerosols.py:344)
RHLEV = np.array([0.0, 0.5, 0.7, 0.8, 0.9, 0.95, 0.98, 0.99])
NRH = len(RHLEV)

# component order: RH-independent first (reference NCM1 split)
COMPONENTS = ("inso", "soot", "minm", "waso", "ssam", "sscm")
N_RHI = 3  # inso, soot, minm
N_RHD = 3  # waso, ssam, sscm

# species AOD diagnostic slots (reference NSPC: dust, BC, OC, SU, SS)
SPECIES = ("dust", "black_carbon", "water_soluble", "sulfate", "sea_salt")
_COMP_SPECIES = {  # component -> species index (reference idxspc role)
    "inso": 0, "minm": 0, "soot": 1, "waso": 2, "ssam": 4, "sscm": 4,
}

# per-component optical character used by the fabricated tables:
# (Angstrom exponent, ssa at 550 nm, asymmetry, hygroscopic-growth gamma)
_CHARACTER = {
    # fine absorbing/dust-like insoluble
    "inso": (0.25, 0.72, 0.80, 0.0),
    "soot": (1.20, 0.21, 0.50, 0.0),
    "minm": (0.30, 0.86, 0.78, 0.0),
    "waso": (1.50, 0.965, 0.63, 0.55),
    "ssam": (0.50, 1.00, 0.74, 0.65),
    "sscm": (0.05, 1.00, 0.82, 0.60),
}


def make_aerosol_tables(
    sw_lam_um: np.ndarray, lw_lam_um: np.ndarray
) -> Dict[str, np.ndarray]:
    """Fabricate reference-layout aerosol optical-property tables.

    Layout mirrors radiation_aerosols.py's ``extrhi``/``extrhd`` family:
      extrhi/scarhi/ssarhi/asyrhi: [N_RHI, nbands]
      extrhd/scarhd/ssarhd/asyrhd: [NRH, N_RHD, nbands]
      extstra: [nbands] stratospheric background extinction
    Bands are SW then LW (the reference's NSWLWBD concatenation); ext is
    normalized to 1 at 550 nm per dry component.
    """
    lam = np.concatenate([sw_lam_um, lw_lam_um])
    nb = lam.size

    def spectral(alpha):
        return (lam / 0.55) ** (-alpha)

    def ssa_of(lam_um, ssa550):
        # scattering efficiency collapses in the thermal IR (coarse
        # particles keep some): smooth roll-off beyond ~3 um
        roll = 1.0 / (1.0 + (lam_um / 3.0) ** 2)
        return np.clip(ssa550 * roll, 0.02, 1.0)

    extrhi = np.zeros((N_RHI, nb))
    scarhi = np.zeros((N_RHI, nb))
    ssarhi = np.zeros((N_RHI, nb))
    asyrhi = np.zeros((N_RHI, nb))
    for i, name in enumerate(COMPONENTS[:N_RHI]):
        alpha, ssa550, asy, _ = _CHARACTER[name]
        ext = spectral(alpha)
        ssa = ssa_of(lam, ssa550)
        extrhi[i] = ext
        ssarhi[i] = ssa
        scarhi[i] = ssa * ext
        asyrhi[i] = asy * np.clip(1.0 - 0.08 * np.log1p(lam / 0.55), 0.3, 1.0)

    extrhd = np.zeros((NRH, N_RHD, nb))
    scarhd = np.zeros((NRH, N_RHD, nb))
    ssarhd = np.zeros((NRH, N_RHD, nb))
    asyrhd = np.zeros((NRH, N_RHD, nb))
    for j, name in enumerate(COMPONENTS[N_RHI:]):
        alpha, ssa550, asy, gamma = _CHARACTER[name]
        for h, rh in enumerate(RHLEV):
            # hygroscopic growth: water uptake swells the particle --
            # extinction grows like (1-rh)^-gamma (Kasten/Hanel form),
            # the size growth flattens the Angstrom slope and pushes
            # ssa toward water's (1.0) and asy up
            grow = (1.0 - min(rh, 0.99)) ** (-gamma)
            alpha_eff = alpha / (1.0 + 0.5 * (grow - 1.0) / 6.0)
            ext = grow * spectral(alpha_eff)
            wet = 1.0 - 1.0 / grow  # 0 dry .. ->1 very wet
            ssa = ssa_of(lam, ssa550 * (1.0 - wet) + 1.0 * wet)
            extrhd[h, j] = ext
            ssarhd[h, j] = ssa
            scarhd[h, j] = ssa * ext
            asyrhd[h, j] = np.clip(
                (asy + 0.1 * wet)
                * np.clip(1.0 - 0.08 * np.log1p(lam / 0.55), 0.3, 1.0),
                0.0,
                0.95,
            )

    # stratospheric background sulfate (reference extstra role), per-km
    # optical depth: quiet-period column AOD(550) ~ 5e-3 over a ~12 km
    # aerosol-bearing stratosphere
    extstra = 4.0e-4 * spectral(1.0)
    return {
        "_sw_lam_um": np.asarray(sw_lam_um),
        "extrhi": extrhi, "scarhi": scarhi,
        "ssarhi": ssarhi, "asyrhi": asyrhi,
        "extrhd": extrhd, "scarhd": scarhd,
        "ssarhd": ssarhd, "asyrhd": asyrhd,
        "extstra": extstra,
    }


@dataclasses.dataclass(frozen=True)
class AerosolClimatology:
    """Analytic horizontal/vertical composition (the GOCART-map role).

    Numbers are calibrated so column AOD(550) lands in the
    climatological range: ~0.06 remote ocean, ~0.12 vegetated land,
    ~0.3+ in the dust belt.
    """

    mixing_layer_km: float = 2.0  # domain-1 depth above the surface
    transport_top_km: float = 4.0  # domain-2 (mineral transport) top
    tropopause_hpa: float = 110.0  # domain 3 -> 4 switch
    upper_strat_hpa: float = 5.0  # domain 4 -> 5 switch
    denn_mixing: float = 0.14  # number-density scaling, mixing layer
    denn_transport: float = 0.08  # mineral transport layer


def component_mixing(land_frac, lat, month: float = 6.5) -> jnp.ndarray:
    """Mixing-layer component fractions m_c [..., 6] (cmixg role).

    Ocean: sea salt + water-soluble + soot traces.  Land: water-soluble
    + insoluble + soot; the subtropical dust belt (|lat| in 10-35 deg
    over land) adds mineral loading.

    ``month`` (1..12, fractional ok) drives the seasonal cycle the
    reference gets from its monthly climatology maps (aer_update,
    radiation_aerosols.py:1216): dust mobilization peaks in the local
    summer hemisphere; sea salt follows the winter storm tracks.
    """
    lat_deg = jnp.rad2deg(lat)
    dust_belt = jnp.exp(-(((jnp.abs(lat_deg) - 22.0) / 12.0) ** 2))
    # seasonal phase: +1 at NH mid-summer (July), -1 in January
    season = jnp.cos(2.0 * jnp.pi * (month - 7.0) / 12.0)
    hemi = jnp.tanh(lat_deg / 15.0)  # +1 NH, -1 SH
    summer = 1.0 + 0.5 * season * hemi  # local-summer factor, 0.5..1.5
    winter = 1.0 - 0.35 * season * hemi  # local-winter factor
    # industrial/biomass band: NH midlatitudes + tropics
    pollution = 0.5 + 0.5 * jnp.exp(-(((lat_deg - 30.0) / 25.0) ** 2))
    ocean = 1.0 - land_frac
    m = {
        "inso": land_frac * (0.06 + 0.10 * dust_belt * summer),
        "soot": 0.02 * pollution,
        "minm": land_frac * 0.55 * dust_belt * summer,
        "waso": 0.35 * pollution + 0.15 * land_frac,
        "ssam": ocean * 0.45 * winter,
        "sscm": ocean * 0.12 * winter,
    }
    return jnp.stack([m[c] for c in COMPONENTS], axis=-1)


def _rh_weights(rh, wdtype=None) -> jnp.ndarray:
    """[..., NRH] linear-interpolation weights over the RH classes
    (one-hot formulation of the reference's ih1/ih2/rdrh search).
    The weight matrix is built DIRECTLY in ``wdtype`` (the RRTMG
    storage dtype — CLAUDE.md bf16 pattern) so the big [C, L, NRH]
    plane is written once at half width; the index/frac math stays in
    the input precision."""
    wdtype = wdtype or rh.dtype
    levs = jnp.asarray(RHLEV, rh.dtype)
    rhc = jnp.clip(rh, 0.0, float(RHLEV[-1]))
    # fractional class position
    idx = jnp.searchsorted(levs, rhc, side="right").astype(jnp.int32) - 1
    idx = jnp.clip(idx, 0, NRH - 2)
    lo = levs[idx]
    hi = levs[idx + 1]
    frac = ((rhc - lo) / (hi - lo)).astype(wdtype)
    iota = jnp.arange(NRH, dtype=jnp.int32)
    oh0 = (idx[..., None] == iota).astype(wdtype)
    oh1 = ((idx + 1)[..., None] == iota).astype(wdtype)
    return oh0 * (1.0 - frac)[..., None] + oh1 * frac[..., None]


def setaer(
    plyr_hpa, delz_km, rh, land_frac, lat,
    tables: Dict[str, jnp.ndarray],
    nbands_sw: int,
    clim: AerosolClimatology = AerosolClimatology(),
    month: float = 6.5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Aerosol optical properties for every layer and band.

    Args (all [C, L] surface-first like the RRTMG drivers, except
    land_frac/lat [C]): layer pressure (hPa), geometric thickness (km),
    relative humidity (0-1).

    Returns (aer_sw [C, L, nbands_sw, 3], aer_lw [C, L, nb_lw, 3],
    aerodp [C, len(SPECIES)+1]) with the (tau, ssa, asy) triples the
    band solvers consume and the per-species column AOD diagnostic
    (reference ``aerodp``).
    """
    dtype = plyr_hpa.dtype
    # all the big [C, L, nb]-class planes are held in the RRTMG storage
    # dtype (bf16 on accelerators): aerosol taus are a small additive
    # perturbation on the gas optics, so the ~0.4% quantization is far
    # below the ledgered bf16-storage flux error; f64 oracle runs are
    # never degraded (_sdt returns the compute dtype there)
    st = _sdt(dtype)
    acc = _acc(st)
    z_agl = zscan.cumsum(delz_km, axis=-1) - 0.5 * delz_km  # [C, L] km

    # vertical domains (reference aer_property's idmaer)
    in_mix = z_agl <= clim.mixing_layer_km
    in_transport = (~in_mix) & (z_agl <= clim.transport_top_km)
    in_strat = plyr_hpa < clim.tropopause_hpa
    in_upper = plyr_hpa < clim.upper_strat_hpa
    in_freetrop = (~in_mix) & (~in_transport) & (~in_strat)
    in_strat = in_strat & (~in_upper)

    m_mix = component_mixing(land_frac, lat, month).astype(st)  # [C, 6]
    wrh = _rh_weights(rh, st)  # [C, L, NRH]

    extrhi = jnp.asarray(tables["extrhi"], st)  # [3, nb]
    scarhi = jnp.asarray(tables["scarhi"], st)
    ssarhi = jnp.asarray(tables["ssarhi"], st)
    asyrhi = jnp.asarray(tables["asyrhi"], st)
    # RH-interpolated hygroscopic tables -> [C, L, 3, nb]
    ext_d = jnp.einsum("slh,hjb->sljb", wrh, jnp.asarray(tables["extrhd"], st))
    sca_d = jnp.einsum("slh,hjb->sljb", wrh, jnp.asarray(tables["scarhd"], st))
    ssa_d = jnp.einsum("slh,hjb->sljb", wrh, jnp.asarray(tables["ssarhd"], st))
    asy_d = jnp.einsum("slh,hjb->sljb", wrh, jnp.asarray(tables["asyrhd"], st))

    def aggregate(m):  # m: [C, L, 6] -> per-band mixture
        mi, md = m[..., :N_RHI], m[..., N_RHI:]
        ext = jnp.einsum("slc,cb->slb", mi, extrhi) + (
            md[..., None] * ext_d
        ).sum(-2)
        sca = jnp.einsum("slc,cb->slb", mi, scarhi) + (
            md[..., None] * sca_d
        ).sum(-2)
        ssa_num = jnp.einsum("slc,cb->slb", mi, ssarhi * extrhi) + (
            md[..., None] * ssa_d * ext_d
        ).sum(-2)
        asy_num = jnp.einsum("slc,cb->slb", mi, asyrhi * scarhi) + (
            md[..., None] * asy_d * sca_d
        ).sum(-2)
        return ext, sca, ssa_num, asy_num

    # --- domain 1: mixing layer with the full composition
    m1 = jnp.broadcast_to(
        m_mix[:, None, :], rh.shape + (len(COMPONENTS),)
    )
    ext1, sca1, ssa1n, asy1n = aggregate(m1)

    # --- domain 3: free troposphere, the reference's FIXED WMO mix
    # (radclimaer idom==3: 0.17e-3 inso + 0.4 soot + 0.59983 waso, n=730
    # but folded into a per-km extinction here via denn_ft).  The inso
    # and soot terms are compile-time row constants; only waso needs
    # the per-layer RH interpolation (exactly as in the reference)
    _C3 = (0.17e-3, 0.4, 0.59983)  # inso, soot, waso
    fixed3 = _C3[0] * extrhi[0] + _C3[1] * extrhi[1]  # [nb]
    ext3 = fixed3 + _C3[2] * ext_d[..., 0, :]
    sca3 = (
        _C3[0] * scarhi[0] + _C3[1] * scarhi[1]
        + _C3[2] * sca_d[..., 0, :]
    )
    ssa3n = (
        _C3[0] * ssarhi[0] * extrhi[0]
        + _C3[1] * ssarhi[1] * extrhi[1]
        + _C3[2] * (ssa_d * ext_d)[..., 0, :]
    )
    asy3n = (
        _C3[0] * asyrhi[0] * scarhi[0]
        + _C3[1] * asyrhi[1] * scarhi[1]
        + _C3[2] * (asy_d * sca_d)[..., 0, :]
    )
    denn_ft = 0.0078  # calibrated: free-troposphere AOD ~ 0.01-0.02

    # --- domain 2: mineral transport (pure minm component)
    ext2 = extrhi[2][None, None]
    sca2 = scarhi[2][None, None]
    ssa2n = (ssarhi[2] * extrhi[2])[None, None]
    asy2n = (asyrhi[2] * scarhi[2])[None, None]
    m_minm = m_mix[:, None, 2:3]  # transport strength follows the belt

    dz = delz_km[..., None].astype(st)
    denn1 = clim.denn_mixing
    denn2 = clim.denn_transport

    tau1 = jnp.where(in_mix[..., None], ext1 * denn1 * dz, 0.0)
    tau2 = jnp.where(
        in_transport[..., None], ext2 * m_minm * denn2 * dz, 0.0
    )
    tau3 = jnp.where(in_freetrop[..., None], ext3 * denn_ft * dz, 0.0)
    extstra = jnp.asarray(tables["extstra"], st)
    tau4 = jnp.where(in_strat[..., None], extstra[None, None] * dz, 0.0)

    tau = tau1 + tau2 + tau3 + tau4
    # blended ssa/asy: optical-depth-weighted mixture of the active
    # domain's aggregates (the reference assigns per-layer from the
    # single active domain; masks are disjoint so this is identical)
    eps = jnp.asarray(1e-30, st)

    def ratio(n, d):
        return jnp.clip(n / jnp.maximum(d, eps), 0.0, 1.0)

    ssa_dom1 = ratio(ssa1n, ext1)
    asy_dom1 = ratio(asy1n, sca1)
    ssa_dom2 = ratio(ssa2n, ext2)
    asy_dom2 = ratio(asy2n, sca2)
    ssa_dom3 = ratio(ssa3n, ext3)
    asy_dom3 = ratio(asy3n, sca3)
    nb = tau.shape[-1]
    # stratospheric ssa/asy constants (radclimaer idom 4/5): 0.99/0.696
    # in the SW bands, 0.5/0.3 in the LW bands
    is_sw = (jnp.arange(nb) < nbands_sw).astype(st)[None, None]
    ssa_dom4 = 0.99 * is_sw + 0.5 * (1.0 - is_sw)
    asy_dom4 = 0.696 * is_sw + 0.3 * (1.0 - is_sw)

    def sel(field1, field2, field3, field4):
        out = jnp.where(in_mix[..., None], field1, field4)
        out = jnp.where(in_transport[..., None], field2, out)
        out = jnp.where(in_freetrop[..., None], field3, out)
        return out

    ssa = sel(ssa_dom1, ssa_dom2, ssa_dom3, ssa_dom4)
    asy = sel(asy_dom1, asy_dom2, asy_dom3, asy_dom4)

    aer = jnp.stack([tau, ssa, asy], axis=-1)  # [C, L, nb, 3]
    aer_sw = aer[:, :, :nbands_sw]
    aer_lw = aer[:, :, nbands_sw:]

    # per-species column AOD at 550 nm (use SW band nearest 0.55 um as
    # the reference's nv_aod): attribute each domain's tau to species
    b550 = int(np.argmin(np.abs(np.asarray(tables["_sw_lam_um"]) - 0.55))) \
        if "_sw_lam_um" in tables else 0
    # per-component 550 nm extinction [C, L, 6] (RH-indep rows are
    # constants, hygroscopic rows RH-interpolated)
    exts550 = jnp.concatenate(
        [
            jnp.broadcast_to(
                extrhi[:, b550], rh.shape + (N_RHI,)
            ),
            ext_d[..., b550],
        ],
        axis=-1,
    )
    # per-component mixing coefficient across the tropospheric domains
    # (mixing layer + the fixed WMO free-troposphere mix); domains are
    # disjoint so the sum attributes every tropospheric tau to a
    # component, as the reference's idxspc bookkeeping does
    m3c = jnp.asarray(
        [_C3[0], _C3[1], 0.0, _C3[2], 0.0, 0.0], st
    )
    coeff = (
        m1 * denn1 * in_mix[..., None]
        + m3c * denn_ft * in_freetrop[..., None]
    )
    comp_tau550 = coeff * exts550 * dz  # [C, L, 6]
    # column sums accumulate in the compute dtype (bf16 accumulation
    # over 32 layers would lose ~2 bits)
    col = comp_tau550.sum(axis=1, dtype=acc)  # [C, 6]
    spc = []
    for s in range(len(SPECIES)):
        tot = jnp.zeros_like(col[..., 0])
        for ci, cname in enumerate(COMPONENTS):
            if _COMP_SPECIES[cname] == s:
                tot = tot + col[..., ci]
        spc.append(tot)
    # mineral transport counts as dust; stratosphere as sulfate
    spc[0] = spc[0] + (tau2[..., b550]).sum(axis=1, dtype=acc)
    spc[3] = spc[3] + (tau4[..., b550]).sum(axis=1, dtype=acc)
    total = tau[..., b550].sum(axis=1, dtype=acc)
    aerodp = jnp.stack(spc + [total], axis=-1)
    return aer_sw, aer_lw, aerodp
