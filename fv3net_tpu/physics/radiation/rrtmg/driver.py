"""GFS-driver adapter for the real RRTMG band solvers.

The ``Radiation``-wrapper-shaped surface (reference wrapper_api.py:119-349
+ radiation_driver.py _GFS_radiation_driver:380): one pure call of
(time, named state columns) -> RENAME_OUT-named fluxes and heating rates,
now backed by the oracle-validated RRTMG-LW/SW solvers (lw.py / sw.py)
instead of the synthetic band model (physics/radiation/driver.py, kept as
scheme "synthband").

K-tables default to the documented-shape synthetic set (tables.py) since
the real GCS lookup data is unreachable here; pass ``lw_tables`` /
``sw_tables`` dicts (reference netCDF layout) to run with real data.
"""
from __future__ import annotations

import dataclasses
import datetime
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.constants import GRAVITY, RDGAS
from fv3net_tpu.ops import thermo, zenith
from fv3net_tpu.physics.radiation import aerosols as aer_mod
from fv3net_tpu.physics.radiation import gases, optics
from fv3net_tpu.physics.radiation.rrtmg import lw as rlw
from fv3net_tpu.physics.radiation.rrtmg import params as P
from fv3net_tpu.physics.radiation.rrtmg import sw as rsw
from fv3net_tpu.physics.radiation.rrtmg import tables as rtables

# representative halocarbon volume mixing ratios (reference
# radiation_gases.py defaults)
_CFC11 = 2.6e-10
_CFC12 = 5.3e-10
_CFC22 = 1.1e-10
_CCL4 = 9.0e-11

# continental vs maritime aerosol optical character per SW band
# (compact stand-in for radiation_aerosols.py's climatological maps:
# Angstrom spectral slope on extinction, band-dependent ssa/asy)
_SW_BAND_WVN = np.array([
    2925.0, 3625.0, 4325.0, 4900.0, 5650.0, 6925.0, 7875.0, 10450.0,
    14425.0, 19325.0, 25825.0, 33500.0, 44000.0, 1710.0,
])  # band-center wavenumbers cm-1 (published RRTMG-SW band bounds)
_SW_LAM_UM = 1.0e4 / _SW_BAND_WVN
_LW_BAND_WVN = np.array([
    180.0, 425.0, 565.0, 665.0, 760.0, 900.0, 1030.0, 1130.0,
    1285.0, 1435.0, 1640.0, 1940.0, 2165.0, 2315.0, 2490.0, 2925.0,
])  # band-center wavenumbers cm-1 (published RRTMG-LW band bounds)
_LW_LAM_UM = 1.0e4 / _LW_BAND_WVN


@dataclasses.dataclass
class RRTMGConfig:
    iovr: int = 1  # max-random overlap
    isol: int = 0
    ico2: int = 0
    iaer: int = 1
    icld: int = 1
    year: int = 2016
    mcica_seed: int = 42
    solcon: float = 1368.22
    # compute transmittances with direct exp instead of the reference's
    # quantized lookup tables (identical function, ~1e-4 quantization
    # difference, no 62M-index gathers) — the TPU production default
    fast_exp: bool = True
    # MXU precision of the k-table selection/interpolation contractions:
    # "highest" (full f32, bit-exact row selection vs the reference),
    # "high" (3-pass bf16) or "default" (1-pass bf16).  Process-wide
    # (read at jit trace time; see lw.set_matmul_precision).  "high" is
    # the TPU production default: measured on v5e against "highest",
    # LW fluxes agree to 2e-4 W/m2, SW surface flux to 1 W/m2 (0.1%,
    # far below McICA subcolumn noise), heating to 2.6e-6 K/s, for ~10%
    # of the whole radiation call back (262->238 ms on C48/nz32).  CPU
    # runs (and the oracle tests) are unaffected — precision tiers only
    # change TPU MXU pass counts
    matmul_precision: str = "high"
    # solver-scan unroll: None = leave the process-wide setting alone
    # (module default: AUTO = full unroll on accelerators — measured
    # 325 -> 315 ms/chunk on the v5e C48 hourly-RRTMG workload — and 1
    # on CPU where full unroll only multiplies LLVM compile time; env
    # FV3NET_RRTMG_SCAN_UNROLL overrides).  Set -1/0/>=1 to pin
    # auto/full/explicit for programs built from this driver.
    # Bit-identical numerics across settings (lw.set_scan_unroll)
    scan_unroll: Optional[int] = None
    # storage dtype of the big [C, L, ngpt]-class intermediates:
    # "auto" (bfloat16 on accelerators, float32 on CPU), "float32"
    # (exact) or "bfloat16" (halves the dominant HBM traffic of the
    # bandwidth-bound solvers — measured 63.3 -> 70.7 SYPD on the v5e
    # flagship; all index math, interpolation weights, transmittance
    # math, and flux accumulations stay f32, and the measured flux
    # deviation, <=0.13 W/m2, is far below per-call McICA subcolumn
    # noise — docs/performance.md).  None = leave the process-wide
    # setting alone (module default: auto, or env
    # FV3NET_RRTMG_STORAGE).  Read at jit trace time
    # (lw.set_storage_dtype); f64 oracle runs are never degraded
    storage_dtype: Optional[str] = None
    # column blocking (the GFS driver's ngptc blocking role, reference
    # radiation_driver.py drives the solvers in lat-row chunks): run the
    # LW/SW solvers over blocks of columns via lax.map so the peak HBM
    # working set of the [C, L, ngpt]-class planes scales with the
    # BLOCK, not the grid — required for C96+/C192 single-chip runs
    # (one C192 [C, L, 140] f32 plane is ~4 GB).  None = auto (env
    # FV3NET_RRTMG_COLBLOCK; default: 16384-column blocks on a single
    # accelerator when the grid exceeds one block, off on CPU and
    # sharded meshes where the column axis is already partitioned),
    # 0 = off, >0 = explicit block size.  Blocked and full-width paths
    # agree to f32 roundoff (all solver math is per-column; XLA only
    # reassociates contractions differently per batch shape — measured
    # max flux delta 1.5e-3 W/m2); the SW daylight compression packs
    # within each block
    column_block: Optional[int] = None
    # lower bound on layer pressures (mb): shrinks the upper-atmosphere
    # one-hot weight planes to the rows the jp index can actually reach
    # (lw.nbase_hi_for — a 3 hPa model top cuts [C, L, 236] -> 96-row
    # planes with IDENTICAL results, since rows beyond the bound carry
    # zero selection weight).  Default = this build's fixed model-top
    # interface pressure (core.constants.TOA_PRESSURE); None disables
    min_pressure_mb: Optional[float] = None


def _default_min_pressure_mb() -> float:
    from fv3net_tpu.core.constants import TOA_PRESSURE

    return TOA_PRESSURE / 100.0


def _column_block_default(ncol: int) -> int:
    """Auto column-block size: 16k-column blocks on one accelerator for
    grids bigger than one block; 0 (off) on CPU, under multi-device
    meshes (the column axis is already partitioned per device), and for
    grids that fit one block.  Env FV3NET_RRTMG_COLBLOCK=off/0/<int>
    overrides."""
    import os

    mode = os.environ.get("FV3NET_RRTMG_COLBLOCK", "auto").lower()
    if mode in ("0", "off", "false"):
        return 0
    if mode not in ("", "auto"):
        return int(mode)
    try:
        if jax.default_backend() == "cpu" or len(jax.devices()) != 1:
            return 0
    except Exception:  # noqa: BLE001
        return 0
    if ncol <= 16384:
        return 0
    # prefer an EXACT divisor of the column count: the padded path must
    # pad + reshape EVERY [C, ...] radiation input into [nblk, blk, ...]
    # (a full copy per plane — measured ~135 ms/call of pure data
    # rearrangement at C192), while an exact leading-axis split is a
    # free reshape.  Cube grids (6 n^2) always have a divisor near the
    # 16384 working-set target: C96 -> 4 x 13824, C192 -> 16 x 13824
    nblk = -(-ncol // 16384)
    for k in range(nblk, 4 * nblk + 1):
        if ncol % k == 0:
            return ncol // k
    # no clean divisor: even the blocks out (lane-aligned) so the
    # padded tail is tiny
    return -(-(-(-ncol // nblk)) // 8) * 8


def _map_blocked(fn, args, blk: int):
    """Run ``fn(*args) -> dict`` over column blocks with ``lax.map``.

    Each arg has a leading column axis; ragged tails are edge-padded
    (replicated real columns, so the solver sees physical inputs) and
    the pad rows are dropped from every output.  The body compiles
    once; blocks execute sequentially, bounding the live [blk, L, G]
    working set."""
    ncol = args[0].shape[0]
    nblk = -(-ncol // blk)
    pad = nblk * blk - ncol

    def prep(a):
        if pad:
            a = jnp.pad(
                a, ((0, pad),) + ((0, 0),) * (a.ndim - 1), mode="edge"
            )
        return a.reshape((nblk, blk) + a.shape[1:])

    out = jax.lax.map(lambda xs: fn(*xs), tuple(prep(a) for a in args))
    return {
        k: v.reshape((nblk * blk,) + v.shape[2:])[:ncol]
        for k, v in out.items()
    }


class RRTMGDriver:
    """Builds table data once; ``__call__`` is pure and jit-friendly."""

    def __init__(
        self,
        config: RRTMGConfig = RRTMGConfig(),
        lw_tables: Optional[Dict] = None,
        sw_tables: Optional[Dict] = None,
        dtype=jnp.float32,
    ):
        self.config = config
        min_p = (
            config.min_pressure_mb
            if config.min_pressure_mb is not None
            else _default_min_pressure_mb()
        )
        nbase_hi = rlw.nbase_hi_for(min_p)
        self.Tlw = rlw.prep_lw_tables(
            lw_tables or rtables.make_lw_tables(), dtype,
            nbase_hi=nbase_hi,
        )
        self.Tsw = rsw.prep_sw_tables(
            sw_tables or rtables.make_sw_tables(), dtype,
            nbase_hi=nbase_hi,
        )
        # OPAC-style climatological aerosol optics (iaer=1 default;
        # reference radiation_aerosols.py machinery, synthetic tables)
        self.Taer = aer_mod.make_aerosol_tables(_SW_LAM_UM, _LW_LAM_UM)
        self.dtype = dtype

    def _aerosols(self, play_mb, dp_mb, land, nbands, lw_mode):
        """[C, L, nbands, 3] (tau, ssa, asy); boundary-layer climatology
        with an Angstrom spectral slope for SW and a flat gray
        absorption for LW."""
        aod550 = 0.12 * land + 0.06 * (1.0 - land)
        w = dp_mb * (play_mb > 700.0)
        w = w / jnp.maximum(w.sum(-1, keepdims=True), 1.0)
        prof = aod550[:, None] * w  # [C, L]
        if lw_mode:
            tau = prof[..., None] * 0.06 * jnp.ones(nbands, self.dtype)
            ssa = jnp.zeros_like(tau)
            asy = jnp.zeros_like(tau)
        else:
            spectral = jnp.asarray(
                (_SW_LAM_UM / 0.55) ** -1.3, self.dtype
            )
            tau = prof[..., None] * spectral
            ssa = jnp.full_like(tau, 0.95)
            asy = jnp.full_like(tau, 0.70)
        return jnp.stack([tau, ssa, asy], axis=-1)

    def __call__(
        self,
        time: datetime.datetime,
        state: Dict[str, jnp.ndarray],
        cosz: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """state: z-last columns with z index 0 = model TOP (this
        framework's convention; flipped internally to the solvers'
        surface-first order).  Same keys as the synthband driver."""
        cfg = self.config
        # set the contraction precision at TRACE time so each driver's
        # jitted program gets ITS config even when several drivers with
        # different tiers coexist in one process (the knob is a module
        # global read while the solver ops are being built)
        rlw.set_matmul_precision(cfg.matmul_precision)
        if cfg.scan_unroll is not None:
            rlw.set_scan_unroll(cfg.scan_unroll)
        if cfg.storage_dtype is not None:
            rlw.set_storage_dtype(cfg.storage_dtype)
        dt = self.dtype
        T_in = state["air_temperature"]
        lead, nz = T_in.shape[:-1], T_in.shape[-1]
        ncol = int(np.prod(lead)) if lead else 1

        def cols(x, flip=True):
            x = jnp.asarray(x, dt).reshape(
                (ncol,) + jnp.shape(x)[len(lead):]
            )
            return x[:, ::-1] if (flip and x.ndim > 1) else x

        T = cols(T_in)  # [C, L] surface-first
        dp_pa = cols(state["pressure_thickness_of_atmospheric_layer"])
        q = (
            cols(state["specific_humidity"])
            if "specific_humidity" in state
            else jnp.full((ncol, nz), 1e-6, dt)
        )
        qc = (
            cols(state["cloud_water_mixing_ratio"])
            if "cloud_water_mixing_ratio" in state
            else jnp.zeros((ncol, nz), dt)
        )
        tsfc = cols(state["surface_temperature"], flip=False)
        lat = cols(state["latitude"], flip=False)
        lon = cols(state["longitude"], flip=False)
        land = jnp.clip(
            cols(state.get("land_sea_mask", jnp.zeros(lead)), flip=False),
            0.0, 1.0,
        )
        ice = jnp.clip(
            cols(state.get("ice_fraction", jnp.zeros(lead)), flip=False),
            0.0, 1.0,
        )

        # pressures in mb, surface-first levels
        dp_td = jnp.asarray(
            state["pressure_thickness_of_atmospheric_layer"], dt
        ).reshape(ncol, nz)
        plev_td = thermo.pressure_at_interface(dp_td)  # [C, L+1] top-down
        plvl = plev_td[:, ::-1] * 0.01
        plyr = (0.5 * (plev_td[..., :-1] + plev_td[..., 1:]))[:, ::-1] * 0.01
        delp = dp_pa * 0.01
        # interface temperatures, surface-first: level 0 extrapolates
        # below the lowest layer, level L above the top layer
        tlvl = jnp.concatenate(
            [
                T[:, :1] + 0.25 * (T[:, :1] - T[:, 1:2]),
                0.5 * (T[:, :-1] + T[:, 1:]),
                T[:, -1:] - 0.25 * (T[:, -2:-1] - T[:, -1:]),
            ],
            axis=-1,
        )

        # ozone mass mixing ratio
        if "ozone_mixing_ratio" in state:
            o3 = jnp.maximum(cols(state["ozone_mixing_ratio"]), 0.0)
        else:
            o3 = gases.ozone_profile(plyr * 100.0, lat)

        # well-mixed gas VOLUME mixing ratios -> gasvmr slots
        co2 = gases.co2vmr(cfg.year, cfg.ico2)
        ones = jnp.ones_like(plyr)
        gasvmr = jnp.stack(
            [
                ones * co2,
                ones * gases.N2OVMR_DEF,
                ones * gases.CH4VMR_DEF,
                ones * gases.O2VMR_DEF,
                ones * 1.5e-7,  # co
                ones * _CFC11,
                ones * _CFC12,
                ones * _CFC22,
                ones * _CCL4,
                jnp.zeros_like(plyr),
            ],
            axis=-1,
        )

        # clouds: condensate -> in-cloud paths/radii.  Fraction is the
        # max of the compact condensate form and the Sundqvist RH-based
        # diagnosis shared with the gscond closure (physics/microphysics
        # .py::sundqvist_cloud_fraction — the GFS progcld role)
        t_frac_ice = jnp.clip((268.0 - T) / 15.0, 0.0, 1.0)
        wpath = qc * dp_pa * (1000.0 / GRAVITY)
        from fv3net_tpu.physics.microphysics import sundqvist_cloud_fraction

        cldfrac = jnp.maximum(
            jnp.where(qc > 1e-7, 1.0 - jnp.exp(-qc / 3.0e-5), 0.0),
            sundqvist_cloud_fraction(T, q, qc, plyr * 100.0),
        )
        if cfg.icld == 0:
            cldfrac = jnp.zeros_like(cldfrac)
        incloud = wpath / jnp.maximum(cldfrac, 0.05)
        lwp = incloud * (1.0 - t_frac_ice)
        iwp = incloud * t_frac_ice
        re_liq = jnp.broadcast_to(
            (10.0 * land + 14.0 * (1.0 - land))[:, None], lwp.shape
        )
        re_ice = jnp.clip(326.3 + 12.42 * (T - 273.15), 20.0, 130.0)
        zeros = jnp.zeros_like(cldfrac)
        clouds = jnp.stack(
            [cldfrac, lwp, re_liq, iwp, re_ice,
             zeros, zeros, zeros, zeros],
            axis=-1,
        )

        days = zenith.days_from_2000(time)
        if cosz is None:
            cosz = zenith.cos_zenith_angle(
                days, jnp.rad2deg(lon), jnp.rad2deg(lat)
            )
        cosz = jnp.asarray(cosz, dt).reshape(ncol)

        # McICA randoms decorrelated across calls via a state fold
        # (max, not sum: reduction-order independent, so sharded and
        # single-device runs draw identical subcolumns)
        state_fold = ((jnp.abs(T).max() * 64.0) % 1000003.0).astype(
            jnp.int32
        )
        key = jax.random.fold_in(
            jax.random.PRNGKey(cfg.mcica_seed), state_fold
        )
        # f32 runs draw the uniforms DIRECTLY in bfloat16: 16-bit draws
        # halve both the threefry work and the [C, G*L] plane bytes, and
        # the 2^-8 threshold granularity is ~40x below per-call McICA
        # subcolumn noise.  The draws are then held in the STORAGE dtype
        # (exact upcast when storage is f32), so both storage modes
        # sample bit-identical subcolumns.  f64 (oracle) runs keep full-
        # precision draws.
        rdt = jnp.bfloat16 if dt == jnp.float32 else dt
        sdt = rlw._sdt(dt)
        rand_lw = jax.random.uniform(
            key, (ncol, P.NGPT_LW * nz), dtype=rdt
        ).astype(sdt)
        rand_sw = jax.random.uniform(
            jax.random.fold_in(key, 1), (ncol, P.NGPT_SW * nz),
            dtype=rdt,
        ).astype(sdt)

        sfemis = optics.surface_emissivity(land)
        aerodp = None
        if cfg.iaer == 1:
            # climatological OPAC-species scheme with RH-dependent
            # hygroscopic optics (aerosols.py::setaer)
            from fv3net_tpu.physics.microphysics import (
                saturation_specific_humidity,
            )

            qsat = saturation_specific_humidity(T, plyr * 100.0)
            rh = jnp.clip(q / jnp.maximum(qsat, 1e-10), 0.0, 1.0)
            tv = thermo.virtual_temperature(T, q)
            # hypsometric thickness in the exact dlogp form (plvl is
            # surface-first so plvl[:, :-1] is the lower interface)
            delz_km = (
                RDGAS * tv / GRAVITY
                * jnp.log(plvl[:, :-1] / jnp.maximum(plvl[:, 1:], 1e-6))
                / 1000.0
            )
            month = time.month + (time.day - 1) / 30.5
            aer_sw, aer_lw, aerodp = aer_mod.setaer(
                plyr, delz_km, rh, land, lat, self.Taer, P.NBANDS_SW,
                month=month,
            )
        elif cfg.iaer:
            # compact Angstrom/boundary-layer stand-in (iaer=2)
            aer_lw = self._aerosols(plyr, delp, land, P.NBANDS_LW, True)
            aer_sw = self._aerosols(plyr, delp, land, P.NBANDS_SW, False)
        else:
            aer_lw = jnp.zeros((ncol, nz, P.NBANDS_LW, 3), dt)
            aer_sw = jnp.zeros((ncol, nz, P.NBANDS_SW, 3), dt)

        blk = (
            cfg.column_block
            if cfg.column_block is not None
            else _column_block_default(ncol)
        )
        blocked = bool(blk) and blk < ncol

        def _lw(*a):
            return rlw.lwrad(
                *a, self.Tlw, iovrlw=cfg.iovr, fast_exp=cfg.fast_exp
            )

        lw_args = (plyr, plvl, T, tlvl, q, o3, gasvmr, clouds, aer_lw,
                   sfemis, tsfc, delp, rand_lw)
        lw_out = _map_blocked(_lw, lw_args, blk) if blocked else _lw(
            *lw_args
        )

        # broadband dir/dif albedo -> (nir-bm, nir-df, vis-bm, vis-df)
        alb_dir_b, alb_dif_b = optics.surface_albedo(
            cosz, land, ice_frac=ice
        )
        vis = jnp.asarray(_SW_LAM_UM < 0.7, dt)
        wsum_v = jnp.maximum(vis.sum(), 1.0)
        wsum_n = jnp.maximum((1.0 - vis).sum(), 1.0)
        nbands_old = alb_dir_b.shape[-1]
        if nbands_old == P.NBANDS_SW:
            a_nir_bm = (alb_dir_b * (1.0 - vis)).sum(-1) / wsum_n
            a_nir_df = (alb_dif_b * (1.0 - vis)).sum(-1) / wsum_n
            a_vis_bm = (alb_dir_b * vis).sum(-1) / wsum_v
            a_vis_df = (alb_dif_b * vis).sum(-1) / wsum_v
        else:  # fall back to band means
            a_nir_bm = a_vis_bm = alb_dir_b.mean(-1)
            a_nir_df = a_vis_df = alb_dif_b.mean(-1)
        sfcalb = jnp.stack(
            [a_nir_bm, a_nir_df, a_vis_bm, a_vis_df], axis=-1
        )

        s0 = cfg.solcon
        if cfg.isol:
            # orbit-modulated solar constant (the reference
            # radiation_astronomy.py sol_update role): Spencer (a/r)^2
            s0 = cfg.solcon * zenith.solar_distance_factor(days)
        # inside lax.map every block sorts/packs its own daylit columns,
        # so the SW daylight compression stays valid per block
        sw_args = (plyr, plvl, T, tlvl, q, o3, gasvmr, clouds, aer_sw,
                   sfcalb, delp, cosz, rand_sw)

        def _sw_call(*a):
            return rsw.swrad(
                a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8],
                a[9], a[10], a[11], s0, a[12], self.Tsw,
                iovrsw=cfg.iovr, fast_exp=cfg.fast_exp,
            )

        sw_out = (
            _map_blocked(_sw_call, sw_args, blk)
            if blocked
            else _sw_call(*sw_args)
        )

        def resh(x, flip=False):
            if flip:
                x = x[:, ::-1]
            return x.reshape(lead + x.shape[1:])

        hlwc = lw_out["hlwc"]
        hswc = sw_out["hswc"]
        out = {
            "total_sky_longwave_heating_rate_python": resh(hlwc, True),
            "clear_sky_longwave_heating_rate_python": resh(
                lw_out["hlw0"], True
            ),
            "total_sky_shortwave_heating_rate_python": resh(hswc, True),
            "clear_sky_shortwave_heating_rate_python": resh(
                sw_out["hsw0"], True
            ),
            "total_sky_upward_longwave_flux_at_top_of_atmosphere_python":
                resh(lw_out["upfxc_t"]),
            "clear_sky_upward_longwave_flux_at_top_of_atmosphere_python":
                resh(lw_out["upfx0_t"]),
            "total_sky_upward_shortwave_flux_at_top_of_atmosphere_python":
                resh(sw_out["ftoauc"]),
            "clear_sky_upward_shortwave_flux_at_top_of_atmosphere_python":
                resh(sw_out["ftoau0"]),
            "total_sky_downward_shortwave_flux_at_top_of_atmosphere_python":
                resh(sw_out["ftoadc"]),
            "total_sky_upward_longwave_flux_at_surface_python":
                resh(lw_out["upfxc_s"]),
            "clear_sky_upward_longwave_flux_at_surface_python":
                resh(lw_out["upfx0_s"]),
            "total_sky_downward_longwave_flux_at_surface_python":
                resh(lw_out["dnfxc_s"]),
            "clear_sky_downward_longwave_flux_at_surface_python":
                resh(lw_out["dnfx0_s"]),
            "total_sky_upward_shortwave_flux_at_surface_python":
                resh(sw_out["fsfcuc"]),
            "clear_sky_upward_shortwave_flux_at_surface_python":
                resh(sw_out["fsfcu0"]),
            "total_sky_downward_shortwave_flux_at_surface_python":
                resh(sw_out["fsfcdc"]),
            "clear_sky_downward_shortwave_flux_at_surface_python":
                resh(sw_out["fsfcd0"]),
            "cos_zenith_angle": resh(cosz),
            "tendency_of_air_temperature_due_to_radiation": resh(
                hlwc + hswc, True
            ),
        }
        if aerodp is not None:
            # per-species 550 nm column AOD (reference setaer's aerodp:
            # total, dust, BC, water-soluble, sulfate, sea salt)
            names = ("dust", "black_carbon", "water_soluble", "sulfate",
                     "sea_salt")
            for i, nm in enumerate(names):
                out[f"aerosol_optical_depth_{nm}"] = resh(aerodp[:, i])
            out["aerosol_optical_depth_total"] = resh(aerodp[:, -1])
        return out
