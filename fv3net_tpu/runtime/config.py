"""Runtime configuration dataclasses, strictly parsed from dicts.

reference: workflows/prognostic_c48_run/runtime/config.py:24-108 — a
single config file whose reserved model keys configure the (there:
Fortran) model and whose remaining keys parse strictly into nested
dataclasses via dacite; here a small built-in strict parser plays the
dacite role.
"""
from __future__ import annotations

import dataclasses
import logging
import typing
from typing import Any, Dict, List, Mapping, Optional, Sequence

import yaml

# keys consumed by the model core itself (the FV3CONFIG_KEYS analog,
# reference config.py:24-37)
MODEL_KEYS = {
    "namelist",
    "initial_conditions",
}


@dataclasses.dataclass
class MachineLearningConfig:
    """reference: runtime/steppers/machine_learning.py MachineLearningConfig"""

    model: List[str] = dataclasses.field(default_factory=list)
    use_mse_conserving_humidity_limiter: bool = True
    online: bool = True
    # reference machine_learning.py:61 — record ML predictions as
    # diagnostics without applying them (``online: false`` is this
    # build's equivalent alias)
    diagnostic_ml: bool = False


@dataclasses.dataclass
class RadiationSchemeConfig:
    """reference: runtime/steppers/radiation.py:13 RadiationStepperConfig
    — run the Python radiation in the loop; ``scheme`` selects the
    gray-gas or rrtmg band backend (this build's addition)."""

    kind: str = "python"
    scheme: str = "rrtmg"
    apply_heating: bool = False
    # local directory of measured k-table netCDFs in the reference
    # layout (the reference's GCS lookup download, radiation
    # config.py:4-5); None -> synthetic tables
    lookup_dir: Optional[str] = None


@dataclasses.dataclass
class NudgingConfig:
    restarts_path: str = ""
    timescale_hours: Mapping[str, float] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class DiagnosticFileConfig:
    """reference: runtime/diagnostics/manager.py:26-96"""

    name: str = "diags.zarr"
    variables: List[str] = dataclasses.field(default_factory=list)
    times: "TimeConfig" = None
    # per-dimension zarr chunk sizes, e.g. {"time": 12} (reference
    # manager.py:36,46; unlisted dims chunk at their full extent,
    # time defaults to 1)
    chunks: Mapping[str, int] = dataclasses.field(default_factory=dict)
    # stored-name overrides: {model diagnostic name: output name}
    renames: Mapping[str, str] = dataclasses.field(default_factory=dict)
    # reference manager.py:37-41,54-56 — route this file's variables to
    # a TensorBoard event log under <rundir>/tensorboard instead of zarr
    tensorboard: bool = False
    # observations held as device handles before one batched
    # device->host pull (rows land up to pull_buffer-1 observations
    # late; close() drains).  Through the TPU tunnel each pull RPC is a
    # round-trip comparable to a fused chunk's compute, so batching
    # across chunks is a large production-throughput win; 1 restores
    # write-every-observation behavior.  For interval-average files the
    # buffered observations are additionally SUMMED on device per
    # window, so only one partial-sum plane per window crosses the link
    # per drain (~pull_buffer x fewer bytes).
    pull_buffer: int = 4
    # pull-precision override: "bfloat16" casts floating diagnostics to
    # bf16 INSIDE the device-side batched pull (half the bytes over the
    # device->host link — the dominant cost of the production segment
    # path on transfer-bound hosts), upcast to float32 before the zarr
    # write.  bf16 keeps f32 range (no overflow on e.g. pressures);
    # precision at output drops to ~3 decimal digits, fine for plotting
    # and monitoring diagnostics, not for restart-grade fields.  None
    # (default) pulls at model precision.
    pull_dtype: Optional[str] = None

    def __post_init__(self):
        if self.times is None:
            self.times = TimeConfig()
        if self.pull_dtype is not None:
            # Fail at config build, not at the first diagnostics drain
            # deep into a run (advisor r2).
            import numpy as _np

            try:
                dt = _np.dtype(self.pull_dtype)
            except TypeError:
                # bfloat16 etc. are not numpy-native; probe via jax
                import jax.numpy as _jnp

                try:
                    dt = _np.dtype(_jnp.dtype(self.pull_dtype))
                except Exception:
                    raise ValueError(
                        f"DiagnosticFileConfig {self.name!r}: invalid "
                        f"pull_dtype {self.pull_dtype!r} (not a dtype)"
                    ) from None
            if dt.kind not in ("f", "V"):  # V: ml_dtypes (bfloat16)
                raise ValueError(
                    f"DiagnosticFileConfig {self.name!r}: pull_dtype "
                    f"{self.pull_dtype!r} must be a floating dtype"
                )


@dataclasses.dataclass
class FortranVariableNameSpec:
    """reference: runtime/diagnostics/fortran.py FortranVariableNameSpec —
    (module_name, field_name) identify the Fortran diagnostic;
    output_name is the stored variable name."""

    module_name: str
    field_name: str
    output_name: str


@dataclasses.dataclass
class FortranFileConfig:
    """reference: runtime/diagnostics/fortran.py:82-134 — Fortran
    diagnostic file configs, lowered there to fv3config DiagFileConfig
    diag_table entries.  This model has no Fortran side, so they lower to
    ordinary :class:`DiagnosticFileConfig` outputs (``field_name`` keys
    the model diagnostic, ``output_name`` names the stored variable); a
    diag_table rendering is kept for config familiarity."""

    name: str = "atmos_dt_atmos.zarr"
    chunks: Mapping[str, int] = dataclasses.field(default_factory=dict)
    variables: List[FortranVariableNameSpec] = dataclasses.field(
        default_factory=list
    )
    times: "TimeConfig" = None

    def __post_init__(self):
        if self.times is None:
            self.times = TimeConfig()

    def to_diagnostic_config(self) -> DiagnosticFileConfig:
        return DiagnosticFileConfig(
            name=self.name,
            variables=[v.field_name for v in self.variables],
            times=self.times,
            chunks=self.chunks,
            renames={
                v.field_name: v.output_name
                for v in self.variables
                if v.output_name != v.field_name
            },
        )

    def to_diag_table_lines(self, dt_seconds: float) -> List[str]:
        """Fortran diag_table file entry + field lines (reference
        fortran.py:116-134 FortranFileConfig.to_fv3config_diag_file_config
        semantics)."""
        freq = (
            int((self.times.frequency or dt_seconds) // 60)
            if self.times.kind in ("interval", "interval-average")
            else 0
        )
        reduction = (
            "average" if self.times.kind == "interval-average" else "none"
        )
        base = self.name.split(".")[0]
        lines = [f'"{base}", {freq}, "minutes", 1, "hours", "time"']
        for v in self.variables:
            lines.append(
                f'"{v.module_name}", "{v.field_name}", "{v.output_name}", '
                f'"{base}", "all", "{reduction}", "none", 2'
            )
        return lines


@dataclasses.dataclass
class TendencyPrescriberConfig:
    """reference: runtime/tendency_prescriber.py TendencyPrescriberConfig
    — override/add physics tendencies from a dataset."""

    dataset: str = ""
    variables: List[str] = dataclasses.field(default_factory=list)
    limit_quantiles: Optional[Mapping[str, float]] = None


@dataclasses.dataclass
class BiasCorrectionConfig:
    """reference: config.py:78 bias_correction (a PrescriberConfig of
    correction tendencies, optionally applied on an interval)."""

    dataset: str = ""
    variables: List[str] = dataclasses.field(default_factory=list)
    apply_interval_seconds: Optional[float] = None
    limit_quantiles: Optional[Mapping[str, float]] = None


@dataclasses.dataclass
class OnlineEmulatorConfig:
    """reference: runtime/transformers/fv3fit.py Config (the
    online_emulator key) — apply a saved emulator inside the physics
    step (the call_py_fort microphysics slot)."""

    url: str = ""
    enabled: bool = True
    # hook point: "microphysics" replaces the whole Zhao-Carr step,
    # "gscond" only the grid-scale condensation stage (precpd stays
    # native) — the reference's two call_py_fort hooks
    target: str = "microphysics"
    # piggy-back mode: the NATIVE microphysics still advances the state
    # while the emulator runs alongside; both sources are emitted as
    # tendency_of_*_due_to_{zhao_carr,gscond}_{emulator,physics}
    # diagnostics for offline skill evaluation (reference
    # diagnostics/prognostic_run/emulation/single_run.py)
    piggy_back: bool = False


@dataclasses.dataclass
class ReservoirCorrectorConfig:
    """reference: runtime/steppers/reservoir.py:35 ReservoirConfig (minus
    per-rank path mapping — one model covers all columns here)."""

    model_path: str = ""
    synchronize_steps: int = 1
    reservoir_timestep_seconds: float = 900.0
    # model-side -> run-side variable names (reference reservoir.py:50)
    rename_mapping: Dict[str, str] = dataclasses.field(default_factory=dict)
    # predictions become diagnostics only (reference reservoir.py:47)
    diagnostic_only: bool = False
    # restore a pre-synchronized reservoir state saved next to the model
    # (reference reservoir.py:49)
    warm_start: bool = False


@dataclasses.dataclass
class TimeConfig:
    """reference: runtime/diagnostics/time.py:17-153 — kinds:
    every | interval | interval-average | selected"""

    kind: str = "every"
    frequency: Optional[float] = None  # seconds, for interval kinds
    times: Optional[List[str]] = None  # for kind == selected


@dataclasses.dataclass
class NamelistConfig:
    """Core model parameters (plays the Fortran namelist's role)."""

    npx: int = 48  # cells per tile side
    npz: int = 32  # vertical levels
    dt_atmos: float = 900.0
    n_split: int = 2
    kord: int = 9
    diff_coef: float = 0.004
    # horizontal transport operator: 1 upwind, 2 MUSCL, 4 PPM (hord)
    hord: int = 4
    # nondim del-2 divergence damping (FV3's d2_bg role)
    d2_div: float = 0.06
    # sponge-layer damping boost (divergence AND del-2 wind/Tv) for the
    # top two layers (fv_core_nml d2_bg_k1/d2_bg_k2).  ON by default:
    # multi-week coupled soaks over resolved topography break
    # stationary waves against the rigid model top (top-layer winds
    # 40 -> 260 m/s by day ~22, r5 soak_debug).  VALUES ARE
    # STABILITY-BOUNDED: the damping is explicit forward-Euler del-2,
    # stable only for coef*(corner distortion ~1.5) < 1/4 — 0.2 (the
    # fv3gfs default) blew up at a tile edge within 2 days here
    d2_bg_k1: float = 0.12
    d2_bg_k2: float = 0.06
    # stratospheric mean-preserving eddy damping (physics/driver.py
    # PhysicsConfig.strat_eddy_damp_*): relax T toward its per-level
    # global mean above this pressure with this timescale.  Stands in
    # for the radiative eddy damping the synthetic k-tables lack;
    # 0 days disables
    strat_eddy_damp_days: float = 1.0
    strat_eddy_damp_pa: float = 25000.0
    # energy-conserving vertical remap (FV3's te_map)
    remap_te: bool = True
    hydrostatic: bool = True
    # upper-level Rayleigh sponge (the fv3gfs-fortran fv_core_nml
    # ``tau``/``rf_cutoff`` pair): e-folding time in DAYS at the model
    # top (0 disables) and the pressure (Pa) below which no damping acts.
    # ON by default: without it the top layers develop unbounded winds
    # in multi-week coupled runs (C48 RRTMG soak blow-ups at days 21-28
    # traced to z=0-1 wind growth; tau=1 d to 30 hPa ran the 30-day
    # coupled soak green, docs/acceptance.md).  The deep cutoff reflects
    # this build's LOW model top (3 hPa): fv3gfs uses 750 Pa against
    # ~60 Pa tops, the same top few layers
    tau: float = 0.5
    # deepened r5: with a 3 hPa top the breaking level of polar-night
    # stationary waves sits at 10-150 hPa depending on where shallower
    # sponges end (soak_debug bisection); the log-p sin^2 ramp from
    # 200 hPa gives tau_eff ~90 d at 150 hPa (tropospheric jets
    # untouched), ~4 d at 50 hPa, ~1.4 d at 14 hPa
    # 300 hPa final (r5): the 200-hPa ramp arrested the 14-hPa breaking
    # but a momentum-flux-driven jet re-grew at ~150 hPa (+1.5 m/s/day,
    # NaN by day ~55 of the 90-day soak); the 300-hPa ramp (tau_eff
    # ~9 d at 150 hPa, ~125 d at 250 hPa) bounds it — 90-day soak
    # finite with wmax oscillating 60-90 m/s
    rf_cutoff: float = 30000.0
    # prognostic mixed-layer surface temperature (physics/slab_ocean.py)
    # instead of fixed aquaplanet SST
    slab_ocean: bool = False
    mixed_layer_depth_m: float = 50.0
    # prognostic o3mr tracer: transported by the dycore, relaxed toward
    # the climatology by linearized photochemistry (physics/ozone.py),
    # consumed by the band radiation
    prognostic_ozone: bool = False
    # bucket land hydrology (physics/land.py): prognostic soil moisture
    # limits land evaporation; runoff closes the land water budget.
    # Active where land_sea_mask > 0.5 (pair with slab_ocean for the
    # land surface-temperature side)
    bucket_land: bool = False
    bucket_capacity_m: float = 0.15
    # land surface model: "" (bucket_land flag decides), "bucket"
    # (Manabe bucket hydrology, physics/land.py) or "noah" (4-layer
    # Noah-style soil heat + Clapp-Hornberger soil water + prognostic
    # snowpack, physics/soil.py — the GFS Noah LSM role).  "noah"
    # requires slab_ocean (the land skin rides its thin-slab branch)
    land_model: str = ""
    # zero-layer thermodynamic sea ice on the slab ocean
    # (physics/sea_ice.py): freezing deficits grow ice, melting consumes
    # it before the mixed layer warms; ice fraction feeds the radiation
    # albedo.  Requires slab_ocean
    sea_ice: bool = False
    # surface boundary conditions from the catalog (or a registered
    # zarr): supplies land_sea_mask / surface_geopotential / sgh /
    # surface_temperature so configured runs need not be aquaplanets
    # (e.g. "topography/c48"; fields also loadable from restarts)
    surface_data: Optional[str] = None
    # device-mesh layout [py, px] for the intra-tile (y, x) spatial
    # decomposition (the fv_core_nml ``layout`` analog; the reference
    # runs 6*lx*ly MPI ranks — here py*px mesh devices shard all six
    # tiles' (y, x) axes, tile axis unsharded, SURVEY §2.9).  [1, 1]
    # = single device.  TimeLoop places its state on the mesh; every
    # jitted chunk then partitions via jax.sharding + the explicit
    # ppermute halo backend
    layout: Sequence[int] = (1, 1)
    # radiation scheme for the IN-LOOP physics step: "gray" (Frierson),
    # "rrtmg" (real RRTMG band solvers), "synthband" (compact band
    # model).  The GFS runs band radiation; gray is the cheap default
    # for idealized runs
    radiation: str = "gray"
    # surface-flux scheme: "monin_obukhov" (GFS sfc_diff-style stability
    # similarity) or "bulk" (constant-exchange aerodynamics)
    surface_scheme: str = "monin_obukhov"
    # PBL scheme: "kprofile" (Hong-Pan nonlocal-K, the GFS moninedmf
    # stage's structure) or "ramp" (prescribed sigma-profile K)
    pbl_scheme: str = "kprofile"
    # convection scheme: "betts_miller" (relaxed adjustment) or
    # "mass_flux" (SAS-family entraining plume, physics/convection_mf.py)
    convection: str = "betts_miller"
    # stratospheric methane-oxidation water source (the GFS h2o_phys
    # flag; physics/h2ophys.py).  Adds water mass by design — keep off
    # for exact-water-closure runs
    stratospheric_h2o: bool = False
    # large-scale microphysics: "zhao_carr" (two-stage gscond/precpd,
    # the scheme the reference's emulation hooks target) or "gfdl"
    # (six-category bulk scheme, physics/microphysics_gfdl.py; the
    # TimeLoop adds the ice_wat/rainwat/snowwat/graupel tracers to the
    # state when restarts do not carry them)
    microphysics: str = "zhao_carr"

    def __post_init__(self):
        if self.microphysics not in ("zhao_carr", "gfdl"):
            raise ValueError(
                f"unknown microphysics scheme {self.microphysics!r}"
            )
        if self.radiation not in ("gray", "rrtmg", "synthband"):
            raise ValueError(
                f"unknown radiation scheme {self.radiation!r}"
            )
        if self.surface_scheme not in ("monin_obukhov", "bulk"):
            raise ValueError(
                f"unknown surface scheme {self.surface_scheme!r}"
            )
        if self.pbl_scheme not in ("kprofile", "ramp"):
            raise ValueError(f"unknown pbl scheme {self.pbl_scheme!r}")
        if self.convection not in ("betts_miller", "mass_flux"):
            raise ValueError(
                f"unknown convection scheme {self.convection!r}"
            )
        if self.land_model == "" and self.bucket_land:
            self.land_model = "bucket"
        if self.land_model not in ("", "bucket", "noah"):
            raise ValueError(f"unknown land model {self.land_model!r}")
        if self.land_model == "bucket":
            self.bucket_land = True  # keep the legacy flag consistent
        if self.land_model == "noah" and not self.slab_ocean:
            raise ValueError(
                "land_model 'noah' requires slab_ocean (the land skin "
                "temperature rides its thin-slab land branch)"
            )
        if self.sea_ice and not self.slab_ocean:
            raise ValueError(
                "sea_ice requires slab_ocean (the ice exchanges latent "
                "heat with the mixed-layer energy budget)"
            )


@dataclasses.dataclass
class UserConfig:
    """Top-level runtime config (reference: runtime/config.py:40-80)."""

    namelist: NamelistConfig = dataclasses.field(default_factory=NamelistConfig)
    diagnostics: List[DiagnosticFileConfig] = dataclasses.field(
        default_factory=list
    )
    fortran_diagnostics: List[FortranFileConfig] = dataclasses.field(
        default_factory=list
    )
    scikit_learn: Optional[MachineLearningConfig] = None
    nudging: Optional[NudgingConfig] = None
    radiation_scheme: Optional[RadiationSchemeConfig] = None
    prephysics: Optional[List[dict]] = None
    tendency_prescriber: Optional[TendencyPrescriberConfig] = None
    online_emulator: Optional[OnlineEmulatorConfig] = None
    bias_correction: Optional[BiasCorrectionConfig] = None
    reservoir_corrector: Optional[ReservoirCorrectorConfig] = None
    # accepted for reference-config compatibility (both values run this
    # framework's model; reference config.py:61 selects the Fortran
    # wrapper module)
    wrapper: str = "fv3gfs.wrapper"
    # path to a restart directory to initialize from: either this
    # framework's npz checkpoints or a reference-layout Fortran RESTART
    # (fv_core.res.tileN.nc ... — the fv3config initial_conditions role)
    initial_conditions: Optional[str] = None
    duration_seconds: float = 3600.0
    initial_time: str = "2016-08-01T00:00:00"
    # fused fast path: chunk this many model steps into ONE jitted
    # lax.scan dispatch (runtime/fused.py build_fused_multi_step) when
    # the configured steppers allow it — the production-TimeLoop analog
    # of the benchmark's fused step (eliminates per-substep host
    # round-trips; diagnostics drain at chunk boundaries).  0/1 = the
    # per-substep loop
    fused_chunk_steps: int = 0
    # compute band radiation every N steps inside the fused chunk,
    # reusing stored heating in between (GFS calls RRTMG hourly against
    # dt_atmos=900 -> 4)
    radiation_interval_steps: int = 1

    def __post_init__(self):
        if self.wrapper not in ("fv3gfs.wrapper", "shield.wrapper"):
            raise ValueError(
                f"unsupported wrapper {self.wrapper!r}: expected "
                "'fv3gfs.wrapper' or 'shield.wrapper'"
            )
        if self.scikit_learn and self.scikit_learn.model and self.nudging:
            raise ValueError(
                "nudging cannot be used with scikit_learn models "
                "(reference config.py:54-55)"
            )


def _from_dict(cls, d: Mapping[str, Any]):
    """Strict nested dataclass construction (the dacite.from_dict analog,
    reference config.py:89-99): unknown keys raise."""
    if d is None:
        return None
    fields = {f.name: f for f in dataclasses.fields(cls)}
    hints = typing.get_type_hints(cls)
    unknown = set(d) - set(fields)
    if unknown:
        raise ValueError(f"unknown config keys for {cls.__name__}: {unknown}")
    kwargs = {}
    for key, value in d.items():
        ftype = hints.get(key, fields[key].type)
        resolved = _resolve(ftype)
        if dataclasses.is_dataclass(resolved) and isinstance(value, Mapping):
            kwargs[key] = _from_dict(resolved, value)
        elif (
            typing.get_origin(resolved) in (list, List)
            and value is not None
            and dataclasses.is_dataclass(_resolve(typing.get_args(resolved)[0]))
        ):
            inner = _resolve(typing.get_args(resolved)[0])
            kwargs[key] = [
                _from_dict(inner, v) if isinstance(v, Mapping) else v
                for v in value
            ]
        else:
            kwargs[key] = value
    return cls(**kwargs)


def _resolve(ftype):
    """Resolve Optional[...]/string annotations to the inner type."""
    if isinstance(ftype, str):
        ns = globals()
        ftype = ns.get(ftype.strip('"'), ftype)
        if isinstance(ftype, str):
            return ftype
    if typing.get_origin(ftype) is typing.Union:
        args = [a for a in typing.get_args(ftype) if a is not type(None)]
        if len(args) == 1:
            return args[0]
    return ftype


# fv3config keys that reference data assets this framework has no use
# for (Fortran tables, GCS forcing bundles).  Accepted and dropped so a
# reference fv3config.yml parses as-is.
FV3CONFIG_ASSET_KEYS = frozenset({
    "data_table", "diag_table", "field_table", "experiment_name",
    "forcing", "orographic_forcing", "patch_files", "gfs_analysis_data",
    "zhao_mp_tables", "nudging_filenames", "restart_interval",
})

# FV3 hord transport-scheme codes -> this dycore's operator family
# (1 upwind, 2 MUSCL-limited linear, >=4 PPM variants)
_HORD_MAP = {1: 1, 2: 2, 3: 2}


def lower_fortran_config(d: Mapping[str, Any]) -> Dict[str, Any]:
    """Lower a reference-shaped fv3config dict (Fortran ``*_nml``
    namelist sections, data-asset keys) to this framework's flat config.

    Maps the dynamically meaningful keys (reference fv3gfs-fortran
    namelist semantics): fv_core_nml npx (grid CORNERS, ours is cells ->
    npx-1), npz, n_split, hydrostatic, tau/rf_cutoff, d2_bg -> d2_div,
    kord_tm -> kord, hord_mt -> hord family; coupler_nml dt_atmos and
    days/hours/minutes/seconds -> duration_seconds; gfs_physics_nml
    fhswr -> radiation_interval_steps and (by its presence) the "rrtmg"
    band-radiation scheme.  Everything else is ignored with a log line —
    the reference config carries dozens of Fortran-implementation
    sections with no analog here.  Flat (non-``_nml``) namelist keys in
    the same dict win over lowered ones."""
    out = {k: v for k, v in d.items() if k != "namelist"}
    nml = dict(d.get("namelist") or {})
    flat: Dict[str, Any] = {
        k: v for k, v in nml.items() if not k.endswith("_nml")
    }
    ignored = []

    fv = dict(nml.get("fv_core_nml") or {})
    if "npx" in fv:
        flat.setdefault("npx", int(fv["npx"]) - 1)
    for src, dst in (
        ("npz", "npz"), ("n_split", "n_split"),
        ("hydrostatic", "hydrostatic"), ("tau", "tau"),
        ("rf_cutoff", "rf_cutoff"), ("d2_bg", "d2_div"),
    ):
        if src in fv:
            flat.setdefault(dst, fv[src])
    if "kord_tm" in fv:
        flat.setdefault("kord", abs(int(fv["kord_tm"])))
    if "hord_mt" in fv:
        h = int(fv["hord_mt"])
        flat.setdefault("hord", _HORD_MAP.get(h, 4))

    coupler = dict(nml.get("coupler_nml") or {})
    if "dt_atmos" in coupler:
        flat.setdefault("dt_atmos", float(coupler["dt_atmos"]))
    span = sum(
        float(coupler.get(k, 0)) * s
        for k, s in (("days", 86400.0), ("hours", 3600.0),
                     ("minutes", 60.0), ("seconds", 1.0))
    )
    if float(coupler.get("months", 0)):
        raise ValueError(
            "coupler_nml months is not supported; use days/hours"
        )
    if span > 0:
        out.setdefault("duration_seconds", span)

    gfs = dict(nml.get("gfs_physics_nml") or {})
    if gfs:
        # GFS physics configs run RRTMG band radiation
        flat.setdefault("radiation", "rrtmg")
        fhswr = float(gfs.get("fhswr", 0))
        dt = float(flat.get("dt_atmos", NamelistConfig.dt_atmos))
        if fhswr > 0 and dt > 0:
            out.setdefault(
                "radiation_interval_steps", max(1, round(fhswr / dt))
            )
        # imp_physics: 11 = GFDL six-category cloud MP, 99 = Zhao-Carr
        imp = int(gfs.get("imp_physics", 0))
        if imp == 11:
            flat.setdefault("microphysics", "gfdl")

    known = {"fv_core_nml", "coupler_nml", "gfs_physics_nml"}
    ignored += [k for k in nml if k.endswith("_nml") and k not in known]
    if ignored:
        logging.getLogger(__name__).info(
            "ignoring Fortran namelist sections with no analog here: %s",
            sorted(ignored),
        )
    out["namelist"] = flat
    return out


def get_config(d: Mapping[str, Any]) -> UserConfig:
    """Parse a config dict (e.g. loaded from fv3config.yml) strictly.

    Reference-shaped fv3config dicts are accepted: a ``base_version``
    key routes through prepare_config's preset merge, Fortran ``*_nml``
    namelist sections lower via :func:`lower_fortran_config`, and
    data-asset keys (diag_table, forcing, ...) are dropped."""
    d = dict(d)
    if "base_version" in d:
        from fv3net_tpu.runtime.segmented_run.prepare_config import (
            prepare_config,
        )

        return get_config(prepare_config(d))
    dropped = FV3CONFIG_ASSET_KEYS & set(d)
    for k in dropped:
        d.pop(k)
    if dropped:
        logging.getLogger(__name__).info(
            "ignoring fv3config data-asset keys: %s", sorted(dropped)
        )
    if isinstance(d.get("namelist"), Mapping) and any(
        str(k).endswith("_nml") for k in d["namelist"]
    ):
        d = lower_fortran_config(d)
    return _from_dict(UserConfig, d)


def load_config(path: str) -> UserConfig:
    with open(path) as f:
        return get_config(yaml.safe_load(f))
