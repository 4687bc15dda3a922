"""Canned synthetic-dataset generators for model-shaped data
(reference: external/synth/synth/__init__.py:14-31 generate_nudging /
generate_restart_data and the pytest fixtures in _dataset_fixtures.py)."""
from __future__ import annotations



from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.synth.core import DatasetSchema, Range, VariableSchema, generate

DIMS_3D = ("time", "tile", "z", "y", "x")
DIMS_2D = ("time", "tile", "y", "x")


def _schema_for(names_3d, names_2d, nt, nz, n):
    variables = {}
    for name in names_3d:
        variables[name] = VariableSchema(
            name=name, dims=list(DIMS_3D), shape=[nt, 6, nz, n, n]
        )
    for name in names_2d:
        variables[name] = VariableSchema(
            name=name, dims=list(DIMS_2D), shape=[nt, 6, n, n]
        )
    return DatasetSchema(variables=variables)


def generate_nudging(nt: int = 4, nz: int = 8, n: int = 8) -> Dataset:
    """Nudged-run training dataset: state + nudging tendencies
    (the open_nudge_to_fine data layout, reference
    external/loaders/loaders/mappers/_nudged/_nudged.py:118)."""
    schema = _schema_for(
        [
            "air_temperature",
            "specific_humidity",
            "pressure_thickness_of_atmospheric_layer",
            "air_temperature_tendency_due_to_nudging",
            "specific_humidity_tendency_due_to_nudging",
        ],
        ["latent_heat_flux", "sensible_heat_flux", "surface_precipitation_rate"],
        nt, nz, n,
    )
    ranges = {
        "air_temperature": Range(220.0, 310.0),
        "specific_humidity": Range(0.0, 0.02),
        "pressure_thickness_of_atmospheric_layer": Range(800.0, 1500.0),
        "air_temperature_tendency_due_to_nudging": Range(-1e-4, 1e-4),
        "specific_humidity_tendency_due_to_nudging": Range(-1e-7, 1e-7),
        "latent_heat_flux": Range(0.0, 200.0),
        "sensible_heat_flux": Range(-50.0, 100.0),
        "surface_precipitation_rate": Range(0.0, 1e-3),
    }
    return generate(schema, ranges)


def generate_restart_data(nz: int = 8, n: int = 8) -> Dataset:
    """Restart-shaped fields (fv_core-style state, single time)."""
    names_3d = ["T", "sphum", "delp", "u_cartesian_0", "u_cartesian_1",
                "u_cartesian_2"]
    variables = {
        name: VariableSchema(
            name=name, dims=["tile", "z", "y", "x"], shape=[6, nz, n, n]
        )
        for name in names_3d
    }
    variables["phis"] = VariableSchema(
        name="phis", dims=["tile", "y", "x"], shape=[6, n, n]
    )
    schema = DatasetSchema(variables=variables)
    ranges = {
        "T": Range(220.0, 310.0),
        "sphum": Range(0.0, 0.02),
        "delp": Range(800.0, 1500.0),
        "phis": Range(0.0, 5000.0),
    }
    return generate(schema, ranges)
