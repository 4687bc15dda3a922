"""Training-data access layer (reference: external/loaders).

Round-1 scope: time-keyed zarr mappers and stacked column batches — the
``open_zarr`` -> ``XarrayMapper`` -> ``BatchesFromMapperConfig`` path of
the reference (reference: external/loaders/loaders/mappers/_xarray.py:9-56,
batches/_batch.py:45-118).  Mapper registries and the nudged/fine-res
mappers widen in later rounds.
"""
from fv3net_tpu.loaders.batches import (  # noqa: F401
    ZarrMapper,
    batches_from_config,
    batches_from_mapper,
)
from fv3net_tpu.loaders.mappers import (  # noqa: F401
    open_fine_resolution,
    open_nudge_to_fine,
    open_nudge_to_fine_scream,
    open_nudge_to_obs,
)
from fv3net_tpu.loaders.serialized import SerializedSequence  # noqa: F401

SAMPLE_DIM_NAME = "sample"  # reference: loaders/constants.py
TIME_NAME = "time"
DERIVATION_DIM = "derivation"
