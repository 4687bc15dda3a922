"""Offline ETL pipelines.

Replaces the reference's Apache Beam / Google Dataflow jobs
(reference: workflows/dataflow/fv3net/pipelines/ — coarsen_restarts,
restarts_to_zarr; workflows/fine_res_budget) with on-device streaming
kernels driven by a simple map-over-timesteps runner: a single TPU chip
coarsens C384->C48 faster than a Dataflow autoscaling fleet, so the
orchestration layer shrinks to a loop.
"""
