"""Jacobian diagnostics of trained models.

reference: external/fv3fit/fv3fit/keras/jacobian.py (exported at
fv3fit/__init__.py:9) — per input/output variable pair, the sensitivity
matrix of the model around a base state, used to inspect what a
corrective-tendency network learned.  Here it is one ``jax.jacobian``
call on the pure apply function — exact, not finite-differenced.
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp

from fv3net_tpu.fit import packer


def compute_jacobians(model, base_state: Mapping[str, jnp.ndarray]):
    """Exact Jacobians d(output)/d(input) at ``base_state``.

    Args:
        model: a DenseModel (or anything with ``apply_packed`` + packing
            info attributes)
        base_state: input variable -> [features] profile to linearize
            around (e.g. the training-data mean)

    Returns:
        {output_name: {input_name: [out_features, in_features] array}}
    """
    data = {k: jnp.asarray(v)[None] for k, v in base_state.items()}
    X, x_info = packer.pack(data, model.input_variables)

    def f(x_flat):
        return model.apply_packed(model.params, x_flat[None])[0]

    J = jax.jacobian(f)(X[0])  # [out_features, in_features]
    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    in_slices = x_info.slices()
    out_slices = model.output_info.slices()
    for oname, osl in out_slices.items():
        out[oname] = {}
        for iname, isl in in_slices.items():
            out[oname][iname] = J[osl, isl]
    return out


def nondimensionalize_jacobians(jacobians, stddevs: Mapping[str, jnp.ndarray]):
    """Scale by input/output standard deviations (reference jacobian.py
    normalization) so entries are comparable across variables."""
    out = {}
    for oname, row in jacobians.items():
        out[oname] = {}
        for iname, J in row.items():
            sx = jnp.asarray(stddevs[iname]).reshape(1, -1)
            sy = jnp.asarray(stddevs[oname]).reshape(-1, 1)
            out[oname][iname] = J * sx / sy
    return out
