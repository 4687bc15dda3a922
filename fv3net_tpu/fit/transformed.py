"""Transformed microphysics-emulator trainer.

The ``transformed`` trainer of the reference (reference:
external/fv3fit/fv3fit/train_microphysics.py:451
@register_training_function("transformed", TransformedParameters)):
trains a network in a *transformed* space built from composable tensor
transforms (log humidity, state differences, output limiters — the
emulation/transforms machinery, design doc
docs/design-docs/log-transformed-emulator.md), with selectable
architecture (dense / linear / rnn over vertical levels, the
reference's emulation/layers/architecture.py options).  The returned
predictor applies forward transforms, the network, then the inverse
transforms, and exposes ``predict_arrays`` so it drops straight into
``emulation.MicrophysicsEmulator`` (the call_py_fort gscond/microphysics
hook slot).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.emulation.transforms import (
    ComposedTransform,
    Difference,
    LimitValueTransform,
    LogTransform,
)
from fv3net_tpu.fit import io, packer
from fv3net_tpu.fit.dense import init_mlp_params, mlp_apply
from fv3net_tpu.fit.normalize import StandardScaler
from fv3net_tpu.fit.predictor import Predictor
from fv3net_tpu.fit.train import register_training_function

_TRANSFORM_KINDS = {
    "log": LogTransform,
    "limit": LimitValueTransform,
    "difference": Difference,
}


def build_transform(specs: Sequence[Dict]) -> ComposedTransform:
    """[{kind: log|limit|difference, ...kwargs}] -> ComposedTransform."""
    ts = []
    for spec in specs:
        kw = {k: v for k, v in spec.items() if k != "kind"}
        ts.append(_TRANSFORM_KINDS[spec["kind"]](**kw))
    return ComposedTransform(ts)


def _source_fields(specs: Sequence[Dict], names: Sequence[str]) -> set:
    """Resolve transformed tensor names back to the raw fields that
    produce them (names not produced by any transform are themselves)."""
    produced: Dict[str, set] = {}
    for spec in specs:
        if spec["kind"] == "log":
            to = spec.get("to") or f"log_{spec['field']}"
            produced[to] = {spec["field"]}
        elif spec["kind"] == "difference":
            produced[spec["to"]] = {spec["before"], spec["after"]}
    needed: set = set()
    for name in names:
        needed |= produced.get(name, {name})
    return needed


def _predict_time_inputs(hp: "TransformedParameters") -> List[str]:
    """Physical fields required to evaluate the network's inputs (the
    prediction-time state reads — target-side fields are excluded)."""
    return sorted(_source_fields(hp.tensor_transforms, hp.input_variables))


@dataclasses.dataclass
class TransformedParameters:
    """(reference: TransformedParameters at train_microphysics.py:284-451;
    names here are the post-forward-transform tensor names, exactly as in
    the reference's TransformConfig usage)"""

    input_variables: List[str] = dataclasses.field(default_factory=list)
    output_variables: List[str] = dataclasses.field(default_factory=list)
    # raw fields to read from each batch before the forward transform;
    # defaults to input+output variables (sufficient when no transform
    # renames anything)
    data_variables: Optional[List[str]] = None
    # physical outputs returned after the backward transform; defaults to
    # output_variables
    predicted_variables: Optional[List[str]] = None
    tensor_transforms: List[Dict] = dataclasses.field(default_factory=list)
    architecture: str = "dense"  # dense | linear | rnn
    hidden_layers: int = 2
    width: int = 256
    learning_rate: float = 1e-3
    epochs: int = 10
    batch_size: int = 512
    seed: int = 0


# ---------------------------------------------------------------------------
# architectures
# ---------------------------------------------------------------------------


def _init_rnn_params(key, nvar_in: int, width: int, nvar_out: int):
    """GRU cell scanned over vertical levels + per-level linear head."""
    k = jax.random.split(key, 4)
    scale_x = jnp.sqrt(1.0 / max(nvar_in, 1))
    scale_h = jnp.sqrt(1.0 / width)
    return {
        "wx": jax.random.normal(k[0], (nvar_in, 3 * width)) * scale_x,
        "wh": jax.random.normal(k[1], (width, 3 * width)) * scale_h,
        "b": jnp.zeros(3 * width),
        "wo": jax.random.normal(k[2], (width, nvar_out)) * scale_h,
        "bo": jnp.zeros(nvar_out),
    }


def _rnn_apply(p, x_lev):
    """x_lev: [sample, nz, nvar_in] -> [sample, nz, nvar_out]; a GRU scan
    down the column (level 0 = top, matching the physics sweep order)."""
    width = p["wh"].shape[0]
    # carry dtype must match the promoted compute dtype (params may be
    # f64 when the x64 flag is on) or lax.scan rejects the body
    h_dtype = jnp.result_type(x_lev.dtype, p["wh"].dtype)
    h0 = jnp.zeros(x_lev.shape[:1] + (width,), h_dtype)

    def cell(h, x):
        gates = x @ p["wx"] + p["b"]
        gh = h @ p["wh"]
        r = jax.nn.sigmoid(gates[..., :width] + gh[..., :width])
        z = jax.nn.sigmoid(
            gates[..., width : 2 * width] + gh[..., width : 2 * width]
        )
        n = jnp.tanh(gates[..., 2 * width :] + r * gh[..., 2 * width :])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new @ p["wo"] + p["bo"]

    _, ys = jax.lax.scan(cell, h0, jnp.moveaxis(x_lev, 1, 0))
    return jnp.moveaxis(ys, 0, 1)


def _init_params(hp: TransformedParameters, key, in_info, out_info):
    if hp.architecture == "rnn":
        return _init_rnn_params(
            key, len(in_info.names), hp.width, len(out_info.names)
        )
    if hp.architecture == "linear":
        sizes = [in_info.total_features, out_info.total_features]
    elif hp.architecture == "dense":
        sizes = (
            [in_info.total_features]
            + [hp.width] * hp.hidden_layers
            + [out_info.total_features]
        )
    else:
        raise ValueError(f"unknown architecture {hp.architecture!r}")
    return init_mlp_params(key, sizes)


def _net_apply(arch: str, params, X, in_info, out_info):
    """Packed [sample, nf_in] -> [sample, nf_out] for any architecture."""
    if arch != "rnn":
        return mlp_apply(params, X)
    sl = in_info.slices()
    nz = max(in_info.features)
    cols = []
    for name, nf in zip(in_info.names, in_info.features):
        arr = X[..., sl[name]]
        if nf == 1:  # broadcast scalars down the column
            arr = jnp.broadcast_to(arr, arr.shape[:-1] + (nz,))
        cols.append(arr)
    x_lev = jnp.stack(cols, axis=-1)  # [sample, nz, nvar_in]
    y_lev = _rnn_apply(params, x_lev)  # [sample, nz, nvar_out]
    outs = []
    for i, nf in enumerate(out_info.features):
        if nf != nz:
            raise ValueError("rnn architecture requires nz-sized outputs")
        outs.append(y_lev[..., i])
    return jnp.concatenate(outs, axis=-1)


@io.register("transformed")
class TransformedPredictor(Predictor):
    """Forward transforms -> network -> inverse transforms."""

    def __init__(
        self,
        data_variables: Sequence[str],
        predicted_variables: Sequence[str],
        hp: TransformedParameters,
        params,
        in_info: packer.PackingInfo,
        out_info: packer.PackingInfo,
        x_scaler: StandardScaler,
        y_scaler: StandardScaler,
    ):
        super().__init__(list(data_variables), list(predicted_variables))
        self.hp = hp
        self.params = params
        self.in_info = in_info
        self.out_info = out_info
        self.x_scaler = x_scaler
        self.y_scaler = y_scaler
        self.transform = build_transform(hp.tensor_transforms)

    def apply_packed(self, params, X: jnp.ndarray) -> jnp.ndarray:
        xn = self.x_scaler.normalize(X)
        yn = _net_apply(
            self.hp.architecture, params, xn, self.in_info, self.out_info
        )
        return self.y_scaler.denormalize(yn)

    def predict_arrays(
        self, data: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        t = self.transform.forward(dict(data))
        X, _ = packer.pack(t, self.hp.input_variables)
        Y = self.apply_packed(self.params, X)
        t.update(packer.unpack(Y, self.out_info, squeeze_scalar=False))
        phys = self.transform.backward(t)
        return {k: phys[k] for k in self.output_variables}

    def predict(self, X: Dataset) -> Dataset:
        data = packer.dataset_to_samples(X, self.input_variables)
        return packer.samples_to_dataset(self.predict_arrays(data))

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        leaves = jax.tree_util.tree_leaves(self.params)
        flat = {f"p{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
        flat["x_mean"] = np.asarray(self.x_scaler.mean)
        flat["x_std"] = np.asarray(self.x_scaler.std)
        flat["y_mean"] = np.asarray(self.y_scaler.mean)
        flat["y_std"] = np.asarray(self.y_scaler.std)
        np.savez(os.path.join(path, "weights.npz"), **flat)
        meta = {
            "data_variables": self.input_variables,
            "predicted_variables": self.output_variables,
            "hp": dataclasses.asdict(self.hp),
            "in_info": self.in_info.to_dict(),
            "out_info": self.out_info.to_dict(),
        }
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str) -> "TransformedPredictor":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        hp = TransformedParameters(**meta["hp"])
        in_info = packer.PackingInfo.from_dict(meta["in_info"])
        out_info = packer.PackingInfo.from_dict(meta["out_info"])
        # rebuild the parameter pytree structure, then fill leaves in
        # flatten order
        skeleton = _init_params(hp, jax.random.PRNGKey(0), in_info, out_info)
        treedef = jax.tree_util.tree_structure(skeleton)
        z = np.load(os.path.join(path, "weights.npz"))
        n_leaves = treedef.num_leaves
        leaves = [jnp.asarray(z[f"p{i}"]) for i in range(n_leaves)]
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        return cls(
            data_variables=meta["data_variables"],
            predicted_variables=meta["predicted_variables"],
            hp=hp,
            params=params,
            in_info=in_info,
            out_info=out_info,
            x_scaler=StandardScaler(jnp.asarray(z["x_mean"]),
                                    jnp.asarray(z["x_std"])),
            y_scaler=StandardScaler(jnp.asarray(z["y_mean"]),
                                    jnp.asarray(z["y_std"])),
        )


@register_training_function("transformed", TransformedParameters)
def train_transformed_model(
    hyperparameters: TransformedParameters,
    train_batches,
    validation_batches=None,
) -> TransformedPredictor:
    hp = hyperparameters
    transform = build_transform(hp.tensor_transforms)
    data_vars = hp.data_variables or sorted(
        _source_fields(
            hp.tensor_transforms,
            list(hp.input_variables) + list(hp.output_variables),
        )
    )
    predicted = hp.predicted_variables or list(hp.output_variables)

    xs, ys = [], []
    in_info = out_info = None
    for ds in train_batches:
        raw = packer.dataset_to_samples(ds, data_vars)
        t = transform.forward(raw)
        X, in_info = packer.pack(t, hp.input_variables)
        Y, out_info = packer.pack(t, hp.output_variables)
        xs.append(np.asarray(X))
        ys.append(np.asarray(Y))
    X = np.concatenate(xs)
    Y = np.concatenate(ys)
    x_scaler = StandardScaler.fit(jnp.asarray(X))
    y_scaler = StandardScaler.fit(jnp.asarray(Y))

    key = jax.random.PRNGKey(hp.seed)
    params = _init_params(hp, key, in_info, out_info)

    tx = optax.adam(hp.learning_rate)
    opt_state = tx.init(params)
    xn = jnp.asarray(np.asarray(x_scaler.normalize(jnp.asarray(X))))
    yn = jnp.asarray(np.asarray(y_scaler.normalize(jnp.asarray(Y))))

    def loss_fn(p, xb, yb):
        pred = _net_apply(hp.architecture, p, xb, in_info, out_info)
        return jnp.mean((pred - yb) ** 2)

    n = X.shape[0]
    rng = np.random.RandomState(hp.seed)
    bs = min(hp.batch_size, n)
    steps_per_epoch = max((n - bs) // bs + 1, 1)
    idx_all = np.stack(
        [
            rng.permutation(n)[: steps_per_epoch * bs].reshape(
                steps_per_epoch, bs
            )
            for _ in range(hp.epochs)
        ]
    ).reshape(hp.epochs * steps_per_epoch, bs)

    def step(carry, idx):
        p, o = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, xn[idx], yn[idx])
        updates, o = tx.update(grads, o)
        return (optax.apply_updates(p, updates), o), loss

    (params, opt_state), _ = jax.jit(
        lambda c, i: jax.lax.scan(step, c, i)
    )((params, opt_state), jnp.asarray(idx_all))

    return TransformedPredictor(
        data_variables=_predict_time_inputs(hp),
        predicted_variables=predicted,
        hp=hp,
        params=params,
        in_info=in_info,
        out_info=out_info,
        x_scaler=x_scaler,
        y_scaler=y_scaler,
    )
