"""Precipitative model + trainer: a dense network with a closed,
optimized precipitation budget.

The ``precipitative`` trainer of the reference (reference:
external/fv3fit/fv3fit/keras/_models/precipitative.py:162
train_precipitative_model / build_model:182), rebuilt in JAX.  The
architecture is a dense trunk over normalized inputs
(air_temperature, specific_humidity, pressure_thickness, physics_precip,
+ optional extras) with three linear heads sharing the trunk:

- a column-precipitation profile (dQ2 units, kg/kg/s),
- a residual moistening profile and a residual heating profile.

The physical couplings (precipitative.py:35-67 IntegratePrecipLayer /
CondensationalHeatingLayer):

- dQ2 = residual_moistening + column_precip
- dQ1 = residual_heating - (Lv/cp) * column_precip   (condensational
  heating of the precipitated water)
- total_precipitation_rate = physics_precip
    - (1/g) * sum_z(column_precip * delp)             (column integral)

``couple_precip_to_dQ1_dQ2=False`` recovers the plain dense behavior
(three independent heads).  The loss is a per-output standard-scaled MSE
(the reference's LossConfig(scaling="standard")).  Training runs as one
jitted lax.scan over minibatches (see fit/dense.py).
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

from fv3net_tpu.core.constants import GRAVITY
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.fit import io, packer
from fv3net_tpu.fit.dense import init_mlp_params
from fv3net_tpu.fit.normalize import StandardScaler
from fv3net_tpu.fit.predictor import Predictor
from fv3net_tpu.fit.train import register_training_function

LV = 2.5e6  # latent heat of vaporization, J/kg (precipitative.py:21)
CPD = 1004.6  # J/kg/K (precipitative.py:23)

DELP_NAME = "pressure_thickness_of_atmospheric_layer"
T_NAME = "air_temperature"
Q_NAME = "specific_humidity"
PRECIP_NAME = "total_precipitation_rate"
PHYS_PRECIP_NAME = "physics_precip"
T_TENDENCY_NAME = "dQ1"
Q_TENDENCY_NAME = "dQ2"


@dataclasses.dataclass
class PrecipitativeHyperparameters:
    """(reference: PrecipitativeHyperparameters at
    keras/_models/precipitative.py:69)"""

    additional_input_variables: List[str] = dataclasses.field(
        default_factory=list
    )
    hidden_layers: int = 3
    width: int = 16  # reference dense_network width=16 default here
    learning_rate: float = 1e-3
    epochs: int = 10
    batch_size: int = 512
    couple_precip_to_dQ1_dQ2: bool = True
    seed: int = 0
    # {name: {min, max}} prediction clamp (reference output_limit.py:51;
    # precipitative config carries it like dense/convolutional do)
    output_limit_config: Optional[dict] = None

    @property
    def input_variables(self) -> Sequence[str]:
        return tuple(
            [T_NAME, Q_NAME, DELP_NAME, PHYS_PRECIP_NAME]
            + list(self.additional_input_variables)
        )

    @property
    def output_variables(self) -> Sequence[str]:
        return (T_TENDENCY_NAME, Q_TENDENCY_NAME, PRECIP_NAME)


def _trunk_apply(layers, x):
    for layer in layers:
        x = jax.nn.relu(x @ layer["w"] + layer["b"])
    return x


def _head_apply(head, h):
    return h @ head["w"] + head["b"]


@io.register("precipitative")
class PrecipitativeModel(Predictor):
    """Shared-trunk three-head model with the precipitation budget closed
    in the forward function (so the constraint also holds inside the
    jitted prognostic step)."""

    def __init__(
        self,
        input_variables: Sequence[str],
        params,
        input_info: packer.PackingInfo,
        x_scaler: StandardScaler,
        scalers: Dict[str, StandardScaler],
        couple: bool,
        output_limits=None,
    ):
        super().__init__(
            list(input_variables),
            [T_TENDENCY_NAME, Q_TENDENCY_NAME, PRECIP_NAME],
        )
        self.params = params
        self.input_info = input_info
        self.x_scaler = x_scaler
        self.scalers = scalers  # per-output denormalization
        self.couple = couple
        self.output_limits = output_limits

    def apply_packed(self, params, X: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        sl = self.input_info.slices()
        delp = X[..., sl[DELP_NAME]]
        phys_precip = X[..., sl[PHYS_PRECIP_NAME]][..., 0]
        h = _trunk_apply(params["trunk"], self.x_scaler.normalize(X))
        s_T = self.scalers[T_TENDENCY_NAME]
        s_q = self.scalers[Q_TENDENCY_NAME]
        resid_T = s_T.denormalize(_head_apply(params["head_T"], h))
        resid_q = s_q.denormalize(_head_apply(params["head_q"], h))
        # the column-precip head denormalizes with dQ2's statistics, as in
        # the reference (precipitative.py:232-239)
        col_precip = s_q.denormalize(_head_apply(params["head_precip"], h))
        if self.couple:
            dQ1 = resid_T - (LV / CPD) * col_precip
            dQ2 = resid_q + col_precip
        else:
            dQ1, dQ2 = resid_T, resid_q
        surface_precip = phys_precip - (
            (col_precip * delp).sum(axis=-1) / GRAVITY
        )
        out = {
            T_TENDENCY_NAME: dQ1,
            Q_TENDENCY_NAME: dQ2,
            PRECIP_NAME: surface_precip[..., None],
        }
        if self.output_limits:
            out = self.output_limits.apply_limits(out)
        return out

    def predict_arrays(
        self, data: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        X, _ = packer.pack(data, self.input_variables)
        out = self.apply_packed(self.params, X)
        out[PRECIP_NAME] = out[PRECIP_NAME][..., 0]
        return out

    def predict(self, X: Dataset) -> Dataset:
        data = packer.dataset_to_samples(X, self.input_variables)
        return packer.samples_to_dataset(self.predict_arrays(data))

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        flat = {}
        for i, layer in enumerate(self.params["trunk"]):
            flat[f"trunk_w{i}"] = np.asarray(layer["w"])
            flat[f"trunk_b{i}"] = np.asarray(layer["b"])
        for head in ("head_T", "head_q", "head_precip"):
            flat[f"{head}_w"] = np.asarray(self.params[head]["w"])
            flat[f"{head}_b"] = np.asarray(self.params[head]["b"])
        flat["x_mean"] = np.asarray(self.x_scaler.mean)
        flat["x_std"] = np.asarray(self.x_scaler.std)
        for name, s in self.scalers.items():
            flat[f"scaler_{name}_mean"] = np.asarray(s.mean)
            flat[f"scaler_{name}_std"] = np.asarray(s.std)
        np.savez(os.path.join(path, "weights.npz"), **flat)
        meta = {
            "input_variables": self.input_variables,
            "input_info": self.input_info.to_dict(),
            "n_trunk": len(self.params["trunk"]),
            "scaler_names": list(self.scalers),
            "couple": self.couple,
            "output_limits": (
                self.output_limits.to_dict() if self.output_limits else None
            ),
        }
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str) -> "PrecipitativeModel":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        z = np.load(os.path.join(path, "weights.npz"))
        params = {
            "trunk": [
                {
                    "w": jnp.asarray(z[f"trunk_w{i}"]),
                    "b": jnp.asarray(z[f"trunk_b{i}"]),
                }
                for i in range(meta["n_trunk"])
            ]
        }
        for head in ("head_T", "head_q", "head_precip"):
            params[head] = {
                "w": jnp.asarray(z[f"{head}_w"]),
                "b": jnp.asarray(z[f"{head}_b"]),
            }
        scalers = {
            name: StandardScaler(
                jnp.asarray(z[f"scaler_{name}_mean"]),
                jnp.asarray(z[f"scaler_{name}_std"]),
            )
            for name in meta["scaler_names"]
        }
        return cls(
            input_variables=meta["input_variables"],
            params=params,
            input_info=packer.PackingInfo.from_dict(meta["input_info"]),
            x_scaler=StandardScaler(
                jnp.asarray(z["x_mean"]), jnp.asarray(z["x_std"])
            ),
            scalers=scalers,
            couple=meta["couple"],
            output_limits=_limits_from_meta(meta),
        )


def _limits_from_meta(meta: dict):
    if meta.get("output_limits"):
        from fv3net_tpu.fit.config import OutputLimitConfig

        return OutputLimitConfig.from_dict(meta["output_limits"])
    return None


@register_training_function("precipitative", PrecipitativeHyperparameters)
def train_precipitative_model(
    hyperparameters: PrecipitativeHyperparameters,
    train_batches,
    validation_batches=None,
) -> PrecipitativeModel:
    hp = hyperparameters
    inputs = list(hp.input_variables)
    outputs = list(hp.output_variables)
    xs, ys = [], []
    x_info = None
    for ds in train_batches:
        data = packer.dataset_to_samples(ds, inputs + outputs)
        X, x_info = packer.pack(data, inputs)
        xs.append(np.asarray(X))
        ys.append({k: np.asarray(data[k]) for k in outputs})
    X = np.concatenate(xs)
    Y = {
        k: np.concatenate([b[k] for b in ys]).reshape(X.shape[0], -1)
        for k in outputs
    }
    x_scaler = StandardScaler.fit(jnp.asarray(X))
    scalers = {k: StandardScaler.fit(jnp.asarray(v)) for k, v in Y.items()}

    nz = Y[Q_TENDENCY_NAME].shape[-1]
    key = jax.random.PRNGKey(hp.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    trunk_sizes = [x_info.total_features] + [hp.width] * hp.hidden_layers
    # init_mlp_params builds n-1 layers incl. a final linear; the trunk is
    # all-relu so build heads separately
    trunk = init_mlp_params(k1, trunk_sizes)

    def head(k, n_out):
        w = jax.random.normal(k, (hp.width, n_out)) * jnp.sqrt(1.0 / hp.width)
        return {"w": w, "b": jnp.zeros(n_out)}

    params = {
        "trunk": trunk,
        "head_T": head(k2, Y[T_TENDENCY_NAME].shape[-1]),
        "head_q": head(k3, nz),
        "head_precip": head(k4, nz),
    }

    model = PrecipitativeModel(
        input_variables=inputs,
        params=params,
        input_info=x_info,
        x_scaler=x_scaler,
        scalers=scalers,
        couple=hp.couple_precip_to_dQ1_dQ2,
        output_limits=_limits_from_meta(
            {"output_limits": hp.output_limit_config}
        ),
    )

    Xd = jnp.asarray(X)
    Yd = {k: jnp.asarray(v) for k, v in Y.items()}

    def loss_fn(p, xb, yb):
        out = model.apply_packed(p, xb)
        total = 0.0
        for k in outputs:
            pred = out[k].reshape(yb[k].shape)
            # standard-scaled MSE per output (LossConfig scaling)
            total = total + jnp.mean(
                ((pred - yb[k]) / scalers[k].std) ** 2
            )
        return total

    tx = optax.adam(hp.learning_rate)
    opt_state = tx.init(params)
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
        xb = Xd[idx]
        yb = {k: v[idx] for k, v in Yd.items()}
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
        updates, o = tx.update(grads, o)
        return (optax.apply_updates(p, updates), o), loss

    (params, opt_state), _ = jax.jit(
        lambda c, i: jax.lax.scan(step, c, i)
    )((params, opt_state), jnp.asarray(idx_all))

    model.params = params
    return model
