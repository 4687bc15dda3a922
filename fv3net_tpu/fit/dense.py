"""Dense (MLP) model + trainer, pure JAX + optax.

The ``dense`` trainer of the reference (reference: external/fv3fit/
fv3fit/keras/_models/dense.py:90 train_dense_model +
keras/_models/shared/dense_network.py:21-39 DenseNetworkConfig), rebuilt
TPU-first: the network is a weight pytree applied by a jittable pure
function (so it can run *inside* the prognostic jitted step), trained
with an optax Adam loop over batched samples.
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
from fv3net_tpu.fit import io, packer
from fv3net_tpu.fit.normalize import StandardScaler
from fv3net_tpu.fit.predictor import Predictor
from fv3net_tpu.fit.train import register_training_function


@dataclasses.dataclass
class DenseHyperparameters:
    """(reference: DenseHyperparameters at keras/_models/dense.py:36)"""

    input_variables: List[str] = dataclasses.field(default_factory=list)
    output_variables: List[str] = dataclasses.field(default_factory=list)
    hidden_layers: int = 3
    width: int = 419  # reference dense_network.py default width
    learning_rate: float = 1e-3
    epochs: int = 10
    batch_size: int = 512
    l2_regularization: float = 0.0
    seed: int = 0
    # reference-style nested configs (keras/_models/dense.py:36 fields);
    # when present they override the flat knobs above:
    #   dense_network:    {width, depth, kernel_regularizer: {name, kwargs}}
    #   optimizer_config: {name, kwargs, learning_rate_schedule: {...}}
    #   loss:             {loss_type: mse|mae, weight}
    dense_network: Optional[dict] = None
    optimizer_config: Optional[dict] = None
    loss: Optional[dict] = None
    # per-output-variable {name: {min, max}} clamp applied to
    # predictions (reference output_limit.py:51 OutputLimitConfig,
    # wired at keras/_models/dense.py:36 ``output_limit_config``)
    output_limit_config: Optional[dict] = None


def init_mlp_params(key, sizes: Sequence[int]):
    params = []
    for i, (n_in, n_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (n_in, n_out)) * jnp.sqrt(2.0 / n_in)
        params.append({"w": w, "b": jnp.zeros(n_out)})
    return params


def mlp_apply(params, x):
    for layer in params[:-1]:
        x = jax.nn.relu(x @ layer["w"] + layer["b"])
    last = params[-1]
    return x @ last["w"] + last["b"]


@io.register("dense")
class DenseModel(Predictor):
    """MLP on packed [sample, feature] arrays with standard normalization
    fused into the forward function."""

    def __init__(
        self,
        input_variables: Sequence[str],
        output_variables: Sequence[str],
        params,
        input_info: packer.PackingInfo,
        output_info: packer.PackingInfo,
        x_scaler: StandardScaler,
        y_scaler: StandardScaler,
        output_limits=None,
    ):
        super().__init__(input_variables, output_variables)
        self.params = params
        self.input_info = input_info
        self.output_info = output_info
        self.x_scaler = x_scaler
        self.y_scaler = y_scaler
        self.output_limits = output_limits

    # -- pure apply path (usable inside jit) ------------------------------
    def apply_packed(self, params, X: jnp.ndarray) -> jnp.ndarray:
        xn = self.x_scaler.normalize(X)
        yn = mlp_apply(params, xn)
        Y = self.y_scaler.denormalize(yn)
        if self.output_limits:
            Y = self.output_limits.limit_packed(Y, self.output_info)
        return Y

    def predict_arrays(
        self, data: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        X, _ = packer.pack(data, self.input_variables)
        Y = self.apply_packed(self.params, X)
        return packer.unpack(Y, self.output_info)

    def predict(self, X: Dataset) -> Dataset:
        data = packer.dataset_to_samples(X, self.input_variables)
        out = self.predict_arrays(data)
        return packer.samples_to_dataset(out)

    # -- serialization ----------------------------------------------------
    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        flat = {}
        for i, layer in enumerate(self.params):
            flat[f"w{i}"] = np.asarray(layer["w"])
            flat[f"b{i}"] = np.asarray(layer["b"])
        flat["x_mean"] = np.asarray(self.x_scaler.mean)
        flat["x_std"] = np.asarray(self.x_scaler.std)
        flat["y_mean"] = np.asarray(self.y_scaler.mean)
        flat["y_std"] = np.asarray(self.y_scaler.std)
        np.savez(os.path.join(path, "weights.npz"), **flat)
        meta = {
            "input_variables": self.input_variables,
            "output_variables": self.output_variables,
            "input_info": self.input_info.to_dict(),
            "output_info": self.output_info.to_dict(),
            "n_layers": len(self.params),
        }
        if self.output_limits:
            meta["output_limits"] = self.output_limits.to_dict()
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str) -> "DenseModel":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        z = np.load(os.path.join(path, "weights.npz"))
        params = [
            {"w": jnp.asarray(z[f"w{i}"]), "b": jnp.asarray(z[f"b{i}"])}
            for i in range(meta["n_layers"])
        ]
        return cls(
            input_variables=meta["input_variables"],
            output_variables=meta["output_variables"],
            params=params,
            input_info=packer.PackingInfo.from_dict(meta["input_info"]),
            output_info=packer.PackingInfo.from_dict(meta["output_info"]),
            x_scaler=StandardScaler(jnp.asarray(z["x_mean"]),
                                    jnp.asarray(z["x_std"])),
            y_scaler=StandardScaler(jnp.asarray(z["y_mean"]),
                                    jnp.asarray(z["y_std"])),
            output_limits=_load_output_limits(meta),
        )


def _load_output_limits(meta: dict):
    if meta.get("output_limits"):
        from fv3net_tpu.fit.config import OutputLimitConfig

        return OutputLimitConfig.from_dict(meta["output_limits"])
    return None


def _collect(batches, input_variables, output_variables):
    """Materialize batches (Datasets of [sample(,z)] Quantities) into
    packed numpy arrays."""
    xs, ys = [], []
    x_info = y_info = None
    for ds in batches:
        data = packer.dataset_to_samples(
            ds, list(input_variables) + list(output_variables)
        )
        X, x_info = packer.pack(data, input_variables)
        Y, y_info = packer.pack(data, output_variables)
        xs.append(np.asarray(X))
        ys.append(np.asarray(Y))
    return np.concatenate(xs), np.concatenate(ys), x_info, y_info


@register_training_function("dense", DenseHyperparameters)
def train_dense_model(
    hyperparameters: DenseHyperparameters,
    train_batches,
    validation_batches=None,
) -> DenseModel:
    hp = hyperparameters
    X, Y, x_info, y_info = _collect(
        train_batches, hp.input_variables, hp.output_variables
    )
    x_scaler = StandardScaler.fit(jnp.asarray(X))
    y_scaler = StandardScaler.fit(jnp.asarray(Y))

    # reference-style nested configs override the flat knobs
    width, n_hidden = hp.width, hp.hidden_layers
    penalty = None
    if hp.dense_network is not None:
        from fv3net_tpu.fit.config import RegularizerConfig
        from fv3net_tpu.fit.networks import DenseNetworkConfig

        nd = dict(hp.dense_network)
        reg = nd.pop("kernel_regularizer", None)
        netcfg = DenseNetworkConfig(
            **nd,
            kernel_regularizer=RegularizerConfig(**reg)
            if reg
            else RegularizerConfig("none"),
        )
        width, n_hidden = netcfg.width, netcfg.depth - 1
        penalty = netcfg.penalty
    sizes = [x_info.total_features] + [width] * n_hidden + [
        y_info.total_features
    ]
    key = jax.random.PRNGKey(hp.seed)
    params = init_mlp_params(key, sizes)

    if hp.optimizer_config is not None:
        from fv3net_tpu.fit.config import (
            LearningRateScheduleConfig,
            OptimizerConfig,
        )

        oc = dict(hp.optimizer_config)
        sched = oc.pop("learning_rate_schedule", None)
        tx = OptimizerConfig(
            **oc,
            learning_rate_schedule=LearningRateScheduleConfig(**sched)
            if sched
            else None,
        ).instance
    else:
        tx = optax.adam(hp.learning_rate)
    opt_state = tx.init(params)

    xn_all = np.asarray(x_scaler.normalize(jnp.asarray(X)))
    yn_all = np.asarray(y_scaler.normalize(jnp.asarray(Y)))

    loss_type = (hp.loss or {}).get("loss_type", "mse")
    loss_weight = float((hp.loss or {}).get("weight", 1.0))

    def loss_fn(p, xb, yb):
        pred = mlp_apply(p, xb)
        if loss_type == "mae":
            err = loss_weight * jnp.mean(jnp.abs(pred - yb))
        else:
            err = loss_weight * jnp.mean((pred - yb) ** 2)
        if penalty is not None:
            err = err + penalty([{"w": l["w"]} for l in p])
        elif hp.l2_regularization > 0:
            l2 = sum(jnp.sum(l["w"] ** 2) for l in p)
            err = err + hp.l2_regularization * l2
        return err

    # the whole optimization runs as ONE lax.scan over minibatch indices
    # inside a single jit: the reference's per-batch Keras fit dispatches
    # (and, here, per-dispatch TPU-tunnel round-trips) collapse to one
    # device program; shuffling stays host-side for seed determinism
    n = xn_all.shape[0]
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

    xn_d = jnp.asarray(xn_all)
    yn_d = jnp.asarray(yn_all)

    def step(carry, idx):
        p, o = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, xn_d[idx], yn_d[idx])
        # pass params: decoupled-decay optimizers (adamw, lion) need them
        updates, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), loss

    (params, opt_state), _ = jax.jit(
        lambda c, i: jax.lax.scan(step, c, i)
    )((params, opt_state), jnp.asarray(idx_all))

    output_limits = None
    if hp.output_limit_config:
        from fv3net_tpu.fit.config import OutputLimitConfig

        output_limits = OutputLimitConfig.from_dict(hp.output_limit_config)

    return DenseModel(
        input_variables=list(hp.input_variables),
        output_variables=list(hp.output_variables),
        params=params,
        input_info=x_info,
        output_info=y_info,
        x_scaler=x_scaler,
        y_scaler=y_scaler,
        output_limits=output_limits,
    )
