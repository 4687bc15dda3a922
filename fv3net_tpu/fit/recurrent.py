"""Autoregressive recurrent emulator (the FMR family).

reference: external/fv3fit/fv3fit/pytorch/recurrent/train_fmr.py:446
(trainer "fmr") and pytorch/predict.py:136 (pytorch_autoregressor) — an
emulator stepped forward in time, trained on multi-step rollouts.

TPU-native design: the rollout is a ``lax.scan`` inside the loss, so
backprop-through-time compiles into one XLA program; the step function
is a residual MLP on packed column features.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.fit import io, packer
from fv3net_tpu.fit.dense import init_mlp_params, mlp_apply
from fv3net_tpu.fit.normalize import StandardScaler
from fv3net_tpu.fit.predictor import Predictor
from fv3net_tpu.fit.train import register_training_function


@dataclasses.dataclass
class RecurrentHyperparameters:
    state_variables: List[str] = dataclasses.field(default_factory=list)
    hidden_layers: int = 2
    width: int = 128
    train_window: int = 4  # rollout length for BPTT
    learning_rate: float = 1e-3
    epochs: int = 10
    seed: int = 0


@io.register("fmr")
class AutoregressiveModel(Predictor):
    """s_{t+1} = s_t + f(s_t) on normalized packed state features."""

    def __init__(self, state_variables, params, info, scaler):
        super().__init__(list(state_variables), list(state_variables))
        self.state_variables = list(state_variables)
        self.params = params
        self.info = info
        self.scaler = scaler

    def step(self, params, s_norm):
        return s_norm + mlp_apply(params, s_norm)

    def rollout(self, s0: jnp.ndarray, n_steps: int) -> jnp.ndarray:
        """[sample, features] initial state -> [n_steps, sample, features]."""
        s0n = self.scaler.normalize(s0)

        def body(s, _):
            s = self.step(self.params, s)
            return s, s

        _, traj = lax.scan(body, s0n, None, length=n_steps)
        return jax.vmap(self.scaler.denormalize)(traj)

    def predict(self, X: Dataset) -> Dataset:
        """One-step prediction of all state variables."""
        data = packer.dataset_to_samples(X, self.state_variables)
        S, _ = packer.pack(data, self.state_variables)
        out = self.scaler.denormalize(
            self.step(self.params, self.scaler.normalize(S))
        )
        return packer.samples_to_dataset(packer.unpack(out, self.info))

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        flat = {}
        for i, l in enumerate(self.params):
            flat[f"w{i}"] = np.asarray(l["w"])
            flat[f"b{i}"] = np.asarray(l["b"])
        flat["mean"] = np.asarray(self.scaler.mean)
        flat["std"] = np.asarray(self.scaler.std)
        np.savez(os.path.join(path, "weights.npz"), **flat)
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "state_variables": self.state_variables,
                    "info": self.info.to_dict(),
                    "n_layers": len(self.params),
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "AutoregressiveModel":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        z = np.load(os.path.join(path, "weights.npz"))
        params = [
            {"w": jnp.asarray(z[f"w{i}"]), "b": jnp.asarray(z[f"b{i}"])}
            for i in range(meta["n_layers"])
        ]
        return cls(
            meta["state_variables"],
            params,
            packer.PackingInfo.from_dict(meta["info"]),
            StandardScaler(jnp.asarray(z["mean"]), jnp.asarray(z["std"])),
        )


@register_training_function("fmr", RecurrentHyperparameters)
def train_autoregressive_model(
    hp: RecurrentHyperparameters, train_batches, val=None
) -> AutoregressiveModel:
    """Train on batches of Datasets with [time, sample, z] variables."""
    series = []
    info = None
    for ds in train_batches:
        data = {}
        for v in hp.state_variables:
            arr = jnp.asarray(ds[v].data)  # [time, sample, z] or [time, sample]
            data[v] = arr.reshape(arr.shape[0] * arr.shape[1], -1) if (
                arr.ndim == 3
            ) else arr.reshape(-1)
        # pack per time to keep the time axis: re-pack full series
        t = jnp.asarray(ds[hp.state_variables[0]].data).shape[0]
        packed, info = packer.pack(data, hp.state_variables)
        series.append(np.asarray(packed).reshape(t, -1, info.total_features))
    S = np.concatenate(series, axis=1)  # [time, sample, features]
    scaler = StandardScaler.fit(jnp.asarray(S.reshape(-1, S.shape[-1])))
    Sn = np.asarray(jax.vmap(scaler.normalize)(jnp.asarray(S)))

    key = jax.random.PRNGKey(hp.seed)
    sizes = [info.total_features] + [hp.width] * hp.hidden_layers + [
        info.total_features
    ]
    params = init_mlp_params(key, sizes)
    tx = optax.adam(hp.learning_rate)
    opt_state = tx.init(params)
    W = min(hp.train_window, S.shape[0] - 1)

    def loss_fn(p, window):
        """window: [W+1, sample, features] normalized truth."""
        def body(s, target):
            s = s + mlp_apply(p, s)
            return s, jnp.mean((s - target) ** 2)

        _, losses = lax.scan(body, window[0], window[1:])
        return jnp.mean(losses)

    # all epochs in ONE jit: scan over window start indices, windows
    # gathered on device (see fit/dense.py)
    nt = Sn.shape[0]
    Sn_d = jnp.asarray(Sn)
    win_idx = jnp.asarray(
        np.arange(nt - W)[:, None] + np.arange(W + 1)[None, :]
    )  # [n_windows, W+1]

    def window_step(carry, idx):
        p, o = carry
        _, grads = jax.value_and_grad(loss_fn)(p, Sn_d[idx])
        updates, o = tx.update(grads, o)
        return (optax.apply_updates(p, updates), o), None

    def epoch_body(_, carry):
        return lax.scan(window_step, carry, win_idx)[0]

    params, opt_state = jax.jit(
        lambda c: lax.fori_loop(0, hp.epochs, epoch_body, c)
    )((params, opt_state))

    return AutoregressiveModel(hp.state_variables, params, info, scaler)
