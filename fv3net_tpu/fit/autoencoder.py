"""Dense autoencoder trainer (the reservoir latent-space transformer).

The ``dense_autoencoder`` trainer of the reference (reference:
external/fv3fit/fv3fit/reservoir/transformers/autoencoder.py:250
train_dense_autoencoder; Autoencoder model io-registered as
"dense-autoencoder" at autoencoder.py:48), rebuilt in JAX.  The model
compresses packed per-column state profiles to a small latent vector
(used by the reservoir stack to shrink the readout dimension) and
reconstructs them; ``encode``/``decode`` are jittable pure functions so
the transformer can live inside a jitted reservoir step.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.fit import io, packer
from fv3net_tpu.fit.dense import init_mlp_params, mlp_apply
from fv3net_tpu.fit.normalize import StandardScaler
from fv3net_tpu.fit.predictor import Predictor
from fv3net_tpu.fit.train import register_training_function


@dataclasses.dataclass
class DenseAutoencoderHyperparameters:
    """(reference: DenseAutoencoderHyperparameters at
    reservoir/transformers/autoencoder.py:95)"""

    state_variables: List[str] = dataclasses.field(default_factory=list)
    latent_dim_size: int = 10
    units: int = 64
    n_dense_layers: int = 2
    learning_rate: float = 1e-3
    epochs: int = 10
    batch_size: int = 512
    seed: int = 0


@io.register("dense-autoencoder")
class Autoencoder(Predictor):
    """Encoder/decoder MLP pair over packed normalized state profiles."""

    def __init__(
        self,
        state_variables: Sequence[str],
        enc_params,
        dec_params,
        info: packer.PackingInfo,
        scaler: StandardScaler,
    ):
        super().__init__(list(state_variables), list(state_variables))
        self.enc_params = enc_params
        self.dec_params = dec_params
        self.info = info
        self.scaler = scaler

    @property
    def n_latent_dims(self) -> int:
        return self.enc_params[-1]["b"].shape[0]

    # -- pure apply paths -------------------------------------------------
    def encode_packed(self, X: jnp.ndarray) -> jnp.ndarray:
        return mlp_apply(self.enc_params, self.scaler.normalize(X))

    def decode_packed(self, latent: jnp.ndarray) -> jnp.ndarray:
        return self.scaler.denormalize(mlp_apply(self.dec_params, latent))

    def encode(self, data: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        X, _ = packer.pack(data, self.input_variables)
        return self.encode_packed(X)

    def decode(self, latent: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return packer.unpack(self.decode_packed(latent), self.info)

    def predict(self, X: Dataset) -> Dataset:
        """Roundtrip reconstruction (the Predictor surface)."""
        data = packer.dataset_to_samples(X, self.input_variables)
        return packer.samples_to_dataset(self.decode(self.encode(data)))

    # -- serialization ----------------------------------------------------
    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        flat = {}
        for tag, params in (("enc", self.enc_params), ("dec", self.dec_params)):
            for i, layer in enumerate(params):
                flat[f"{tag}_w{i}"] = np.asarray(layer["w"])
                flat[f"{tag}_b{i}"] = np.asarray(layer["b"])
        flat["x_mean"] = np.asarray(self.scaler.mean)
        flat["x_std"] = np.asarray(self.scaler.std)
        np.savez(os.path.join(path, "weights.npz"), **flat)
        meta = {
            "state_variables": self.input_variables,
            "info": self.info.to_dict(),
            "n_enc": len(self.enc_params),
            "n_dec": len(self.dec_params),
        }
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str) -> "Autoencoder":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        z = np.load(os.path.join(path, "weights.npz"))

        def layers(tag, n):
            return [
                {"w": jnp.asarray(z[f"{tag}_w{i}"]),
                 "b": jnp.asarray(z[f"{tag}_b{i}"])}
                for i in range(n)
            ]

        return cls(
            state_variables=meta["state_variables"],
            enc_params=layers("enc", meta["n_enc"]),
            dec_params=layers("dec", meta["n_dec"]),
            info=packer.PackingInfo.from_dict(meta["info"]),
            scaler=StandardScaler(jnp.asarray(z["x_mean"]),
                                  jnp.asarray(z["x_std"])),
        )


@register_training_function(
    "dense_autoencoder", DenseAutoencoderHyperparameters
)
def train_dense_autoencoder(
    hyperparameters: DenseAutoencoderHyperparameters,
    train_batches,
    validation_batches=None,
) -> Autoencoder:
    hp = hyperparameters
    xs = []
    info = None
    for ds in train_batches:
        data = packer.dataset_to_samples(ds, hp.state_variables)
        X, info = packer.pack(data, hp.state_variables)
        xs.append(np.asarray(X))
    X = np.concatenate(xs)
    scaler = StandardScaler.fit(jnp.asarray(X))

    nf = info.total_features
    key = jax.random.PRNGKey(hp.seed)
    k1, k2 = jax.random.split(key)
    enc_sizes = [nf] + [hp.units] * hp.n_dense_layers + [hp.latent_dim_size]
    dec_sizes = [hp.latent_dim_size] + [hp.units] * hp.n_dense_layers + [nf]
    enc = init_mlp_params(k1, enc_sizes)
    dec = init_mlp_params(k2, dec_sizes)

    tx = optax.adam(hp.learning_rate)
    params = {"enc": enc, "dec": dec}
    opt_state = tx.init(params)

    xn = jnp.asarray(np.asarray(scaler.normalize(jnp.asarray(X))))

    def loss_fn(p, xb):
        recon = mlp_apply(p["dec"], mlp_apply(p["enc"], xb))
        return jnp.mean((recon - xb) ** 2)

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
        loss, grads = jax.value_and_grad(loss_fn)(p, xn[idx])
        updates, o = tx.update(grads, o)
        return (optax.apply_updates(p, updates), o), loss

    (params, opt_state), _ = jax.jit(
        lambda c, i: jax.lax.scan(step, c, i)
    )((params, opt_state), jnp.asarray(idx_all))

    return Autoencoder(
        state_variables=list(hp.state_variables),
        enc_params=params["enc"],
        dec_params=params["dec"],
        info=info,
        scaler=scaler,
    )
