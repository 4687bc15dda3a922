"""Convolutional model + trainer on the full cube.

reference: external/fv3fit/fv3fit/keras/_models/convolutional.py:101
(train function "convolutional") + keras/_models/shared/
convolutional_network.py:20-136 (ConvolutionalNetworkConfig,
halos_required) and _shared/halos.py:163-206 (the tf.py_function
halo-update escape hatch).

TPU-native re-design: the cube-corner-aware halo exchange is a static
gather (fv3net_tpu.parallel.halo) that lives *inside* the jitted
forward/backward graph — no host callback — so convolution over the full
6-tile cube trains end-to-end on device.  Data layout [tile, y, x,
channels] with z-levels of each variable packed into channels.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit import io
from fv3net_tpu.fit.normalize import StandardScaler
from fv3net_tpu.fit.packer import PackingInfo
from fv3net_tpu.fit.predictor import Predictor
from fv3net_tpu.fit.train import register_training_function
from fv3net_tpu.parallel.halo import halo_append


@dataclasses.dataclass
class ConvolutionalHyperparameters:
    input_variables: List[str] = dataclasses.field(default_factory=list)
    output_variables: List[str] = dataclasses.field(default_factory=list)
    filters: int = 32
    depth: int = 3  # number of conv layers (reference network depth)
    kernel_size: int = 3
    learning_rate: float = 1e-3
    epochs: int = 10
    seed: int = 0
    # {name: {min, max}} prediction clamp (reference
    # output_limit.py:51, convolutional.py config field)
    output_limit_config: Optional[dict] = None


def halos_required(depth: int, kernel_size: int) -> int:
    """(reference convolutional_network.py halos_required)"""
    return depth * ((kernel_size - 1) // 2)


def init_conv_params(key, channels: Sequence[int], kernel_size: int):
    params = []
    for cin, cout in zip(channels[:-1], channels[1:]):
        key, sub = jax.random.split(key)
        fan_in = kernel_size * kernel_size * cin
        w = jax.random.normal(sub, (kernel_size, kernel_size, cin, cout)) * (
            jnp.sqrt(2.0 / fan_in)
        )
        params.append({"w": w, "b": jnp.zeros(cout)})
    return params


def conv_apply(params, x, halo: int):
    """x: [tile, ny, nx, cin] -> [tile, ny, nx, cout].

    One halo append up front (cube-topology gather), then VALID
    convolutions consume the halo layer by layer.
    """
    xt = jnp.moveaxis(x, -1, 1)  # [6, c, ny, nx] for the halo gather
    ext = halo_append(xt, halo)
    h = jnp.moveaxis(ext, 1, -1)
    for i, layer in enumerate(params):
        h = lax.conv_general_dilated(
            h, layer["w"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + layer["b"]
        if i < len(params) - 1:
            h = jax.nn.relu(h)
    return h


def _fields_to_channels(ds: Dataset, names: Sequence[str]):
    """[.., tile, z, y, x] or [.., tile, y, x] vars -> [.., tile, y, x, C]
    plus PackingInfo of channel counts."""
    arrays = []
    features = []
    for name in names:
        q = ds[name]
        arr = jnp.asarray(q.data)
        if "z" in q.dims:
            zax = q.dims.index("z")
            arr = jnp.moveaxis(arr, zax, -1)  # channels last
            features.append(arr.shape[-1])
        else:
            arr = arr[..., None]
            features.append(1)
        arrays.append(arr)
    return jnp.concatenate(arrays, axis=-1), PackingInfo(list(names), features)


def _z_variable_names(ds: Dataset, names: Sequence[str]):
    """Which of ``names`` carry a z dimension (a single-level 3-D field
    is indistinguishable from a 2-D one by channel count alone)."""
    return tuple(n for n in names if "z" in ds[n].dims)


def _channels_to_fields(arr, info: PackingInfo, dims_3d, dims_2d,
                        z_names=None):
    out = {}
    start = 0
    for name, nf in zip(info.names, info.features):
        chunk = arr[..., start : start + nf]
        start += nf
        is_3d = (name in z_names) if z_names is not None else nf > 1
        if is_3d:
            data = jnp.moveaxis(chunk, -1, -3)  # back to [.., z, y, x]
            out[name] = Quantity(data, dims_3d)
        else:
            out[name] = Quantity(chunk[..., 0], dims_2d)
    return out


@io.register("convolutional")
class ConvolutionalModel(Predictor):
    def __init__(
        self,
        input_variables,
        output_variables,
        params,
        input_info: PackingInfo,
        output_info: PackingInfo,
        x_scaler: StandardScaler,
        y_scaler: StandardScaler,
        kernel_size: int,
        output_z_names=None,
        output_limits=None,
    ):
        super().__init__(list(input_variables), list(output_variables))
        self.params = params
        self.input_info = input_info
        self.output_info = output_info
        self.x_scaler = x_scaler
        self.y_scaler = y_scaler
        self.kernel_size = kernel_size
        self.output_z_names = (
            tuple(output_z_names) if output_z_names is not None else None
        )
        self.output_limits = output_limits
        self._jit_apply = None

    @property
    def halo(self) -> int:
        return halos_required(len(self.params), self.kernel_size)

    def apply_channels(self, params, x):
        xn = self.x_scaler.normalize(x)
        yn = conv_apply(params, xn, self.halo)
        Y = self.y_scaler.denormalize(yn)
        if self.output_limits:
            Y = self.output_limits.limit_packed(Y, self.output_info)
        return Y

    def predict(self, X: Dataset) -> Dataset:
        arr, _ = _fields_to_channels(X, self.input_variables)
        lead = arr.shape[:-4]
        flat = arr.reshape((-1,) + arr.shape[-4:]) if lead else arr[None]
        # one jitted vmap over samples: a per-sample eager loop costs one
        # dispatch per sample (CLAUDE.md tunnel rule)
        if self._jit_apply is None:
            self._jit_apply = jax.jit(
                lambda p, f: jax.vmap(
                    lambda a: self.apply_channels(p, a)
                )(f)
            )
        outs = self._jit_apply(self.params, flat)
        out = outs.reshape(lead + outs.shape[1:]) if lead else outs[0]
        q0 = X[self.input_variables[0]]
        prefix = tuple(d for d in q0.dims if d not in ("tile", "z", "y", "x"))
        dims_3d = prefix + ("tile", "z", "y", "x")
        dims_2d = prefix + ("tile", "y", "x")
        return Dataset(
            _channels_to_fields(out, self.output_info, dims_3d, dims_2d,
                                z_names=self.output_z_names)
        )

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        flat = {}
        for i, layer in enumerate(self.params):
            flat[f"w{i}"] = np.asarray(layer["w"])
            flat[f"b{i}"] = np.asarray(layer["b"])
        flat.update(
            x_mean=np.asarray(self.x_scaler.mean),
            x_std=np.asarray(self.x_scaler.std),
            y_mean=np.asarray(self.y_scaler.mean),
            y_std=np.asarray(self.y_scaler.std),
        )
        np.savez(os.path.join(path, "weights.npz"), **flat)
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "input_variables": self.input_variables,
                    "output_variables": self.output_variables,
                    "input_info": self.input_info.to_dict(),
                    "output_info": self.output_info.to_dict(),
                    "n_layers": len(self.params),
                    "kernel_size": self.kernel_size,
                    "output_z_names": (
                        list(self.output_z_names)
                        if self.output_z_names is not None else None
                    ),
                    "output_limits": (
                        self.output_limits.to_dict()
                        if self.output_limits else None
                    ),
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "ConvolutionalModel":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        z = np.load(os.path.join(path, "weights.npz"))
        params = [
            {"w": jnp.asarray(z[f"w{i}"]), "b": jnp.asarray(z[f"b{i}"])}
            for i in range(meta["n_layers"])
        ]
        return cls(
            meta["input_variables"],
            meta["output_variables"],
            params,
            PackingInfo.from_dict(meta["input_info"]),
            PackingInfo.from_dict(meta["output_info"]),
            StandardScaler(jnp.asarray(z["x_mean"]), jnp.asarray(z["x_std"])),
            StandardScaler(jnp.asarray(z["y_mean"]), jnp.asarray(z["y_std"])),
            meta["kernel_size"],
            output_z_names=meta.get("output_z_names"),
            output_limits=_limits_from_meta(meta),
        )


def _limits_from_meta(meta: dict):
    if meta.get("output_limits"):
        from fv3net_tpu.fit.config import OutputLimitConfig

        return OutputLimitConfig.from_dict(meta["output_limits"])
    return None


@register_training_function("convolutional", ConvolutionalHyperparameters)
def train_convolutional_model(
    hyperparameters: ConvolutionalHyperparameters, train_batches, val=None
) -> ConvolutionalModel:
    """Train on batches of cube-shaped Datasets with dims
    (time, tile, z, y, x)."""
    hp = hyperparameters
    xs, ys = [], []
    x_info = y_info = None
    out_z_names = None
    for ds in train_batches:
        X, x_info = _fields_to_channels(ds, hp.input_variables)
        Y, y_info = _fields_to_channels(ds, hp.output_variables)
        if out_z_names is None:
            out_z_names = _z_variable_names(ds, hp.output_variables)
        xs.append(np.asarray(X))
        ys.append(np.asarray(Y))
    X = np.concatenate(xs)  # [time, 6, ny, nx, Cin]
    Y = np.concatenate(ys)

    x_scaler = StandardScaler.fit(jnp.asarray(X.reshape(-1, X.shape[-1])))
    y_scaler = StandardScaler.fit(jnp.asarray(Y.reshape(-1, Y.shape[-1])))

    channels = [X.shape[-1]] + [hp.filters] * (hp.depth - 1) + [Y.shape[-1]]
    key = jax.random.PRNGKey(hp.seed)
    params = init_conv_params(key, channels, hp.kernel_size)
    halo = halos_required(hp.depth, hp.kernel_size)

    tx = optax.adam(hp.learning_rate)
    opt_state = tx.init(params)

    xn = np.asarray(x_scaler.normalize(jnp.asarray(X)))
    yn = np.asarray(y_scaler.normalize(jnp.asarray(Y)))

    def loss_fn(p, xb, yb):
        pred = conv_apply(p, xb, halo)
        return jnp.mean((pred - yb) ** 2)

    # all epochs in ONE jit: fori_loop over epochs of a scan over samples
    # (per-dispatch overhead dominates otherwise; see fit/dense.py)
    xn_d = jnp.asarray(xn)
    yn_d = jnp.asarray(yn)

    def batch_step(carry, xy):
        p, o = carry
        xb, yb = xy
        _, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
        updates, o = tx.update(grads, o)
        return (optax.apply_updates(p, updates), o), None

    def epoch_body(_, carry):
        return jax.lax.scan(batch_step, carry, (xn_d, yn_d))[0]

    params, opt_state = jax.jit(
        lambda c: jax.lax.fori_loop(0, hp.epochs, epoch_body, c)
    )((params, opt_state))

    return ConvolutionalModel(
        hp.input_variables,
        hp.output_variables,
        params,
        x_info,
        y_info,
        x_scaler,
        y_scaler,
        hp.kernel_size,
        output_z_names=out_z_names,
        output_limits=_limits_from_meta(
            {"output_limits": hp.output_limit_config}
        ),
    )
