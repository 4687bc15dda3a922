"""Shared network-builder configs and the generic training loop.

Reference semantics: external/fv3fit/fv3fit/keras/_models/shared/
{dense_network.py:21-80, convolutional_network.py:20-136, loss.py:54-95,
training_loop.py:19-140} — Keras layer builders re-expressed as
pure-JAX param initializers + apply functions, and the epoch loop as ONE
fused ``lax.scan`` over minibatches (per-batch dispatch through the TPU
tunnel dominates otherwise; see CLAUDE.md training-loop learnings).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fv3net_tpu.fit.config import OptimizerConfig, RegularizerConfig

__all__ = [
    "DenseNetworkConfig",
    "DenseNetwork",
    "ConvolutionalNetworkConfig",
    "ConvolutionalNetwork",
    "LossConfig",
    "TrainingLoopConfig",
    "EpochResult",
]


@dataclasses.dataclass
class DenseNetwork:
    """Built dense network: a params pytree + pure apply
    (reference dense_network.py:12-18 DenseNetwork output container)."""

    params: List[Mapping[str, jnp.ndarray]]
    config: "DenseNetworkConfig"

    def __call__(self, x, key=None):
        return self.config.apply(self.params, x, key=key)


@dataclasses.dataclass
class DenseNetworkConfig:
    """MLP builder (reference dense_network.py:21-80): ``depth`` counts
    hidden layers + the output layer; ``gaussian_noise`` is applied to
    hidden activations when a PRNG key is passed (training mode)."""

    width: int = 8
    depth: int = 3
    kernel_regularizer: RegularizerConfig = dataclasses.field(
        default_factory=lambda: RegularizerConfig("none")
    )
    gaussian_noise: float = 0.0

    def build(self, key, n_features_in: int, n_features_out: int) -> DenseNetwork:
        sizes = [n_features_in] + [self.width] * (self.depth - 1) + [n_features_out]
        params = []
        for n_in, n_out in zip(sizes[:-1], sizes[1:]):
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (n_in, n_out)) * jnp.sqrt(2.0 / n_in)
            params.append({"w": w, "b": jnp.zeros(n_out)})
        return DenseNetwork(params=params, config=self)

    def apply(self, params, x, key=None):
        for layer in params[:-1]:
            x = jax.nn.relu(x @ layer["w"] + layer["b"])
            if self.gaussian_noise > 0.0 and key is not None:
                key, sub = jax.random.split(key)
                x = x + self.gaussian_noise * jax.random.normal(sub, x.shape)
        last = params[-1]
        return x @ last["w"] + last["b"]

    def penalty(self, params) -> jnp.ndarray:
        return self.kernel_regularizer.penalty(params)


@dataclasses.dataclass
class ConvolutionalNetwork:
    params: List[Mapping[str, jnp.ndarray]]
    config: "ConvolutionalNetworkConfig"

    def __call__(self, x):
        return self.config.apply(self.params, x)


@dataclasses.dataclass
class ConvolutionalNetworkConfig:
    """2-D conv stack builder (reference convolutional_network.py:20-136):
    ``depth`` hidden conv layers of ``filters`` channels + a 1x1 output
    projection; ``halos_required`` gives the input halo width the valid
    convolutions consume."""

    filters: int = 32
    depth: int = 3
    kernel_size: int = 3
    kernel_regularizer: RegularizerConfig = dataclasses.field(
        default_factory=lambda: RegularizerConfig("none")
    )

    @property
    def halos_required(self) -> int:
        return (self.kernel_size - 1) // 2 * (self.depth - 1)

    def build(self, key, n_channels_in: int, n_channels_out: int) -> ConvolutionalNetwork:
        chans = [n_channels_in] + [self.filters] * (self.depth - 1) + [n_channels_out]
        params = []
        for i, (c_in, c_out) in enumerate(zip(chans[:-1], chans[1:])):
            k = self.kernel_size if i < len(chans) - 2 else 1
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (k, k, c_in, c_out)) * jnp.sqrt(
                2.0 / (k * k * c_in)
            )
            params.append({"w": w, "b": jnp.zeros(c_out)})
        return ConvolutionalNetwork(params=params, config=self)

    def apply(self, params, x):
        """x: [batch, y, x, channels]; valid convolutions shrink the
        spatial dims by 2*halos_required total."""
        for i, layer in enumerate(params):
            x = jax.lax.conv_general_dilated(
                x,
                layer["w"],
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + layer["b"]
            if i < len(params) - 1:
                x = jax.nn.relu(x)
        return x

    def penalty(self, params) -> jnp.ndarray:
        return self.kernel_regularizer.penalty(params)


@dataclasses.dataclass
class LossConfig:
    """Per-feature-scaled loss (reference loss.py:54-95): 'mse' or 'mae',
    scaled by 'standard' (per-feature stddev) or 'standard_uniform'
    (mean stddev over features), times ``weight``."""

    loss_type: str = "mse"
    scaling: str = "standard_uniform"
    weight: float = 1.0

    def loss(self, std: jnp.ndarray) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        if self.scaling == "standard_uniform":
            scale = jnp.mean(std)
        elif self.scaling == "standard":
            scale = std
        else:
            raise ValueError(f"unknown scaling {self.scaling!r}")

        if self.loss_type == "mse":
            def fn(pred, target):
                return self.weight * jnp.mean(((pred - target) / scale) ** 2)
        elif self.loss_type == "mae":
            def fn(pred, target):
                return self.weight * jnp.mean(jnp.abs((pred - target) / scale))
        else:
            raise ValueError(f"unknown loss_type {self.loss_type!r}")
        return fn


@dataclasses.dataclass
class EpochResult:
    """Per-epoch metrics (reference training_loop.py:19-29)."""

    epoch: int
    batch_logs: Sequence[Mapping[str, float]]
    epoch_logs: Mapping[str, float]


@dataclasses.dataclass
class TrainingLoopConfig:
    """Generic minibatch training loop (reference training_loop.py:61-140).

    ``fit_loop`` fuses ALL epochs into one jitted ``lax.scan``: the data
    is shuffled per epoch with in-scan row gathers (fast on TPU; the
    dispatch-per-batch alternative is 5x slower through the tunnel).
    Per-epoch losses are returned as EpochResults and passed to
    ``callbacks`` after the scan completes.
    """

    epochs: int = 3
    batch_size: int = 16
    shuffle_seed: int = 0

    def fit_loop(
        self,
        loss_fn: Callable,
        params,
        X: jnp.ndarray,
        y: jnp.ndarray,
        optimizer: Optional[optax.GradientTransformation] = None,
        validation_data=None,
        callbacks: Sequence[Callable[[EpochResult], None]] = (),
    ):
        """Args:
            loss_fn: ``loss_fn(params, X_batch, y_batch) -> scalar``.
            params: initial parameter pytree.
            X, y: [sample, ...] arrays.
            optimizer: optax transform (default: OptimizerConfig().instance).
        Returns:
            (trained_params, [EpochResult]) — epoch_logs carry mean train
            loss and, if validation_data is given, ``val_loss``.
        """
        optimizer = optimizer or OptimizerConfig().instance
        n = X.shape[0]
        n_batches = max(n // self.batch_size, 1)
        used = n_batches * self.batch_size
        opt_state = optimizer.init(params)
        rng = np.random.RandomState(self.shuffle_seed)
        perms = jnp.asarray(
            np.stack([rng.permutation(n)[:used] for _ in range(self.epochs)])
        ).reshape(self.epochs, n_batches, self.batch_size)

        def batch_step(carry, idx):
            params, opt_state = carry
            xb = jnp.take(X, idx, axis=0)
            yb = jnp.take(y, idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        def epoch_step(carry, epoch_perms):
            carry, losses = jax.lax.scan(batch_step, carry, epoch_perms)
            if validation_data is not None:
                xv, yv = validation_data
                val = loss_fn(carry[0], jnp.asarray(xv), jnp.asarray(yv))
            else:
                val = jnp.asarray(0.0)
            return carry, (losses, val)

        @jax.jit
        def run(params, opt_state, perms):
            (params, opt_state), out = jax.lax.scan(
                epoch_step, (params, opt_state), perms
            )
            return params, out

        params, (losses, vals) = run(params, opt_state, perms)
        losses = np.asarray(losses)  # [epochs, n_batches]
        vals = np.asarray(vals)
        results = []
        for e in range(self.epochs):
            logs = {"loss": float(losses[e].mean())}
            if validation_data is not None:
                logs["val_loss"] = float(vals[e])
            result = EpochResult(
                epoch=e,
                batch_logs=[{"loss": float(v)} for v in losses[e]],
                epoch_logs=logs,
            )
            for cb in callbacks:
                cb(result)
            results.append(result)
        return params, results
