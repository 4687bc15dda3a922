"""CycleGAN for domain translation on the cubed sphere.

reference: external/fv3fit/fv3fit/pytorch/cyclegan/ — train_cyclegan.py:393
(trainer "cyclegan") and reloadable.py:43, used for C48<->C384 bias
correction / statistical super-resolution.

JAX re-design: generators and discriminators are halo-aware convolutional
networks on [tile, y, x, channels] cube fields (reusing the in-graph cube
halo exchange of fit.convolutional); LSGAN adversarial losses + cycle and
identity consistency, optimized with two optax optimizers in one jitted
update.
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

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.fit import io
from fv3net_tpu.fit.convolutional import (
    _channels_to_fields,
    _fields_to_channels,
    _z_variable_names,
    conv_apply,
    halos_required,
    init_conv_params,
)
from fv3net_tpu.fit.normalize import StandardScaler
from fv3net_tpu.fit.packer import PackingInfo
from fv3net_tpu.fit.predictor import Predictor
from fv3net_tpu.fit.train import register_training_function


@dataclasses.dataclass
class CycleGANHyperparameters:
    state_variables: List[str] = dataclasses.field(default_factory=list)
    generator_filters: int = 32
    generator_depth: int = 3
    discriminator_filters: int = 32
    discriminator_depth: int = 3
    kernel_size: int = 3
    cycle_weight: float = 10.0
    identity_weight: float = 5.0
    learning_rate: float = 2e-4
    epochs: int = 5
    seed: int = 0


def _gen_apply(params, x, halo):
    return conv_apply(params, x, halo)


def _disc_apply(params, x, halo):
    """Patch discriminator: conv stack -> per-cell score -> mean."""
    score = conv_apply(params, x, halo)
    return score.mean(axis=(-3, -2, -1))


@io.register("cycle_gan")
class CycleGAN(Predictor):
    """Holds both generators; ``predict`` applies G: domain A -> B
    (the reference's convention for applying the trained corrector)."""

    def __init__(self, state_variables, g_ab, g_ba, info, scaler_a,
                 scaler_b, kernel_size, depth, state_z_names=None):
        super().__init__(list(state_variables), list(state_variables))
        self.state_variables = list(state_variables)
        self.g_ab = g_ab
        self.g_ba = g_ba
        self.info = info
        self.scaler_a = scaler_a
        self.scaler_b = scaler_b
        self.kernel_size = kernel_size
        self.depth = depth
        self.state_z_names = (
            tuple(state_z_names) if state_z_names is not None else None
        )
        self._jit_translate = None

    @property
    def halo(self) -> int:
        return halos_required(self.depth, self.kernel_size)

    def _translate(self, params, x, scaler_in, scaler_out):
        xn = scaler_in.normalize(x)
        yn = _gen_apply(params, xn, self.halo)
        return scaler_out.denormalize(yn)

    def _run_direction(self, X: Dataset, params, scaler_in, scaler_out):
        """Shared predict/reverse body: one jitted vmap over samples (a
        per-sample eager loop costs one dispatch each, CLAUDE.md tunnel
        rule)."""
        arr, _ = _fields_to_channels(X, self.state_variables)
        lead = arr.shape[:-4]
        flat = arr.reshape((-1,) + arr.shape[-4:]) if lead else arr[None]
        if self._jit_translate is None:
            self._jit_translate = jax.jit(
                lambda p, f, si_m, si_s, so_m, so_s: jax.vmap(
                    lambda a: self._translate(
                        p, a,
                        StandardScaler(si_m, si_s),
                        StandardScaler(so_m, so_s),
                    )
                )(f)
            )
        outs = self._jit_translate(
            params, flat, scaler_in.mean, scaler_in.std,
            scaler_out.mean, scaler_out.std,
        )
        out = outs.reshape(lead + outs.shape[1:]) if lead else outs[0]
        q0 = X[self.state_variables[0]]
        prefix = tuple(d for d in q0.dims if d not in ("tile", "z", "y", "x"))
        return Dataset(
            _channels_to_fields(
                out, self.info,
                prefix + ("tile", "z", "y", "x"), prefix + ("tile", "y", "x"),
                z_names=self.state_z_names,
            )
        )

    def predict(self, X: Dataset) -> Dataset:
        return self._run_direction(X, self.g_ab, self.scaler_a, self.scaler_b)

    def reverse(self, X: Dataset) -> Dataset:
        """Apply F: domain B -> A."""
        return self._run_direction(X, self.g_ba, self.scaler_b, self.scaler_a)

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        flat = {}
        for tag, params in (("ab", self.g_ab), ("ba", self.g_ba)):
            for i, l in enumerate(params):
                flat[f"{tag}_w{i}"] = np.asarray(l["w"])
                flat[f"{tag}_b{i}"] = np.asarray(l["b"])
        flat.update(
            a_mean=np.asarray(self.scaler_a.mean),
            a_std=np.asarray(self.scaler_a.std),
            b_mean=np.asarray(self.scaler_b.mean),
            b_std=np.asarray(self.scaler_b.std),
        )
        np.savez(os.path.join(path, "weights.npz"), **flat)
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(
                {
                    "state_variables": self.state_variables,
                    "info": self.info.to_dict(),
                    "n_layers": len(self.g_ab),
                    "kernel_size": self.kernel_size,
                    "depth": self.depth,
                    "state_z_names": (
                        list(self.state_z_names)
                        if self.state_z_names is not None else None
                    ),
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "CycleGAN":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        z = np.load(os.path.join(path, "weights.npz"))
        g = {
            tag: [
                {
                    "w": jnp.asarray(z[f"{tag}_w{i}"]),
                    "b": jnp.asarray(z[f"{tag}_b{i}"]),
                }
                for i in range(meta["n_layers"])
            ]
            for tag in ("ab", "ba")
        }
        return cls(
            meta["state_variables"],
            g["ab"],
            g["ba"],
            PackingInfo.from_dict(meta["info"]),
            StandardScaler(jnp.asarray(z["a_mean"]), jnp.asarray(z["a_std"])),
            StandardScaler(jnp.asarray(z["b_mean"]), jnp.asarray(z["b_std"])),
            meta["kernel_size"],
            meta["depth"],
            state_z_names=meta.get("state_z_names"),
        )


@register_training_function("cyclegan", CycleGANHyperparameters)
def train_cyclegan(
    hp: CycleGANHyperparameters, train_batches, val=None
) -> CycleGAN:
    """Train on a sequence of (domain_a: Dataset, domain_b: Dataset) pairs
    of cube-shaped samples with dims (time, tile, z, y, x) — unpaired in
    content, paired only in batch structure (standard CycleGAN setup)."""
    a_list, b_list = [], []
    info = None
    state_z_names = None
    for ds_a, ds_b in train_batches:
        A, info = _fields_to_channels(ds_a, hp.state_variables)
        B, _ = _fields_to_channels(ds_b, hp.state_variables)
        if state_z_names is None:
            state_z_names = _z_variable_names(ds_a, hp.state_variables)
        a_list.append(np.asarray(A))
        b_list.append(np.asarray(B))
    A = np.concatenate(a_list)  # [time, 6, ny, nx, C]
    B = np.concatenate(b_list)
    C = A.shape[-1]
    scaler_a = StandardScaler.fit(jnp.asarray(A.reshape(-1, C)))
    scaler_b = StandardScaler.fit(jnp.asarray(B.reshape(-1, C)))
    An = np.asarray(scaler_a.normalize(jnp.asarray(A)))
    Bn = np.asarray(scaler_b.normalize(jnp.asarray(B)))

    key = jax.random.PRNGKey(hp.seed)
    kg = [C] + [hp.generator_filters] * (hp.generator_depth - 1) + [C]
    kd = [C] + [hp.discriminator_filters] * (hp.discriminator_depth - 1) + [1]
    keys = jax.random.split(key, 4)
    gen = {
        "ab": init_conv_params(keys[0], kg, hp.kernel_size),
        "ba": init_conv_params(keys[1], kg, hp.kernel_size),
    }
    disc = {
        "a": init_conv_params(keys[2], kd, hp.kernel_size),
        "b": init_conv_params(keys[3], kd, hp.kernel_size),
    }
    halo_g = halos_required(hp.generator_depth, hp.kernel_size)
    halo_d = halos_required(hp.discriminator_depth, hp.kernel_size)

    tx_g = optax.adam(hp.learning_rate, b1=0.5)
    tx_d = optax.adam(hp.learning_rate, b1=0.5)
    opt_g = tx_g.init(gen)
    opt_d = tx_d.init(disc)

    def gen_loss(gen, disc, a, b):
        fake_b = _gen_apply(gen["ab"], a, halo_g)
        fake_a = _gen_apply(gen["ba"], b, halo_g)
        # LSGAN: generator wants D(fake) -> 1
        adv = jnp.mean((_disc_apply(disc["b"], fake_b, halo_d) - 1.0) ** 2) + (
            jnp.mean((_disc_apply(disc["a"], fake_a, halo_d) - 1.0) ** 2)
        )
        cyc = jnp.mean(
            jnp.abs(_gen_apply(gen["ba"], fake_b, halo_g) - a)
        ) + jnp.mean(jnp.abs(_gen_apply(gen["ab"], fake_a, halo_g) - b))
        idt = jnp.mean(
            jnp.abs(_gen_apply(gen["ab"], b, halo_g) - b)
        ) + jnp.mean(jnp.abs(_gen_apply(gen["ba"], a, halo_g) - a))
        return adv + hp.cycle_weight * cyc + hp.identity_weight * idt

    def disc_loss(disc, gen, a, b):
        fake_b = jax.lax.stop_gradient(_gen_apply(gen["ab"], a, halo_g))
        fake_a = jax.lax.stop_gradient(_gen_apply(gen["ba"], b, halo_g))
        loss = (
            jnp.mean((_disc_apply(disc["a"], a, halo_d) - 1.0) ** 2)
            + jnp.mean(_disc_apply(disc["a"], fake_a, halo_d) ** 2)
            + jnp.mean((_disc_apply(disc["b"], b, halo_d) - 1.0) ** 2)
            + jnp.mean(_disc_apply(disc["b"], fake_b, halo_d) ** 2)
        )
        return 0.5 * loss

    # all epochs in ONE jit: the alternating G/D updates ride a scan over
    # samples inside a fori_loop over epochs (see fit/dense.py)
    nt = min(An.shape[0], Bn.shape[0])
    An_d = jnp.asarray(An[:nt])
    Bn_d = jnp.asarray(Bn[:nt])

    def sample_step(carry, ab):
        gen, disc, opt_g, opt_d = carry
        a, b = ab
        _, ggrad = jax.value_and_grad(gen_loss)(gen, disc, a, b)
        gupd, opt_g = tx_g.update(ggrad, opt_g)
        gen = optax.apply_updates(gen, gupd)
        _, dgrad = jax.value_and_grad(disc_loss)(disc, gen, a, b)
        dupd, opt_d = tx_d.update(dgrad, opt_d)
        disc = optax.apply_updates(disc, dupd)
        return (gen, disc, opt_g, opt_d), None

    def epoch_body(_, carry):
        return jax.lax.scan(sample_step, carry, (An_d, Bn_d))[0]

    gen, disc, opt_g, opt_d = jax.jit(
        lambda c: jax.lax.fori_loop(0, hp.epochs, epoch_body, c)
    )((gen, disc, opt_g, opt_d))

    return CycleGAN(
        hp.state_variables, gen["ab"], gen["ba"], info, scaler_a, scaler_b,
        hp.kernel_size, hp.generator_depth,
        state_z_names=state_z_names,
    )
