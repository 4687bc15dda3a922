"""CycleGAN for domain translation on the cubed sphere.

reference: external/fv3fit/fv3fit/pytorch/cyclegan/ — train_cyclegan.py:393
(trainer "cyclegan"), generator.py (Zhu et al. 2017 ResNet
encoder/decoder), discriminator.py (PatchGAN), image_pool.py (replay
buffer), modules.py (GeographicFeatures/GeographicBias/ResnetBlock) —
used for C48<->C384 bias correction / statistical super-resolution.

JAX TPU re-design with ARCHITECTURAL parity (r2 verdict #7):

- Generator: initial k=7 conv -> instance norm -> relu, ``n_convolutions``
  stride-2 down blocks doubling filters to ``max_filters``, ``n_resnet``
  residual blocks (conv-IN-relu-conv-IN + skip), symmetric
  fractionally-strided (transposed) up blocks, final k=7 conv; optional
  trainable geographic bias fields on input/output and appended
  (clock_x, clock_y, x, y, z) geographic features (generator.py:27-199,
  modules.py:49-121).
- Discriminator: PatchGAN — stride-2 leaky-ReLU conv stack (no norm on
  the first layer), non-strided penultimate block, 1-channel patch map
  output; LSGAN losses over the patch map (discriminator.py:70-170).
- Replay image pool with the reference's 50%% swap rule, re-expressed as
  an in-graph buffer in the training scan carry (image_pool.py:10-70 —
  a host-side pool would force one dispatch per sample through the TPU
  tunnel; the jitted buffer keeps the whole training loop one program).
- Every convolution is cube-topology halo-padded per layer
  (parallel/halo.py), so tile seams are seamless at every resolution of
  the encoder/decoder pyramid — the cube analog of the reference's
  halo ConvolutionFactory.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.fit import io
from fv3net_tpu.fit.convolutional import (
    _channels_to_fields,
    _fields_to_channels,
    _z_variable_names,
)
from fv3net_tpu.fit.normalize import StandardScaler
from fv3net_tpu.fit.packer import PackingInfo
from fv3net_tpu.fit.predictor import Predictor
from fv3net_tpu.fit.train import register_training_function
from fv3net_tpu.parallel.halo import halo_append

N_GEO_FEATURES = 5  # (clock_x, clock_y, x, y, z); modules.py:56
_SECONDS_PER_DAY = 86400.0


@dataclasses.dataclass
class GeneratorConfig:
    """reference generator.py:19-61 (same fields and defaults)."""

    n_convolutions: int = 3
    n_resnet: int = 3
    kernel_size: int = 3
    strided_kernel_size: int = 4
    max_filters: int = 256
    use_geographic_bias: bool = True
    use_geographic_features: bool = True


@dataclasses.dataclass
class DiscriminatorConfig:
    """reference discriminator.py:16-45 (same fields and defaults)."""

    n_convolutions: int = 3
    kernel_size: int = 3
    strided_kernel_size: int = 3
    max_filters: int = 256
    use_geographic_features: bool = True


@dataclasses.dataclass
class CycleGANHyperparameters:
    """reference train_cyclegan.py CycleGANHyperparameters /
    CycleGANNetworkConfig (generator+discriminator sub-configs, LSGAN
    weights, replay pool)."""

    state_variables: List[str] = dataclasses.field(default_factory=list)
    generator: GeneratorConfig = dataclasses.field(
        default_factory=GeneratorConfig
    )
    discriminator: DiscriminatorConfig = dataclasses.field(
        default_factory=DiscriminatorConfig
    )
    cycle_weight: float = 10.0
    identity_weight: float = 5.0
    gan_weight: float = 1.0
    image_pool_size: int = 50
    learning_rate: float = 2e-4
    epochs: int = 5
    seed: int = 0


# ---------------------------------------------------------------------------
# cube-aware conv primitives
# ---------------------------------------------------------------------------


def _halo(x, h: int):
    """Cube-topology halo pad of [6, ny, nx, c] by h cells.

    Pinned to the single-program impls: these convs run under
    vmap-over-samples inside the training scan, not over a device mesh,
    so the mesh-registered shard_map halo must not engage here."""
    if h == 0:
        return x
    xt = jnp.moveaxis(x, -1, 1)  # [6, c, ny, nx]
    impl = "concat" if len(jax.devices()) == 1 else "gather"
    ext = halo_append(xt, h, impl=impl)
    return jnp.moveaxis(ext, 1, -1)


def _conv(x, w, b, stride: int = 1):
    """Halo-padded convolution keeping ny/stride resolution."""
    k = w.shape[0]
    pad = (k - stride + 1) // 2
    h = lax.conv_general_dilated(
        _halo(x, pad), w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if h.shape[1] != x.shape[1] // stride:  # even kernels: crop tail
        h = h[:, : x.shape[1] // stride, : x.shape[2] // stride]
    return h + b


def _conv_transpose(x, w, b):
    """Fractionally-strided (stride-1/2) halo-padded convolution:
    cube-halo the low-res field by 1, zero-dilate by 2, VALID conv, crop
    to exactly 2x resolution (generator.py up blocks)."""
    n = x.shape[1]
    k = w.shape[0]
    h = lax.conv_general_dilated(
        _halo(x, 1), w, (1, 1), [(0, 0), (0, 0)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # dilated extended width 2(n+2)-1 = 2n+3 -> output 2n+4-k; crop
    # symmetrically (excess is 0 for k=4, 1 for k=3)
    excess = h.shape[1] - 2 * n
    lo = excess // 2
    h = h[:, lo : lo + 2 * n, lo : lo + 2 * n]
    return h + b


def _inorm(x, eps: float = 1e-5):
    """InstanceNorm2d (affine-free) per tile and channel over (y, x) —
    the reference folds (batch, tile) into the instance axis
    (generator.py FoldFirstDimension(InstanceNorm2d))."""
    m = x.mean(axis=(1, 2), keepdims=True)
    v = x.var(axis=(1, 2), keepdims=True)
    return (x - m) * lax.rsqrt(v + eps)


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.2)


def _conv_init(key, k: int, cin: int, cout: int):
    # scale as a PYTHON float: an np.float64 scalar would promote the
    # f32 weights to f64 under jax_enable_x64 (weak-typed python floats
    # do not), breaking mixed-dtype convs in x64 test processes
    w = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * float(
        1.0 / np.sqrt(k * k * cin)
    )
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _geo_features(n: int):
    """[6, n, n, 5] static parts: unit-sphere xyz + (lat, lon) for the
    solar clock (modules.py:49-108)."""
    from fv3net_tpu.grid.geometry import make_grid

    grid = make_grid(n)
    lat = jnp.asarray(grid.lat, jnp.float32)
    lon = jnp.asarray(grid.lon, jnp.float32)
    x = jnp.cos(lat) * jnp.cos(lon)
    y = jnp.cos(lat) * jnp.sin(lon)
    z = jnp.sin(lat)
    return lat, lon, jnp.stack([x, y, z], axis=-1)


def _clock(time_seconds, lat, lon):
    """Local 24h solar clock hand as 2 channels, amplitude cos(lat)."""
    phase = lon + 2.0 * jnp.pi * (
        (time_seconds % _SECONDS_PER_DAY) / _SECONDS_PER_DAY
    )
    return jnp.stack(
        [jnp.cos(lat) * jnp.cos(phase), jnp.cos(lat) * jnp.sin(phase)],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# generator / discriminator
# ---------------------------------------------------------------------------


def init_generator(key, cfg: GeneratorConfig, channels: int, n: int):
    min_f = cfg.max_filters // (2 ** cfg.n_convolutions)
    keys = iter(jax.random.split(key, 64))
    cin = channels + (N_GEO_FEATURES if cfg.use_geographic_features else 0)
    p = {
        "first": _conv_init(next(keys), 7, cin, min_f),
        "down": [],
        "resnet": [],
        "up": [],
        "out": _conv_init(next(keys), 7, min_f, channels),
    }
    f = min_f
    for _ in range(cfg.n_convolutions):
        p["down"].append(
            _conv_init(next(keys), cfg.strided_kernel_size, f, 2 * f)
        )
        f *= 2
    for _ in range(cfg.n_resnet):
        p["resnet"].append(
            (
                _conv_init(next(keys), cfg.kernel_size, f, f),
                _conv_init(next(keys), cfg.kernel_size, f, f),
            )
        )
    for _ in range(cfg.n_convolutions):
        p["up"].append(
            _conv_init(next(keys), cfg.strided_kernel_size, f, f // 2)
        )
        f //= 2
    if cfg.use_geographic_bias:
        p["in_bias"] = jnp.zeros((6, n, n, channels), jnp.float32)
        p["out_bias"] = jnp.zeros((6, n, n, channels), jnp.float32)
    return p


def apply_generator(p, cfg: GeneratorConfig, geo, x, time_seconds=0.0):
    """x: [6, ny, nx, C] normalized fields -> translated fields."""
    if cfg.use_geographic_bias:
        x = x + p["in_bias"]
    if cfg.use_geographic_features:
        lat, lon, xyz = geo
        clock = _clock(time_seconds, lat, lon)
        x = jnp.concatenate([x, clock, xyz], axis=-1)
    h = jax.nn.relu(_inorm(_conv(x, **p["first"])))
    for layer in p["down"]:
        h = jax.nn.relu(_inorm(_conv(h, layer["w"], layer["b"], stride=2)))
    for c1, c2 in p["resnet"]:
        r = jax.nn.relu(_inorm(_conv(h, **c1)))
        r = _inorm(_conv(r, **c2))
        h = h + r  # ResnetBlock skip (modules.py:546-590)
    for layer in p["up"]:
        h = jax.nn.relu(_inorm(_conv_transpose(h, layer["w"], layer["b"])))
    out = _conv(h, **p["out"])
    if cfg.use_geographic_bias:
        out = out + p["out_bias"]
    return out


def init_discriminator(key, cfg: DiscriminatorConfig, channels: int):
    min_f = cfg.max_filters // (2 ** (cfg.n_convolutions - 1))
    keys = iter(jax.random.split(key, 32))
    cin = channels + (N_GEO_FEATURES if cfg.use_geographic_features else 0)
    p = {
        "first": _conv_init(next(keys), cfg.strided_kernel_size, cin, min_f),
        "down": [],
        "final": None,
        "patch": None,
    }
    f = min_f
    for _ in range(1, cfg.n_convolutions):
        p["down"].append(
            _conv_init(next(keys), cfg.strided_kernel_size, f, 2 * f)
        )
        f *= 2
    p["final"] = _conv_init(next(keys), cfg.kernel_size, f, f)
    p["patch"] = _conv_init(next(keys), 3, f, 1)
    return p


def apply_discriminator(p, cfg: DiscriminatorConfig, geo, x,
                        time_seconds=0.0):
    """-> patch score map [6, ny/2^n, nx/2^n, 1] (PatchGAN)."""
    if cfg.use_geographic_features:
        lat, lon, xyz = geo
        clock = _clock(time_seconds, lat, lon)
        x = jnp.concatenate([x, clock, xyz], axis=-1)
    # first strided conv deliberately unnormalized (discriminator.py:112)
    h = _leaky(_conv(x, p["first"]["w"], p["first"]["b"], stride=2))
    for layer in p["down"]:
        h = _leaky(_inorm(_conv(h, layer["w"], layer["b"], stride=2)))
    h = _leaky(_inorm(_conv(h, **p["final"])))
    return _conv(h, **p["patch"])


# ---------------------------------------------------------------------------
# in-graph replay image pool (image_pool.py semantics)
# ---------------------------------------------------------------------------


def pool_query(pool, count, key, img):
    """One query of the replay buffer: while filling, insert and return
    the current image; once full, with p=0.5 return a stored image and
    replace it with the current one, else return the current image."""
    P = pool.shape[0]
    ku, ki = jax.random.split(key)
    not_full = count < P
    use_old = jnp.logical_and(
        jnp.logical_not(not_full), jax.random.uniform(ku) > 0.5
    )
    idx = jax.random.randint(ki, (), 0, P)
    pos = jnp.where(not_full, jnp.minimum(count, P - 1), idx)
    old = pool[pos]
    write = jnp.logical_or(not_full, use_old)
    pool = jnp.where(write, pool.at[pos].set(img), pool)
    ret = jnp.where(use_old, old, img)
    return pool, count + not_full.astype(count.dtype), ret


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------


@io.register("cycle_gan")
class CycleGAN(Predictor):
    """Holds both generators; ``predict`` applies G: domain A -> B
    (the reference's convention for applying the trained corrector);
    ``reverse`` applies F: B -> A."""

    def __init__(self, state_variables, gen_cfg: GeneratorConfig, n: int,
                 g_ab, g_ba, info, scaler_a, scaler_b, state_z_names=None):
        super().__init__(list(state_variables), list(state_variables))
        self.state_variables = list(state_variables)
        self.gen_cfg = gen_cfg
        self.n = n
        self.g_ab = g_ab
        self.g_ba = g_ba
        self.info = info
        self.scaler_a = scaler_a
        self.scaler_b = scaler_b
        self.state_z_names = (
            tuple(state_z_names) if state_z_names is not None else None
        )
        self._geo = _geo_features(n)
        self._jit_translate = None

    def _run_direction(self, X: Dataset, params, scaler_in, scaler_out):
        """One jitted vmap over samples (a per-sample eager loop costs
        one dispatch each, CLAUDE.md tunnel rule)."""
        arr, _ = _fields_to_channels(X, self.state_variables)
        # f32 network: inputs may arrive f64 in x64 processes
        arr = jnp.asarray(arr, jnp.float32)
        lead = arr.shape[:-4]
        flat = arr.reshape((-1,) + arr.shape[-4:]) if lead else arr[None]
        if self._jit_translate is None:
            cfg, geo = self.gen_cfg, self._geo

            def one(p, a, si_m, si_s, so_m, so_s):
                an = StandardScaler(si_m, si_s).normalize(a)
                yn = apply_generator(p, cfg, geo, an)
                return StandardScaler(so_m, so_s).denormalize(yn)

            self._jit_translate = jax.jit(
                lambda p, f, *s: jax.vmap(lambda a: one(p, a, *s))(f)
            )
        outs = self._jit_translate(
            params, flat, scaler_in.mean, scaler_in.std,
            scaler_out.mean, scaler_out.std,
        )
        out = outs.reshape(lead + outs.shape[1:]) if lead else outs[0]
        q0 = X[self.state_variables[0]]
        prefix = tuple(
            d for d in q0.dims if d not in ("tile", "z", "y", "x")
        )
        return Dataset(
            _channels_to_fields(
                out, self.info,
                prefix + ("tile", "z", "y", "x"),
                prefix + ("tile", "y", "x"),
                z_names=self.state_z_names,
            )
        )

    def predict(self, X: Dataset) -> Dataset:
        return self._run_direction(
            X, self.g_ab, self.scaler_a, self.scaler_b
        )

    def reverse(self, X: Dataset) -> Dataset:
        return self._run_direction(
            X, self.g_ba, self.scaler_b, self.scaler_a
        )

    # -- serialization: leaves in canonical tree order + rebuildable
    # structure from the config ----------------------------------------
    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        flat = {}
        for tag, params in (("ab", self.g_ab), ("ba", self.g_ba)):
            leaves = jax.tree_util.tree_leaves(params)
            for i, leaf in enumerate(leaves):
                flat[f"{tag}_{i}"] = np.asarray(leaf)
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
                    "generator": dataclasses.asdict(self.gen_cfg),
                    "n": self.n,
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
        gen_cfg = GeneratorConfig(**meta["generator"])
        info = PackingInfo.from_dict(meta["info"])
        channels = sum(info.features)
        template = init_generator(
            jax.random.PRNGKey(0), gen_cfg, channels, meta["n"]
        )
        treedef = jax.tree_util.tree_structure(template)
        gs = {}
        for tag in ("ab", "ba"):
            leaves = [
                jnp.asarray(z[f"{tag}_{i}"])
                for i in range(treedef.num_leaves)
            ]
            gs[tag] = jax.tree_util.tree_unflatten(treedef, leaves)
        return cls(
            meta["state_variables"],
            gen_cfg,
            meta["n"],
            gs["ab"],
            gs["ba"],
            info,
            StandardScaler(jnp.asarray(z["a_mean"]), jnp.asarray(z["a_std"])),
            StandardScaler(jnp.asarray(z["b_mean"]), jnp.asarray(z["b_std"])),
            state_z_names=meta.get("state_z_names"),
        )


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


@register_training_function("cyclegan", CycleGANHyperparameters)
def train_cyclegan(
    hp: CycleGANHyperparameters, train_batches, val=None
) -> CycleGAN:
    """Train on a sequence of (domain_a: Dataset, domain_b: Dataset)
    pairs of cube-shaped samples with dims (time, tile, z, y, x) —
    unpaired in content, paired only in batch structure (standard
    CycleGAN setup; reference train_cyclegan.py:393)."""
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
    n = A.shape[-2]
    if n % (2 ** hp.generator.n_convolutions):
        raise ValueError(
            f"C{n} not divisible by 2^{hp.generator.n_convolutions} "
            "(generator.n_convolutions strided halvings)"
        )
    # the network is f32 by design: pin the training arrays/scalers so
    # x64 processes (tests enable it module-wide) don't promote the
    # conv inputs to f64
    A = A.astype(np.float32)
    B = B.astype(np.float32)
    scaler_a = StandardScaler.fit(jnp.asarray(A.reshape(-1, C)))
    scaler_b = StandardScaler.fit(jnp.asarray(B.reshape(-1, C)))
    An = np.asarray(scaler_a.normalize(jnp.asarray(A)), np.float32)
    Bn = np.asarray(scaler_b.normalize(jnp.asarray(B)), np.float32)

    key = jax.random.PRNGKey(hp.seed)
    keys = jax.random.split(key, 5)
    gen = {
        "ab": init_generator(keys[0], hp.generator, C, n),
        "ba": init_generator(keys[1], hp.generator, C, n),
    }
    disc = {
        "a": init_discriminator(keys[2], hp.discriminator, C),
        "b": init_discriminator(keys[3], hp.discriminator, C),
    }
    geo = _geo_features(n)
    gcfg, dcfg = hp.generator, hp.discriminator

    def G(p, x):
        return apply_generator(p, gcfg, geo, x)

    def D(p, x):
        return apply_discriminator(p, dcfg, geo, x)

    tx_g = optax.adam(hp.learning_rate, b1=0.5)
    tx_d = optax.adam(hp.learning_rate, b1=0.5)
    opt_g = tx_g.init(gen)
    opt_d = tx_d.init(disc)

    def gen_loss(gen, disc, a, b):
        fake_b = G(gen["ab"], a)
        fake_a = G(gen["ba"], b)
        # LSGAN over the PATCH map: generator wants D(fake) -> 1
        adv = jnp.mean((D(disc["b"], fake_b) - 1.0) ** 2) + jnp.mean(
            (D(disc["a"], fake_a) - 1.0) ** 2
        )
        cyc = jnp.mean(jnp.abs(G(gen["ba"], fake_b) - a)) + jnp.mean(
            jnp.abs(G(gen["ab"], fake_a) - b)
        )
        idt = jnp.mean(jnp.abs(G(gen["ab"], b) - b)) + jnp.mean(
            jnp.abs(G(gen["ba"], a) - a)
        )
        loss = (
            hp.gan_weight * adv
            + hp.cycle_weight * cyc
            + hp.identity_weight * idt
        )
        return loss, (fake_a, fake_b)

    def disc_loss(disc, a, b, fake_a, fake_b):
        loss = (
            jnp.mean((D(disc["a"], a) - 1.0) ** 2)
            + jnp.mean(D(disc["a"], fake_a) ** 2)
            + jnp.mean((D(disc["b"], b) - 1.0) ** 2)
            + jnp.mean(D(disc["b"], fake_b) ** 2)
        )
        return 0.5 * loss

    # all epochs in ONE jit: the alternating G/D updates ride a scan over
    # samples inside a fori_loop over epochs (see fit/dense.py); the
    # replay pools live in the carry
    nt = min(An.shape[0], Bn.shape[0])
    An_d = jnp.asarray(An[:nt])
    Bn_d = jnp.asarray(Bn[:nt])
    P = max(1, int(hp.image_pool_size))
    pool0 = jnp.zeros((P,) + An_d.shape[1:], An_d.dtype)

    def sample_step(carry, ab):
        gen, disc, opt_g, opt_d, pa, pb, ca, cb, key = carry
        a, b = ab
        key, ka, kb = jax.random.split(key, 3)
        (_, (fake_a, fake_b)), ggrad = jax.value_and_grad(
            gen_loss, has_aux=True
        )(gen, disc, a, b)
        gupd, opt_g = tx_g.update(ggrad, opt_g)
        gen = optax.apply_updates(gen, gupd)
        # discriminators train against the REPLAY POOL fakes
        pa, ca, fa_pool = pool_query(
            pa, ca, ka, jax.lax.stop_gradient(fake_a)
        )
        pb, cb, fb_pool = pool_query(
            pb, cb, kb, jax.lax.stop_gradient(fake_b)
        )
        dgrad = jax.grad(disc_loss)(disc, a, b, fa_pool, fb_pool)
        dupd, opt_d = tx_d.update(dgrad, opt_d)
        disc = optax.apply_updates(disc, dupd)
        return (gen, disc, opt_g, opt_d, pa, pb, ca, cb, key), None

    def epoch_body(_, carry):
        return jax.lax.scan(sample_step, carry, (An_d, Bn_d))[0]

    carry0 = (
        gen, disc, opt_g, opt_d, pool0, pool0,
        jnp.int32(0), jnp.int32(0), keys[4],
    )
    gen, disc, *_ = jax.jit(
        lambda c: jax.lax.fori_loop(0, hp.epochs, epoch_body, c)
    )(carry0)

    return CycleGAN(
        hp.state_variables, hp.generator, n, gen["ab"], gen["ba"], info,
        scaler_a, scaler_b, state_z_names=state_z_names,
    )
