"""fv3fit dQ1/dQ2 corrective-tendency training + inference throughput.

BASELINE config 4: the reference trains Keras dense networks over
tf.data pipelines on CPU/GPU (external/fv3fit/fv3fit/train.py:105-192)
and applies them column-wise in the prognostic loop. Here training is a
jitted optax loop and inference is one MXU matmul chain over all
columns. Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from fv3net_tpu.core.dataset import Dataset
    from fv3net_tpu.core.quantity import Quantity
    from fv3net_tpu.fit.dense import DenseHyperparameters, train_dense_model

    rng = np.random.RandomState(0)
    nz = 79
    n_train = 6 * 48 * 48 * 4  # four C48 cubes of training columns
    feats = {}
    for name, scale, bias in (
        ("air_temperature", 30.0, 260.0),
        ("specific_humidity", 0.01, 0.0),
    ):
        feats[name] = Quantity(
            jnp.asarray(bias + scale * rng.rand(n_train, nz), jnp.float32),
            ("sample", "z"),
        )
    for name, scale in (("dQ1", 1e-5), ("dQ2", 1e-8)):
        feats[name] = Quantity(
            jnp.asarray(scale * rng.randn(n_train, nz), jnp.float32),
            ("sample", "z"),
        )
    batch = Dataset(feats)
    hp = DenseHyperparameters(
        input_variables=["air_temperature", "specific_humidity"],
        output_variables=["dQ1", "dQ2"],
        hidden_layers=3,
        width=419,
        epochs=5,
    )
    t0 = time.perf_counter()
    model = train_dense_model(hp, [batch])
    train_seconds = time.perf_counter() - t0

    # inference throughput over one C48 cube of columns
    pred = model.predict(batch)
    sync = float(np.asarray(pred["dQ1"].data[0, 0]))
    n_calls = 20
    t0 = time.perf_counter()
    for _ in range(n_calls):
        pred = model.predict(batch)
    sync = float(np.asarray(pred["dQ1"].data[0, 0]))  # noqa: F841
    dt = (time.perf_counter() - t0) / n_calls
    print(
        json.dumps(
            {
                "metric": "dq1_dq2_training_and_inference",
                "value": round(n_train / dt, 0),
                "unit": "columns/s inference",
                "train_seconds_5_epochs": round(train_seconds, 2),
                "n_train_columns": n_train,
                "nz": nz,
                "hidden": f"{hp.hidden_layers}x{hp.width}",
            }
        )
    )


if __name__ == "__main__":
    main()
