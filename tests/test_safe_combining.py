"""safe access / sampling / combining / checksum utilities."""
import numpy as np
import jax.numpy as jnp
import pytest
import warnings

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.core import safe
from fv3net_tpu.core.testing import checksum_dataset, no_warning


def _ds():
    return Dataset(
        {
            "a": Quantity(jnp.arange(12.0).reshape(3, 4), ("t", "x")),
            "b": Quantity(jnp.ones((3,)), ("t",)),
        }
    )


def test_get_variables_strict():
    ds = _ds()
    sub = safe.get_variables(ds, ["a"])
    assert list(sub.keys()) == ["a"]
    with pytest.raises(KeyError, match="missing"):
        safe.get_variables(ds, ["a", "nope", "other"])


def test_warn_if_intersecting():
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        safe.warn_if_intersecting(["x", "y"], ["y", "z"])
    assert len(rec) == 1 and "overwrite" in str(rec[0].message)
    with no_warning():
        safe.warn_if_intersecting(["x"], ["z"])


def test_stack_once():
    ds = Dataset(
        {"a": Quantity(jnp.arange(24.0).reshape(2, 3, 4), ("t", "y", "x"))}
    )
    out = safe.stack_once(ds, "sample", ["y", "x"])
    assert out["a"].dims == ("sample", "t")
    assert out["a"].shape == (12, 2)
    with pytest.raises(ValueError, match="cannot stack"):
        safe.stack_once(_ds(), "sample", ["y", "x"])


def test_sampling_split():
    times = [f"2016010{d}.000000" for d in range(1, 9)]
    splits = safe.train_test_split_sample(
        times, "20160105.000000", train_samples=2, test_samples=2
    )
    assert len(splits["train"]) == 2 and len(splits["test"]) == 2
    for pair in splits["train"]:
        assert pair[0] < "20160105.000000"
    for pair in splits["test"]:
        assert pair[0] >= "20160105.000000"
    # deterministic under the same seed
    again = safe.train_test_split_sample(
        times, "20160105.000000", train_samples=2, test_samples=2
    )
    assert again == splits


def test_combine_array_sequence():
    rng = np.random.RandomState(0)
    arrays = []
    for time in ("t0", "t1"):
        for tile in (1, 2, 3):
            arrays.append(
                ("h", (time, tile), rng.randn(4, 4).astype(np.float32))
            )
    ds = safe.combine_array_sequence(arrays, labels=("time", "tile"))
    assert ds["h"].shape == (2, 3, 4, 4)
    assert list(ds.coords["time"]) == ["t0", "t1"]
    # round-trip a specific entry
    want = [a for n, k, a in arrays if k == ("t1", 2)][0]
    np.testing.assert_array_equal(np.asarray(ds["h"].data)[1, 1], want)
    with pytest.raises(ValueError, match="does not match labels"):
        safe.combine_array_sequence(
            [("h", ("t0",), np.zeros(2))], labels=("time", "tile")
        )


def test_checksums_stable_and_sensitive():
    ds = _ds()
    c1 = checksum_dataset(ds)
    c2 = checksum_dataset(_ds())
    assert c1 == c2
    ds2 = Dataset(
        {
            "a": Quantity(jnp.arange(12.0).reshape(3, 4) + 1, ("t", "x")),
            "b": Quantity(jnp.ones((3,)), ("t",)),
        }
    )
    assert checksum_dataset(ds2) != c1
