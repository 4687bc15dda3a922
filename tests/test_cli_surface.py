"""CLI surface parity: artifacts, validate-batches-config,
post-process-run, diagnostics movies, restarts_to_zarr main."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest
import yaml

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.core.zarrio import open_zarr, to_zarr


def test_artifacts_cli(tmp_path, capsys):
    from fv3net_tpu.artifacts.cli import main

    assert main(["resolve-url", "ws", "myproj", "run-1",
                 "--date", "2026-08-16"]) == 0
    out = capsys.readouterr().out.strip()
    assert out == "ws/myproj/2026-08-16/run-1"
    # invalid project name rejected by the naming convention
    with pytest.raises(ValueError):
        main(["resolve-url", "ws", "My_Proj", "run-1"])

    root = tmp_path / "ws"
    for p, d, t in [("a", "2026-08-01", "x"), ("b", "2026-08-02", "y")]:
        (root / p / d / t).mkdir(parents=True)
    assert main(["ls", str(root), "-o", "json"]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert {r["project"] for r in rows} == {"a", "b"}
    assert main(["ls", str(root), "--project", "a"]) == 0
    assert "b" not in capsys.readouterr().out.split()


def test_validate_batches_config(tmp_path, capsys):
    from fv3net_tpu.loaders.validate import main

    good = {"kind": "zarr", "path": "/tmp/x.zarr", "variables": ["a"]}
    cfg = tmp_path / "good.yaml"
    cfg.write_text(yaml.safe_dump(good))
    assert main([str(cfg)]) == 0
    assert json.loads(capsys.readouterr().out)["valid"] is True

    bad = {"kind": "mystery"}
    cfg2 = tmp_path / "bad.yaml"
    cfg2.write_text(yaml.safe_dump(bad))
    assert main([str(cfg2)]) == 1
    rec = json.loads(capsys.readouterr().out)
    assert not rec["valid"] and len(rec["problems"]) == 3

    # --open actually reads the store
    ds = Dataset(
        {"a": Quantity(jnp.ones((3, 6, 2, 2)), ("time", "tile", "y", "x"))},
        coords={"time": np.arange(3)},
    )
    store = str(tmp_path / "d.zarr")
    to_zarr(ds, store)
    good["path"] = store
    cfg3 = tmp_path / "open.yaml"
    cfg3.write_text(yaml.safe_dump(good))
    assert main([str(cfg3), "--open"]) == 0


def test_post_process_run_cli(tmp_path, capsys):
    from fv3net_tpu.post_process_cli import main

    seg = tmp_path / "run" / "artifacts" / "20160801.000000"
    seg.mkdir(parents=True)
    ds = Dataset(
        {"h500": Quantity(jnp.ones((2, 6, 4, 4)), ("time", "tile", "y", "x"))},
        coords={"time": np.arange(2)},
    )
    to_zarr(ds, str(seg / "diags.zarr"))
    dest = str(tmp_path / "out")
    assert main([str(tmp_path / "run"), dest]) == 0
    rec = json.loads(capsys.readouterr().out)
    assert rec["written"]
    merged = open_zarr(os.path.join(dest, "diags.zarr"))
    assert merged["h500"].shape[0] == 2


def test_movies_cmd_and_zarr_discovery(tmp_path, capsys):
    from fv3net_tpu.diagnostics.cli import _find_state_zarr, main

    n = 6
    rng = np.random.RandomState(0)
    ds = Dataset(
        {
            "h500": Quantity(
                jnp.asarray(rng.rand(2, 6, n, n).astype(np.float32)),
                ("time", "tile", "y", "x"),
            )
        },
        coords={"time": np.arange(2)},
    )
    run = tmp_path / "run"
    run.mkdir()
    to_zarr(ds, str(run / "state_after_timestep.zarr"))
    assert _find_state_zarr(str(run)).endswith("state_after_timestep.zarr")
    outdir = str(tmp_path / "movies")
    assert main(["movies", str(run), outdir]) == 0
    written = capsys.readouterr().out.split()
    assert len(written) == 1 and written[0].endswith("h500.gif")
    assert os.path.getsize(written[0]) > 0
    with pytest.raises(FileNotFoundError):
        _find_state_zarr(str(tmp_path / "empty"))


def test_restarts_to_zarr_has_module_main():
    import fv3net_tpu.pipelines.restarts_to_zarr as m

    assert callable(m.main)
