"""Argo-style local workflow templates: parse, substitute, DAG order,
retries, and an end-to-end template run."""
import os

import numpy as np
import pytest
import yaml

from fv3net_tpu.workflows.templates import (
    WorkflowTemplate,
    list_templates,
    run_workflow,
)

TOY = """
apiVersion: argoproj.io/v1alpha1
kind: WorkflowTemplate
metadata: {name: toy}
spec:
  entrypoint: main
  templates:
  - name: main
    inputs:
      parameters:
      - name: msg
      - {name: outdir, value: /tmp}
    dag:
      tasks:
      - name: second
        dependencies: [first]
        template: append
        arguments:
          parameters:
          - {name: text, value: "second-{{inputs.parameters.msg}}"}
          - {name: outdir, value: "{{inputs.parameters.outdir}}"}
      - name: first
        template: append
        arguments:
          parameters:
          - {name: text, value: "first-{{inputs.parameters.msg}}"}
          - {name: outdir, value: "{{inputs.parameters.outdir}}"}
  - name: append
    inputs:
      parameters: [{name: text}, {name: outdir}]
    script:
      command: [bash, -c]
      source: |
        echo {{inputs.parameters.text}} >> {{inputs.parameters.outdir}}/log.txt
"""


def test_required_templates_listed():
    names = list_templates()
    assert {"training", "prognostic-run", "prognostic-run-diags",
            "train-diags-prog", "cubed-to-latlon", "offline-diags",
            "run-simulation", "resolve-output-url",
            "scream-prognostic-run", "chgres-cube"} <= set(names)
    for n in names:
        t = WorkflowTemplate.load(n)
        assert t.parameters() is not None
        # required params flagged: resolving with none raises
        if any(v is None for v in t.parameters().values()):
            with pytest.raises(ValueError, match="missing required"):
                t.resolve_tasks({})


def test_dag_order_and_substitution(tmp_path):
    t = WorkflowTemplate(yaml.safe_load(TOY))
    results = run_workflow(
        t, {"msg": "hello", "outdir": str(tmp_path)}
    )
    assert list(results) == ["first", "second"]  # dependency order
    lines = (tmp_path / "log.txt").read_text().split()
    assert lines == ["first-hello", "second-hello"]


def test_unknown_parameter_rejected():
    t = WorkflowTemplate(yaml.safe_load(TOY))
    with pytest.raises(ValueError, match="unknown parameters"):
        t.resolve_tasks({"msg": "x", "typo": "y"})


def test_failed_task_raises_after_retries(tmp_path):
    doc = yaml.safe_load(TOY)
    doc["spec"]["templates"][1]["script"]["source"] = (
        "echo attempt >> {{inputs.parameters.outdir}}/tries.txt; exit 1"
    )
    doc["spec"]["templates"][1]["retryStrategy"] = {
        "limit": 2, "backoff": {"duration": "0s"}
    }
    t = WorkflowTemplate(doc)
    with pytest.raises(RuntimeError, match="failed at task first"):
        run_workflow(t, {"msg": "x", "outdir": str(tmp_path)})
    assert (tmp_path / "tries.txt").read_text().count("attempt") == 3


def test_cycle_detected():
    doc = yaml.safe_load(TOY)
    doc["spec"]["templates"][0]["dag"]["tasks"][1]["dependencies"] = ["second"]
    t = WorkflowTemplate(doc)
    with pytest.raises(ValueError, match="cycle"):
        run_workflow(t, {"msg": "x"})


def test_cubed_to_latlon_template_end_to_end(tmp_path):
    """Drive a shipped template on a real zarr store."""
    import jax.numpy as jnp

    from fv3net_tpu.core.dataset import Dataset
    from fv3net_tpu.core.quantity import Quantity
    from fv3net_tpu.core.zarrio import open_zarr, to_zarr

    n = 12
    rng = np.random.RandomState(0)
    ds = Dataset(
        {
            "h500": Quantity(
                jnp.asarray(rng.randn(2, 6, n, n).astype(np.float32)),
                ("time", "tile", "y", "x"),
            )
        },
        coords={"time": np.arange(2)},
    )
    src = str(tmp_path / "cube.zarr")
    dst = str(tmp_path / "latlon.zarr")
    to_zarr(ds, src)
    t = WorkflowTemplate.load("cubed-to-latlon")
    results = run_workflow(
        t,
        {"input-zarr": src, "output-zarr": dst, "nlat": "24", "nlon": "48"},
        env={"FV3NET_JAX_PLATFORMS": "cpu"},
    )
    assert results["regrid"].succeeded
    out = open_zarr(dst)
    assert out["h500"].shape == (2, 24, 48)
    # conservative regrid roughly preserves the global mean
    assert abs(float(np.asarray(out["h500"].values).mean())) < 1.0


def test_all_shipped_templates_parse():
    """Every yaml in workflows/argo/ must load as a WorkflowTemplate (the
    `make test_argo` kubectl-dry-run role, reference Makefile)."""
    import glob
    import os

    from fv3net_tpu.workflows.templates import WorkflowTemplate

    root = os.path.join(
        os.path.dirname(__file__), "..", "fv3net_tpu", "workflows", "argo"
    )
    paths = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert len(paths) >= 15, paths
    for path in paths:
        with open(path) as f:
            doc = yaml.safe_load(f)
        t = WorkflowTemplate(doc)
        assert t.entrypoint, path


def test_resolve_output_url_template_end_to_end(tmp_path):
    """resolve-output-url runs the artifacts CLI and prints the
    bucket/project/date/tag convention URL (reference
    workflows/argo/resolve-output-url.yaml)."""
    t = WorkflowTemplate.load("resolve-output-url")
    results = run_workflow(
        t, {"bucket": "gs://bkt", "project": "proj", "tag": "exp-1"}
    )
    task = results["resolve-output-url"]
    assert task.succeeded
    out = task.stdout.strip()
    assert out.startswith("gs://bkt/proj/") and out.endswith("/exp-1")


def test_chgres_cube_template_rejects_refinement(tmp_path):
    """The chgres-cube analog only coarsens; a refinement request must
    fail the workflow rather than silently produce nothing."""
    t = WorkflowTemplate.load("chgres-cube")
    with pytest.raises(RuntimeError, match="failed at task"):
        run_workflow(
            t,
            {
                "restarts": str(tmp_path),
                "source_resolution": "C48",
                "target_resolution": "C384",
                "destination": str(tmp_path / "out"),
            },
        )


def test_coarsen_restarts_cli_roundtrip(tmp_path):
    """python -m fv3net_tpu.pipelines.coarsen_restarts coarsens a
    reference-layout restart dir, conserving mass."""
    import datetime

    import numpy as np
    import jax.numpy as jnp

    from fv3net_tpu.core import netcdfio
    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import init_state
    from fv3net_tpu.pipelines.coarsen_restarts import main as cr_main
    from fv3net_tpu.runtime.checkpoint import save_fortran_restarts
    from fv3net_tpu.runtime.derived_state import ModelState

    grid = make_grid(12)
    d, *_ = init_state(grid, nz=8, perturbation=2.0)
    src = str(tmp_path / "src")
    save_fortran_restarts(
        ModelState(dycore=d, surface={}),
        datetime.datetime(2016, 8, 1), src, grid,
    )
    dst = str(tmp_path / "dst")
    assert cr_main([src, dst, "--factor", "2"]) == 0
    cats = netcdfio.open_restarts(dst)
    assert cats["fv_core.res"]["delp"].shape[-1] == 6
    fine = np.asarray(d.delp) * grid.area[:, None]
    coarse = (
        cats["fv_core.res"]["delp"].values[:, 0]
        * make_grid(6).area[:, None]
    )
    np.testing.assert_allclose(fine.sum(), coarse.sum(), rtol=1e-5)


@pytest.mark.slow
def test_train_diags_prog_chain_end_to_end(tmp_path):
    """The full train -> prognostic-run -> diagnostics -> HTML-report
    chain executed as the train-diags-prog 3-stage DAG through the
    local workflow executor on synth data (VERDICT r4 #8).
    reference: workflows/argo/train-diags-prog.yaml + the offline
    compute surface fv3net/diagnostics/offline/compute.py:61-315."""
    import os

    import jax.numpy as jnp
    import numpy as np

    from fv3net_tpu.core import zarrio
    from fv3net_tpu.core.dataset import Dataset
    from fv3net_tpu.core.quantity import Quantity

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # synth nudged-run-style training store [time, tile, z, y, x]
    rng = np.random.RandomState(3)
    nt, nz, n = 2, 8, 6
    T = 260 + 30 * rng.rand(nt, 6, nz, n, n)
    q = 0.01 * rng.rand(nt, 6, nz, n, n)
    dims = ("time", "tile", "z", "y", "x")
    ds = Dataset({
        "air_temperature": Quantity(jnp.asarray(T, jnp.float32), dims),
        "specific_humidity": Quantity(jnp.asarray(q, jnp.float32), dims),
        "dQ1": Quantity(
            jnp.asarray(1e-5 * (T - 280.0) / 30.0, jnp.float32), dims
        ),
        "dQ2": Quantity(jnp.asarray(1e-8 * q / 0.01, jnp.float32), dims),
    })
    zpath = str(tmp_path / "training.zarr")
    zarrio.to_zarr(ds, zpath)

    train_cfg = str(tmp_path / "train.yaml")
    with open(train_cfg, "w") as f:
        yaml.safe_dump({
            "model_type": "dense",
            "hyperparameters": {
                "input_variables": [
                    "air_temperature", "specific_humidity"
                ],
                "output_variables": ["dQ1", "dQ2"],
                "hidden_layers": 1, "width": 8, "epochs": 1,
            },
        }, f)
    data_cfg = str(tmp_path / "data.yaml")
    with open(data_cfg, "w") as f:
        yaml.safe_dump({
            "kind": "zarr", "path": zpath,
            "variables": [
                "air_temperature", "specific_humidity", "dQ1", "dQ2"
            ],
        }, f)
    out = str(tmp_path / "out")
    prog_cfg = str(tmp_path / "prognostic.yaml")
    with open(prog_cfg, "w") as f:
        yaml.safe_dump({
            "namelist": {
                "npx": n, "npz": nz, "dt_atmos": 900.0, "n_split": 2,
            },
            "duration_seconds": 1800.0,
            "initial_time": "2016-08-01T00:00:00",
            "scikit_learn": {"model": [out + "/model"]},
            "diagnostics": [{
                "name": "diags.zarr",
                "variables": [
                    "air_temperature", "surface_pressure", "PRATEsfc",
                    "water_vapor_path", "physics_precip",
                ],
                "times": {"kind": "every"},
            }],
        }, f)

    t = WorkflowTemplate.load("train-diags-prog")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # subprocesses must not attach to the tunnel TPU: the sitecustomize
    # pins JAX_PLATFORMS, so use the package's own env override
    env["FV3NET_JAX_PLATFORMS"] = "cpu"
    results = run_workflow(
        t,
        {
            "training-config": train_cfg,
            "training-data-config": data_cfg,
            "prognostic-run-config": prog_cfg,
            "output": out,
        },
        workdir=repo,
        env=env,
    )
    assert list(results) == ["train-model", "prognostic-run",
                             "online-diags"]
    assert all(r.returncode == 0 for r in results.values())
    # stage artifacts: model, run segment with diagnostics, report
    assert os.path.isdir(os.path.join(out, "model"))
    artifacts = os.path.join(out, "run", "artifacts")
    segs = sorted(os.listdir(artifacts))
    assert segs and os.path.isdir(
        os.path.join(artifacts, segs[-1], "diags.zarr")
    )
    assert os.path.exists(os.path.join(out, "report", "index.html"))
