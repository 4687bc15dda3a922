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
