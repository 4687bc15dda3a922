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


def test_all_shipped_templates_parse():
    names = list_templates()
    assert {"training", "prognostic-run", "prognostic-run-diags",
            "train-diags-prog", "cubed-to-latlon",
            "offline-diags"} <= set(names)
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
        env={"JAX_PLATFORMS": "cpu"},
    )
    assert results["regrid"].succeeded
    out = open_zarr(dst)
    assert out["h500"].shape == (2, 24, 48)
    # conservative regrid roughly preserves the global mean
    assert abs(float(np.asarray(out["h500"].values).mean())) < 1.0
