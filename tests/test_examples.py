"""Every shipped example config must parse against the real config
machinery (the projects/-analog validation; reference projects/ configs
are exercised by their Argo submissions)."""
import glob
import os

import pytest
import yaml

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load(path):
    with open(path) as f:
        return yaml.safe_load(f)


def test_examples_index_covers_directories():
    dirs = {
        d
        for d in os.listdir(EXAMPLES)
        if os.path.isdir(os.path.join(EXAMPLES, d))
    }
    index = open(os.path.join(EXAMPLES, "README.md")).read()
    for d in dirs:
        assert f"`{d}/`" in index, f"{d} missing from examples/README.md"


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(EXAMPLES, "*", "train*.yaml")))
)
def test_training_configs_parse(path):
    from fv3net_tpu.fit.train import TrainingConfig

    cfg = TrainingConfig.from_dict(_load(path))
    assert cfg.model_type
    assert cfg.hyperparameters is not None


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(EXAMPLES, "*", "prognostic.yaml")))
)
def test_prognostic_configs_parse(path):
    from fv3net_tpu.runtime.segmented_run.prepare_config import prepare_config

    lowered = prepare_config(_load(path))
    assert "namelist" in lowered


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(EXAMPLES, "*", "data.yaml")))
)
def test_data_configs_have_required_keys(path):
    cfg = _load(path)
    assert cfg.get("kind", "zarr") == "zarr"
    assert "path" in cfg and "variables" in cfg


def test_scream_case_parses():
    from fv3net_tpu.scream_run.config import ScreamConfig

    cfg = ScreamConfig(**_load(os.path.join(EXAMPLES, "scream", "case.yaml")))
    assert cfg.ATM_NCPL == 96
