"""Hydra-style config composition: group selectors, config files, override
order — plus every example's configs/ tree resolving through its CLI.

The reference launches runs as `python train.py canonicalization=steerable
dataset=cifar10 ...` (Hydra groups, README run commands); compose_config
reproduces that surface over the dataclass taxonomy.
"""

import os

import pytest

from equiadapt_tpu.utils import Config, compose_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLS_CFG = os.path.join(REPO, "examples/images/classification/configs")
SEG_CFG = os.path.join(REPO, "examples/images/segmentation/configs")
PC_CFG = os.path.join(REPO, "examples/pointcloud/classification/configs")
PS_CFG = os.path.join(REPO, "examples/pointcloud/part_segmentation/configs")
NB_CFG = os.path.join(REPO, "examples/nbody/configs")


def test_group_selector_merges_subtree():
    cfg = compose_config(["canonicalization=steerable"], config_dir=CLS_CFG)
    assert cfg.canonicalization.canonicalization_type == "steerable"
    # untouched groups keep dataclass defaults
    assert cfg.dataset.dataset_name == "synthetic"


def test_config_file_loads_full_tree():
    cfg = compose_config(
        [f"config={CLS_CFG}/default.yaml"], config_dir=CLS_CFG
    )
    assert cfg.dataset.dataset_name == "cifar10"
    assert cfg.experiment.loss.prior_weight == 100.0


def test_dotted_overrides_win_over_files():
    cfg = compose_config(
        [
            f"config={CLS_CFG}/default.yaml",
            "canonicalization=opt_group_equivariant",
            "canonicalization.beta=7.5",
            "dataset.dataset_name=stl10",
        ],
        config_dir=CLS_CFG,
    )
    assert cfg.canonicalization.canonicalization_type == "opt_group_equivariant"
    assert cfg.canonicalization.beta == 7.5
    assert cfg.dataset.dataset_name == "stl10"


def test_group_file_wrapped_and_bare_styles():
    # classification group files wrap content in the group key; nbody's
    # vndeepsets and the segmentation tree are bare (reference style)
    wrapped = compose_config(["canonicalization=group_equivariant"],
                             config_dir=CLS_CFG)
    bare = compose_config(["canonicalization=group_equivariant"],
                          config_dir=SEG_CFG)
    assert wrapped.canonicalization.canonicalization_type == "group_equivariant"
    assert bare.canonicalization.network_hyperparams.num_layers == 12


def test_missing_group_file_raises():
    with pytest.raises(FileNotFoundError, match="config group file"):
        compose_config(["canonicalization=nope"], config_dir=CLS_CFG)


def test_malformed_override_raises():
    with pytest.raises(ValueError, match="key=value"):
        compose_config(["canonicalization"], config_dir=CLS_CFG)


def test_start_config_replaces_defaults():
    start = Config().override("experiment.seed=42")
    cfg = compose_config(["experiment.batch_size=4"], start=start)
    assert cfg.experiment.seed == 42 and cfg.experiment.batch_size == 4


@pytest.mark.parametrize(
    "cfg_dir,expected_type",
    [
        (SEG_CFG, "steerable"),
        (PC_CFG, "identity"),
        (PS_CFG, "identity"),
    ],
)
def test_all_example_trees_resolve(cfg_dir, expected_type):
    sel = "steerable" if expected_type == "steerable" else "identity"
    cfg = compose_config([f"canonicalization={sel}"], config_dir=cfg_dir)
    assert cfg.canonicalization.canonicalization_type == expected_type


def test_baseline_config_defaults_load():
    """All five BASELINE configs are launchable from YAML alone: each
    example's configs/default.yaml parses into the dataclass taxonomy."""
    for d, probe in [
        (CLS_CFG, lambda c: c.dataset.dataset_name == "cifar10"),
        (SEG_CFG, lambda c: c.prediction.architecture == "sam_vit"
         and c.experiment.loss.task_weight == 0.0),
        (PC_CFG, lambda c: c.dataset.num_points == 1024
         and c.canonicalization.network_type == "vector_neuron_small"),
        (PS_CFG, lambda c: c.dataset.num_points == 2048),
        (NB_CFG, lambda c: c.experiment.batch_size == 100
         and c.canonicalization.network_hyperparams.canon_feature == "pv"),
    ]:
        cfg = compose_config([f"config={d}/default.yaml"], config_dir=d)
        assert probe(cfg), d


def test_nbody_cli_with_group_selector(capsys):
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "cli_nb_grp", os.path.join(REPO, "examples/nbody/train.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["cli_nb_grp"] = mod
    spec.loader.exec_module(mod)
    mod.main([
        "canonicalization=vndeepsets",
        "experiment.num_epochs=1",
        "experiment.batch_size=8",
    ])
    assert "loss" in capsys.readouterr().out.lower()


@pytest.mark.parametrize(
    "cfg_dir,groups",
    [
        (CLS_CFG, ["dataset", "experiment", "prediction", "checkpoint", "wandb"]),
        (SEG_CFG, ["dataset", "experiment", "prediction", "checkpoint"]),
        (PC_CFG, ["dataset", "experiment", "prediction", "checkpoint"]),
        (PS_CFG, ["dataset", "experiment", "prediction", "checkpoint"]),
        (NB_CFG, ["dataset", "experiment", "prediction", "checkpoint"]),
    ],
)
def test_full_group_taxonomy_resolves(cfg_dir, groups):
    """Every example carries the reference's full config-group taxonomy
    (canonicalization/dataset/experiment/prediction/checkpoint[/wandb]) and
    each default group file parses through composition."""
    selectors = [f"{g}=default" for g in groups if g != "wandb"]
    cfg = compose_config(selectors, config_dir=cfg_dir)
    assert cfg.experiment.run_mode == "train"
    assert os.path.isdir(os.path.join(cfg_dir, "canonicalization"))
