"""Smoke-drive every example CLI in-process on synthetic data.

The reference's examples are its primary user surface (SURVEY.md L3/L4);
these tests call each `main(argv)` with tiny dotted overrides the way a
user would from the shell, so config parsing, registry wiring, the train
loop, checkpointing flags, and the final metric printout all execute.
Marked slow where a full pipeline compiles several programs.
"""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


TINY_IMAGE = [
    "dataset.dataset_name=synthetic",
    "dataset.image_size=16",
    "dataset.num_classes=4",
    "experiment.num_epochs=1",
    "experiment.batch_size=8",
    "canonicalization.resize_shape=8",
    "canonicalization.network_hyperparams.out_channels=4",
    "canonicalization.network_hyperparams.num_layers=1",
    "prediction.architecture=resnet18",
]


@pytest.mark.slow
def test_classification_cli_train(tmp_path, capsys):
    mod = _load("examples/images/classification/train.py", "cli_cls")
    mod.main(TINY_IMAGE + [
        f"checkpoint.checkpoint_path={tmp_path}/ck",
        "checkpoint.save_canonized_images=true",
    ])
    out = capsys.readouterr().out
    assert "loss" in out or "acc" in out
    assert os.path.exists(tmp_path / "ck" / "config.json")
    assert os.path.exists(tmp_path / "ck" / "canonized_epoch0.png")


@pytest.mark.slow
def test_classification_cli_test_mode_restores_config(tmp_path, capsys):
    mod = _load("examples/images/classification/train.py", "cli_cls2")
    ck = f"{tmp_path}/ck"
    mod.main(TINY_IMAGE + [f"checkpoint.checkpoint_path={ck}"])
    capsys.readouterr()
    mod.main([
        "experiment.run_mode=test",
        f"checkpoint.checkpoint_path={ck}",
    ])
    out = capsys.readouterr().out
    assert "test/acc" in out


@pytest.mark.slow
def test_classification_cli_crash_resume(tmp_path, capsys):
    """checkpoint.resume=true restarts from the newest async step."""
    mod = _load("examples/images/classification/train.py", "cli_cls3")
    ck = f"{tmp_path}/ck"
    args = TINY_IMAGE + [
        f"checkpoint.checkpoint_path={ck}",
        "checkpoint.resume=true",
    ]
    mod.main(args + ["experiment.num_epochs=1"])
    capsys.readouterr()
    mod.main(args + ["experiment.num_epochs=2"])
    out = capsys.readouterr().out
    assert "resumed from epoch 0" in out
    assert "epoch 1:" in out and "epoch 0:" not in out


@pytest.mark.slow
def test_segmentation_cli(capsys):
    mod = _load("examples/images/segmentation/train.py", "cli_seg")
    mod.main([
        "experiment.num_epochs=1",
        "dataset.image_size=32",
        "canonicalization.resize_shape=16",
        "canonicalization.network_hyperparams.out_channels=4",
        "canonicalization.network_hyperparams.num_layers=1",
    ])
    assert "map" in capsys.readouterr().out.lower()


def test_classification_cli_dryrun(capsys):
    """run_mode=dryrun: one train step + one eval batch, then exit."""
    mod = _load("examples/images/classification/train.py", "cli_dry")
    mod.main(TINY_IMAGE + ["experiment.run_mode=dryrun"])
    assert "dryrun ok" in capsys.readouterr().out


def test_serving_cli_aot_compile(capsys):
    """serve.py: AOT-compiled bf16-fast forward streams batches."""
    mod = _load("examples/images/classification/serve.py", "cli_serve")
    mod.main(TINY_IMAGE)
    out = capsys.readouterr().out
    assert "AOT compile" in out and "images/s" in out


@pytest.mark.slow
def test_serving_cli_from_trained_checkpoint(tmp_path, capsys):
    """Train then serve from the written checkpoint (the CLI's primary use).

    Regression for the round-2 advisor finding: the serve-side restore
    template uses a placeholder sgd(0.0) optimizer whose opt_state tree
    never matches the one train.py saved — the non-strict restore must
    merge params/batch_stats only instead of crashing on the tree
    mismatch."""
    train = _load("examples/images/classification/train.py", "cli_tr4srv")
    ck = f"{tmp_path}/ck"
    train.main(TINY_IMAGE + [f"checkpoint.checkpoint_path={ck}"])
    capsys.readouterr()
    serve = _load("examples/images/classification/serve.py", "cli_srv_ck")
    serve.main(TINY_IMAGE + [f"checkpoint.checkpoint_path={ck}"])
    out = capsys.readouterr().out
    assert "serving checkpoint weights" in out
    assert "images/s" in out


def test_classification_cli_pretrained_weights(tmp_path, capsys):
    """prediction.pretrained=true converts a local torchvision checkpoint
    into the prediction subtree (reference model_utils.py:35-60's
    weights="DEFAULT" flow, egress-free)."""
    import torch

    from tests.test_pretrained_convert import make_resnet_state_dict

    sd = make_resnet_state_dict([2, 2, 2, 2], bottleneck=False)
    torch.save(sd, tmp_path / "resnet18.pth")
    mod = _load("examples/images/classification/train.py", "cli_pre")
    mod.main(TINY_IMAGE + [
        "experiment.run_mode=dryrun",
        "prediction.pretrained=true",
        f"prediction.pretrained_path={tmp_path}/resnet18.pth",
    ])
    out = capsys.readouterr().out
    assert "loaded pretrained resnet18 weights" in out
    assert "dryrun ok" in out


def test_nbody_cli(capsys):
    mod = _load("examples/nbody/train.py", "cli_nbody")
    mod.main(["experiment.num_epochs=1", "experiment.batch_size=8"])
    assert "loss" in capsys.readouterr().out.lower()


@pytest.mark.slow
def test_pointcloud_classification_cli(capsys):
    mod = _load("examples/pointcloud/classification/train.py", "cli_pc")
    mod.main([
        "experiment.num_epochs=1",
        "experiment.batch_size=8",
        "dataset.num_points=64",
        "prediction.architecture=pointnet",
    ])
    assert "acc" in capsys.readouterr().out.lower()


@pytest.mark.slow
def test_pointcloud_partseg_cli(capsys):
    mod = _load("examples/pointcloud/part_segmentation/train.py", "cli_ps")
    mod.main(["experiment.num_epochs=1"])
    assert "iou" in capsys.readouterr().out.lower()


def test_nbody_cli_train_then_test(tmp_path, capsys):
    """run_mode=test restores config + weights from the checkpoint (the
    reference's nbody test path crashes on undefined image_data instead)."""
    mod = _load("examples/nbody/train.py", "cli_nbody_tt")
    ck = f"{tmp_path}/ck"
    mod.main([
        "experiment.num_epochs=1", "experiment.batch_size=8",
        f"checkpoint.checkpoint_path={ck}",
    ])
    capsys.readouterr()
    mod.main(["experiment.run_mode=test", f"checkpoint.checkpoint_path={ck}"])
    assert "test/mse" in capsys.readouterr().out


@pytest.mark.slow
def test_pointcloud_cli_train_then_test(tmp_path, capsys):
    """Checkpoint save + test-mode restore with the z/so3 rotation
    robustness sweep (reference model.py:44-69 maybe_transform_points)."""
    mod = _load("examples/pointcloud/classification/train.py", "cli_pc_tt")
    ck = f"{tmp_path}/ck"
    args = [
        "experiment.num_epochs=1", "experiment.batch_size=8",
        "dataset.num_points=64", "prediction.architecture=pointnet",
    ]
    mod.main(args + [f"checkpoint.checkpoint_path={ck}"])
    capsys.readouterr()
    mod.main(["experiment.run_mode=test", f"checkpoint.checkpoint_path={ck}"])
    out = capsys.readouterr().out
    assert "test/acc_z" in out and "test/acc_so3" in out


@pytest.mark.slow
def test_segmentation_cli_train_then_test(tmp_path, capsys):
    mod = _load("examples/images/segmentation/train.py", "cli_seg_tt")
    ck = f"{tmp_path}/ck"
    args = [
        "experiment.num_epochs=1",
        "dataset.image_size=32",
        "canonicalization.resize_shape=16",
        "canonicalization.network_hyperparams.out_channels=4",
        "canonicalization.network_hyperparams.num_layers=1",
    ]
    mod.main(args + [f"checkpoint.checkpoint_path={ck}"])
    capsys.readouterr()
    mod.main(["experiment.run_mode=test", f"checkpoint.checkpoint_path={ck}"])
    assert "test/group_map" in capsys.readouterr().out


@pytest.mark.slow
def test_partseg_cli_train_then_test(tmp_path, capsys):
    mod = _load("examples/pointcloud/part_segmentation/train.py", "cli_ps_tt")
    ck = f"{tmp_path}/ck"
    mod.main(["experiment.num_epochs=1", f"checkpoint.checkpoint_path={ck}"])
    capsys.readouterr()
    mod.main(["experiment.run_mode=test", f"checkpoint.checkpoint_path={ck}"])
    assert "test/miou" in capsys.readouterr().out
