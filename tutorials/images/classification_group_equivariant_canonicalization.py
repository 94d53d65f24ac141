"""Tutorial 2 — Making a classifier rotation-invariant by canonicalization.

Counterpart of reference tutorials/images/
classification_group_equivariant_canonicalization.ipynb (ViT + STL-10 C4
finetune): wrap a (possibly frozen) classifier with a learned canonicalizer,
train with prior regularization, and evaluate per-group-element robustness.

Run:  PYTHONPATH=. python tutorials/images/classification_group_equivariant_canonicalization.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from equiadapt_tpu.data import synthetic_image_batch
from equiadapt_tpu.models import ResNet18
from equiadapt_tpu.pipelines import (
    ImageClassifierPipeline,
    create_train_state,
    group_inference,
    make_optimizer,
    make_train_step,
)
from equiadapt_tpu.utils import (
    CanonicalizationConfig,
    NetworkHyperparams,
    get_image_canonicalization_network,
    get_image_canonicalizer,
)


def main():
    rng = jax.random.key(0)
    in_shape = (32, 32, 3)

    cfg = CanonicalizationConfig(
        canonicalization_type="group_equivariant",
        network_type="e2cnn",
        network_hyperparams=NetworkHyperparams(
            kernel_size=3, out_channels=8, num_layers=2, num_rotations=4,
        ),
    )
    net = get_image_canonicalization_network(cfg, in_shape)
    canon = get_image_canonicalizer(cfg, net, in_shape)
    # freeze_prediction=True in make_optimizer reproduces the frozen
    # foundation-model adaptation flow
    pred = ResNet18(num_classes=4, small_images=True)
    pipeline = ImageClassifierPipeline(canonicalizer=canon, prediction_network=pred)

    batch = synthetic_image_batch(rng, 64, size=32, num_classes=4)
    tx = make_optimizer(architecture="resnet18", learning_rate=1e-3,
                        canonicalization_learning_rate=1e-3)
    state = create_train_state(pipeline, rng, batch["image"], tx)
    step = make_train_step({"prior_weight": 100.0})

    for i in range(60):
        b = synthetic_image_batch(jax.random.fold_in(rng, i % 8), 64, size=32, num_classes=4)
        state, metrics = step(state, b, rng)
    print({k: round(float(v), 4) for k, v in metrics.items()})

    # group robustness: accuracy under every group element of the test input
    test = synthetic_image_batch(jax.random.fold_in(rng, 3), 64, size=32, num_classes=4)
    gm = group_inference(state, test, num_rotations=4)
    print({k: round(float(v), 4) for k, v in gm.items()})
    # the headline property: accuracy is IDENTICAL under every group element
    # — the canonicalized pipeline is exactly rotation-invariant, so there
    # is no robustness gap to close (absolute accuracy depends only on the
    # task/backbone, not the orientation)
    accs = [float(gm[f"test/acc_element_{g}"]) for g in range(4)]
    assert max(accs) - min(accs) < 1e-6, accs
    print("per-element accuracies identical -> exact rotation invariance")


if __name__ == "__main__":
    main()
