"""Tutorial 3 — Prior-regularized promptable segmentation (SAM-style).

Counterpart of reference tutorials/images/
instance_segmentation_group_equivariant_canonicalization.ipynb (SAM + COCO
prior-regularization demo): canonicalize images *and* box/mask targets
jointly, adapt a promptable segmentation model, and invert predicted masks
back to the original frame.

Run:  PYTHONPATH=. python tutorials/images/instance_segmentation_group_equivariant_canonicalization.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import optax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from equiadapt_tpu.data.coco import synthetic_coco_batch
from equiadapt_tpu.images import (
    EquivariantNetwork,
    GroupEquivariantImageCanonicalization,
)
from equiadapt_tpu.models.segmentation import SAMLite
from equiadapt_tpu.pipelines.segmentation import (
    ImageSegmentationPipeline,
    create_segmentation_state,
    make_segmentation_train_step,
)


def main():
    rng = jax.random.key(0)
    size = 64

    net = EquivariantNetwork(
        in_channels=3, out_channels=4, kernel_size=3,
        group_type="rotation", num_rotations=4, num_layers=2,
    )
    canon = GroupEquivariantImageCanonicalization(
        canonicalization_network=net, in_shape=(size, size, 3), num_rotations=4,
    )
    sam = SAMLite(embed_dim=64, encoder_depth=1, decoder_depth=1, num_heads=2)
    pipe = ImageSegmentationPipeline(canonicalizer=canon, prediction_network=sam)

    batch = synthetic_coco_batch(rng, 2, image_size=size, num_prompts=3)
    state = create_segmentation_state(
        pipe, rng, batch["image"], batch["targets"], optax.adam(1e-3)
    )
    # prior_weight biases the canonical pose toward identity — this is what
    # lets a *frozen* pretrained model work on unseen orientations
    step = make_segmentation_train_step(prior_weight=100.0)
    for i in range(5):
        b = synthetic_coco_batch(jax.random.fold_in(rng, i), 2, image_size=size,
                                 num_prompts=3)
        state, metrics = step(state, b, rng)
    print({k: round(float(v), 4) for k, v in metrics.items()})

    # invert predicted masks to the original orientation
    variables = {"params": state.params, **(
        {"batch_stats": state.batch_stats} if state.batch_stats else {})}
    ((_, _, pred_masks, ious), info) = pipe.apply(
        variables, batch["image"], batch["targets"]
    )
    back = pipe.invert_masks(info, pred_masks)
    print("inverted mask batch:", back.shape, "ious:", ious.shape)


if __name__ == "__main__":
    main()
