from equiadapt_tpu.data.nbody_sim import (
    generate_nbody_dataset,
    simulate_charged,
    simulate_springs,
)
from equiadapt_tpu.data.synthetic import (
    batch_iterator,
    synthetic_image_batch,
    synthetic_pointcloud_batch,
)

__all__ = [
    "generate_nbody_dataset",
    "simulate_charged",
    "simulate_springs",
    "batch_iterator",
    "synthetic_image_batch",
    "synthetic_pointcloud_batch",
]
