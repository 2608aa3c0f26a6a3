"""Multi-chip scaling: device meshes, sharded rendering, distributed training."""

from orion_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    render_sharded,
    make_train_step,
)
