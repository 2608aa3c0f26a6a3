"""Multi-chip scaling: device meshes, sharded rendering, distributed training."""

from orion_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    make_train_step,
    render_sharded,
    scene_params,
)
from orion_tpu.parallel.shardmap_render import (  # noqa: F401
    make_train_step_shardmap,
    render_shardmap,
)
