from orion_tpu.accel.bvh import BVH, BuildStats, build_bvh  # noqa: F401
