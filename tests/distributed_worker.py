"""Worker for tests/test_distributed.py: one process of a 2-process CPU
cluster. Usage: python distributed_worker.py PORT PROCESS_ID OUTDIR

Env (set by the test): JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=4 (so 2 processes x 4
local devices = 8 global devices — the pod-slice shape faked on CPU).

jax.distributed.initialize must run before ANYTHING touches the XLA
backend, so all orion_tpu imports live inside main() after init.
"""

import json
import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")

ASSETS = "/root/reference/assets"


def main() -> int:
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from orion_tpu.parallel.distributed import init_distributed

    info = init_distributed(coordinator_address=f"localhost:{port}",
                            num_processes=2, process_id=pid)
    assert info["process_count"] == 2, info
    assert info["local_devices"] == 4, info
    assert info["global_devices"] == 8, info

    # a REAL cross-process collective: sum of per-process markers
    import numpy as np
    from jax.experimental import multihost_utils

    marker = jax.numpy.asarray([float(10 ** pid)])
    gathered = np.asarray(multihost_utils.process_allgather(marker))
    assert gathered.sum() == 11.0, gathered  # both processes reported in

    from orion_tpu.camera import camera_from_rtc
    from orion_tpu.parallel.distributed import host_tile, render_multihost
    from orion_tpu.scene import load_scene

    scene, rtc = load_scene(f"{ASSETS}/cornell-box.rtc")
    rtc.xres = rtc.yres = 24
    cam = camera_from_rtc(rtc)
    img = render_multihost(scene, cam, jax.random.key(7), samples=4,
                           max_depth=2, light_samples=2)
    info["host_tile_rows"] = host_tile(rtc.yres)
    out = pathlib.Path(outdir)
    np.save(out / f"img_p{pid}.npy", img)
    (out / f"info_p{pid}.json").write_text(json.dumps(info))
    return 0


if __name__ == "__main__":
    sys.exit(main())
