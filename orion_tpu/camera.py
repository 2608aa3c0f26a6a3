"""Camera model and primary-ray generation.

Reproduces the reference camera exactly (RayTracer::calculateCameraVectors,
/root/reference/orion/raytracer.cpp:212-238, and the pixel loop, :69-85):

  front = normalize(look_at - view_point)
  up    = normalize(Gram-Schmidt(front, up)) * y_view/2
  right = cross(front, normalized up) * y_view * aspect / 2
  x in [-1, 1) left->right over columns, y flipped so (-1,-1) is top-left
  dir(x, y) = front + x * right + (-y) * up        (unnormalized!)

Note the reference does NOT normalize primary ray directions; t is therefore
measured in units of |dir|. We keep that convention — hit positions
origin + t*dir are identical either way.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from orion_tpu.io.rtc import RTCData


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    origin: jax.Array  # [3]
    front: jax.Array   # [3] unit
    up: jax.Array      # [3] scaled: unit-up * y_view/2
    right: jax.Array   # [3] scaled: unit-right * y_view*aspect/2
    xres: int = dataclasses.field(metadata=dict(static=True), default=0)
    yres: int = dataclasses.field(metadata=dict(static=True), default=0)


def _orthogonalize(base: jax.Array, v: jax.Array) -> jax.Array:
    """Gram-Schmidt: component of v orthogonal to base (math.hpp:313-317)."""
    return v - base * (jnp.dot(base, v) / jnp.dot(base, base))


def camera_from_rtc(rtc: RTCData) -> Camera:
    view_point = jnp.asarray(rtc.view_point, jnp.float32)
    look_at = jnp.asarray(rtc.look_at, jnp.float32)
    up = jnp.asarray(rtc.vector_up, jnp.float32)

    front = look_at - view_point
    up = _orthogonalize(front, up)
    up = up / jnp.linalg.norm(up)
    front = front / jnp.linalg.norm(front)
    right = jnp.cross(front, up)

    up = up * (rtc.y_view * 0.5)
    right = right * (rtc.y_view * rtc.aspect_ratio * 0.5)
    return Camera(origin=view_point, front=front, up=up, right=right,
                  xres=rtc.xres, yres=rtc.yres)


def make_camera(view_point, look_at, vector_up, y_view: float,
                xres: int, yres: int) -> Camera:
    rtc = RTCData(xres=xres, yres=yres, view_point=tuple(view_point),
                  look_at=tuple(look_at), vector_up=tuple(vector_up),
                  y_view=y_view)
    return camera_from_rtc(rtc)


def primary_rays(camera: Camera, jitter_x: jax.Array, jitter_y: jax.Array):
    """Generate one primary ray per pixel for a single sub-pixel jitter.

    jitter_x/jitter_y: scalars (or [H,W] arrays) in [0, pixel_size) NDC units;
    the reference shares one jitter pattern across all pixels
    (raytracer.cpp:53-63) — pass scalars for parity, per-pixel arrays for
    decorrelated sampling.

    Returns (origins [H*W, 3], directions [H*W, 3]) flattened row-major.
    """
    H, W = camera.yres, camera.xres
    j = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)  # column
    i = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)  # row
    x = 2.0 * (j / W) - 1.0 + jitter_x
    y = -(2.0 * (i / H) - 1.0 + jitter_y)  # flip y: top-left = (-1, +1*up)
    dirs = (camera.front[None, None, :]
            + x[:, :, None] * camera.right[None, None, :]
            + y[:, :, None] * camera.up[None, None, :])
    origins = jnp.broadcast_to(camera.origin, (H, W, 3))
    return origins.reshape(-1, 3), dirs.reshape(-1, 3)
