"""3D box geometry in JAX (device-side).

Replaces the reference's numpy box code (utils/box_util.py:330-383 corner
construction, :97-209 axis-aligned IoU) *and* removes the per-step
CPU round-trip the reference does in decode_pred_box
(models/proposal_module.py:81-104): corners are computed in-device inside
the jitted forward pass.

Corner order matches utils/box_util.py:get_3d_box_batch exactly:
    x: [ l/2,  l/2, -l/2, -l/2,  l/2,  l/2, -l/2, -l/2]
    y: [ w/2, -w/2, -w/2,  w/2,  w/2, -w/2, -w/2,  w/2]
    z: [ h/2,  h/2,  h/2,  h/2, -h/2, -h/2, -h/2, -h/2]
rotated by roty(heading) and shifted by center.  ScanNet headings are
always 0 (data/scannet/model_util_scannet.py:130-140) so the default path
skips the rotation entirely.
"""
from __future__ import annotations

import jax.numpy as jnp

# Unit corner signs, shape (8, 3), ordered as in the reference.
_CORNER_SIGNS = jnp.array(
    [
        [1, 1, 1],
        [1, -1, 1],
        [-1, -1, 1],
        [-1, 1, 1],
        [1, 1, -1],
        [1, -1, -1],
        [-1, -1, -1],
        [-1, 1, -1],
    ],
    dtype=jnp.float32,
)


def get_3d_box_batch(
    box_size: jnp.ndarray, heading_angle: jnp.ndarray | None, center: jnp.ndarray
) -> jnp.ndarray:
    """box_size: (..., 3) [l, w, h]; heading: (...,) or None; center: (..., 3).

    Returns corners (..., 8, 3).
    """
    half = box_size * 0.5                              # (..., 3)
    corners = half[..., None, :] * _CORNER_SIGNS       # (..., 8, 3)
    if heading_angle is not None:
        c = jnp.cos(heading_angle)[..., None]
        s = jnp.sin(heading_angle)[..., None]
        x, y, z = corners[..., 0], corners[..., 1], corners[..., 2]
        # roty: x' = c*x + s*z ; z' = -s*x + c*z (reference utils/box_util.py:322-338)
        corners = jnp.stack([c * x + s * z, y, -s * x + c * z], axis=-1)
    return corners + center[..., None, :]


def box3d_minmax(corners: jnp.ndarray):
    """corners (..., 8, 3) -> (min (...,3), max (...,3))."""
    return jnp.min(corners, axis=-2), jnp.max(corners, axis=-2)


def box3d_iou_batch(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned 3D IoU from corners, (..., 8, 3) x 2 -> (...,).

    Mirrors utils/box_util.py:box3d_iou_batch_tensor (incl. the 1e-8 in the
    denominator).
    """
    mn1, mx1 = box3d_minmax(corners1)
    mn2, mx2 = box3d_minmax(corners2)
    lo = jnp.maximum(mn1, mn2)
    hi = jnp.minimum(mx1, mx2)
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol1 = jnp.prod(mx1 - mn1, axis=-1)
    vol2 = jnp.prod(mx2 - mn2, axis=-1)
    return inter / (vol1 + vol2 - inter + 1e-8)
