"""Camera container for the render path.

Counterpart of the reference's `dataclass_camera`
(project/models/gaussians/basics.py:112-135). Width/height are static python
ints (XLA shapes depend on them); matrices are traced arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Camera:
    camtoworld: jax.Array          # (4, 4)
    K: jax.Array                   # (3, 3) intrinsics
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    camtoworld_gt: jax.Array | None = None  # pre-refinement pose

    @property
    def viewmat(self) -> jax.Array:
        """world -> camera, inverse of camtoworld (closed-form SE(3) inverse)."""
        R = self.camtoworld[:3, :3]
        t = self.camtoworld[:3, 3]
        Rt = R.T
        top = jnp.concatenate([Rt, (-Rt @ t)[:, None]], axis=1)
        return jnp.concatenate(
            [top, jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)], axis=0
        )

    @property
    def origin(self) -> jax.Array:
        return self.camtoworld[:3, 3]
