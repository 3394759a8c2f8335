"""Camera pose refinement: per-image SE(3) deltas.

Counterpart of the reference's `CameraOptModule`
(project/models/modules.py:822-872): a zero-initialized per-image embedding of
(3 translation + 6D rotation) deltas; identity 6D basis added before Gram-
Schmidt so zero embeddings are exactly the identity transform; the delta is
right-multiplied onto camera-to-world. Disabled for novel views
(base.py:325-329).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transforms

# numpy, not jnp: a module-level device array initializes the XLA backend
# at import, forbidding a later jax.distributed.initialize()
IDENTITY_6D = np.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], np.float32)


def init_camera_opt(key, num_images: int, std: float = 0.0):
    if std > 0:
        embeds = std * jax.random.normal(key, (num_images, 9))
    else:
        embeds = jnp.zeros((num_images, 9))
    return {"embeds": embeds}


def apply_camera_opt(params, camtoworlds: jax.Array, img_idx) -> jax.Array:
    """camtoworlds (..., 4, 4) @ delta(img_idx)."""
    deltas = params["embeds"][img_idx]
    dx, drot = deltas[..., :3], deltas[..., 3:]
    rot = transforms.rotation_6d_to_matrix(drot + IDENTITY_6D)
    transform = transforms.se3_compose(rot, dx)
    return camtoworlds @ transform
