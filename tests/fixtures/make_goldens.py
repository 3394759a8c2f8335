"""Generate committed golden render/gradient fixtures for the rasterization
pipeline (SURVEY.md §4 oracle set; VERDICT round-1 item 8).

The goldens lock the oracle-verified pipeline outputs at generation time so
any later numerical drift — in the Pallas kernels, the binning sort, the
projection math, or a JAX upgrade — fails tests/test_goldens.py with a
diff, instead of silently shifting quality. Inputs are STORED in the file
(not re-derived from a PRNG seed) so the fixture survives jax.random
implementation changes.

Run from the repo root: python tests/fixtures/make_goldens.py
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from bilateral_driving_tpu.core import gaussians as G  # noqa: E402
from bilateral_driving_tpu.ops import pipeline  # noqa: E402

WIDTH, HEIGHT = 96, 64
N = 300


def main():
    key = jax.random.key(42)
    ks = jax.random.split(key, 6)
    means = jnp.concatenate(
        [jax.random.uniform(ks[0], (N, 2), minval=-1.2, maxval=1.2),
         jax.random.uniform(ks[1], (N, 1), minval=2.0, maxval=8.0)], axis=1)
    quats = G.random_quats(ks[2], N)
    scales = jnp.exp(jax.random.uniform(ks[3], (N, 3), minval=-3.5,
                                        maxval=-1.5))
    opac = jax.random.uniform(ks[4], (N,), minval=0.3, maxval=0.95)
    colors = jax.random.uniform(ks[5], (N, 3))
    viewmat = jnp.eye(4)
    f = 0.8 * WIDTH
    K = jnp.array([[f, 0.0, WIDTH / 2], [0.0, f, HEIGHT / 2], [0, 0, 1.0]])

    cfg = pipeline.RasterizeConfig(isect_capacity=2 ** 14, interpret=True)

    def loss(means, scales, opac, colors):
        out = pipeline.rasterize(means, quats, scales, opac, colors, viewmat,
                                 K, WIDTH, HEIGHT, cfg)
        # weighted sums touch every output head so every gradient path is
        # exercised, incl. the expected-depth normalization
        return (jnp.sum(out["rgb"] * 1.7) + jnp.sum(out["alpha"] * 0.3)
                + jnp.sum(jnp.where(out["alpha"] > 0.2, out["depth"], 0.0)))

    out = pipeline.rasterize(means, quats, scales, opac, colors, viewmat, K,
                             WIDTH, HEIGHT, cfg)
    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, opac, colors)

    path = os.path.join(os.path.dirname(__file__), "goldens_rasterize.npz")
    np.savez_compressed(
        path,
        means=np.asarray(means), quats=np.asarray(quats),
        scales=np.asarray(scales), opac=np.asarray(opac),
        colors=np.asarray(colors), viewmat=np.asarray(viewmat),
        K=np.asarray(K),
        rgb=np.asarray(out["rgb"]), depth=np.asarray(out["depth"]),
        alpha=np.asarray(out["alpha"]),
        num_isects=np.asarray(out["info"]["num_isects"]),
        g_means=np.asarray(grads[0]), g_scales=np.asarray(grads[1]),
        g_opac=np.asarray(grads[2]), g_colors=np.asarray(grads[3]))
    print("wrote", path, "num_isects", int(out["info"]["num_isects"]))


if __name__ == "__main__":
    main()
