"""Cross-implementation goldens: the committed fixture holds renders,
gradients, and the intersection count produced by an INDEPENDENT
formulation (matrix-form EWA projection + O(N·H·W) all-pairs compositor,
tests/fixtures/make_goldens.py) of the gsplat v1.3.0 spec the pipeline
implements (reference call site:
/root/reference/project/models/trainers/base.py:393-408). The production
pipeline (component-form projection + binning sort + Pallas tile kernel)
must reproduce them — a semantics misread in either formulation surfaces as
a mismatch here instead of being locked in by self-generated fixtures
(VERDICT round-2 item 2). Behavior-by-behavior spec tests live in
tests/test_gsplat_semantics.py; the mapping is documented in PARITY.md."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilateral_driving_tpu.ops import pipeline

GOLDENS = os.path.join(os.path.dirname(__file__), "fixtures",
                       "goldens_rasterize.npz")
WIDTH, HEIGHT = 96, 64


@pytest.fixture(scope="module")
def g():
    return dict(np.load(GOLDENS))


def _render_args(g):
    return (jnp.asarray(g["means"]), jnp.asarray(g["quats"]),
            jnp.asarray(g["scales"]), jnp.asarray(g["opac"]),
            jnp.asarray(g["colors"]), jnp.asarray(g["viewmat"]),
            jnp.asarray(g["K"]))


def _cfg(tight):
    return pipeline.RasterizeConfig(isect_capacity=2 ** 14, interpret=True,
                                    tight_radius=tight)


# tight_radius=True must give IDENTICAL images/gradients (the tightened
# radius only removes entries the kernel's 1/255 alpha gate zeroes anyway)
@pytest.mark.parametrize("tight", [False, True])
def test_render_matches_golden(g, tight):
    means, quats, scales, opac, colors, viewmat, K = _render_args(g)
    out = pipeline.rasterize(means, quats, scales, opac, colors, viewmat, K,
                             WIDTH, HEIGHT, _cfg(tight))
    if tight:
        assert int(out["info"]["num_isects"]) <= int(g["num_isects"])
    else:
        # gsplat isect_tiles count, computed independently from tile AABBs
        assert int(out["info"]["num_isects"]) == int(g["num_isects"])
    np.testing.assert_allclose(np.asarray(out["rgb"]), g["rgb"],
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"])[..., 0], g["alpha"],
                               atol=3e-5, rtol=1e-4)
    hit = g["alpha"] > 0.2             # depth is noise where nothing renders
    np.testing.assert_allclose(np.asarray(out["depth"])[..., 0][hit],
                               g["depth"][hit], atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("tight", [False, True])
def test_grads_match_golden(g, tight):
    means, quats, scales, opac, colors, viewmat, K = _render_args(g)

    def loss(means, scales, opac, colors):
        out = pipeline.rasterize(means, quats, scales, opac, colors, viewmat,
                                 K, WIDTH, HEIGHT, _cfg(tight))
        return (jnp.sum(out["rgb"] * 1.7) + jnp.sum(out["alpha"] * 0.3)
                + jnp.sum(jnp.where(out["alpha"] > 0.2, out["depth"], 0.0)))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, opac, colors)
    for got, want, name in [(grads[0], g["g_means"], "means"),
                            (grads[1], g["g_scales"], "scales"),
                            (grads[2], g["g_opac"], "opac"),
                            (grads[3], g["g_colors"], "colors")]:
        scale = max(float(np.abs(want).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=2e-4 * scale, rtol=5e-4,
                                   err_msg=f"grad mismatch: {name}")
