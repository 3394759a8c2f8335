"""Cube-map sampling + Pallas window-splat VJP (ops/cubemap.py).

The EnvLight gradient path: XLA scatter-add costs ~28 ms/step on v5e, the
window-splat kernel ~5 ms — these tests pin exact parity between the two
and the coverage fallback for pathological direction sets."""
import jax
import jax.numpy as jnp
import numpy as np

from bilateral_driving_tpu.models import sky
from bilateral_driving_tpu.ops import cubemap


def _smooth_dirs(h, w):
    """Pinhole-style ray grid (spatially coherent, like real viewdirs)."""
    xs = jnp.linspace(-0.4, 0.4, w)
    ys = jnp.linspace(-0.3, 0.3, h)
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)


def _grad_pair(base, dirs):
    wgt = (jnp.arange(dirs.size).reshape(*dirs.shape[:-1], 3) % 7 + 1) * 0.1
    g_ref = jax.grad(lambda b: jnp.sum(cubemap.sample(b, dirs) * wgt))(base)
    g_new = jax.grad(lambda b: jnp.sum(
        cubemap.sample_splat_vjp(b, dirs, True) * wgt))(base)
    return np.asarray(g_ref), np.asarray(g_new)


def test_sample_matches_sky_gather():
    key = jax.random.key(0)
    base = jax.random.uniform(key, (6, 32, 32, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (100, 3))
    a = cubemap.sample(base, dirs)
    b = sky.sample_cubemap(base, dirs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_splat_vjp_parity_smooth():
    """Windowed path (smooth rays, res > window not required)."""
    key = jax.random.key(2)
    base = jax.random.uniform(key, (6, 64, 64, 3))
    dirs = _smooth_dirs(32, 64)
    g_ref, g_new = _grad_pair(base, dirs)
    np.testing.assert_allclose(g_new, g_ref,
                               atol=1e-5 * max(np.abs(g_ref).max(), 1e-9))


def test_splat_vjp_parity_random_dirs_fallback():
    """Random directions at res 512 exceed every window span -> the exact
    XLA-scatter fallback branch must produce identical gradients."""
    key = jax.random.key(3)
    base = jax.random.uniform(key, (6, 512, 512, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (32, 32, 3))
    g_ref, g_new = _grad_pair(base, dirs)
    np.testing.assert_allclose(g_new, g_ref,
                               atol=1e-5 * max(np.abs(g_ref).max(), 1e-9))


def test_envlight_color_trainable_path():
    key = jax.random.key(4)
    params = {"base": jax.random.uniform(key, (6, 64, 64, 3))}
    dirs = _smooth_dirs(32, 32)
    out_ref = sky.envlight_color(params, dirs)
    out_new = sky.envlight_color(params, dirs, interpret=True)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref),
                               atol=1e-6)
    g_ref = jax.grad(lambda b: jnp.sum(
        sky.envlight_color({"base": b}, dirs) ** 2))(params["base"])
    g_new = jax.grad(lambda b: jnp.sum(
        sky.envlight_color({"base": b}, dirs, interpret=True) ** 2))(
            params["base"])
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-5 * float(jnp.abs(g_ref).max()))
