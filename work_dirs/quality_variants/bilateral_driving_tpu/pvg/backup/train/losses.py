"""Loss stack (reference project/models/losses.py + base.py:518-659).

Pure jnp; boolean-indexed reductions become masked means (static shapes).
SSIM is the standard 11x11 Gaussian-window formulation (reference uses
pytorch_msssim) implemented as depthwise convolutions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def masked_mean(x, mask, eps=1.0):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), eps)


# --------------------------------------------------------------------------
# SSIM (11x11 gaussian window, C1=0.01^2, C2=0.03^2 on [0,1] images)
# --------------------------------------------------------------------------


@functools.lru_cache()
def _ssim_band_np(n: int, size=11, sigma=1.5):
    """Banded Toeplitz matrix (n-size+1, n) applying the 1-D Gaussian window
    as a valid convolution. Cached numpy, not jnp (traced-array leak)."""
    import numpy as np

    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).astype("float32")
    m = n - size + 1
    A = np.zeros((m, n), "float32")
    for i in range(size):
        A[np.arange(m), np.arange(m) + i] = g[i]
    return A


def _filter2d(img, size=11, sigma=1.5):
    """img (H, W, C): separable 11-tap Gaussian as two banded matmuls.

    Single-channel depthwise convs lower to scalar VPU loops on TPU
    (measured +1.3 s/step at 544x320 through fwd+bwd); the same filter as
    (H-10, H) @ img @ (W, W-10) rides the MXU and is ~100x cheaper.
    """
    h, w = img.shape[:2]
    # images smaller than the window (coarse res-schedule stages on small
    # scenes) shrink the window to the image instead of a negative "valid"
    # extent; matches SSIM-with-smaller-window semantics
    size = min(size, h, w)
    ah = jnp.asarray(_ssim_band_np(h, size, sigma))
    aw = jnp.asarray(_ssim_band_np(w, size, sigma))
    # HIGHEST: sigma terms subtract mu^2 — one-pass bf16 matmuls (the TPU
    # f32 default) lose the low bits that survive that cancellation
    p = jax.lax.Precision.HIGHEST
    out = jnp.einsum("ih,hwc->iwc", ah, img, precision=p)
    return jnp.einsum("jw,iwc->ijc", aw, out, precision=p)


def ssim(pred, gt, c1=0.01 ** 2, c2=0.03 ** 2):
    """Mean SSIM over an (H, W, C) image pair in [0, 1] (11x11 Gaussian
    window, the pytorch_msssim formulation used by the reference at
    base.py:113-115)."""
    mu_x = _filter2d(pred)
    mu_y = _filter2d(gt)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _filter2d(pred * pred) - mu_xx
    sigma_y = _filter2d(gt * gt) - mu_yy
    sigma_xy = _filter2d(pred * gt) - mu_xy
    s = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2))
    return jnp.mean(s)


# --------------------------------------------------------------------------
# sky-opacity BCE (losses.py:33-86 SafeBCE)
# --------------------------------------------------------------------------


@jax.custom_vjp
def _safe_bce_elem(x, y, limit):
    x = jnp.clip(x, 0.0, 1.0)
    return -jnp.where(y == 0,
                      jnp.maximum(jnp.log1p(-jnp.minimum(x, 1.0 - 1e-12)),
                                  jnp.log(limit)),
                      jnp.maximum(jnp.log(jnp.maximum(x, 1e-12)),
                                  jnp.log(limit)))


def _safe_bce_fwd(x, y, limit):
    return _safe_bce_elem(x, y, limit), (x, y, limit)


def _safe_bce_bwd(res, g):
    """Clipped-BCE with preserved gradients (losses.py:54-75): clip x away
    from the saturating end, gradient zero only where x == y exactly."""
    x, y, limit = res
    xc = jnp.where(y == 0, jnp.clip(x, 0.0, 1.0 - limit),
                   jnp.clip(x, limit, 1.0))
    gx = jnp.where(y == 0, 1.0 / (1.0 - xc), -1.0 / xc) * g * (x != y)
    return gx, None, None


_safe_bce_elem.defvjp(_safe_bce_fwd, _safe_bce_bwd)


def safe_bce(pred, target, limit=0.1, mask=None):
    loss = _safe_bce_elem(pred, jnp.clip(target, 0.0, 1.0), limit)
    if mask is None:
        return jnp.mean(loss)
    return masked_mean(loss, mask)


def bce(pred, target, eps=1e-6, mask=None):
    """Plain binary cross-entropy on probabilities
    (`opacity_loss_type: bce`, base.py:552-556)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    loss = -(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))
    if mask is None:
        return jnp.mean(loss)
    return masked_mean(loss, mask)


# --------------------------------------------------------------------------
# lidar depth loss (losses.py:91-176 DepthLoss)
# --------------------------------------------------------------------------


def depth_loss(pred, gt, hit_mask=None, loss_type="l2", normalize=True,
               use_inverse_depth=False, max_depth=80.0,
               reduction="mean_on_hit"):
    pred = pred.reshape(gt.shape)
    if hit_mask is not None:
        pred = pred * hit_mask
        gt = gt * hit_mask
    valid = (gt > 0.01) & (gt < max_depth) & (pred > 1e-4)
    if normalize:
        pred = jnp.clip(pred / max_depth, 1e-6, 1.0)
        gt = jnp.clip(gt / max_depth, 1e-6, 1.0)
    if use_inverse_depth:
        pred = 1.0 / pred
        gt = 1.0 / gt
    if loss_type == "l1":
        err = jnp.abs(pred - gt)
    elif loss_type == "l2":
        err = (pred - gt) ** 2
    elif loss_type == "smooth_l1":
        d = jnp.abs(pred - gt)
        err = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    else:
        raise ValueError(loss_type)
    err = err * valid
    if reduction == "mean_on_hit":
        return masked_mean(err, valid)
    if reduction == "mean_on_hw":
        return jnp.sum(err) / (gt.shape[0] * gt.shape[1])
    if reduction == "sum":
        return jnp.sum(err)
    return err


# --------------------------------------------------------------------------
# misc regularizers
# --------------------------------------------------------------------------


def opacity_entropy(opacity):
    """-o log o regularizer (base.py:569-575)."""
    o = jnp.clip(opacity, 1e-6, 1.0 - 1e-6)
    return jnp.mean(-o * jnp.log(o))


def inverse_depth_smoothness(inv_depth, image):
    """kornia.losses.inverse_depth_smoothness_loss (base.py:576-585):
    edge-aware first-order smoothness; inv_depth (H, W), image (H, W, 3)."""
    didx = jnp.abs(inv_depth[:, 1:] - inv_depth[:, :-1])
    didy = jnp.abs(inv_depth[1:, :] - inv_depth[:-1, :])
    wx = jnp.exp(-jnp.mean(jnp.abs(image[:, 1:] - image[:, :-1]), axis=-1))
    wy = jnp.exp(-jnp.mean(jnp.abs(image[1:, :] - image[:-1, :]), axis=-1))
    return jnp.mean(didx * wx) + jnp.mean(didy * wy)


def psnr(pred, gt):
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
