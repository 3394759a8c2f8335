"""LPIPS (VGG-16 variant) as a pure-JAX function.

Port of the `lpips` package's VGG LPIPS metric (the reference evaluates it at
project/models/trainers/base.py:113-115 and video_utils.py:273-289):

  scale input from [0,1] to [-1,1], apply the fixed channel shift/scale,
  run the VGG-16 conv stack, tap the five post-ReLU stages
  (conv1_2, conv2_2, conv3_3, conv4_3, conv5_3), unit-normalize each tap
  over channels, squared difference, a learned non-negative 1x1 "lin" layer
  per tap, spatial mean, sum over taps.

Weights are NOT bundled (this environment has no network egress and no
torchvision cache); `load_weights_npz` consumes the export produced by
`tools/export_lpips_weights.py` on any machine with `lpips`+`torchvision`
installed. The architecture itself is parity-tested against a torch-built
equivalent with random weights (tests/test_metrics_lpips.py), so plugging in
real exported weights yields the reference metric.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG-16 conv plan: (out_channels, pool_before) per conv layer
VGG16_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
# indices (into the conv list) after which a tap is taken (post-ReLU)
TAP_AFTER = [1, 3, 6, 9, 12]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPSParams(NamedTuple):
    convs: List[Tuple[jax.Array, jax.Array]]   # 13 x (HWIO weight, bias)
    lins: List[jax.Array]                      # 5 x (C_tap,) weights


def init_random(key, dtype=jnp.float32) -> LPIPSParams:
    """Random-weight instance (architecture tests only)."""
    convs = []
    cin = 3
    for i, (cout, _) in enumerate(VGG16_PLAN):
        key, k1, k2 = jax.random.split(key, 3)
        w = jax.random.normal(k1, (3, 3, cin, cout), dtype) * 0.05
        b = jax.random.normal(k2, (cout,), dtype) * 0.05
        convs.append((w, b))
        cin = cout
    lins = []
    for t in TAP_AFTER:
        key, k = jax.random.split(key)
        c = VGG16_PLAN[t][0]
        lins.append(jax.random.uniform(k, (c,), dtype))
    return LPIPSParams(convs, lins)


def load_weights_npz(path: str) -> LPIPSParams:
    """Load the npz written by tools/export_lpips_weights.py.

    Keys: conv{i}_w (OIHW, torch layout), conv{i}_b, lin{j}_w (O=1,I,1,1)."""
    z = np.load(path)
    convs = []
    for i in range(len(VGG16_PLAN)):
        w = z[f"conv{i}_w"]                       # (O, I, H, W)
        b = z[f"conv{i}_b"]
        convs.append((jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b)))
    lins = [jnp.asarray(z[f"lin{j}_w"].reshape(-1))
            for j in range(len(TAP_AFTER))]
    return LPIPSParams(convs, lins)


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _vgg_taps(params: LPIPSParams, x):
    """x: (N, H, W, 3) in [0, 1]. Returns the 5 tapped activations."""
    x = 2.0 * x - 1.0
    x = (x - _SHIFT) / _SCALE
    taps = []
    for i, ((w, b), (_, pool)) in enumerate(zip(params.convs, VGG16_PLAN)):
        if pool:
            x = _maxpool2(x)
        x = jax.nn.relu(_conv(x, w, b))
        if i in TAP_AFTER:
            taps.append(x)
    return taps


def _unit_norm(x, eps=1e-10):
    return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=())
def lpips(params: LPIPSParams, pred, gt) -> jax.Array:
    """pred/gt: (H, W, 3) or (N, H, W, 3) in [0, 1]. Returns scalar (or (N,))
    LPIPS distance."""
    squeeze = pred.ndim == 3
    if squeeze:
        pred, gt = pred[None], gt[None]
    ta = _vgg_taps(params, pred)
    tb = _vgg_taps(params, gt)
    total = 0.0
    for a, b, lin in zip(ta, tb, params.lins):
        d = (_unit_norm(a) - _unit_norm(b)) ** 2
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total[0] if squeeze else total
