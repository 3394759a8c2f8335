"""LPIPS-VGG architecture parity: the JAX port vs a torch-built equivalent.

Real pretrained weights are not available offline, so the test pins the
*architecture* (conv stack, pooling placement, taps, channel-unit-norm,
lin layers, reductions) with random weights shared between both
implementations. With identical weights the two must agree to float
tolerance; exported real weights then reproduce the reference metric."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from bilateral_driving_tpu.eval import lpips_jax


def torch_lpips_equiv(params, a_np, b_np):
    """Reference torch implementation mirroring the lpips package."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(x):
        x = x * 2 - 1
        x = (x - shift) / scale
        out = []
        for i, ((w, b), (_, pool)) in enumerate(
                zip(params.convs, lpips_jax.VGG16_PLAN)):
            if pool:
                x = F.max_pool2d(x, 2)
            wt = torch.from_numpy(
                np.asarray(w).transpose(3, 2, 0, 1).copy())  # HWIO -> OIHW
            bt = torch.from_numpy(np.asarray(b).copy())
            x = F.relu(F.conv2d(x, wt, bt, padding=1))
            if i in lpips_jax.TAP_AFTER:
                out.append(x)
        return out

    a = torch.from_numpy(a_np.transpose(2, 0, 1)[None].copy())
    b = torch.from_numpy(b_np.transpose(2, 0, 1)[None].copy())
    ta, tb = taps(a), taps(b)
    total = 0.0
    for xa, xb, lin in zip(ta, tb, params.lins):
        na = xa / torch.sqrt((xa * xa).sum(1, keepdim=True) + 1e-10)
        nb = xb / torch.sqrt((xb * xb).sum(1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        lw = torch.from_numpy(np.asarray(lin).copy()).view(1, -1, 1, 1)
        total = total + (d * lw).sum(1).mean(dim=(1, 2))
    return float(total.item())


def test_lpips_port_matches_torch():
    import jax

    params = lpips_jax.init_random(jax.random.key(0))
    rng = np.random.RandomState(1)
    a = rng.rand(33, 47, 3).astype(np.float32)
    b = np.clip(a + rng.randn(33, 47, 3).astype(np.float32) * 0.1, 0, 1)
    got = float(lpips_jax.lpips(params, a, b))
    want = torch_lpips_equiv(params, a, b)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # identical inputs -> 0
    assert float(lpips_jax.lpips(params, a, a)) < 1e-8


def test_lpips_npz_roundtrip(tmp_path):
    """Exporter format: torch-layout npz loads into the same params."""
    import jax

    params = lpips_jax.init_random(jax.random.key(2))
    out = {}
    for i, (w, b) in enumerate(params.convs):
        out[f"conv{i}_w"] = np.asarray(w).transpose(3, 2, 0, 1)
        out[f"conv{i}_b"] = np.asarray(b)
    for j, lin in enumerate(params.lins):
        out[f"lin{j}_w"] = np.asarray(lin).reshape(1, -1, 1, 1)
    p = tmp_path / "w.npz"
    np.savez(p, **out)
    loaded = lpips_jax.load_weights_npz(str(p))
    for (w0, b0), (w1, b1) in zip(params.convs, loaded.convs):
        np.testing.assert_allclose(np.asarray(w0), np.asarray(w1))
        np.testing.assert_allclose(np.asarray(b0), np.asarray(b1))
    rng = np.random.RandomState(3)
    a = rng.rand(17, 21, 3).astype(np.float32)
    b = rng.rand(17, 21, 3).astype(np.float32)
    np.testing.assert_allclose(float(lpips_jax.lpips(params, a, b)),
                               float(lpips_jax.lpips(loaded, a, b)),
                               rtol=1e-6)
