"""Export LPIPS-VGG weights to the npz consumed by eval/lpips_jax.py.

Run on any machine with `lpips` and `torchvision` installed (neither is in
this training environment, which has no network egress):

    python tools/export_lpips_weights.py --out lpips_vgg.npz

then point the trainer at it via BILATERAL_LPIPS_WEIGHTS=/path/lpips_vgg.npz
(or drop it at the default location data/lpips_vgg.npz).
"""
import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/lpips_vgg.npz")
    args = p.parse_args()

    import lpips as lpips_pkg
    import torch

    model = lpips_pkg.LPIPS(net="vgg")
    out = {}
    convs = [m for m in model.net.slice1 + model.net.slice2 + model.net.slice3
             + model.net.slice4 + model.net.slice5
             if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 13, len(convs)
    for i, c in enumerate(convs):
        out[f"conv{i}_w"] = c.weight.detach().numpy()
        out[f"conv{i}_b"] = c.bias.detach().numpy()
    for j, lin in enumerate(model.lins):
        out[f"lin{j}_w"] = lin.model[-1].weight.detach().numpy()
    np.savez(args.out, **out)
    print(f"wrote {args.out}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main()
