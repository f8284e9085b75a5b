"""Export torch-lpips AlexNet weights to the npz layout adnm_tpu expects.

Run in an environment where the ``lpips`` pip package (and its pretrained
weights) is installed:

    python scripts/export_lpips.py lpips_alex.npz

then point ADNM_LPIPS_WEIGHTS at the output.
"""

import sys

import numpy as np


def main(out_path: str):
    import lpips  # noqa: requires pip install lpips

    net = lpips.LPIPS(net="alex", verbose=False)
    feats = net.net  # alexnet slices
    convs = [m for m in feats.modules() if m.__class__.__name__ == "Conv2d"]
    arrays = {}
    for i, c in enumerate(convs[:5]):
        arrays[f"conv{i}_w"] = c.weight.detach().numpy()
        arrays[f"conv{i}_b"] = c.bias.detach().numpy()
    for i, lin in enumerate([net.lin0, net.lin1, net.lin2, net.lin3, net.lin4]):
        arrays[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy()
    np.savez(out_path, **arrays)
    print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz")
