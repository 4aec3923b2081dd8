"""Colorize 16-bit depth PNGs to rendered images (viz helper).

Equivalent of the reference's `src/scripts/colorize_depth.py` (the
`colorize(...)` helper + its `__main__` walk over a predictions dir):
maps each `*_depth.png` / `*.png` uint16 depth map through a matplotlib
colormap with percentile-based vmin/vmax and writes `{name}_rendered.png`
next to (or into --out_dir).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def _parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="a depth PNG or a directory of them")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--cmap", default="Spectral_r")
    p.add_argument("--vminp", type=float, default=2.0,
                   help="lower percentile for the color range "
                        "(reference colorize vminp=2)")
    p.add_argument("--vmaxp", type=float, default=95.0)
    return p


def main(argv=None):
    from PIL import Image

    from ..utils.image import colorize_depth

    args = _parser().parse_args(argv)
    paths = ([args.input] if os.path.isfile(args.input)
             else sorted(glob.glob(os.path.join(args.input, "*.png"))))
    paths = [p for p in paths if not p.endswith("_rendered.png")]
    if not paths:
        raise SystemExit(f"no PNGs under {args.input}")
    out_dir = args.out_dir
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    for path in paths:
        d = np.asarray(Image.open(path)).astype(np.float32)
        if d.ndim == 3:
            d = d[..., 0]
        # percentile normalization is scale-invariant — no need to guess
        # the stored unit (u8 vs u16)
        vmin = float(np.percentile(d, args.vminp))
        vmax = float(np.percentile(d, args.vmaxp))
        rgb = colorize_depth(d, min_depth=vmin, max_depth=max(vmax, vmin + 1e-6),
                             cmap=args.cmap)
        out = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        name = os.path.splitext(os.path.basename(path))[0] + "_rendered.png"
        dest = os.path.join(out_dir or os.path.dirname(path) or ".", name)
        Image.fromarray(out).save(dest)
        print(dest)


if __name__ == "__main__":
    main()
