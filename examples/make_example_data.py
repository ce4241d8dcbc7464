"""Generate synthetic example data for the manifests in this directory.

The reference's example .tif images are Git-LFS blobs not present in every
checkout (reference .MISSING_LARGE_BLOBS); this script writes synthetic
stand-ins with the full 21-marker panel layout of examples/markers.txt so
every example config is runnable out of the box.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(out_dir=None, h=512, w=512, n_cells=300):
    from PIL import Image

    from ribca_tpu.gui.io_plugin import make_sample_data
    from ribca_tpu.io import write_tiff

    out_dir = out_dir or os.path.dirname(os.path.abspath(__file__))
    markers = [
        m.strip()
        for m in open(os.path.join(out_dir, "markers.txt"))
        if m.strip()
    ]
    for i, seed in enumerate((0, 1), start=1):
        layers = make_sample_data(
            h=h, w=w, n_cells=n_cells, n_channels=len(markers), seed=seed
        )
        img, mask = layers[0][0], layers[1][0]
        write_tiff(os.path.join(out_dir, f"example_{i}.tif"),
                   img.astype(np.float32))
        Image.fromarray(mask.astype(np.uint16)).save(
            os.path.join(out_dir, f"example_{i}_cell_mask.png")
        )
        print(f"wrote example_{i}.tif ({len(markers)}ch {h}x{w}) "
              f"+ mask ({n_cells} cells)")


if __name__ == "__main__":
    main()
