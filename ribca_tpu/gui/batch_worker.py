"""Mock batch worker — a fake backend for GUI testing without models.

Parity with the reference's ``batch_process.py`` (component 17, SURVEY
§2): prints the received parameters, drops a canned result image into the
working dir, sleeps to simulate compute, and writes the completion
sentinel so the widget's polling path can be exercised end-to-end with no
device, weights, or real images.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def batch_process_func(working_dir: str, sleep_s: float = 2.0) -> None:
    params_path = os.path.join(working_dir, "hyperparams_batch.json")
    if os.path.exists(params_path):
        with open(params_path) as f:
            print("mock batch worker received:", json.load(f))
    from PIL import Image

    canned = (np.arange(64 * 64, dtype=np.uint16).reshape(64, 64) % 7)
    Image.fromarray(canned).save(os.path.join(working_dir, "output_img.png"))
    time.sleep(sleep_s)
    with open(os.path.join(working_dir, "output.txt"), "w") as f:
        f.write("Batch process completed")
