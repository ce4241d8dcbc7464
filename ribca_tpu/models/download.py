"""Checkpoint fetcher (reference component 7, download_models.py:7-37).

The reference downloads 8 torch checkpoints (5 classifiers + 3 MAE
imputers) from Google Drive with gdown. This module keeps the same
checkpoint identities and destination layout but targets the registry's
native store: after download, each ``.pth`` is converted once to ``.npz``
(models/convert.py) and torch is never needed again.

gdown / network access is optional: without either, the function reports
what is missing instead of failing, and the registry falls back per its
policy (models/registry.py).
"""

from __future__ import annotations

import os

# Same checkpoint identities and URLs as the reference's download table
# (download_models.py:7-24); fetched with gdown fuzzy matching.
CHECKPOINT_URLS: dict[str, str] = {
    "immune_base.pth":
        "https://drive.google.com/file/d/1EOe216MIV7o_pxAHIYg0KUab94BnhP0Z/view?usp=sharing",
    "immune_extended.pth":
        "https://drive.google.com/file/d/1U8X-ka5hk3MvVUZ6nO7Nx30WrT5Rc1yU/view?usp=sharing",
    "immune_full.pth":
        "https://drive.google.com/file/d/1-KCwsysGks8BUXElAoF2rAqUvBpD4mtB/view?usp=sharing",
    "struct.pth":
        "https://drive.google.com/file/d/1fuC78XYHSs0acN0m9b25xN86ujBxE6A5/view?usp=sharing",
    "nerve.pth":
        "https://drive.google.com/file/d/1B8hv3xG5kI0TsSY5XLwAyHI6D7KKQ8y1/view?usp=sharing",
    "immune_base_impute.pth":
        "https://drive.google.com/file/d/1034ex__rMmMz7w8PPCY1e8YHWwl62J9H/view?usp=sharing",
    "immune_extended_impute.pth":
        "https://drive.google.com/file/d/1iQUY3JUueCNTducSNUmijzQVIkaTuJ0N/view?usp=sharing",
    "immune_full_impute.pth":
        "https://drive.google.com/file/d/1vK9JgVlO_PtcI_B9mPXCp6eamff0S2rD/view?usp=sharing",
}


def download_models(models_dir: str | None = None,
                    convert: bool = True) -> dict[str, str]:
    """Fetch missing checkpoints into ``models_dir``; returns a status map
    {filename: 'present' | 'downloaded' | 'missing (<reason>)'}."""
    from ribca_tpu.models.registry import DEFAULT_MODELS_DIR

    models_dir = models_dir or DEFAULT_MODELS_DIR
    os.makedirs(models_dir, exist_ok=True)
    try:
        import gdown  # type: ignore
    except ImportError:
        gdown = None

    status: dict[str, str] = {}
    for name, url in CHECKPOINT_URLS.items():
        dest = os.path.join(models_dir, name)
        npz = dest.replace(".pth", ".npz")
        if os.path.exists(npz) or os.path.exists(dest):
            status[name] = "present"
            continue
        if gdown is None:
            status[name] = "missing (gdown not installed)"
            continue
        try:
            gdown.download(url, dest, quiet=False, fuzzy=True)
            status[name] = "downloaded"
        except Exception as e:  # network-restricted environments
            status[name] = f"missing ({type(e).__name__})"

    if convert:
        _convert_all(models_dir)
    return status


def _convert_all(models_dir: str) -> None:
    """Convert every .pth without a sibling .npz (one-time torch use)."""
    from ribca_tpu.models import store
    from ribca_tpu.models.convert import (
        convert_mae_state_dict,
        convert_vit_state_dict,
        load_torch_checkpoint,
    )

    for name in os.listdir(models_dir):
        if not name.endswith(".pth"):
            continue
        npz = os.path.join(models_dir, name.replace(".pth", ".npz"))
        if os.path.exists(npz):
            continue
        sd = load_torch_checkpoint(os.path.join(models_dir, name))
        conv = (
            convert_mae_state_dict if "impute" in name
            else convert_vit_state_dict
        )
        store.save_params(conv(sd), npz)


if __name__ == "__main__":
    for name, st in download_models().items():
        print(f"{name}: {st}")
