"""Checkpoint fetcher (reference component 7, download_models.py:7-37).

The reference downloads 8 torch checkpoints (5 classifiers + 3 MAE
imputers) from Google Drive with gdown. This module keeps the same
checkpoint identities and destination layout but targets the registry's
native store: after download, each ``.pth`` is converted once to ``.npz``
(models/convert.py) and torch is never needed again.

Network access is optional: offline, the function reports what is
missing instead of failing, and the registry falls back per its policy
(models/registry.py). The fetch itself needs NO third-party package —
``_gdrive_fetch`` speaks Drive's ``uc?export=download`` protocol with
the stdlib (including the large-file virus-scan interstitial that gdown
exists to handle); gdown is used instead when installed, since its
fuzzy-matching handles future URL-shape drift.
"""

from __future__ import annotations

import html
import os
import re
import urllib.parse
import urllib.request

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


_ID_RE = re.compile(r"/file/d/([\w-]+)")
_FORM_RE = re.compile(r"<form[^>]*action=\"([^\"]+)\"[^>]*>(.*?)</form>",
                      re.S)
_INPUT_RE = re.compile(
    r"<input[^>]*name=\"([^\"]+)\"[^>]*value=\"([^\"]*)\"")


def _gdrive_fetch(url: str, dest: str, opener=None) -> None:
    """Download a Google Drive file with the stdlib only.

    Drive's direct endpoint (``uc?export=download&id=…``) returns the
    bytes for small files; for files beyond the virus-scan limit it
    returns an HTML interstitial whose <form> carries the real download
    action (drive.usercontent.google.com) plus hidden inputs (id,
    export, confirm, uuid). We submit that form — exactly what gdown
    automates. ``opener`` is injectable for offline tests.
    """
    if opener is None:
        def opener(req):
            return urllib.request.urlopen(req, timeout=60)
    m = _ID_RE.search(url)
    file_id = m.group(1) if m else urllib.parse.parse_qs(
        urllib.parse.urlparse(url).query).get("id", [url])[0]
    req_url = f"https://drive.google.com/uc?export=download&id={file_id}"

    for _hop in range(3):  # direct -> interstitial form -> bytes
        req = urllib.request.Request(
            req_url, headers={"User-Agent": "ribca-tpu/1.0"})
        with opener(req) as resp:
            ctype = resp.headers.get("Content-Type", "")
            if "text/html" not in ctype:
                part = dest + ".part"
                with open(part, "wb") as f:
                    while True:
                        chunk = resp.read(1 << 20)
                        if not chunk:
                            break
                        f.write(chunk)
                os.replace(part, dest)
                return
            page = resp.read().decode("utf-8", "replace")
        form = _FORM_RE.search(page)
        if form is None:
            raise RuntimeError(
                f"Drive returned HTML without a download form for "
                f"{file_id} (quota exceeded or permission change?)")
        action = html.unescape(form.group(1))
        fields = {k: html.unescape(v)
                  for k, v in _INPUT_RE.findall(form.group(2))}
        req_url = action + ("&" if "?" in action else "?") + \
            urllib.parse.urlencode(fields)
    raise RuntimeError(f"Drive interstitial loop for {file_id}")


def download_models(models_dir: str | None = None,
                    convert: bool = True,
                    opener=None) -> dict[str, str]:
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
        try:
            if gdown is not None and opener is None:
                gdown.download(url, dest, quiet=False, fuzzy=True)
            else:
                _gdrive_fetch(url, dest, opener=opener)
            status[name] = "downloaded"
        except Exception as e:  # network-restricted environments
            status[name] = f"missing ({type(e).__name__}: {e})"

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
