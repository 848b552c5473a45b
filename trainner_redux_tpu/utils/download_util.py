"""Weight/file download helpers (parity: reference utils/download_util.py).

Same API surface (`load_file_from_url`, `download_file_from_google_drive`)
built on urllib so no extra dependency is needed. Downloads cache under
``TRAINNER_WEIGHTS_DIR`` (or ``~/.cache/trainner_redux_tpu``) and are
skipped when the file already exists — which is also how zero-egress
deployments work: pre-place the files in the cache directory and these
helpers resolve them without touching the network.
"""

from __future__ import annotations

import contextlib
import os
import os.path as osp
import urllib.request
from urllib.parse import urlparse


def _cache_dir() -> str:
    return os.environ.get(
        "TRAINNER_WEIGHTS_DIR",
        osp.join(osp.expanduser("~"), ".cache", "trainner_redux_tpu"),
    )


def load_file_from_url(
    url: str,
    model_dir: str | None = None,
    progress: bool = True,
    file_name: str | None = None,
) -> str:
    """Return a local path for `url`, downloading it if absent
    (reference download_util.py:81-110)."""
    model_dir = model_dir or _cache_dir()
    os.makedirs(model_dir, exist_ok=True)
    if file_name is None:
        file_name = osp.basename(urlparse(url).path)
    cached = osp.abspath(osp.join(model_dir, file_name))
    if osp.exists(cached):
        return cached

    print(f'Downloading: "{url}" to {cached}')

    def _hook(blocks: int, bs: int, total: int) -> None:
        if progress and total > 0 and blocks % 64 == 0:
            done = min(blocks * bs / total * 100, 100.0)
            print(f"\r  {done:5.1f}%", end="", flush=True)

    # Download to a .part file and rename only on success so an interrupted
    # transfer never masquerades as a valid cached artifact (torch.hub does
    # the same; reference download_util.py routes through it).
    part = cached + ".part"
    try:
        urllib.request.urlretrieve(url, part, reporthook=_hook)
        os.replace(part, cached)
    except OSError as e:
        with contextlib.suppress(OSError):
            os.remove(part)
        raise OSError(
            f"could not download {url} ({e}); on air-gapped hosts place the "
            f"file manually at {cached}"
        ) from e
    if progress:
        print()
    return cached


def download_file_from_google_drive(file_id: str, save_path: str) -> None:
    """Fetch a public Drive file by id (reference download_util.py:13-44)."""
    url = f"https://drive.usercontent.google.com/download?id={file_id}&confirm=t"
    os.makedirs(osp.dirname(osp.abspath(save_path)) or ".", exist_ok=True)
    try:
        urllib.request.urlretrieve(url, save_path)
    except OSError as e:
        raise OSError(
            f"could not download Drive file {file_id} ({e}); on air-gapped "
            f"hosts place the file manually at {save_path}"
        ) from e
