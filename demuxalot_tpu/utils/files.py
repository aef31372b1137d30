"""Small filesystem helpers (reference: demuxalot/utils.py:147-160)."""
from __future__ import annotations

import urllib.request
from pathlib import Path


def as_str(filename) -> str:
    assert isinstance(filename, (str, Path))
    return str(filename)


def download_file(url, local_filename) -> str:
    """Utility used only in examples."""
    if Path(local_filename).exists():
        print(f"file {local_filename} already exists locally")
    else:
        Path(local_filename).parent.mkdir(exist_ok=True, parents=True)
        urllib.request.urlretrieve(url, local_filename)
        print(f"downloaded to {local_filename}")
    return local_filename
