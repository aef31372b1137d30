"""Tiny filesystem/network helpers used by examples."""
from __future__ import annotations

import shutil
import urllib.request
from pathlib import Path


def as_str(filename) -> str:
    """Normalize a str-or-Path filename to str (reject anything else)."""
    if not isinstance(filename, (str, Path)):
        raise TypeError(f"expected a filename (str or Path), got {type(filename)}")
    return str(filename)


def download_file(url: str, local_filename) -> str:
    """Fetch ``url`` into ``local_filename`` unless it is already present.

    Streaming copy (no full in-memory buffering); parent directories are
    created as needed. Used only by the examples.
    """
    target = Path(local_filename)
    if target.exists():
        print(f"{target} is already present, not downloading")
        return str(target)
    target.parent.mkdir(parents=True, exist_ok=True)
    with urllib.request.urlopen(url) as response, open(target, "wb") as sink:
        shutil.copyfileobj(response, sink)
    print(f"fetched {url} -> {target}")
    return str(target)
