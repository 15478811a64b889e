"""Idempotent binary file sink (SURVEY §2.1 S8).

The reference downloads photos to ``photos/<city>/<pid>.jpg`` and skips
files that already exist (scrapers/vgsi/source.py:647-669). Out of the
analytic path — a driver-side (or foreach) side effect wired through the
``get_photo_items_fn`` / ``download_fn`` source hooks.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable


def idempotent_download(
    out_dir: str | Path,
    fetch_bytes: Callable[[str], bytes],
) -> Callable[[tuple[str, str]], Path | None]:
    """Build a ``download_fn`` for SourceDefinition.

    Items are ``(url, relative_path)`` tuples; existing files are skipped
    (re-runs are free), writes are tmp-then-rename atomic.
    """
    base = Path(out_dir)

    def download(item: tuple[str, str]) -> Path | None:
        url, rel = item
        dest = base / rel
        if dest.exists():
            return None  # idempotent skip (reference :652-655)
        dest.parent.mkdir(parents=True, exist_ok=True)
        tmp = dest.with_suffix(dest.suffix + ".tmp")
        tmp.write_bytes(fetch_bytes(url))
        tmp.rename(dest)
        return dest

    return download
