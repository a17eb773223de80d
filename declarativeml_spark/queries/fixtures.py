"""Marker-gated on-disk fixtures for file-connector queries.

Some registered queries exercise a WRITE → list → READ path (media
files, ORC/CSV/partitioned-parquet round trips). The fixture side —
materializing a bounded, deterministic file set — must run exactly
once per distinct content so bench / verify / the determinism
double-run reuse the files instead of rewriting them, and so a
constant change in a future round can never silently reuse a stale
directory (the key hashes every parameter that defines the content).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable


def fixture_dir(tag: str, key_parts: str, writer: Callable[[str], None]) -> str:
    """Return a temp directory holding the fixture for
    ``(tag, key_parts)``, invoking ``writer(dir)`` only when its
    ``_COMPLETE`` marker is absent.

    ``key_parts`` must encode EVERYTHING that determines the files'
    content (sf_dir, subset modulus, column list, row cap, …): the
    directory is content-addressed, so an un-keyed parameter change
    would reuse a stale fixture and fail the oracle gate with no
    visible cause in the diff.
    """
    key = hashlib.sha1(key_parts.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"declml_fix_{tag}_{key}")
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        writer(d)
        with open(marker, "w") as f:
            f.write("ok")
    return d
