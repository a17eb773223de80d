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
import shutil
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

    Cross-process safe: two concurrent sessions (bench + a
    correctness run) may both see the marker missing. The writer
    therefore targets a PRIVATE staging directory which is renamed
    into place atomically (one filesystem, same tempdir) — concurrent
    writers never interleave output inside the served directory, and
    the loser simply discards its staging copy.
    """
    key = hashlib.sha1(key_parts.encode()).hexdigest()[:12]
    base = tempfile.gettempdir()
    d = os.path.join(base, f"declml_fix_{tag}_{key}")
    marker = os.path.join(d, "_COMPLETE")
    if os.path.exists(marker):
        return d

    stage = tempfile.mkdtemp(prefix=f"declml_stage_{tag}_{key}_", dir=base)
    try:
        writer(stage)
        with open(os.path.join(stage, "_COMPLETE"), "w") as f:
            f.write("ok")
        for _ in range(3):
            if os.path.exists(marker):  # a concurrent writer won
                break
            if os.path.isdir(d):
                # stale partial (crashed pre-marker writer): clear it
                # so the rename can land; losing a re-clear race just
                # means another attempt through the loop.
                shutil.rmtree(d, ignore_errors=True)
            try:
                os.rename(stage, d)
                return d
            except OSError:
                continue  # raced: re-check the marker
        if not os.path.exists(marker):
            raise RuntimeError(
                f"fixture_dir could not install {d!r} (persistent"
                " rename race or stale partial directory)"
            )
        return d
    finally:
        shutil.rmtree(stage, ignore_errors=True)
