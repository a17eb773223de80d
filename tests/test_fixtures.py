"""fixture_dir install semantics (queries/fixtures.py).

The r9 review hardened the cross-process story: writers stage into a
private directory and install by atomic rename; stale partial
directories are CLAIMED by rename (never rmtree'd in place) and a
freshly-installed complete copy is restored, not destroyed. These
tests pin the single-process-visible contracts of that machinery.
"""

from __future__ import annotations

import os
import time

import pytest

from declarativeml_spark.queries.fixtures import fixture_dir


def _writer(payload: str):
    def write(d: str) -> None:
        with open(os.path.join(d, "data.txt"), "w") as f:
            f.write(payload)

    return write


def test_fixture_dir_writes_once_and_reuses(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # re-read TMPDIR
    try:
        calls = []

        def write(d):
            calls.append(d)
            _writer("v1")(d)

        d1 = fixture_dir("t1", "k1", write)
        d2 = fixture_dir("t1", "k1", write)
        assert d1 == d2
        assert len(calls) == 1  # second call served from the marker
        assert open(os.path.join(d1, "data.txt")).read() == "v1"
        assert os.path.exists(os.path.join(d1, "_COMPLETE"))
    finally:
        tempfile.tempdir = None


def test_fixture_dir_distinct_keys_distinct_dirs(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        a = fixture_dir("t2", "ka", _writer("a"))
        b = fixture_dir("t2", "kb", _writer("b"))
        assert a != b
        assert open(os.path.join(a, "data.txt")).read() == "a"
        assert open(os.path.join(b, "data.txt")).read() == "b"
    finally:
        tempfile.tempdir = None


def test_fixture_dir_replaces_stale_partial(tmp_path, monkeypatch):
    """A directory at the target WITHOUT its marker is a crashed
    writer's leftover — it must be claimed and replaced, and the new
    content served."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import hashlib
    import tempfile

    tempfile.tempdir = None
    try:
        key = hashlib.sha1(b"k3").hexdigest()[:12]
        stale = tmp_path / f"declml_fix_t3_{key}"
        stale.mkdir()
        (stale / "data.txt").write_text("half-written garbage")
        # a real crashed-writer leftover is OLD; the claim path age-
        # gates on mtime so a fresh marker-less dir (likely a racing
        # winner mid-install) is never stolen — backdate to qualify
        old = time.time() - 120
        os.utime(stale, (old, old))
        d = fixture_dir("t3", "k3", _writer("fresh"))
        assert open(os.path.join(d, "data.txt")).read() == "fresh"
        assert os.path.exists(os.path.join(d, "_COMPLETE"))
        # no claim directories left behind
        leftovers = [p for p in os.listdir(tmp_path) if ".claim." in p]
        assert leftovers == []
    finally:
        tempfile.tempdir = None


def test_fixture_dir_age_gates_fresh_markerless_dir(tmp_path, monkeypatch):
    """A marker-less directory YOUNGER than the claim age gate might
    be a concurrent winner racing the marker check — it must not be
    renamed away immediately (that would transiently unlink a fixture
    the winner's Spark job may be reading). The caller instead WAITS
    out the gate; if no marker appears (so it really was a crashed
    writer's fresh partial), it is then claimed and rebuilt — a
    recovery, not a hard error."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import hashlib
    import tempfile

    from declarativeml_spark.queries.fixtures import _CLAIM_MIN_AGE_S

    tempfile.tempdir = None
    try:
        key = hashlib.sha1(b"k3f").hexdigest()[:12]
        fresh = tmp_path / f"declml_fix_t3f_{key}"
        fresh.mkdir()
        (fresh / "data.txt").write_text("crashed writer fresh partial")
        t0 = time.monotonic()
        d = fixture_dir("t3f", "k3f", _writer("rebuilt"))
        elapsed = time.monotonic() - t0
        # recovered with fresh content, but only after bridging the gate
        assert open(os.path.join(d, "data.txt")).read() == "rebuilt"
        assert elapsed >= _CLAIM_MIN_AGE_S * 0.8, elapsed
        assert not [p for p in os.listdir(tmp_path) if ".claim." in p]
    finally:
        tempfile.tempdir = None


def test_fixture_dir_installs_world_readable(tmp_path, monkeypatch):
    """mkdtemp stages at 0700; the installed fixture is a SHARED
    content-addressed cache, so the rename must publish a dir other
    OS users can traverse (else a second user's marker stat fails and
    the fixture hard-errors instead of being reused)."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import stat
    import tempfile

    tempfile.tempdir = None
    try:
        d = fixture_dir("t3p", "k3p", _writer("x"))
        mode = stat.S_IMODE(os.stat(d).st_mode)
        assert mode & stat.S_IROTH, f"installed mode {oct(mode)} lacks o+r"
        assert mode & stat.S_IXOTH, f"installed mode {oct(mode)} lacks o+x"
    finally:
        tempfile.tempdir = None


def test_fixture_dir_never_destroys_complete_dir(tmp_path, monkeypatch):
    """A COMPLETE directory (marker present) is served as-is — the
    writer must not run and the content must survive byte-for-byte."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import hashlib
    import tempfile

    tempfile.tempdir = None
    try:
        key = hashlib.sha1(b"k4").hexdigest()[:12]
        done = tmp_path / f"declml_fix_t4_{key}"
        done.mkdir()
        (done / "data.txt").write_text("precious")
        (done / "_COMPLETE").write_text("ok")

        def never(d):  # pragma: no cover - must not run
            raise AssertionError("writer ran over a complete fixture")

        d = fixture_dir("t4", "k4", never)
        assert open(os.path.join(d, "data.txt")).read() == "precious"
    finally:
        tempfile.tempdir = None


def test_fixture_dir_writer_failure_leaves_no_install(tmp_path, monkeypatch):
    """A writer that raises must leave neither the target directory
    nor stray staging dirs, and a retry must succeed."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import hashlib
    import tempfile

    tempfile.tempdir = None
    try:
        with pytest.raises(RuntimeError, match="boom"):
            fixture_dir("t5", "k5", lambda d: (_ for _ in ()).throw(RuntimeError("boom")))
        key = hashlib.sha1(b"k5").hexdigest()[:12]
        assert not os.path.exists(tmp_path / f"declml_fix_t5_{key}")
        stray = [p for p in os.listdir(tmp_path) if "declml_stage_t5" in p]
        assert stray == []
        d = fixture_dir("t5", "k5", _writer("recovered"))
        assert open(os.path.join(d, "data.txt")).read() == "recovered"
    finally:
        tempfile.tempdir = None
