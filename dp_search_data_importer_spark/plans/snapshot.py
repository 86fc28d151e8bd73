"""Index snapshot / restore — the ES ``_snapshot`` + ``_restore`` twin.

A snapshot is a self-verifying copy of a stored index: every file is
copied into ``snapshots_root/<name>/`` and its sha256 recorded in
``SNAPSHOT.json``, which is written LAST (the commit marker — a snapshot
directory without it is an aborted attempt and is never restorable).
Restore verifies every checksum before declaring success, so silent
bit rot in cold storage is caught at restore time, not at query time.

The source is made commit-consistent first (``recover_for_read`` rolls
any interrupted incremental-upsert commit forward), and live mutation
markers (``_COMMIT.lock``, ``_upsert_stage``, backups) are excluded —
a snapshot captures exactly the readable index state.

Scale note: this is the METADATA/protocol layer. The per-file copy loop
runs wherever the snapshot runs (driver or an external tool); at real
scale the same manifest protocol applies with the copies delegated to
bulk storage tooling (distcp-style), since parquet files are immutable
once written — the checksums are computed from the stream during copy,
one pass per file.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

_MANIFEST = "SNAPSHOT.json"
_EXCLUDE_PREFIXES = ("_old_", "_upsert_stage", "_COMMIT", "_reindex_ids")


def _files(index_dir: str) -> list[str]:
    out = []
    for root, dirs, files in os.walk(index_dir):
        rel_root = os.path.relpath(root, index_dir)
        parts = [] if rel_root == "." else rel_root.split(os.sep)
        if parts and parts[0].startswith(_EXCLUDE_PREFIXES):
            dirs[:] = []
            continue
        for f in files:
            if f.startswith(_EXCLUDE_PREFIXES):
                continue
            rel = f if rel_root == "." else os.path.join(rel_root, f)
            out.append(rel)
    return sorted(out)


def _copy_with_sha(src: str, dst: str) -> str:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    h = hashlib.sha256()
    with open(src, "rb") as fi, open(dst, "wb") as fo:
        while True:
            chunk = fi.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
            fo.write(chunk)
    return h.hexdigest()


def _sha(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()


def snapshot(index_dir: str, snapshots_root: str, name: str) -> dict:
    """Snapshot ``index_dir`` as ``snapshots_root/name``. Returns the
    manifest dict. Refuses an existing completed snapshot of the same
    name; an aborted attempt (dir without SNAPSHOT.json) is replaced."""
    from dp_search_data_importer_spark.plans.update_index import (
        recover_for_read,
    )

    dst = os.path.join(snapshots_root, name)
    if os.path.exists(os.path.join(dst, _MANIFEST)):
        raise ValueError(f"snapshot already exists: {name}")
    recover_for_read(index_dir)  # capture a commit-consistent state
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    shas = {rel: _copy_with_sha(os.path.join(index_dir, rel),
                                os.path.join(dst, rel))
            for rel in _files(index_dir)}
    if "stats.json" not in shas:
        raise ValueError(f"not an index (no stats.json): {index_dir}")
    manifest = {"name": name, "files": shas, "n_files": len(shas)}
    tmp = os.path.join(dst, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(dst, _MANIFEST))  # commit marker, last
    return manifest


def verify_snapshot(snapshots_root: str, name: str) -> dict:
    """Re-checksum every file against the manifest. Returns
    {ok, n_files, corrupt: [...], missing: [...]}."""
    dst = os.path.join(snapshots_root, name)
    mpath = os.path.join(dst, _MANIFEST)
    if not os.path.exists(mpath):
        raise ValueError(f"no completed snapshot named {name!r}")
    with open(mpath) as f:
        manifest = json.load(f)
    corrupt, missing = [], []
    for rel, want in sorted(manifest["files"].items()):
        p = os.path.join(dst, rel)
        if not os.path.exists(p):
            missing.append(rel)
        elif _sha(p) != want:
            corrupt.append(rel)
    return {"ok": not corrupt and not missing,
            "n_files": manifest["n_files"],
            "corrupt": corrupt, "missing": missing}


def restore(snapshots_root: str, name: str, dst_dir: str) -> dict:
    """Restore a snapshot into a NEW index directory, verifying every
    checksum during the copy — a corrupt or truncated snapshot never
    materializes as a live index (the partial restore is removed)."""
    src = os.path.join(snapshots_root, name)
    mpath = os.path.join(src, _MANIFEST)
    if not os.path.exists(mpath):
        raise ValueError(f"no completed snapshot named {name!r}")
    if os.path.exists(os.path.join(dst_dir, "stats.json")):
        raise ValueError(f"destination already holds an index: {dst_dir}")
    with open(mpath) as f:
        manifest = json.load(f)
    os.makedirs(dst_dir, exist_ok=True)
    try:
        for rel, want in sorted(manifest["files"].items()):
            got = _copy_with_sha(os.path.join(src, rel),
                                 os.path.join(dst_dir, rel))
            if got != want:
                raise ValueError(
                    f"checksum mismatch restoring {rel!r}: snapshot "
                    f"{name!r} is corrupt")
    except Exception:
        shutil.rmtree(dst_dir, ignore_errors=True)
        raise
    return {"restored": manifest["n_files"], "dst": dst_dir}
