"""Deterministic on-disk locations for session-built index artifacts.

The text, IVF/ANN, and PQ index builders all persist derived tables
(bucketed postings, partition-pruned vector/code tables). Earlier rounds
wrote each under a fresh ``tempfile.mkdtemp`` with no cleanup, so every
session leaked a directory and a long-lived app could never refresh after
source data changed (ADVICE r03). Instead: one deterministic root per
(kind, sf_dir) under the system temp dir — a rebuild overwrite-replaces in
place (every writer uses mode("overwrite")), successive sessions reuse the
same path instead of accreting new ones, and the per-session in-memory
caches still key on (applicationId, sf_dir) so a new session rebuilds from
current source data.

At 100 TB the analogous root is a warehouse/object-store prefix per
(index kind, dataset version) with the same overwrite-replace discipline —
the reference's saveAsTable-into-warehouse layout (DataFrameWriter.scala).
"""

from __future__ import annotations

import getpass
import hashlib
import os
import stat as stat_mod
import tempfile
from pathlib import Path


def _assert_secure_dir(path: Path) -> None:
    """tempfile-style secure-dir check (ADVICE r05): mkdir(exist_ok=True)
    on a predictable /tmp path accepts a pre-existing attacker-created
    directory or symlink. lstat (never following a symlink) and require a
    real directory owned by the current uid with no group/other access —
    raising RuntimeError otherwise, exactly like tempfile's _mkstemp_inner
    rejects unsafe candidate dirs."""
    st = os.lstat(path)
    if not stat_mod.S_ISDIR(st.st_mode):
        raise RuntimeError(f"index store base {path} is not a directory")
    if hasattr(os, "getuid") and st.st_uid != os.getuid():
        raise RuntimeError(
            f"index store base {path} is owned by uid {st.st_uid}, "
            f"not the current user — refusing a pre-created directory"
        )
    if stat_mod.S_IMODE(st.st_mode) & 0o077:
        raise RuntimeError(
            f"index store base {path} is group/other-accessible "
            f"(mode {oct(stat_mod.S_IMODE(st.st_mode))}); expected 0700"
        )


def index_store_root(kind: str, sf_dir: str) -> str:
    """Stable local path for a persisted index of `kind` over `sf_dir`.

    Same (user, kind, sf_dir) → same path, created on first use; callers
    write with mode("overwrite") so re-use across sessions replaces rather
    than duplicates. The base dir is scoped per-user, created with mode
    0700, and verified post-mkdir with a tempfile-style ownership/symlink/
    mode check (ADVICE r04+r05: a world-predictable shared-/tmp path is a
    cross-user race and a pre-creation/symlink hazard; mkdir(exist_ok=True)
    alone would silently adopt an attacker's pre-created dir)."""
    try:
        user = getpass.getuser()
    except Exception:  # no passwd entry (containers) — fall back to uid
        user = str(os.getuid()) if hasattr(os, "getuid") else "nouser"
    base = Path(tempfile.gettempdir()) / f"sftq_indexes_{user}"
    base.mkdir(mode=0o700, parents=True, exist_ok=True)
    _assert_secure_dir(base)
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = base / f"{kind}_{digest}"
    root.mkdir(parents=True, exist_ok=True)
    return str(root)
