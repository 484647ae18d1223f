"""Driver-side state IO seam — the adapter SURVEY §1.2 promises.

The scheduler's per-round commit protocol (manifest read/atomic-write,
delta-directory listing, compaction rename-commit, vacuum) is a small
set of filesystem primitives. Inlining `os`/`glob`/`shutil` calls in
the loop would hard-wire a driver-local POSIX filesystem — the first
thing that breaks on a real cluster, where the workdir is an HDFS/S3
path and the manifest commit becomes an Iceberg snapshot commit.

This module is that seam: `StateIO` is the minimal interface the
scheduler and maintenance jobs need; `LocalStateIO` is the POSIX
implementation used in tests and on local[k]. A production deployment
swaps in an implementation backed by the Hadoop FileSystem API
(reachable without new dependencies via
``spark._jvm.org.apache.hadoop.fs.FileSystem``) or an Iceberg catalog:
`write_text_atomic` maps onto a rename-based commit (HDFS) or a
catalog snapshot commit (Iceberg), `list_dirs` onto FileSystem.globStatus
or snapshot manifests. Spark's own parquet reads/writes already speak
any Hadoop-compatible URI, so the DataFrame side needs no adapter.

Atomicity contract (what the crash-safety protocol relies on):
  * ``write_text_atomic`` — readers see the old or the new content,
    never a torn write;
  * ``rename`` — all-or-nothing publication of a prepared directory;
  * ``remove_dir`` — only ever called on state a committed
    manifest/compaction no longer references.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil


class StateIO:
    """Interface for driver-side state/metadata IO (see module doc)."""

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_text_atomic(self, path: str, data: str) -> None:
        raise NotImplementedError

    def list_dirs(self, pattern: str) -> list[str]:
        """Glob-style listing; returns sorted paths."""
        raise NotImplementedError

    def remove_dir(self, path: str) -> None:
        """Remove a directory tree; missing paths are not an error."""
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        """Atomic rename-commit of a prepared directory."""
        raise NotImplementedError

    # ---- json convenience built on the primitives ----
    def read_json(self, path: str) -> dict | None:
        if not self.exists(path):
            return None
        return json.loads(self.read_text(path))

    def write_json_atomic(self, path: str, obj: dict) -> None:
        self.write_text_atomic(path, json.dumps(obj, indent=1))


class LocalStateIO(StateIO):
    """POSIX implementation (local[k], tests)."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, data: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def list_dirs(self, pattern: str) -> list[str]:
        return sorted(_glob.glob(pattern))

    def remove_dir(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)


DEFAULT_IO = LocalStateIO()
