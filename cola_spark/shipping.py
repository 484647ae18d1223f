"""Package self-shipping — the Spark analogue of cola's job-code push.

The reference zips the job directory and pushes it to master/workers
over a socket (cola/core/zip.py ZipHandler ~L1-60,
cola/core/rpc/__init__.py FileTransportServer/Client ~L40-120). On
Spark the same capability is ``spark-submit --py-files engine.zip``
(the north rule names it explicitly); for sessions created
programmatically we build the zip once and ``sc.addPyFile`` it so
executor Python workers can import ``cola_spark`` regardless of cwd.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_PKG_ROOT = os.path.dirname(os.path.abspath(__file__))


def build_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the cola_spark package for --py-files / addPyFile."""
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(), "cola_spark_pyfiles.zip")
    tmp = dest + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(_PKG_ROOT):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                rel = os.path.join("cola_spark", os.path.relpath(full, _PKG_ROOT))
                zf.write(full, rel)
    os.replace(tmp, dest)
    return dest


def ship_package(spark) -> str:
    """Attach the package zip to a live session (idempotent)."""
    path = build_pyfiles_zip()
    spark.sparkContext.addPyFile(path)
    return path
