"""Loader for the from-spec protobuf runtime shim (_protoshim/).

pyspark's transformWithStateInPandas talks to the JVM state server via
protobuf messages (`pyspark.sql.streaming.proto.StateMessage_pb2`),
whose generated code needs the `google.protobuf` runtime — absent in
this sandbox, which kept the Spark-4 stateful API permanently
environment-gated (r18 verdict item 4). The shim implements exactly the
runtime surface that generated module exercises, from the public wire
format + descriptor.proto documentation (see _shim_impl.py).

Two delivery paths, both handled here:
  driver  — prepend the shim dir to sys.path (only when the real
            runtime is missing; the real wheel always wins);
  workers — the state clients run inside Spark's python workers, so the
            shim ships as an addPyFile zip (workers prepend py-files to
            sys.path before deserializing the UDF).
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile

_SHIM_DIR = os.path.join(os.path.dirname(__file__), "_protoshim")


def _have_real_runtime() -> bool:
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False
    return not getattr(
        sys.modules["google.protobuf"], "_SPARK_GRAFT_SHIM", False
    )


def _build_zip() -> str:
    """Zip the google/ tree for addPyFile. Content-addressed name so a
    shim edit mid-session ships fresh bytes instead of hitting Spark's
    same-filename-already-registered cache."""
    import hashlib

    h = hashlib.sha256()
    files = []
    for root, _dirs, names in sorted(os.walk(_SHIM_DIR)):
        for n in sorted(names):
            if n.endswith(".py"):
                p = os.path.join(root, n)
                files.append(p)
                with open(p, "rb") as fh:
                    h.update(p.encode())
                    h.update(fh.read())
    out = os.path.join(
        tempfile.gettempdir(), f"spark_graft_protoshim_{h.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for p in files:
                zf.write(p, os.path.relpath(p, _SHIM_DIR))
        os.replace(tmp, out)
    return out


def ensure_protobuf_env() -> str:
    """Export the shim onto PYTHONPATH for python processes the JVM
    will spawn LATER (the transformWithStateInPandas driver worker gets
    its sys.path from the JVM's PYTHONPATH env var, not from addPyFile).
    Must run before the SparkSession/JVM is created to cover that
    worker. Returns 'real' or 'shim'."""
    if _have_real_runtime():
        return "real"
    parts = os.environ.get("PYTHONPATH", "")
    if _SHIM_DIR not in parts.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _SHIM_DIR + (os.pathsep + parts if parts else "")
        )
    return "shim"


def ensure_protobuf_runtime(spark=None) -> str:
    """Make `google.protobuf` importable; returns 'real' or 'shim'.

    With a live SparkSession, also ships the shim to python workers
    (idempotent per session). Call before starting any
    transformWithStateInPandas query."""
    if _have_real_runtime():
        return "real"
    if _SHIM_DIR not in sys.path:
        sys.path.insert(0, _SHIM_DIR)
    ensure_protobuf_env()  # future JVMs' spawned workers
    import google.protobuf  # noqa: F401  (validates the shim imports)

    if spark is not None:
        sc = spark.sparkContext
        zpath = _build_zip()
        shipped = getattr(sc, "_spark_graft_protoshim", None)
        if shipped != zpath:
            sc.addPyFile(zpath)
            sc._spark_graft_protoshim = zpath
    return "shim"
