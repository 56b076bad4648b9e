"""Manifest-based table versions — time travel from first principles.

The lakehouse trick that makes :func:`~.writers.compact_files` and
:func:`~.writers.delete_rows` safe in production is that a "table" is
a MANIFEST (the list of data files making up a version), not a
directory: maintenance writes new files to the side, then commits a
new manifest; readers pin a version and never see a half-rewritten
table; old versions stay readable until vacuumed (Delta/Iceberg do
exactly this, with manifest spill-out past ~millions of files).

This is the minimal filesystem-portable version of that contract:

- ``<root>/_manifests/v000001.json`` … — one JSON per version, listing
  absolute data-file paths + sizes + a note. Written through the
  Hadoop FileSystem API (works on HDFS/object stores, not just local).
- Commit is O(files) driver-side metadata, the same scale any planner
  pays to list the directory. Monotonic version numbers; the largest
  N is the current table.
- ``read_version`` hands Spark the pinned file list — the scan reads
  exactly those files, so a version is immutable even while newer
  maintenance runs.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _manifest_dir(root: str) -> str:
    return root.rstrip("/") + "/_manifests"


def list_versions(spark: SparkSession, table_root: str) -> list[int]:
    fs, mdir, _ = _fs_and_path(spark, _manifest_dir(table_root))
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def commit_version(
    spark: SparkSession,
    table_root: str,
    data_dir: str,
    note: str = "",
    fmt: str = "parquet",
) -> int:
    """Record ``data_dir``'s current data files as the next version of
    the table at ``table_root``. Returns the new version number."""
    from data_integration_and_harmonization_spark.sources.writers import (
        list_data_files,
    )

    files = list_data_files(spark, data_dir)
    version = (list_versions(spark, table_root) or [0])[-1] + 1
    doc = {
        "version": version,
        "format": fmt,
        "note": note,
        "files": [{"path": p, "bytes": b} for p, b in sorted(files)],
    }
    fs, mdir, jvm = _fs_and_path(spark, _manifest_dir(table_root))
    fs.mkdirs(mdir)
    target = jvm.org.apache.hadoop.fs.Path(
        _manifest_dir(table_root) + f"/v{version:06d}.json"
    )
    out = fs.create(target, False)  # no overwrite: a version is immutable
    try:
        out.write(bytearray(json.dumps(doc).encode("utf-8")))
    finally:
        out.close()
    return version


def read_manifest(spark: SparkSession, table_root: str, version: int | None = None) -> dict:
    versions = list_versions(spark, table_root)
    if not versions:
        raise FileNotFoundError(f"no manifests under {table_root}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions}")
    # one tiny JSON file, read through Spark itself (wholeTextFiles
    # goes through the same Hadoop FS layer — no extra jars assumed)
    mpath = _manifest_dir(table_root) + f"/v{v:06d}.json"
    (_, text), = spark.sparkContext.wholeTextFiles(mpath).collect()
    return json.loads(text)


def vacuum(
    spark: SparkSession,
    table_root: str,
    keep_versions: list[int] | None = None,
) -> dict:
    """Retention: physically delete data files referenced ONLY by
    versions outside ``keep_versions`` (default: keep the latest), and
    drop the vacuumed manifests. Files shared with a kept version —
    e.g. everything ``delete_rows`` carried over untouched — survive,
    exactly like Delta's VACUUM.

    Driver-side FS metadata work, O(files across versions); nothing
    scans data. Returns {"deleted": [paths], "kept_versions": [...]}.
    """
    versions = list_versions(spark, table_root)
    if not versions:
        return {"deleted": [], "kept_versions": []}
    keep = sorted(set(keep_versions if keep_versions is not None else versions[-1:]))
    missing = [v for v in keep if v not in versions]
    if missing:
        raise FileNotFoundError(f"keep_versions {missing} not in {versions}")
    referenced: set[str] = set()
    for v in keep:
        referenced |= {f["path"] for f in read_manifest(spark, table_root, v)["files"]}
    doomed: set[str] = set()
    for v in versions:
        if v in keep:
            continue
        doomed |= {
            f["path"] for f in read_manifest(spark, table_root, v)["files"]
        }
    doomed -= referenced
    fs, _, jvm = _fs_and_path(spark, table_root)
    HPath = jvm.org.apache.hadoop.fs.Path
    for p in sorted(doomed):
        fs.delete(HPath(p), False)
    for v in versions:
        if v not in keep:
            fs.delete(HPath(_manifest_dir(table_root) + f"/v{v:06d}.json"), False)
    return {"deleted": sorted(doomed), "kept_versions": keep}


def read_version(
    spark: SparkSession, table_root: str, version: int | None = None
) -> DataFrame:
    """The pinned-version scan: exactly the manifest's files, immune to
    any maintenance committed after this version."""
    doc = read_manifest(spark, table_root, version)
    paths = [f["path"] for f in doc["files"]]
    if not paths:
        raise ValueError(f"version {doc['version']} has no data files")
    return spark.read.format(doc.get("format", "parquet")).load(paths)
