"""Shared batch-store protocol helpers.

Several engine components persist incrementally-growing side state as
``store_path/batch-NNNNNN-<suffix>/`` subdirectories committed by a
``_SUCCESS`` marker (the near-dup signature store, the exact-dedup
fingerprint store, the sketch-profile store). The listing rule is one
protocol and used to live as four inline copies that could drift —
this module is the single implementation.

Listings go through the Hadoop FileSystem API so remote stores
(hdfs://, s3a://) behave identically to local paths; a driver-local
``os.listdir`` would silently see no store and re-admit every
duplicate forever. Directories without ``_SUCCESS`` (a crashed
writer) are invisible, the same way Spark's own committers ignore
uncommitted task output.
"""

from __future__ import annotations


def store_fs(spark, store_path: str):
    """(jvm, fs, root_path) handles for a store path."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(store_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, root


def complete_batches(spark, store_path: str) -> list[str]:
    """Sorted list of the store's COMPLETE batch subdirectories."""
    jvm, fs, root = store_fs(spark, store_path)
    out: list[str] = []
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if (
                st.isDirectory()
                and name.startswith("batch-")
                and fs.exists(
                    jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
                )
            ):
                out.append(st.getPath().toString())
    out.sort()
    return out
