"""Spark 4 Python DataSource: distributed xlsx corpus scan.

The engine's S2 Excel bridge (``readers._read_excel_driver_side``,
ref:172-173) is deliberately driver-side — the reference only ever
sees one uploaded workbook, and dtype-inference parity with
``pd.read_excel`` is what its oracle pins. That shape does NOT scale
to a CORPUS of workbooks (a drop-zone of thousands of exported
spreadsheets is a normal ingestion source at 100 TB): every byte
would funnel through the driver.

This module is the scale path: a Python DataSource (the public
``pyspark.sql.datasource`` API, new in Spark 4) registered under the
format name ``xlsx_corpus``. One input partition per workbook, decode
runs ON THE EXECUTORS with the engine's stdlib ECMA-376 reader
(:mod:`.xlsx` — zipfile + XML, no dependencies to ship), and the scan
parallelizes across however many workbooks match. xlsx is a zip
container and inherently non-splittable WITHIN a file, so
file-per-partition is the correct granularity (the same one Spark's
own binaryFile source uses).

Schema-on-read contract: every column is ``string`` (plus a
``_src_file`` provenance column), with names taken from the FIRST
matched workbook's header row. Later workbooks align BY NAME —
missing columns read NULL, extra columns are dropped — the same
outer-union-by-name semantics as the engine's harmonizer (U1), which
is the downstream consumer that types these strings with the
coercion family (C1).
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _read_manifest(path: str) -> dict | None:
    """The sink's committed ``_SUCCESS`` manifest for a directory, or
    None when absent / not a directory. A manifest that EXISTS but
    fails to parse raises: the commit path writes it atomically
    (temp + ``os.replace``), so a torn file signals real corruption —
    silently falling back to a glob would serve exactly the
    torn/speculative parts the manifest exists to exclude."""
    import json

    marker = os.path.join(path, "_SUCCESS")
    if not (os.path.isdir(path) and os.path.exists(marker)):
        return None
    try:
        with open(marker) as fh:
            m = json.load(fh)
    except (OSError, ValueError) as e:
        raise ValueError(
            f"xlsx_corpus: manifest {marker!r} exists but is unreadable "
            f"({e}) — refusing the glob fallback, which could serve "
            "uncommitted part files"
        ) from e
    if not (isinstance(m, dict) and "files" in m and "columns" in m):
        raise ValueError(
            f"xlsx_corpus: manifest {marker!r} parsed but lacks the "
            "files/columns keys — not a corpus manifest"
        )
    return m


def _matched_paths(path: str) -> tuple[list[str], list[str] | None]:
    """(workbook paths, committed columns or None).

    A directory carrying the sink's manifest is read through it: ONLY
    committed parts are served — a crashed or speculative task attempt
    may have left torn/duplicate .xlsx files on disk, and a glob would
    serve them as data. The manifest also carries the column list, so
    an EMPTY committed corpus still has a schema. Plain directories
    and globs (workbooks from outside the sink) fall back to matching
    files directly."""
    m = _read_manifest(path)
    if m is not None:
        return [os.path.join(path, f) for f in m["files"]], list(m["columns"])
    if os.path.isdir(path):
        pattern = os.path.join(path, "*.xlsx")
    else:
        pattern = path
    paths = sorted(_glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(f"no workbooks match {path!r}")
    return paths, None


def _render(v: object) -> str | None:
    """Canonical string form of a parsed cell (schema-on-read: typing
    is the coercion family's job downstream). Floats that carry an
    integral value render without the trailing '.0' so int-typed and
    float-typed exports of the same figure agree."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


class _WorkbookPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class XlsxCorpusReader(DataSourceReader):
    def __init__(self, schema: T.StructType, paths: Sequence[str]) -> None:
        self._schema = schema
        self._paths = list(paths)

    def partitions(self) -> Sequence[InputPartition]:
        return [_WorkbookPartition(p) for p in self._paths]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if partition is None:  # empty corpus: partitions() returned []
            return
        # executor-side: stdlib decode of ONE workbook
        from data_integration_and_harmonization_spark.sources.xlsx import read_xlsx

        header, rows = read_xlsx(partition.path)
        idx = {c: i for i, c in enumerate(header)}
        cols = [f.name for f in self._schema.fields[:-1]]  # minus _src_file
        src = os.path.basename(partition.path)
        for r in rows:
            yield tuple(
                _render(r[idx[c]]) if c in idx else None for c in cols
            ) + (src,)


class XlsxCorpusDataSource(DataSource):
    """``spark.read.format("xlsx_corpus").load(path_or_glob_or_dir)``."""

    @classmethod
    def name(cls) -> str:
        return "xlsx_corpus"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("xlsx_corpus requires a path (file, glob or dir)")
        return p

    def schema(self) -> T.StructType:
        # manifest-committed corpora carry their column list; otherwise
        # the driver reads ONE header row of the first workbook
        # (read_xlsx_header stops the sheet parse after row 1 — never
        # the full cell grid) — the only driver-side byte touch in the
        # whole scan
        paths, cols = _matched_paths(self._path())
        if cols is None:
            from data_integration_and_harmonization_spark.sources.xlsx import (
                read_xlsx_header,
            )

            cols = read_xlsx_header(paths[0])
        return T.StructType(
            [T.StructField(c, T.StringType(), True) for c in cols]
            + [T.StructField("_src_file", T.StringType(), False)]
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return XlsxCorpusReader(schema, _matched_paths(self._path())[0])

    def writer(self, schema: T.StructType, overwrite: bool) -> "XlsxCorpusWriter":
        # Python data sources support Append and Overwrite only (the
        # API rejects ErrorIfExists/Ignore before reaching here):
        # overwrite REPLACES the committed corpus, but destruction is
        # DEFERRED to commit() — new parts (uuid-named, so they never
        # collide with the old ones) are written alongside the prior
        # corpus, the manifest is atomically swapped to name only the
        # new parts, and only then are the old parts removed. A failed
        # or aborted overwrite therefore leaves the prior committed
        # corpus fully readable. Append adds parts and the commit
        # merges the manifest — after checking the columns agree,
        # since a part written under a different header would silently
        # read as misaligned NULLs.
        if "_src_file" in [f.name for f in schema.fields]:
            raise ValueError(
                "xlsx_corpus sink: drop the _src_file column before writing "
                "— it is the read side's provenance column and would "
                "collide on read-back"
            )
        path = self._path()
        os.makedirs(path, exist_ok=True)
        if not overwrite:
            m = _read_manifest(path)
            if m is not None and list(m["columns"]) != [f.name for f in schema.fields]:
                raise ValueError(
                    "xlsx_corpus append: column mismatch with the committed "
                    f"corpus — existing {m['columns']}, appending "
                    f"{[f.name for f in schema.fields]}"
                )
        return XlsxCorpusWriter(schema, path, overwrite=overwrite)


def register_xlsx_corpus(spark: SparkSession) -> None:
    """Idempotent registration of the corpus source on a session."""
    spark.dataSource.register(XlsxCorpusDataSource)


def read_xlsx_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Distributed scan of an xlsx corpus: one executor partition per
    workbook, stdlib decode, all-string schema + ``_src_file``."""
    register_xlsx_corpus(spark)
    return spark.read.format("xlsx_corpus").load(path)


def write_xlsx_corpus(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed xlsx SINK: one workbook per non-empty partition,
    encoded executor-side, with a driver-committed ``_SUCCESS``
    manifest naming the parts. The export shape for handing query
    results back to spreadsheet consumers — the reverse of the
    reference's upload-a-workbook front door. Local/shared-FS paths
    (the stdlib encoder writes with plain ``open``)."""
    register_xlsx_corpus(df.sparkSession)
    df.write.format("xlsx_corpus").mode(mode).save(path)


# ----------------------------------------------------------- the sink


from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _XlsxCommit(WriterCommitMessage):
    file: str | None = None
    n_rows: int = 0


class XlsxCorpusWriter(DataSourceWriter):
    """One workbook per NON-EMPTY partition, written executor-side
    with the stdlib ECMA-376 encoder; empty partitions write nothing
    (the empty-batch-dir lesson from the dedup stores). The driver's
    ``commit`` writes a ``_SUCCESS`` manifest naming every part —
    readers that care about torn writes can check it; ``abort``
    removes whatever partial parts reported back."""

    def __init__(
        self, schema: T.StructType, path: str, overwrite: bool = False
    ) -> None:
        self._cols = [f.name for f in schema.fields]
        self._path = path
        self._overwrite = overwrite

    def write(self, iterator) -> _XlsxCommit:
        from pyspark import TaskContext

        from data_integration_and_harmonization_spark.sources.xlsx import write_xlsx

        rows = []
        for row in iterator:
            rows.append([
                v if isinstance(v, (int, float, bool, str)) or v is None
                else str(v)
                for v in row
            ])
        if not rows:
            return _XlsxCommit(None, 0)
        import uuid

        ctx = TaskContext.get()
        # uuid, not taskAttemptId: attempt ids restart per application,
        # and a retried/speculative attempt must never reuse a name the
        # committed manifest might already carry
        name = f"part-{ctx.partitionId():05d}-{uuid.uuid4().hex[:8]}.xlsx"
        write_xlsx(os.path.join(self._path, name), self._cols, rows)
        return _XlsxCommit(name, len(rows))

    def commit(self, messages) -> None:
        # only files whose tasks REPORTED BACK are committed — a
        # crashed or speculative attempt's torn workbook stays on disk
        # but outside the manifest, and manifest-aware reads never
        # serve it. The manifest itself lands atomically (temp file in
        # the same directory + os.replace): a driver crash mid-commit
        # leaves either the prior manifest or the new one, never a
        # torn JSON that would force readers onto the glob fallback.
        import json
        import tempfile

        files = {m.file for m in messages if m and m.file}
        prior = _read_manifest(self._path)
        if prior is not None and not self._overwrite:
            files.update(prior["files"])  # append job: merge the manifest
        fd, tmp = tempfile.mkstemp(
            prefix="._SUCCESS.", dir=self._path, text=True
        )
        with os.fdopen(fd, "w") as fh:
            json.dump({"columns": self._cols, "files": sorted(files)}, fh)
        os.replace(tmp, os.path.join(self._path, "_SUCCESS"))
        if self._overwrite and prior is not None:
            # the swap above is the commit point: prior parts are now
            # unreferenced, and removing them is pure housekeeping —
            # a crash mid-sweep leaves orphan files the manifest never
            # serves
            for f in set(prior["files"]) - files:
                try:
                    os.remove(os.path.join(self._path, f))
                except OSError:
                    pass

    def abort(self, messages) -> None:
        for m in messages:
            if m and m.file:
                try:
                    os.remove(os.path.join(self._path, m.file))
                except OSError:
                    pass
