"""TxnLogTable as a Structured Streaming SOURCE (Delta readStream
parity) via Spark 4's Python Data Source API.

``spark.readStream.format("txnlog").option("path", p).load()`` tails
the commit log: each micro-batch consumes exactly the data files
ADDED by the commits in ``(start_version, end_version]`` — offsets
ARE log versions, so the engine's offset checkpointing composes with
the table's own atomic commits to give exactly-once consumption of an
append-only feed with zero extra bookkeeping (Delta's streaming-source
design; reference ingest loop src/routes/stocks.js:137-142 is the
batch shape this streams).

Scale shape: ``partitions()`` is driver-side METADATA (replaying KB
of JSON per commit — never data); each added file becomes one input
partition, and ``read()`` executes on executors, yielding Arrow
record batches straight from the parquet footer (no Python row
loop). A 10-file commit is a 10-partition micro-batch regardless of
table size.

Change semantics: by default a REMOVE of a data file inside the
consumed range raises (the stream is an append-only contract, same
default as Delta's readStream); ``.option("ignoreChanges", "true")``
relaxes it to adds-only delivery (rewritten files re-emit their rows
— Delta's documented ignoreChanges caveat applies verbatim).
Merge-on-read deletion vectors are metadata files and are never
emitted as rows; a deletion-vector ADD (a deferred delete) raises in
default mode like a remove does, since it drops rows without any
remove action — Delta's readStream fails on DV deletes the same way.

Cited reference behavior: the reference tails its stocks feed by
polling the newest rows (src/routes/stocks.js:42-47); here the table
itself is the replayable feed.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)

_ARROW_TO_DDL = {
    "bool": "boolean",
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
}


def _arrow_field_spark_type(field):
    """Arrow field -> pyspark DataType, PURE PYTHON — the sink's
    driver-side commit runs in a Spark-free worker process where
    ``_parse_datatype_string`` (which needs an active SparkContext)
    is unavailable."""
    import pyspark.sql.types as T

    t = str(field.type)
    simple = {
        "bool": T.BooleanType(),
        "int8": T.ByteType(),
        "int16": T.ShortType(),
        "int32": T.IntegerType(),
        "int64": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "large_string": T.StringType(),
        "binary": T.BinaryType(),
        "large_binary": T.BinaryType(),
        "date32[day]": T.DateType(),
    }
    if t in simple:
        return simple[t]
    if t.startswith("timestamp["):
        return T.TimestampType()
    if t.startswith("decimal128(") or t.startswith("decimal("):
        return T.DecimalType(field.type.precision, field.type.scale)
    if t.startswith("list<") or t.startswith("large_list<"):
        return T.ArrayType(_arrow_field_spark_type(field.type.value_field))
    raise ValueError(
        f"txnlog stream cannot map arrow type {t!r} "
        f"(column {field.name!r})"
    )


def _arrow_field_ddl(field) -> str:
    t = str(field.type)
    if t in _ARROW_TO_DDL:
        return _ARROW_TO_DDL[t]
    if t.startswith("timestamp["):
        return "timestamp"
    if t.startswith("decimal128(") or t.startswith("decimal("):
        return t.replace("decimal128", "decimal")
    if t.startswith("list<") or t.startswith("large_list<"):
        inner = field.type.value_field
        return f"array<{_arrow_field_ddl(inner)}>"
    raise ValueError(
        f"txnlog stream source cannot map arrow type {t!r} "
        f"(column {field.name!r}); pass an explicit .schema(...)"
    )


class _LogView:
    """Driver-side, Spark-free view of a txnlog table's commit log —
    just enough replay to turn version ranges into added-file lists.
    (The full TxnLogTable class needs a SparkSession; the stream
    reader must not.)"""

    def __init__(self, path: str) -> None:
        self.path = path
        self.log_dir = os.path.join(path, "_txn_log")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and not f.endswith(".checkpoint.json")
        )

    def entry(self, v: int) -> dict:
        p = os.path.join(self.log_dir, f"{v:020d}.json")
        with open(p, encoding="utf-8") as f:
            return json.load(f)

    def added_data_files(
        self, after: int, upto: int, ignore_changes: bool
    ) -> list[str]:
        """Absolute paths of data files added in (after, upto]."""
        out: list[str] = []
        for v in range(after + 1, upto + 1):
            entry = self.entry(v)
            for a in entry["actions"]:
                if (
                    "remove" in a
                    and not ignore_changes
                    and not a["remove"]["path"].startswith("_")
                ):
                    raise RuntimeError(
                        f"txnlog stream: version {v} "
                        f"({entry.get('op', '?')}) removed data file "
                        f"{a['remove']['path']!r}; the stream is an "
                        "append-only contract — set "
                        "option('ignoreChanges', 'true') to consume "
                        "adds-only (rewritten rows re-emit)"
                    )
                add = a.get("add")
                if add and add.get("dv") and not ignore_changes:
                    # a deletion-vector ADD is a deferred delete
                    # (delete_keys_deferred commits are add-only: the
                    # DV grows, no data file is removed) — rows vanish
                    # from the table without any remove action, so the
                    # append-only contract must raise here too, exactly
                    # as Delta's readStream fails on DV-based deletes.
                    # (A DV SHRINK — revive — also rewrites/purges a
                    # data file in the same commit, so it already
                    # raises via the remove check above.)
                    raise RuntimeError(
                        f"txnlog stream: version {v} "
                        f"({entry.get('op', '?')}) added deletion "
                        f"vector {add['path']!r} (a deferred delete); "
                        "the stream is an append-only contract — set "
                        "option('ignoreChanges', 'true') to consume "
                        "adds-only (deferred-deleted rows are NOT "
                        "retracted)"
                    )
                if add and not add.get("dv") and add.get("rows"):
                    p = add["path"]
                    out.append(
                        p if os.path.isabs(p) else os.path.join(self.path, p)
                    )
        return out

    def cmap_state(self, upto: int | None = None) -> dict:
        """Column-mapping/protocol state at version ``upto`` (default:
        newest) — TxnLogTable._cmap_at precedence: checkpoint, else
        newest metadata action carrying the field, else default.
        Spark-free."""
        vs = self.versions()
        if upto is not None:
            vs = [v for v in vs if v <= upto]
        for v in reversed(vs):
            ck_path = os.path.join(
                self.log_dir, f"{v:020d}.checkpoint.json"
            )
            if os.path.exists(ck_path):
                with open(ck_path, encoding="utf-8") as f:
                    ck = json.load(f)
                return ck.get(
                    "cmap",
                    {"map": {}, "retired": [], "protocol": {}},
                )
            for a in self.entry(v)["actions"]:
                if "metadata" in a and "cmap" in a["metadata"]:
                    return a["metadata"]["cmap"]
        return {"map": {}, "retired": [], "protocol": {}}

    def logical_schema_json(self, upto: int | None = None) -> dict | None:
        """Logged schema at version ``upto`` (already LOGICAL names),
        or None for a table that never committed a metadata action or
        checkpoint."""
        vs = self.versions()
        if upto is not None:
            vs = [v for v in vs if v <= upto]
        for v in reversed(vs):
            ck_path = os.path.join(
                self.log_dir, f"{v:020d}.checkpoint.json"
            )
            if os.path.exists(ck_path):
                with open(ck_path, encoding="utf-8") as f:
                    ck = json.load(f)
                if "schema" in ck:
                    return ck["schema"]
            for a in self.entry(v)["actions"]:
                if "metadata" in a:
                    return a["metadata"]["schema"]
        return None

    def row_id_bases(self, upto: int | None = None) -> dict[str, int]:
        """relpath -> base row id at version ``upto`` — the same lazy
        assignment as TxnLogTable._row_id_bases (commit-order walk;
        ``rowid_materialized`` adds and re-referenced paths skipped),
        Spark-free so the format reader can ship it to executors as a
        pickled dict."""
        bases: dict[str, int] = {}
        hwm = 0
        vs = self.versions()
        if upto is not None:
            vs = [v for v in vs if v <= upto]
        # seed from the newest checkpoint carrying folded rowid state
        # (TxnLogTable._row_id_bases parity)
        start_idx = 0
        for i in range(len(vs) - 1, -1, -1):
            ck_path = os.path.join(
                self.log_dir, f"{vs[i]:020d}.checkpoint.json"
            )
            if os.path.exists(ck_path):
                with open(ck_path, encoding="utf-8") as f:
                    ck = json.load(f)
                if "rowid" in ck:
                    bases = dict(ck["rowid"]["bases"])
                    hwm = ck["rowid"]["hwm"]
                    start_idx = i + 1
                    break
        for v in vs[start_idx:]:
            for a in self.entry(v)["actions"]:
                add = a.get("add")
                if (
                    not add
                    or add.get("dv")
                    or add.get("rowid_materialized")
                    or add["path"] in bases
                ):
                    continue
                bases[add["path"]] = hwm
                hwm += add.get("rows") or 0
        return bases

    def live_at(self, version: int | None = None):
        """(data_relpaths, dv_relpaths) live at ``version`` — full log
        replay (entries are never deleted, so skipping checkpoints is
        always complete). Spark-free."""
        vs = self.versions()
        if version is not None:
            if version not in vs:
                raise ValueError(f"no such version: {version}")
            vs = [v for v in vs if v <= version]
        live: dict[str, bool] = {}
        for v in vs:
            for a in self.entry(v)["actions"]:
                if "add" in a:
                    live[a["add"]["path"]] = bool(a["add"].get("dv"))
                elif "remove" in a:
                    live.pop(a["remove"]["path"], None)
        data = [p for p, is_dv in live.items() if not is_dv]
        dvs = [p for p, is_dv in live.items() if is_dv]
        return data, dvs

    def version_at(self, timestamp: float) -> int:
        """Newest version whose MONOTONICALLY ADJUSTED commit ts is
        <= ``timestamp`` (TxnLogTable.version_at semantics: each
        effective ts is clamped to predecessor + 1 ms, so skewed
        writer clocks cannot expose a later commit)."""
        vs = self.versions()
        eff: dict[int, float] = {}
        prev = None
        for v in vs:
            ts = float(self.entry(v).get("ts") or 0.0)
            if prev is not None and ts <= prev:
                ts = prev + 0.001
            eff[v] = ts
            prev = ts
        cands = [v for v in vs if eff[v] <= timestamp]
        if not cands:
            raise ValueError(
                f"no version at or before timestamp {timestamp}"
            )
        return max(cands)

    def any_data_file(self) -> str | None:
        live: dict[str, bool] = {}
        for v in self.versions():
            for a in self.entry(v)["actions"]:
                if "add" in a:
                    live[a["add"]["path"]] = not a["add"].get("dv")
                elif "remove" in a:
                    live.pop(a["remove"]["path"], None)
        for p, is_data in live.items():
            if is_data:
                return p if os.path.isabs(p) else os.path.join(self.path, p)
        return None


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _declared_arrow_types(schema) -> dict:
    """{logical field name: declared Arrow type} for null-filling
    fields absent from old-era files (computed driver-side, pickled to
    executors with the reader)."""
    from pyspark.sql.pandas.types import to_arrow_type

    return {f.name: to_arrow_type(f.dataType) for f in schema.fields}


def _project_file_table(table, want, logical_to_phys, arrow_types):
    """Project ONE data file's raw Arrow table (immutable PHYSICAL
    column names on disk) to the logical column list ``want`` — the
    format readers' twin of ``TxnLogTable._scan_files``
    (operators/txnlog.py): resolve each logical name to its PHYSICAL
    name and select by that, so a RETIRED physical column whose name
    happens to equal a re-added logical column can never resurrect the
    dropped era's bytes; null-fill fields absent from files written
    before an add_columns (with the declared Arrow type, matching the
    library path's spark.read.schema null-fill); rename to logical.
    Blind name-based rename+subset — the previous implementation —
    fails BOTH ways: it resurrects dropped bytes on drop+re-add and
    raises DATA_SOURCE_RETURN_SCHEMA_MISMATCH on pre-evolution files
    missing a later-added column."""
    import pyarrow as pa

    cols, fields = [], []
    for lname in want:
        pname = logical_to_phys.get(lname, lname)
        if pname in table.column_names:
            col = table[pname]
            cols.append(col)
            fields.append(pa.field(lname, col.type))
        else:
            t = arrow_types[lname]
            cols.append(pa.nulls(table.num_rows, type=t))
            fields.append(pa.field(lname, t))
    return pa.table(cols, schema=pa.schema(fields))


class TxnLogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema=None) -> None:
        # declared (LOGICAL) column set: after a drop_column the data
        # files still carry the retired physical column, which must be
        # projected away before the batch crosses the Arrow bridge
        self._want = (
            [f.name for f in schema.fields] if schema is not None else None
        )
        self.view = _LogView(options["path"])
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        start = options.get("startingversion")
        self.starting = int(start) if start is not None else None
        # ADMISSION CONTROL (Delta's maxFilesPerTrigger): bound how
        # many data files one micro-batch may ingest. The Python data
        # source API has no SupportsAdmissionControl (latestOffset
        # takes no start), so the bound is applied relative to the
        # engine position this reader has OBSERVED — initialOffset on
        # a fresh stream, then every partitions()/commit() call. On a
        # fresh stream every batch is bounded; after a checkpoint
        # restart the FIRST planned batch is unbounded (the position
        # is only revealed to us when the engine plans it) — the same
        # best-effort caveat Delta documents for trigger-availableNow
        # restarts.
        mft = options.get("maxfilespertrigger")
        self.max_files = int(mft) if mft is not None else 0
        self._pos: int | None = None
        # COLUMN MAPPING: data files carry immutable PHYSICAL names;
        # the stream's declared schema is LOGICAL. The physical->
        # logical rename is resolved ONCE at stream start and applied
        # per batch (pinned like the stream's schema itself) — correct
        # across any number of renames mid-stream, because a rename
        # never changes physical names and never adds files. Protocol
        # gate mirrors TxnLogTable._check_protocol (reader v2 = column
        # mapping).
        state = self.view.cmap_state()
        need = (state.get("protocol") or {}).get("min_reader", 1)
        if need > 2:
            raise RuntimeError(
                f"txnlog stream: table requires reader protocol "
                f"{need}; this source supports 2"
            )
        self._logical_to_phys = dict(state.get("map") or {})
        self._arrow_types = (
            _declared_arrow_types(schema) if schema is not None else {}
        )

    def initialOffset(self) -> dict:
        if self.starting is not None:
            # startingVersion v ⇒ the first batch INCLUDES version v
            self._pos = self.starting - 1
            return {"version": self.starting - 1}
        vs = self.view.versions()
        # default: consume the table from the beginning (version 0's
        # init rides the first batch), matching Delta's default of
        # processing the full existing snapshot first
        self._pos = -1
        return {"version": -1}

    def latestOffset(self) -> dict:
        vs = self.view.versions()
        newest = vs[-1] if vs else -1
        if self.max_files <= 0 or self._pos is None or newest <= self._pos:
            return {"version": newest}
        # advance version-at-a-time while the batch stays within the
        # file budget; always include at least one version so the
        # stream can never stall on a single over-budget commit
        # (Delta's maxFilesPerTrigger admits an oversized single
        # commit the same way)
        end = self._pos
        taken = 0
        for v in vs:
            if v <= self._pos:
                continue
            n = len(self.view.added_data_files(end, v, True))
            if taken and taken + n > self.max_files:
                break
            taken += n
            end = v
            if taken >= self.max_files:
                break
        return {"version": end}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        self._pos = int(end["version"])
        files = self.view.added_data_files(
            int(start["version"]), int(end["version"]), self.ignore_changes
        )
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        # Spark's default parquet timestamp encoding (INT96) reads back
        # through pyarrow as timestamp[ns], which the engine's Arrow
        # bridge rejects (UNSUPPORTED_ARROWTYPE). Spark timestamps are
        # microsecond-precision, so the ns->us cast is exact for any
        # Spark-written file (and matches Spark's own read semantics
        # for genuinely-ns data).
        fields = []
        changed = False
        for f in table.schema:
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
                fields.append(
                    pa.field(f.name, pa.timestamp("us", f.type.tz))
                )
                changed = True
            else:
                fields.append(f)
        if changed:
            table = table.cast(pa.schema(fields))
        if self._want is not None:
            table = _project_file_table(
                table, self._want, self._logical_to_phys,
                self._arrow_types,
            )
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        # offsets live in the engine's checkpoint; remember the
        # position so the admission-control bound applies from here
        v = int(end["version"])
        if self._pos is None or v > self._pos:
            self._pos = v


class TxnLogBatchReader(DataSourceReader):
    """``spark.read.format("txnlog")`` — the table as a BATCH source
    (Delta's ``spark.read.format("delta")`` parity), usable without
    constructing a :class:`TxnLogTable`. Options:

    - ``path`` (required)
    - ``versionAsOf`` — read the snapshot at that commit version
    - ``timestampAsOf`` — epoch seconds (float) or an ISO timestamp;
      resolves over the monotonically adjusted commit sequence,
      exactly like ``TxnLogTable.read_asof``
    - ``rowIds`` — ``true`` appends the stable ``_row_id`` column on a
      row-tracked table (TxnLogTable.read_with_row_ids parity, batch
      reads only): files rewritten by a preserving compaction carry
      the id physically and are trusted as-is; fresh files compute
      base + in-file position from the log's lazy assignment, shipped
      to executors as a metadata-sized {path: base} dict

    Each live data file is one input partition read executor-side as
    Arrow batches; merge-on-read deletion vectors are subtracted
    per-partition (the DV key set is log-metadata-sized by design and
    ships with the reader), and column mapping resolves physical names
    to the requested version's logical schema. Composite-key tables
    with live deletion vectors are refused (the per-partition Arrow
    ``is_in`` subtraction needs a single key column) — read those
    through ``TxnLogTable.read``, which applies the DV as one
    broadcast anti-join. File-skipping predicate pushdown also lives
    on the ``TxnLogTable`` read paths; this reader is the plain
    full-snapshot scan."""

    def __init__(self, options: dict, schema) -> None:
        import datetime as _dt

        self.path = options["path"]
        view = _LogView(self.path)
        version = options.get("versionasof")
        self.version = int(version) if version is not None else None
        ts_opt = options.get("timestampasof")
        if ts_opt is not None:
            if self.version is not None:
                raise ValueError(
                    "txnlog batch read: pass versionAsOf OR "
                    "timestampAsOf, not both"
                )
            try:
                ts = float(ts_opt)
            except ValueError:
                ts = _dt.datetime.fromisoformat(ts_opt).timestamp()
            self.version = view.version_at(ts)
        state = view.cmap_state(self.version)
        need = (state.get("protocol") or {}).get("min_reader", 1)
        if need > 2:
            raise RuntimeError(
                f"txnlog batch read: table requires reader protocol "
                f"{need}; this source supports 2"
            )
        self._logical_to_phys = dict(state.get("map") or {})
        self._rowids = str(
            options.get("rowids", "false")
        ).lower() in ("true", "1")
        if self._rowids and not state.get("row_tracking"):
            raise RuntimeError(
                "txnlog batch read: rowIds requested but row tracking "
                "is not enabled on this table (at the requested "
                "version)"
            )
        declared = [f.name for f in schema.fields]
        if self._rowids and "_row_id" not in declared:
            raise ValueError(
                "txnlog batch read: rowIds=true but the effective read "
                "schema does not declare `_row_id` bigint — the reader "
                "only appends the column the schema announces"
            )
        # strip _row_id from the physical projection ONLY when this
        # reader synthesizes it: the name is reserved solely on
        # row-tracked tables (enable_row_tracking refuses a clashing
        # user column), so on any other table `_row_id` is an ordinary
        # user column that must project through untouched
        self._want = [
            n for n in declared if not (self._rowids and n == "_row_id")
        ]
        self._arrow_types = _declared_arrow_types(schema)
        data, dvs = view.live_at(self.version)
        self._files = [
            p if os.path.isabs(p) else os.path.join(self.path, p)
            for p in data
        ]
        self._rowid_bases: dict[str, int] = {}
        if self._rowids:
            rel_bases = view.row_id_bases(self.version)
            self._rowid_bases = {
                (p if os.path.isabs(p) else os.path.join(self.path, p)): b
                for p, b in rel_bases.items()
            }
        self._dv_col = None
        self._dv_keys: frozenset = frozenset()
        if dvs:
            import pyarrow.parquet as pq

            tabs = [
                pq.read_table(
                    p if os.path.isabs(p) else os.path.join(self.path, p)
                )
                for p in dvs
            ]
            cols = {tuple(t.column_names) for t in tabs}
            names = next(iter(cols))
            if len(cols) != 1 or len(names) != 1:
                raise RuntimeError(
                    "txnlog batch read: table has live deletion "
                    "vectors on a composite key; read it through "
                    "TxnLogTable.read (one broadcast anti-join)"
                )
            self._dv_col = names[0]
            self._dv_keys = frozenset(
                k for t in tabs for k in t.column(0).to_pylist()
            )

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in self._files]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        fields = []
        changed = False
        for f in table.schema:
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
                fields.append(
                    pa.field(f.name, pa.timestamp("us", f.type.tz))
                )
                changed = True
            else:
                fields.append(f)
        if changed:
            table = table.cast(pa.schema(fields))
        # Row tracking: grab the physical id column (preserving
        # compactions materialize it) BEFORE the schema projection
        # drops it; fresh files derive ids from base + file position.
        rid_col = None
        if self._rowids:
            if "_row_id" in table.column_names:
                rid_col = table["_row_id"].cast(pa.int64())
            else:
                base = self._rowid_bases.get(partition.path)
                if base is None:
                    raise RuntimeError(
                        "txnlog batch read: no row-id base for "
                        f"{partition.path!r} (log and file set out "
                        "of sync)"
                    )
                rid_col = pa.chunked_array(
                    [pa.array(range(base, base + len(table)), pa.int64())]
                )
        # Physical-schema projection BEFORE the DV subtraction: the DV
        # sidecars are written with LOGICAL key names (_dv_schema,
        # operators/txnlog.py), so the filter runs on the projected
        # table.
        table = _project_file_table(
            table, self._want, self._logical_to_phys, self._arrow_types
        )
        if rid_col is not None:
            table = table.append_column("_row_id", rid_col)
        if self._dv_col is not None and self._dv_keys:
            col = table[self._dv_col]
            mask = pc.invert(
                pc.is_in(
                    col,
                    value_set=pa.array(
                        list(self._dv_keys), type=col.type
                    ),
                )
            )
            table = table.filter(mask)
        yield from table.to_batches()


class _StagedFile(WriterCommitMessage):
    """One executor-written parquet file awaiting the driver-side
    commit: (relpath, rows, per-column min/max stats)."""

    def __init__(self, relpath: str, rows: int, stats: dict | None):
        self.relpath = relpath
        self.rows = rows
        self.stats = stats


class TxnLogStreamWriter(DataSourceStreamArrowWriter):
    """``writeStream.format("txnlog")`` — the table as an EXACTLY-ONCE
    streaming sink, the write-side twin of the streaming source.

    Protocol per micro-batch (Delta's transactional sink shape):
    executors stream their Arrow batches straight into immutable
    parquet files under the table's ``data/`` (one file per task,
    stats computed from the in-memory Arrow table — no second read),
    and the DRIVER lands every staged file plus a
    ``txn {appId, batchId}`` marker in ONE CAS commit. A replayed
    micro-batch (sink retry after a crash between write and
    checkpoint) finds its marker and drops its staged files — the
    same SetTransaction idempotence ``append_once`` gives foreachBatch
    ingest, here native to the writeStream API. CAS losses against
    disjoint commits rebase the same staged adds (blind-append rules);
    a table-shape change (constraint/metadata/restore) mid-stream
    fails the query loudly.

    Contract notes: ``option("appId", ...)`` names the idempotence
    stream (default ``txnlog-sink``); ``option("keys", "a,b")``
    selects the stat columns for later pruning (optional — unstatted
    files simply never prune until a compact rewrites them); sinking
    into a table with active CHECK constraints is refused (this path
    bypasses the write-time validation pass).
    """

    def __init__(self, options: dict, schema) -> None:
        self.path = options["path"]
        self.app_id = options.get("appid", "txnlog-sink")
        keys = options.get("keys", "")
        self.stat_cols = [k for k in keys.split(",") if k]
        self.schema = schema

    # -- executor side ----------------------------------------------------
    def write(self, iterator) -> _StagedFile:
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = list(iterator)
        if not batches:
            return _StagedFile("", 0, None)
        table = pa.Table.from_batches(batches)
        rel = f"data/sink-{_uuid.uuid4().hex[:12]}/part-{_uuid.uuid4().hex[:8]}.parquet"
        full = os.path.join(self.path, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        pq.write_table(table, full)
        stats = {}
        import pyarrow.compute as pc

        for c in self.stat_cols:
            if c not in table.column_names:
                continue
            mm = pc.min_max(table[c])
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            if isinstance(mn, (int, str, float)) or mn is None:
                stats[c] = [mn, mx]
        return _StagedFile(rel, table.num_rows, stats or None)

    # -- driver side --------------------------------------------------------
    def _resolved_table_schema(self):
        """The TABLE's authoritative schema, never the stream's:
        newest checkpoint/metadata schema from the log walk (the same
        precedence as ``TxnLogTable._schema_at``), else inferred from
        an existing data file, else — for a virgin table with no data
        — the stream's schema, which then legitimately DEFINES the
        table. Without this resolution the throwaway commit table's
        ``_base_schema`` would be the stream DataFrame's schema, and a
        sink commit crossing a CHECKPOINT_EVERY boundary would persist
        that ad-hoc schema into the checkpoint's ``schema`` field —
        silently rewriting the table's effective schema for every
        subsequent reader."""
        import pyspark.sql.types as T

        view = _LogView(self.path)
        for v in reversed(view.versions()):
            ck_path = os.path.join(
                view.log_dir, f"{v:020d}.checkpoint.json"
            )
            if os.path.exists(ck_path):
                with open(ck_path, encoding="utf-8") as f:
                    ck = json.load(f)
                if "schema" in ck:
                    return T.StructType.fromJson(ck["schema"])
            for a in view.entry(v)["actions"]:
                if "metadata" in a:
                    return T.StructType.fromJson(a["metadata"]["schema"])
        sample = view.any_data_file()
        if sample is not None:
            import pyarrow.parquet as pq

            arrow = pq.read_schema(sample)
            return T.StructType(
                [
                    T.StructField(f.name, _arrow_field_spark_type(f))
                    for f in arrow
                ]
            )
        return self.schema

    def _table(self):
        from ..operators.txnlog import TxnLogTable

        state = _LogView(self.path).cmap_state()
        need_w = (state.get("protocol") or {}).get("min_writer", 1)
        # writer protocol 3 = row tracking, which the sink satisfies
        # by construction: its commits are pure appends whose add
        # actions carry exact rowcounts, which is all the lazy row-id
        # assignment needs — streaming ingest into a row-tracked table
        # gives every record a stable id with zero coordination
        if need_w > 3:
            raise RuntimeError(
                f"txnlog sink: table requires writer protocol "
                f"{need_w}; this sink supports 3"
            )
        if state.get("map"):
            # executors stage files named by the STREAM's (logical)
            # columns and record stats under those names — both would
            # land in the wrong namespace on a column-mapped table.
            # Refuse loudly (Delta restricts streaming writes on
            # column-mapped tables the same way); batch append via
            # TxnLogTable handles the physical rename correctly.
            raise RuntimeError(
                "txnlog sink cannot write to a column-mapped table "
                "(renamed/dropped columns); ingest via foreachBatch + "
                "append_once instead"
            )
        if state.get("gen"):
            # same reasoning as CHECK constraints: this path stages
            # raw executor files, bypassing both the GENERATED-column
            # computation (_conform) and its write-time validation —
            # rows would land with missing or unvalidated generated
            # values
            raise RuntimeError(
                "txnlog sink cannot write to a table with GENERATED "
                "columns (the sink path bypasses generation and "
                "validation); ingest via foreachBatch + append_once"
            )
        resolved = self._resolved_table_schema()
        # conform-or-reject: the stream must carry exactly the table's
        # columns with the table's types (order and nullability are
        # immaterial — files are read by name under an explicit
        # schema). A retyped/extra/missing column would write data
        # files that mismatch the table's effective schema, so it
        # fails the query loudly instead.
        want = {
            f.name: f.dataType.simpleString() for f in resolved.fields
        }
        got = {
            f.name: f.dataType.simpleString() for f in self.schema.fields
        }
        if want != got:
            raise RuntimeError(
                "txnlog sink: stream schema does not conform to the "
                f"table's schema at {self.path!r}; table has {want}, "
                f"stream has {got} — align the stream's columns/types "
                "or evolve the table first (add_columns)"
            )
        # driver-side metadata work only — no SparkSession needed, and
        # none is passed (read paths are never touched here). The
        # RESOLVED schema (not the stream's) becomes _base_schema, so
        # any checkpoint this commit writes persists the table's own
        # schema.
        return TxnLogTable(None, self.path, resolved, ["__none__"])

    def commit(self, messages, batchId: int) -> None:
        from ..operators.txnlog import CommitConflict

        staged = [
            m for m in messages if isinstance(m, _StagedFile) and m.rows
        ]
        adds = [
            {
                "add": {
                    "path": m.relpath,
                    "rows": m.rows,
                    **({"stats": m.stats} if m.stats else {}),
                }
            }
            for m in staged
        ]
        try:
            t = self._table()  # raises on stream/table schema mismatch
        except Exception:
            self._drop(staged)
            raise
        for _ in range(11):
            base = t.current_version()
            if t.constraints(base):
                self._drop(staged)
                raise RuntimeError(
                    "txnlog sink cannot write to a table with active "
                    "CHECK constraints (the sink path bypasses "
                    "write-time validation); drop the constraint or "
                    "ingest via foreachBatch + append_once"
                )
            last = t.last_txn_version(self.app_id)
            if last is not None and last >= batchId:
                self._drop(staged)  # replayed batch: exactly-once no-op
                return
            actions = adds + [
                {"txn": {"app": self.app_id, "version": batchId}}
            ]
            try:
                t._commit("append", actions, base, staged_adds=[])
                return
            except CommitConflict:
                new_base = t.current_version()
                # pure adds: safe over any intervening commit except a
                # table-shape change or an overlapping DV (unknown key
                # bounds here, so ANY deletion-vector add blocks)
                if not self._adds_safe(t, base, new_base):
                    self._drop(staged)
                    raise
        self._drop(staged)
        raise CommitConflict(
            f"txnlog sink gave up after 10 rebases (batch {batchId})"
        )

    def _adds_safe(self, t, from_v, to_v) -> bool:
        start = 0 if from_v is None else from_v + 1
        end = -1 if to_v is None else to_v
        for v in range(start, end + 1):
            if not os.path.exists(t._log_path(v)):
                return False
            with open(t._log_path(v), encoding="utf-8") as f:
                entry = json.load(f)
            if entry.get("op") == "restore":
                return False
            for a in entry["actions"]:
                if "metadata" in a or "constraint" in a:
                    return False
                if a.get("add", {}).get("dv"):
                    return False
        return True

    def _drop(self, staged) -> None:
        import shutil

        for m in staged:
            full = os.path.join(self.path, m.relpath)
            shutil.rmtree(os.path.dirname(full), ignore_errors=True)

    def abort(self, messages, batchId: int) -> None:
        self._drop(
            [m for m in messages if isinstance(m, _StagedFile) and m.rows]
        )


class TxnLogStreamDataSource(DataSource):
    """``format("txnlog")`` — register once per session with
    ``spark.dataSource.register(TxnLogStreamDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "txnlog"

    def schema(self) -> str:
        view = _LogView(self.options["path"])
        upto = self.options.get("versionasof")
        ts_opt = self.options.get("timestampasof")
        if upto is not None:
            upto = int(upto)
        elif ts_opt is not None:
            import datetime as _dt

            try:
                ts = float(ts_opt)
            except ValueError:
                ts = _dt.datetime.fromisoformat(ts_opt).timestamp()
            upto = view.version_at(ts)
        rowids = str(
            self.options.get("rowids", "false")
        ).lower() in ("true", "1")
        rid_suffix = ", `_row_id` bigint" if rowids else ""
        logged = view.logical_schema_json(upto)
        if logged is not None:
            # a logged metadata schema is authoritative AND already in
            # logical names — the only correct source once the table
            # has renamed/dropped columns (the arrow fallback below
            # would surface physical/retired names)
            import pyspark.sql.types as T

            st = T.StructType.fromJson(logged)
            return (
                ", ".join(
                    f"`{f.name}` {f.dataType.simpleString()}"
                    for f in st.fields
                )
                + rid_suffix
            )
        sample = view.any_data_file()
        if sample is None:
            raise ValueError(
                f"txnlog table at {self.options['path']!r} has no data "
                "files; pass an explicit .schema(...)"
            )
        import pyarrow.parquet as pq

        # hide a physically materialized _row_id (preserving rewrites
        # land it in the files) ONLY on a row-tracked table — on any
        # other table the name is not reserved and a user column
        # called _row_id must surface like every other column
        tracked = bool(view.cmap_state(upto).get("row_tracking"))
        arrow = pq.read_schema(sample)
        cols = ", ".join(
            f"`{f.name}` {_arrow_field_ddl(f)}"
            for f in arrow
            if not (tracked and f.name == "_row_id")
        )
        return cols + rid_suffix

    def reader(self, schema) -> TxnLogBatchReader:
        return TxnLogBatchReader(self.options, schema)

    def streamReader(self, schema) -> TxnLogStreamReader:
        return TxnLogStreamReader(self.options, schema)

    def streamWriter(self, schema, overwrite: bool) -> TxnLogStreamWriter:
        if overwrite:
            raise ValueError(
                "txnlog sink is append-only (exactly-once transactional "
                "appends); complete/overwrite output modes are not "
                "supported"
            )
        return TxnLogStreamWriter(self.options, schema)
