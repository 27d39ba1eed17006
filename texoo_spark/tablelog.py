"""Minimal transactional table format over parquet — the hermetic
Iceberg/Delta seam (no catalog jar ships in this container; swap
TableLog.append for df.writeTo(table).append() on a cluster that has one).

Public-knowledge design (Iceberg spec v1 / Delta protocol concepts):

- A table is ``<path>/data/commit-<uuid>/part-*.parquet`` data files plus
  an append-only ``<path>/_log/<version 08d>.json`` snapshot log. Each
  snapshot is SELF-CONTAINED: it lists every live data file (with
  per-file row counts and per-column min/max pruning stats harvested from
  the parquet footers), the schema, and the operation summary — reading
  any version touches exactly one JSON file, no log replay.
- Commits are ATOMIC and optimistic: data files are fully written first
  (a failed job leaves only unreferenced garbage, never a torn table),
  then the snapshot claims the next version number via O_CREAT|O_EXCL —
  the local-filesystem equivalent of a catalog's compare-and-swap. A
  concurrent writer losing the race recomputes against the new head and
  retries (append/delete compose; overwrite wins by replacing the list).
- Reads are time-travelable: ``read(spark, version=N)`` returns the table
  exactly as of snapshot N. ``scan`` additionally prunes data files whose
  footer min/max cannot satisfy a predicate before Spark ever opens them
  — the file-skipping analog of partition pruning, metadata-only.
- ``delete_where`` is copy-on-write at file granularity: footer stats
  decide which files MAY contain matches; only those are rewritten
  (one distributed job), untouched files carry over by reference.
  ``merge`` (MERGE INTO / upsert) uses the same COW machinery keyed on
  the merge keys' footer ranges. ``append(merge_schema=True)`` evolves
  the schema additively (new nullable columns, metadata-only — old
  files read back with NULLs, nothing rewrites).

At 100 TB: snapshots are KB-scale metadata regardless of data size;
appends never rewrite existing files; delete rewrites only the stats-
affected subset; and every read plans from one JSON list, so planning
cost is O(live files), not O(history).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

_ORDERED = (int, float, str)


def _file_stats(path: str) -> dict:
    """Harvest per-file pruning stats from the parquet footer (no data
    pages read): row count + per-column min/max where available."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            name = col.path_in_schema
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode(), hi.decode()
                except UnicodeDecodeError:
                    continue
            if not isinstance(lo, _ORDERED):
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    return {"rows": md.num_rows,
            "min": mins, "max": maxs}


def _may_match(stats: dict, col: str, op: str, val) -> bool:
    """Can a file with these footer stats contain a row satisfying
    ``col <op> val``? Missing stats => must assume yes."""
    lo = stats.get("min", {}).get(col)
    hi = stats.get("max", {}).get(col)
    if lo is None or hi is None:
        return True
    if op == "=":
        return lo <= val <= hi
    if op == "<":
        return lo < val
    if op == "<=":
        return lo <= val
    if op == ">":
        return hi > val
    if op == ">=":
        return hi >= val
    raise ValueError(f"unsupported prune op {op!r}")


def _schema_shape(schema_json: str) -> list[tuple[str, str]]:
    """(name, type) list — the schema identity that matters for table
    compatibility. Nullability and field metadata are NOT identity:
    Spark plans flip nullable bits freely (joins, unions, literals), and
    a parquet file is readable under either nullability."""
    s = StructType.fromJson(json.loads(schema_json))
    return [(f.name, f.dataType.simpleString()) for f in s.fields]


def _union_schema(old_json: str, new_json: str) -> str:
    """Additive schema union: old fields keep their order and exact
    types; fields only in the new schema append as nullable. A same-name
    field with a different type raises — type mutation needs a rewrite,
    not metadata evolution (same rule as Iceberg's add-column vs
    incompatible-change split)."""
    old = StructType.fromJson(json.loads(old_json))
    new = StructType.fromJson(json.loads(new_json))
    by_name = {f.name: f for f in new.fields}
    for f in old.fields:
        g = by_name.get(f.name)
        if g is not None and g.dataType != f.dataType:
            raise ValueError(
                f"column {f.name!r} type change "
                f"{f.dataType.simpleString()} -> "
                f"{g.dataType.simpleString()} is not additive")
    merged = list(old.fields)
    have = {f.name for f in old.fields}
    for f in new.fields:
        if f.name not in have:
            merged.append(StructField(f.name, f.dataType, nullable=True))
    return StructType(merged).json()


class TableLog:
    """A versioned parquet table at ``path``. See module docstring."""

    def __init__(self, path: str):
        self.path = path
        self.log_dir = os.path.join(path, "_log")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- log plumbing -------------------------------------------------

    def _versions(self) -> list[int]:
        return sorted(int(f[:-5]) for f in os.listdir(self.log_dir)
                      if f.endswith(".json"))

    def current_version(self) -> int:
        vs = self._versions()
        return vs[-1] if vs else 0

    def snapshot(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v == 0:
            return {"version": 0, "op": "empty", "files": [],
                    "schema": None, "total_rows": 0}
        with open(os.path.join(self.log_dir, f"{v:08d}.json")) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        out = []
        for v in self._versions():
            s = self.snapshot(v)
            out.append({"version": v, "op": s["op"],
                        "n_files": len(s["files"]),
                        "total_rows": s["total_rows"]})
        return out

    def _commit(self, files: list[dict], op: str, schema_json: str,
                base_version: int) -> int:
        """Atomically claim the next version. O_CREAT|O_EXCL is the
        local-fs compare-and-swap: exactly one writer can create each
        snapshot number. Returns the committed version; raises
        FileExistsError to the caller's retry loop on a lost race."""
        version = base_version + 1
        snap = {"version": version, "op": op, "files": files,
                "schema": schema_json,
                "total_rows": sum(f["rows"] for f in files)}
        target = os.path.join(self.log_dir, f"{version:08d}.json")
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            os.write(fd, json.dumps(snap).encode())
        finally:
            os.close(fd)
        return version

    def _write_files(self, df: DataFrame) -> tuple[list[dict], str]:
        """Write df fully BEFORE any snapshot references it; a failure
        here leaves only unreferenced garbage."""
        commit_dir = os.path.join(self.data_dir,
                                  f"commit-{uuid.uuid4().hex[:12]}")
        df.write.mode("errorifexists").parquet(commit_dir)
        files = []
        for name in sorted(os.listdir(commit_dir)):
            if not name.endswith(".parquet"):
                continue
            rel = os.path.relpath(os.path.join(commit_dir, name), self.path)
            files.append({"path": rel, **_file_stats(
                os.path.join(commit_dir, name))})
        return files, df.schema.json()

    # -- write ops ----------------------------------------------------

    def append(self, df: DataFrame, merge_schema: bool = False) -> int:
        """Append df's rows. A df whose schema differs from the table's
        raises unless ``merge_schema=True``, which evolves the table
        schema additively (Iceberg add-column): new fields append as
        nullable, existing fields must keep their exact type, and files
        written under the old schema read back with NULLs in the new
        columns — no data rewrite, metadata-only evolution."""
        files, schema_json = self._write_files(df)
        while True:
            base = self.current_version()
            prev = self.snapshot(base)
            out_schema = schema_json
            if prev["schema"] is not None and \
                    _schema_shape(prev["schema"]) == _schema_shape(
                        schema_json):
                out_schema = prev["schema"]    # identical shape: keep
            elif prev["schema"] is not None:
                if not merge_schema:
                    raise ValueError(
                        "append schema differs from table schema; pass "
                        "merge_schema=True for additive evolution")
                out_schema = _union_schema(prev["schema"], schema_json)
            try:
                return self._commit(prev["files"] + files, "append",
                                    out_schema, base)
            except FileExistsError:
                continue  # lost the race: recompute against the new head

    def merge(self, spark: SparkSession, source: DataFrame,
              keys: list[str]) -> int:
        """MERGE INTO (upsert): every table row whose ``keys`` appear in
        ``source`` is replaced by the source row; source rows with no
        match insert. Copy-on-write at file granularity, like
        delete_where: footer min/max on keys[0] decide which files MAY
        hold matching keys (source key bounds come from one scalar agg);
        only those files rewrite via a left-anti join against the
        distinct source keys, every other file carries over by
        reference, and survivors + source write in ONE distributed job.

        At 100 TB this is the CDC-apply / dedup-upsert primitive: a
        day's upserts touch only the files whose key ranges overlap the
        batch, and the optimistic CAS retry recomputes the affected set
        against the new head on a lost race."""
        import functools
        import operator

        from pyspark.sql import functions as F
        k0 = keys[0]
        any_null = functools.reduce(
            operator.or_, [F.col(k).isNull() for k in keys])
        bounds = source.agg(F.min(k0).alias("lo"), F.max(k0).alias("hi"),
                            F.count("*").alias("n"),
                            F.count(F.when(any_null, 1))
                            .alias("nulls")).collect()[0]
        lo, hi = bounds["lo"], bounds["hi"]
        if bounds["nulls"]:
            # SQL equality never matches NULL, so NULL-keyed rows could
            # neither replace nor be replaced — refuse instead of
            # silently accumulating duplicates
            raise ValueError(
                f"merge keys must be non-null ({bounds['nulls']} source "
                f"rows have a NULL key)")
        if bounds["n"] == 0:                        # empty source: no-op
            return self.current_version()
        while True:
            base = self.current_version()
            prev = self.snapshot(base)
            if prev["schema"] is None:
                try:
                    files, schema_json = self._write_files(source)
                    return self._commit(files, "merge", schema_json, base)
                except FileExistsError:
                    continue
            if _schema_shape(prev["schema"]) != _schema_shape(
                    source.schema.json()):
                raise ValueError(
                    "merge source schema must equal the table schema "
                    "(evolve first via append(merge_schema=True))")
            affected = [f for f in prev["files"]
                        if _may_match(f, k0, ">=", lo)
                        and _may_match(f, k0, "<=", hi)]
            hit = {f["path"] for f in affected}
            kept = [f for f in prev["files"] if f["path"] not in hit]
            if affected:
                survivors = (self._read_files(spark, prev, affected)
                             .join(source.select(*keys).distinct(),
                                   keys, "left_anti"))
                out = survivors.unionByName(source)
            else:
                out = source
            new_files, _ = self._write_files(out)
            try:
                # shape was validated equal: keep the table's schema text
                return self._commit(kept + new_files, "merge",
                                    prev["schema"], base)
            except FileExistsError:
                continue

    def overwrite(self, df: DataFrame) -> int:
        files, schema_json = self._write_files(df)
        while True:
            try:
                return self._commit(files, "overwrite", schema_json,
                                    self.current_version())
            except FileExistsError:
                continue

    def delete_where(self, spark: SparkSession, predicate: str,
                     prune: tuple | None = None) -> int:
        """Copy-on-write delete: rewrite only the files whose footer
        stats MAY contain rows matching ``predicate`` (a Spark SQL
        boolean expression); all other files carry over by reference.
        ``prune`` is an optional (col, op, value) triple consistent with
        the predicate that enables the stats-based file skipping (a
        non-range predicate can't be pruned — every file rewrites).

        SQL DELETE semantics: only rows where the predicate evaluates to
        TRUE are deleted — rows where it is NULL (e.g. a NULL column in
        ``doc_id % 2 = 0``) are RETAINED, as in Delta/Iceberg."""
        while True:
            base = self.current_version()
            prev = self.snapshot(base)
            if prune is not None:
                affected = [f for f in prev["files"]
                            if _may_match(f, *prune)]
            else:
                affected = list(prev["files"])
            hit = {f["path"] for f in affected}
            kept = [f for f in prev["files"] if f["path"] not in hit]
            new_files: list[dict] = []
            schema_json = prev["schema"]
            if affected:
                survivors = (spark.read.schema(
                    StructType.fromJson(json.loads(prev["schema"])))
                    .parquet(*[os.path.join(self.path, f["path"])
                               for f in affected])
                    .filter(f"NOT coalesce(({predicate}), false)"))
                new_files, schema_json = self._write_files(survivors)
            try:
                return self._commit(kept + new_files, "delete",
                                    schema_json, base)
            except FileExistsError:
                continue

    def compact(self, spark: SparkSession,
                target_rows_per_file: int = 1 << 20,
                small_file_rows: int | None = None) -> int:
        """Bin-pack small data files into ~target-sized ones (the
        Iceberg rewrite_data_files / Delta OPTIMIZE analogue). Repeated
        appends — especially streaming micro-batches — accumulate files
        far below the scan-efficient size; planning cost and task count
        are O(files), so compaction is what keeps a frequently-appended
        table readable at scale.

        Only files with < ``small_file_rows`` rows (default: half the
        target) are rewritten, in ONE distributed job coalesced to
        ceil(rows/target) output files; large files carry over by
        reference. The commit is the same optimistic CAS as every other
        op — readers of older versions still see the original files
        (snapshots are immutable; garbage collection of unreferenced
        files is a separate concern, as in Iceberg)."""
        small_file_rows = (target_rows_per_file // 2
                           if small_file_rows is None else small_file_rows)
        while True:
            base = self.current_version()
            prev = self.snapshot(base)
            small = [f for f in prev["files"]
                     if f["rows"] < small_file_rows]
            if len(small) < 2:
                return base                  # nothing to gain
            keep = [f for f in prev["files"] if f["rows"] >= small_file_rows]
            total = sum(f["rows"] for f in small)
            n_out = max(1, -(-total // target_rows_per_file))
            packed = (spark.read.schema(
                StructType.fromJson(json.loads(prev["schema"])))
                .parquet(*[os.path.join(self.path, f["path"])
                           for f in small])
                .coalesce(n_out))
            new_files, schema_json = self._write_files(packed)
            try:
                return self._commit(keep + new_files, "compact",
                                    schema_json, base)
            except FileExistsError:
                continue

    def vacuum(self, retain_last: int = 1) -> tuple[int, int]:
        """Delete data files referenced by NO retained snapshot and drop
        the expired snapshot JSONs (Iceberg expire_snapshots + Delta
        VACUUM in one). ``retain_last`` snapshots stay time-travelable.
        Returns (files deleted, snapshots expired).

        Safety model (same as the catalog systems'): committed snapshots
        are immutable, so the live-file union of retained snapshots is
        exact; in-flight writers only ever ADD files under fresh
        commit-<uuid> dirs and reference them AFTER a successful CAS, so
        a file not referenced by any retained snapshot can only belong
        to an expired version or an abandoned write — never to a future
        commit. Uncommitted-yet dirs newer than the newest retained
        snapshot are left alone (they may belong to an in-flight
        append); only files referenced exclusively by expired snapshots
        plus orphans older than the retained history are removed.

        Concurrency caveat (same operational rule Delta enforces via its
        retention duration): vacuum must NOT run while a reader of an
        about-to-expire version is mid-job, or while a writer that may
        lose its CAS race would recompute from an expired base — both
        would hit FileNotFoundError on the deleted data files. Run it
        when no reads/writes of versions older than the retained window
        are in flight, or keep ``retain_last`` larger than the longest
        job's version lag."""
        versions = self._versions()
        if not versions:
            return 0, 0
        retained = versions[-max(retain_last, 1):]
        expired = [v for v in versions if v not in retained]
        live = {f["path"] for v in retained
                for f in self.snapshot(v)["files"]}
        expired_refs = {f["path"] for v in expired
                        for f in self.snapshot(v)["files"]}
        doomed = expired_refs - live
        for rel in sorted(doomed):
            try:
                os.remove(os.path.join(self.path, rel))
            except FileNotFoundError:
                pass
        # drop now-empty commit dirs and the expired snapshot files
        for rel in sorted(doomed):
            d = os.path.dirname(os.path.join(self.path, rel))
            try:
                os.rmdir(d)
            except OSError:
                pass                         # still holds live files
        for v in expired:
            os.remove(os.path.join(self.log_dir, f"{v:08d}.json"))
        return len(doomed), len(expired)

    # -- read ops -----------------------------------------------------

    def _read_files(self, spark: SparkSession, snap: dict,
                    files: list[dict]) -> DataFrame:
        if snap["schema"] is None:
            raise ValueError("table has no snapshots yet")
        schema = StructType.fromJson(json.loads(snap["schema"]))
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[os.path.join(self.path, f["path"]) for f in files])

    def read(self, spark: SparkSession,
             version: int | None = None) -> DataFrame:
        """The table exactly as of ``version`` (default: latest)."""
        snap = self.snapshot(version)
        return self._read_files(spark, snap, snap["files"])

    def scan(self, spark: SparkSession, col: str, op: str, val,
             version: int | None = None) -> DataFrame:
        """Predicate read with metadata-only file skipping: data files
        whose footer min/max cannot satisfy ``col <op> val`` are never
        opened; the residual predicate still applies row-level."""
        snap = self.snapshot(version)
        live = [f for f in snap["files"] if _may_match(f, col, op, val)]
        # residual predicate via Column ops, not string interpolation —
        # repr() is not SQL quoting (a value holding both quote kinds
        # produces backslash escapes whose parse depends on
        # spark.sql.parser.escapedStringLiterals).
        c = F.col(col)
        residual = {"=": c == F.lit(val), "<": c < F.lit(val),
                    "<=": c <= F.lit(val), ">": c > F.lit(val),
                    ">=": c >= F.lit(val)}[op]
        return self._read_files(spark, snap, live).filter(residual)

    def pruned_counts(self, col: str, op: str, val,
                      version: int | None = None) -> tuple[int, int]:
        """(files skipped, files scanned) for a scan — observability for
        tests and EXPLAIN-style reporting."""
        snap = self.snapshot(version)
        hit = sum(1 for f in snap["files"] if _may_match(f, col, op, val))
        return len(snap["files"]) - hit, hit
