"""Transactional table-format tests: atomic snapshot commits, time
travel, copy-on-write delete, and stats-based file skipping."""

import json
import os

import pytest

pytestmark = pytest.mark.spark


@pytest.fixture(scope="session")
def spark():
    from texoo_spark.session import get_spark
    s = get_spark("texoo-tablelog-tests", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def _mk(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id", "concat('text-', id) AS text").coalesce(1)


def test_append_and_time_travel(spark, tmp_path):
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "t"))
    assert t.current_version() == 0
    assert t.append(_mk(spark, 0, 10)) == 1
    assert t.append(_mk(spark, 10, 20)) == 2
    assert _ids(t.read(spark, 1)) == list(range(10))
    assert _ids(t.read(spark)) == list(range(20))
    assert [h["op"] for h in t.history()] == ["append", "append"]
    assert [h["total_rows"] for h in t.history()] == [10, 20]


def test_overwrite_replaces_file_list(spark, tmp_path):
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 10))
    t.overwrite(_mk(spark, 100, 105))
    assert _ids(t.read(spark)) == list(range(100, 105))
    assert _ids(t.read(spark, 1)) == list(range(10))  # history intact
    assert len(t.snapshot()["files"]) == 1


def test_delete_cow_prunes_untouched_files(spark, tmp_path):
    """Footer-stats pruning: a range delete must carry disjoint files
    over BY REFERENCE (identical path entries), rewriting only files
    whose min/max may contain matches."""
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 100))     # file A: doc_id 0..99
    t.append(_mk(spark, 100, 200))   # file B: doc_id 100..199
    before = {f["path"] for f in t.snapshot()["files"]}
    t.delete_where(spark, "doc_id >= 150", prune=("doc_id", ">=", 150))
    after = {f["path"] for f in t.snapshot()["files"]}
    a_files = {f["path"] for f in t.snapshot(1)["files"]}
    assert a_files <= after          # file A untouched, by reference
    assert not (before - a_files) & after  # file B fully replaced
    assert _ids(t.read(spark)) == list(range(150))
    assert _ids(t.read(spark, 2)) == list(range(200))  # time travel


def test_delete_without_prune_hint_rewrites_all(spark, tmp_path):
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 20))
    t.delete_where(spark, "doc_id % 2 = 0")
    assert _ids(t.read(spark)) == list(range(1, 20, 2))


def test_delete_retains_null_predicate_rows(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates to NULL
    (here: NULL doc_id under ``doc_id % 2 = 0``) must be RETAINED, not
    silently dropped via NOT(NULL)=NULL filtering."""
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "t"))
    t.append(spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (None, "null-key")],
        "doc_id long, text string").coalesce(1))
    t.delete_where(spark, "doc_id % 2 = 0")
    rows = {(r.doc_id, r.text) for r in t.read(spark).collect()}
    assert rows == {(1, "b"), (None, "null-key")}


def test_scan_residual_predicate_handles_awkward_quoting(spark, tmp_path):
    """The row-level residual filter is built with Column ops, so values
    containing both quote kinds (repr-hostile) still match exactly."""
    from texoo_spark.tablelog import TableLog
    nasty = "it's a \"mixed\" quote"
    t = TableLog(str(tmp_path / "t"))
    t.append(spark.createDataFrame(
        [(1, nasty), (2, "plain")], "doc_id long, text string")
        .coalesce(1))
    assert _ids(t.scan(spark, "text", "=", nasty)) == [1]


def test_scan_file_skipping(spark, tmp_path):
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 100))
    t.append(_mk(spark, 100, 200))
    skipped, scanned = t.pruned_counts("doc_id", "<", 50)
    assert skipped >= 1 and scanned >= 1
    assert _ids(t.scan(spark, "doc_id", "<", 50)) == list(range(50))
    # equality prune on string column
    t2 = TableLog(str(tmp_path / "t2"))
    t2.append(spark.createDataFrame(
        [(1, "alpha")], "doc_id long, text string").coalesce(1))
    t2.append(spark.createDataFrame(
        [(2, "zeta")], "doc_id long, text string").coalesce(1))
    skipped, scanned = t2.pruned_counts("text", "=", "zeta")
    assert (skipped, scanned) == (1, 1)
    assert _ids(t2.scan(spark, "text", "=", "zeta")) == [2]


def test_optimistic_commit_skips_claimed_version(spark, tmp_path):
    """A concurrent writer claiming the next version forces the retry
    loop to recompute against the new head (the O_EXCL compare-and-swap
    path)."""
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 5))
    # simulate another committer racing in: a valid v2 snapshot that
    # keeps v1's files
    v1 = t.snapshot(1)
    fake = dict(v1, version=2, op="append")
    with open(os.path.join(t.log_dir, "00000002.json"), "w") as f:
        json.dump(fake, f)
    assert t.append(_mk(spark, 5, 8)) == 3  # not 2
    assert _ids(t.read(spark)) == list(range(8))


def test_schema_rides_the_log(spark, tmp_path):
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, 2.5, "x")], "doc_id long, score double, text string")
    t.append(df.coalesce(1))
    got = t.read(spark)
    assert [(f.name, f.dataType.simpleString()) for f in got.schema.fields] \
        == [("doc_id", "bigint"), ("score", "double"), ("text", "string")]
    with pytest.raises(ValueError, match="no snapshots"):
        TableLog(str(tmp_path / "empty")).read(spark)


def test_compact_bin_packs_small_files(spark, tmp_path):
    """compact() rewrites only sub-threshold files into ~target-sized
    ones; big files carry over by reference; old versions still read."""
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "t"))
    for i in range(4):                      # four 10-row micro-appends
        t.append(_mk(spark, i * 10, (i + 1) * 10).coalesce(1))
    t.append(_mk(spark, 40, 140).coalesce(1))   # one 100-row file
    before = t.snapshot()
    big = [f["path"] for f in before["files"] if f["rows"] >= 50]
    assert len(before["files"]) == 5 and len(big) == 1

    v = t.compact(spark, target_rows_per_file=40, small_file_rows=50)
    snap = t.snapshot(v)
    assert snap["op"] == "compact"
    assert snap["total_rows"] == 140
    # the big file survives BY REFERENCE (same path), small ones merged
    assert big[0] in {f["path"] for f in snap["files"]}
    packed = [f for f in snap["files"] if f["path"] != big[0]]
    assert len(packed) == 1 and packed[0]["rows"] == 40
    assert _ids(t.read(spark)) == list(range(140))
    # time travel to the pre-compaction version still works
    assert _ids(t.read(spark, version=before["version"])) == list(range(140))
    # nothing left to compact: no-op returns current version
    assert t.compact(spark, target_rows_per_file=40, small_file_rows=50) == v


def test_vacuum_removes_expired_files_keeps_retained(spark, tmp_path):
    """vacuum() deletes files referenced only by expired snapshots and
    drops their snapshot JSONs; retained versions stay readable."""
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 10).coalesce(1))
    t.overwrite(_mk(spark, 10, 30).coalesce(1))  # v1's file now garbage
    t.append(_mk(spark, 30, 35).coalesce(1))
    n_parquet = lambda: sum(  # noqa: E731
        1 for root, _, names in os.walk(t.data_dir)
        for n in names if n.endswith(".parquet"))
    assert n_parquet() == 3
    deleted, expired = t.vacuum(retain_last=2)
    assert (deleted, expired) == (1, 1)          # v1's file + v1's json
    assert n_parquet() == 2
    assert _ids(t.read(spark)) == list(range(10, 35))
    assert _ids(t.read(spark, version=2)) == list(range(10, 30))
    with pytest.raises(FileNotFoundError):
        t.snapshot(1)                            # expired: no time travel
    # idempotent: nothing more to delete
    assert t.vacuum(retain_last=2) == (0, 0)


def test_merge_upserts_and_prunes_untouched_files(spark, tmp_path):
    """MERGE: matched keys update, unmatched insert; files whose footer
    key range cannot overlap the source bounds carry over by reference
    (path identity), only overlapping files rewrite."""
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "m"))
    t.append(_mk(spark, 0, 10))       # file A: keys 0..9
    t.append(_mk(spark, 100, 110))    # file B: keys 100..109
    before = {f["path"] for f in t.snapshot()["files"]}
    src = spark.range(5, 8).selectExpr(
        "id AS doc_id", "concat('new-', id) AS text").union(
        spark.range(200, 203).selectExpr(
            "id AS doc_id", "concat('new-', id) AS text")).coalesce(1)
    v = t.merge(spark, src, ["doc_id"])
    assert t.snapshot(v)["op"] == "merge"
    rows = {r.doc_id: r.text for r in t.read(spark).collect()}
    assert sorted(rows) == list(range(10)) + list(range(100, 110)) + \
        list(range(200, 203))
    for k in (5, 6, 7, 200, 201, 202):
        assert rows[k] == f"new-{k}"
    for k in (0, 4, 8, 100, 109):
        assert rows[k] == f"text-{k}"
    # every original file overlapped the source bounds [5,202], so all
    # were rewritten into the merge commit
    assert not ({f["path"] for f in t.snapshot()["files"]} & before)
    # append a file outside the next merge's bounds to prove carry-over
    t.append(_mk(spark, 1000, 1010))
    v2 = t.merge(spark, spark.range(5, 6).selectExpr(
        "id AS doc_id", "concat('again-', id) AS text").coalesce(1),
        ["doc_id"])
    assert t.read(spark).filter("doc_id = 5").collect()[0].text == "again-5"
    # snapshot isolation: the pre-merge version still reads the old text
    assert t.read(spark, v2 - 1).filter("doc_id = 5") \
        .collect()[0].text == "new-5"
    assert _ids(t.read(spark, v2 - 1)) == _ids(t.read(spark, v2))
    # pruning assertion: files covering 1000..1009 lie outside the
    # source bounds [5,5] and appear in BOTH v2-1 and v2 file lists
    # (same path => carried by reference, not rewritten)
    pre = {f["path"] for f in t.snapshot(v2 - 1)["files"]
           if f["min"].get("doc_id", 0) >= 1000}
    post = {f["path"] for f in t.snapshot(v2)["files"]
            if f["min"].get("doc_id", 0) >= 1000}
    assert pre and pre == post


def test_merge_into_empty_table(spark, tmp_path):
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "me"))
    v = t.merge(spark, _mk(spark, 0, 5), ["doc_id"])
    assert v == 1 and _ids(t.read(spark)) == list(range(5))


def test_merge_empty_source_is_noop(spark, tmp_path):
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "mn"))
    t.append(_mk(spark, 0, 5))
    v = t.merge(spark, _mk(spark, 0, 0), ["doc_id"])
    assert v == 1 and _ids(t.read(spark)) == list(range(5))


def test_schema_evolution_additive(spark, tmp_path):
    """append(merge_schema=True) adds nullable columns metadata-only:
    old files read back with NULLs, time travel keeps the old schema,
    and a type change refuses."""
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "se"))
    t.append(_mk(spark, 0, 5))
    widened = spark.range(5, 8).selectExpr(
        "id AS doc_id", "concat('text-', id) AS text",
        "id * 2 AS extra").coalesce(1)
    with pytest.raises(ValueError):
        t.append(widened)
    v = t.append(widened, merge_schema=True)
    got = {r.doc_id: r.extra for r in t.read(spark, v).collect()}
    assert sorted(got) == list(range(8))
    assert all(got[i] is None for i in range(5))
    assert all(got[i] == 2 * i for i in range(5, 8))
    # time travel: v1 still has the 2-column schema
    assert t.read(spark, 1).columns == ["doc_id", "text"]
    assert t.read(spark, v).columns == ["doc_id", "text", "extra"]
    # type mutation is not additive
    bad = spark.range(8, 9).selectExpr(
        "id AS doc_id", "CAST(id AS INT) AS text").coalesce(1)
    with pytest.raises(ValueError):
        t.append(bad, merge_schema=True)
    # merge against an evolved table requires the evolved schema
    with pytest.raises(ValueError):
        t.merge(spark, _mk(spark, 0, 2), ["doc_id"])
    v2 = t.merge(spark, spark.range(0, 2).selectExpr(
        "id AS doc_id", "concat('up-', id) AS text",
        "id * 10 AS extra").coalesce(1), ["doc_id"])
    rows = {r.doc_id: (r.text, r.extra)
            for r in t.read(spark, v2).collect()}
    assert rows[0] == ("up-0", 0) and rows[1] == ("up-1", 10)
    assert rows[4] == ("text-4", None)


def test_merge_rejects_null_keys(spark, tmp_path):
    from texoo_spark.tablelog import TableLog
    t = TableLog(str(tmp_path / "nk"))
    t.append(_mk(spark, 0, 5))
    bad = spark.createDataFrame(
        [(None, "x"), (1, "y")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-null"):
        t.merge(spark, bad, ["doc_id"])
