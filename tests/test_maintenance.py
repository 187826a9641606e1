"""T7 purge job: physical cascade delete of soft-deleted rows, the
Spark analog of the reference's daily cron
(/root/reference/config/bootstrap.js:19-26, DeleteService.js:1-16)."""

import json

from nadeefiler_spark.maintenance import main, purge_soft_deleted
from nadeefiler_spark.tableio import ParquetDirIO


def _store(spark, tmp_path):
    io = ParquetDirIO(spark, str(tmp_path))
    io.append(
        spark.createDataFrame(
            [(1, False), (2, True), (3, None), (4, True)],
            "id int, deleted boolean",
        ),
        "datasets",
    )
    io.append(
        spark.createDataFrame(
            [(10, 1), (11, 2), (12, 2), (13, 3), (14, 4)],
            "tid int, dataset_id int",
        ),
        "tuples",
    )
    return io


def test_purge_cascades_children_then_parent(spark, tmp_path):
    io = _store(spark, tmp_path)
    counts = purge_soft_deleted(
        spark, io, "datasets", [("tuples", "dataset_id")]
    )
    assert counts == {"tuples": 3, "datasets": 2}
    ids = {r["id"] for r in io.read("datasets", "id int, deleted boolean").collect()}
    assert ids == {1, 3}  # NULL flag is "not deleted"
    tids = {r["tid"] for r in io.read("tuples", "tid int, dataset_id int").collect()}
    assert tids == {10, 13}


def test_purge_is_idempotent(spark, tmp_path):
    io = _store(spark, tmp_path)
    purge_soft_deleted(spark, io, "datasets", [("tuples", "dataset_id")])
    counts = purge_soft_deleted(
        spark, io, "datasets", [("tuples", "dataset_id")]
    )
    assert counts == {"tuples": 0, "datasets": 0}


def test_purge_missing_or_flagless_tables_is_noop(spark, tmp_path):
    io = ParquetDirIO(spark, str(tmp_path))
    assert purge_soft_deleted(spark, io, "nope") == {}
    io.append(spark.createDataFrame([(1,)], "id int"), "flagless")
    assert purge_soft_deleted(spark, io, "flagless") == {}


def test_purge_cli_entrypoint(spark, tmp_path, capsys):
    _store(spark, tmp_path)
    out = main(
        ["--base-dir", str(tmp_path), "--parent", "datasets",
         "--child", "tuples:dataset_id"],
        spark=spark,
    )
    assert out["purged"] == {"tuples": 3, "datasets": 2}
    assert json.loads(capsys.readouterr().out.strip())["purged"]["datasets"] == 2


def test_clean_column_names(spark, tmp_path):
    """F7: header-derived names parquet would reject are sanitized,
    deduped, and persistable; clean names pass through untouched."""
    from nadeefiler_spark.sources import clean_column_names, read_tuples_csv

    p = tmp_path / "u.csv"
    p.write_text("price (usd),price {usd},_id,,a;b\n1,2,3,4,5\n")
    df = read_tuples_csv(spark, str(p))
    assert df.columns == ["price_usd", "price_usd_2", "_id", "_c3", "a_b"]
    out = tmp_path / "t"
    df.write.parquet(str(out))  # would raise on the raw header names
    assert spark.read.parquet(str(out)).count() == 1
    # idempotent, and a no-op on already-clean names
    assert clean_column_names(df).columns == df.columns


def test_clean_column_names_with_order(spark, tmp_path):
    from nadeefiler_spark.sources import read_tuples_csv

    p = tmp_path / "u.csv"
    p.write_text("k (x)\nb\na\n")
    df = read_tuples_csv(spark, str(p), with_order=True)
    assert set(df.columns) == {"k_x", "__order"}
    rows = {(r["k_x"], r["__order"]) for r in df.collect()}
    assert rows == {("b", 0), ("a", 1)}
