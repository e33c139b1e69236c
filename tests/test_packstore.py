"""Pack store: npz-shaped pack reconstruction and compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from tower_parse_spark.streaming.packstore import compact_packs, read_packs


def write_layout(spark, path: str) -> None:
    """2 groups x 2 packs x 3 rows in the sink's partitioned layout."""
    rows = []
    for lvl in (1, 2):
        for pack in (0, 1):
            for seq in range(3):
                t = lvl * 100.0 + pack * 10 + seq
                rows.append((lvl, pack, seq, t, t + 0.5))
    df = spark.createDataFrame(
        rows, "level int, pack_id long, pack_seq long, time double, rh double"
    )
    df.write.mode("overwrite").partitionBy("level", "pack_id").parquet(path)


def test_read_packs_npz_shape(spark, tmp_path):
    path = str(tmp_path / "packs")
    write_layout(spark, path)
    out = read_packs(spark, path, "level").collect()
    assert len(out) == 4  # 2 groups x 2 packs
    r = {(row["level"], row["pack_id"]): row for row in out}[(1, 0)]
    assert r["n_rows"] == 3
    # vectors come back in pack_seq (arrival) order, npz-style —
    # including the full time vector (readport.py:392-405)
    assert r["rh"] == [100.5, 101.5, 102.5]
    assert r["time"] == [100.0, 101.0, 102.0]
    assert (r["t_min"], r["t_max"]) == (100.0, 102.0)


def test_compact_preserves_content_and_shrinks_files(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    write_layout(spark, src)
    n_src_files = len(
        [f for f in spark.read.parquet(src).inputFiles()]
    )
    compact_packs(spark, src, dest, "level", target_file_mb=128)
    a = sorted(
        map(
            tuple,
            spark.read.parquet(src)
            .select("level", "pack_id", "pack_seq", "time", "rh")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            spark.read.parquet(dest)
            .select("level", "pack_id", "pack_seq", "time", "rh")
            .collect(),
        )
    )
    assert a == b  # bit-identical content
    n_dest_files = len([f for f in spark.read.parquet(dest).inputFiles()])
    assert n_dest_files < n_src_files  # 4 pack dirs collapse
    # readers are layout-agnostic: same npz-shaped reconstruction
    packs = read_packs(spark, dest, "level").collect()
    assert {(r["level"], r["pack_id"]) for r in packs} == {
        (1, 0), (1, 1), (2, 0), (2, 1),
    }
