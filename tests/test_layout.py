"""Z-order layout: bit-interleave correctness + the pruning property that
motivates it (every file's bounding box is tight in BOTH dimensions)."""

from pyspark.sql import functions as F

from readability_spark.operators.layout import zorder_key, zorder_layout, zorder_sql


def _morton(x, y, bits):
    k = 0
    for i in range(bits):
        k |= ((x >> i) & 1) << (2 * i)
        k |= ((y >> i) & 1) << (2 * i + 1)
    return k


def test_zorder_key_matches_reference_and_is_bijective(spark):
    grid = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    rows = grid.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=5).alias("z")
    ).collect()
    zs = set()
    for r in rows:
        assert r["z"] == _morton(r["x"], r["y"], 5)
        zs.add(r["z"])
    assert zs == set(range(1024))  # bijection on the grid


def test_zorder_sql_mirrors_spark_expression(spark):
    import duckdb

    want = {(x, y): _morton(x, y, 4) for x in range(16) for y in range(16)}
    expr = zorder_sql(["x", "y"], bits=4)
    got = duckdb.sql(
        f"SELECT x, y, ({expr}) AS z FROM (SELECT r % 16 AS x, r // 16 AS y "
        "FROM (SELECT unnest(generate_series(0, 255)) AS r))"
    ).fetchall()
    assert {(x, y): z for x, y, z in got} == want


def test_zorder_layout_bboxes_are_tight(spark):
    # 8-bit dims, 6 file bits -> each file fixes the top 3 bits of BOTH dims,
    # so no file's bbox may span more than 2^5 = 32 in either dimension.
    df = spark.range(5000).select(
        ((F.col("id") * 37) % 256).alias("xb"), ((F.col("id") * 101) % 256).alias("yb")
    )
    stats = zorder_layout(df, ["xb", "yb"], bits=8, file_bits=6).collect()
    assert sum(r["n"] for r in stats) == 5000
    for r in stats:
        assert r["max_xb"] - r["min_xb"] <= 31
        assert r["max_yb"] - r["min_yb"] <= 31
