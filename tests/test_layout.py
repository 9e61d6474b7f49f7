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


def test_compaction_plan_groups_consecutive_and_covers_all(spark):
    from readability_spark.operators.layout import compaction_plan

    manifest = spark.createDataFrame(
        [(i, n) for i, n in enumerate([5, 5, 5, 90, 200, 3, 3, 3, 3, 50])],
        "file_id long, n long",
    )
    rows = sorted(compaction_plan(manifest, target_rows=100).collect(),
                  key=lambda r: r.group_id)
    # reference: greedy running-sum binning in file order
    sizes = [5, 5, 5, 90, 200, 3, 3, 3, 3, 50]
    cum, expect = 0, {}
    for fid, n in enumerate(sizes):
        gid = cum // 100
        a = expect.setdefault(gid, [0, 0, fid, fid])
        a[0] += 1
        a[1] += n
        a[3] = fid
        cum += n
    assert {r.group_id: [r.n_files, r.n_rows, r.first_file, r.last_file]
            for r in rows} == expect
    # every file appears exactly once; ranges are consecutive, non-overlapping
    assert sum(r.n_files for r in rows) == len(sizes)
    for a, b in zip(rows, rows[1:]):
        assert b.first_file == a.last_file + 1
    # the undersized flag is exactly the n_rows < target rule
    for r in rows:
        assert r.undersized == (r.n_rows < 100)
