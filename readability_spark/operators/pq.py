"""Product quantization ANN (Jégou, Douze & Schmid 2011, TPAMI 33(1)).

The compression half of the canonical 100-TB vector-search stack
(IVF-PQ): split each d-dim embedding into ``m`` subvectors, learn a
small ``k``-codeword codebook per subspace with k-means, and store each
vector as ``m`` code ids — d·4 bytes become m bytes (64-dim float32 →
4 bytes here, 64× compression). Queries run ADC (asymmetric distance
computation): one tiny per-query lookup table of query-to-codeword
subdistances, then every database vector's approximate distance is a
sum of ``m`` table lookups — no float vector is ever touched at scan
time. Complements the recall-oriented IVF/LSH paths in similarity.py
(ivf_topk / lsh_topk); a production deployment composes them (IVF cell
probe → PQ-compressed rerank).

Determinism / oracle story (the semdedup.py scheme, applied per
subspace with L2 instead of cosine):
- initial codewords are seeded md5-nibble pseudo-random vectors
  (similarity.seeded_planes, seed offset per subspace);
- each Lloyd update quantizes codeword components to 1e-6, absorbing
  the ~1e-12 float-mean drift between engines, so the trained codebooks
  are bit-identical in the DuckDB oracle;
- every subdistance entering the ADC sum is quantized to integer
  micro-units (floor(d2·1e6 + 0.5) as bigint), so the ADC total is an
  ORDER-INDEPENDENT integer sum — no float-accumulation divergence can
  reorder the top-k between engines.

Recall framing: ADC ranks by quantized distance, so on the synthetic
uniform corpus — pairwise-L2 coefficient of variation 0.063, the
distance-concentration worst case for any quantizer — pure ADC order is
near-random. The operator therefore ships the production composition:
ADC selects a constant-size shortlist, exact L2 reranks it. Recall then
rises monotonically with the shortlist size and reaches exact when the
shortlist covers the table (pinned in tests/test_pq.py); at 100 TB the
shortlist stays ~100 rows per query while the ADC scan reads only the
m-byte codes, which is the entire point of PQ.

Plan shape at scale:
- training touches (vec, sub, pos, double) rows in one groupBy per
  Lloyd iteration; the codebook result is m·k·(d/m) doubles — KBs,
  always broadcast;
- encoding is one scan against the broadcast codebook with a map-side
  combined min_by — the shuffle carries one (vec, sub, code) row per
  subvector, never the float payloads;
- the ADC scan is one broadcast join of the (query, sub, code) lookup
  table onto the codes plus a map-side-combinable integer sum — the
  whole query phase moves only longs;
- shortlist selection is the salted two-phase top-L (snapshots.py's
  shape): rank within (query, pmod(vec_id, salts)) first, then rank the
  ≤ L·salts survivors — no query's full N-row ADC column ever sorts in
  one task; the exact rerank joins the broadcast Q·L shortlist back to
  the float vectors, touching only shortlisted rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readability_spark.operators.similarity import (
    DEFAULT_PLANE_SEED,
    _infer_dim,
    seeded_planes,
)

PQ_M = 8          # subspaces
PQ_K = 64         # codewords per subspace
PQ_LLOYD_ITERS = 2
PQ_RERANK = 100   # ADC shortlist size fed to the exact reranker
PQ_SALTS = 16


def _sub_l2(a, b):
    """Left-to-right folded squared L2 — same accumulation order as the
    oracle's sequential list_sum, so the doubles match bit-for-bit."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_subvectors(emb: DataFrame, m: int = PQ_M) -> DataFrame:
    """(vec_id, sub, sv): the m contiguous d/m-dim slices of each vector."""
    d = _infer_dim(emb) // m
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice("embedding", s * d + 1, d).alias("sv"),
            )
            for s in range(m)
        ]
    )
    return emb.select("vec_id", F.explode(slices).alias("p")).select(
        "vec_id", F.col("p.sub").alias("sub"), F.col("p.sv").alias("sv")
    )


def pq_init_codebooks(
    spark: SparkSession, dim: int, m: int = PQ_M, k: int = PQ_K,
    seed: int = DEFAULT_PLANE_SEED,
) -> DataFrame:
    """(sub, code_id, cw) — seeded pseudo-random initial codewords; the
    per-subspace seed offset keeps the m codebooks independent."""
    parts = [
        seeded_planes(spark, k, dim // m, seed * 100 + s).select(
            F.lit(s).alias("sub"),
            F.col("plane_id").alias("code_id"),
            F.col("p_emb").alias("cw"),
        )
        for s in range(m)
    ]
    cb = parts[0]
    for p in parts[1:]:
        cb = cb.unionByName(p)
    return cb


def _pq_assign(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, sub, code): nearest codeword by squared L2, ties to the
    lowest code_id — one broadcast join + map-side-combined min_by."""
    scored = subs.join(F.broadcast(cb), "sub").select(
        "vec_id",
        "sub",
        "code_id",
        _sub_l2(F.col("sv"), F.col("cw")).alias("d2"),
    )
    return scored.groupBy("vec_id", "sub").agg(
        F.min_by(
            F.col("code_id"), F.struct(F.col("d2"), F.col("code_id"))
        ).alias("code")
    )


def _pq_lloyd_update(
    subs: DataFrame, assign: DataFrame, cb: DataFrame, subdim: int
) -> DataFrame:
    """New codeword = per-(sub, code) component mean quantized to 1e-6;
    empty codes keep the previous codeword (semdedup._lloyd_update per
    subspace). The ``subdim`` component means are direct ``avg(sv[i])``
    aggregate columns over ONE (sub, code) shuffle — the earlier
    posexplode + per-(sub, code, pos) shuffle + collect_list re-assembly
    was a second exchange and a per-element row blow-up for the same
    math. The result is m·k rows — broadcast-sized at any corpus size."""
    comp = (
        subs.join(assign, ["vec_id", "sub"])
        .groupBy("sub", "code")
        .agg(
            *[
                F.avg(F.col("sv")[i].cast("double")).alias(f"_m{i}")
                for i in range(subdim)
            ]
        )
    )
    arrs = comp.select(
        "sub",
        "code",
        F.array(
            *[F.floor(F.col(f"_m{i}") * 1e6 + 0.5) / 1e6 for i in range(subdim)]
        ).alias("new_cw"),
    )
    return (
        cb.join(
            arrs,
            (cb.sub == arrs.sub) & (cb.code_id == arrs.code),
            "left",
        )
        .select(
            cb.sub.alias("sub"),
            "code_id",
            F.coalesce(F.col("new_cw"), F.col("cw")).alias("cw"),
        )
    )


def pq_train(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    lloyd_iters: int = PQ_LLOYD_ITERS,
    seed: int = DEFAULT_PLANE_SEED,
    _subs: "DataFrame | None" = None,
) -> DataFrame:
    """Train the m per-subspace codebooks; returns (sub, code_id, cw),
    localCheckpointed (tiny, and consumed by the encode + query-table
    branches — the cut stops each branch re-running the Lloyd chain).

    Each Lloyd iteration references ``subs`` twice (assign + update) and
    the previous codebook twice (assign + empty-code fallback), so an
    un-checkpointed chain re-executes the subvector explode ~3^iters
    times in the single materializing action. ``subs`` is checkpointed
    once and the m·k-row codebook is checkpointed per iteration — one
    tiny job each — keeping the plan linear in ``lloyd_iters``.
    ``_subs``: pre-checkpointed subvector table to reuse (pq_adc_topk
    passes its own so encode and train share one explode)."""
    subs = pq_subvectors(emb, m).localCheckpoint(eager=False) if _subs is None else _subs
    dim = _infer_dim(emb)
    cb = pq_init_codebooks(emb.sparkSession, dim, m, k, seed)
    for _ in range(lloyd_iters):
        cb = _pq_lloyd_update(subs, _pq_assign(subs, cb), cb, dim // m).localCheckpoint()
    return cb if lloyd_iters > 0 else cb.localCheckpoint()


def _topl(df: DataFrame, order_col: str, limit: int, n_salts: int = PQ_SALTS) -> DataFrame:
    """Salted two-phase per-query top-L ascending on (order_col, vec_id):
    phase 1 ranks within (query_id, pmod(vec_id, salts)) — the true top-L
    all survive their own salt's cut — phase 2 ranks ≤ L·salts rows."""
    order = [F.asc(order_col), F.asc("vec_id")]
    w1 = Window.partitionBy("query_id", "_salt").orderBy(*order)
    p1 = (
        df.withColumn("_salt", F.pmod(F.col("vec_id"), F.lit(n_salts)))
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= limit)
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        p1.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= limit)
        .drop("_salt", "_r1")
    )


def pq_adc_topk(
    emb: DataFrame,
    m: int = PQ_M,
    k_codes: int = PQ_K,
    n_queries: int = 5,
    k: int = 10,
    lloyd_iters: int = PQ_LLOYD_ITERS,
    rerank: int = PQ_RERANK,
    seed: int = DEFAULT_PLANE_SEED,
) -> DataFrame:
    """PQ ANN top-k: (query_id, rank, vec_id, d2_micro).

    ADC ranks every code row against the per-query lookup table, a
    constant-size shortlist of ``rerank`` candidates survives, and exact
    squared L2 (in the same integer micro-units) reranks the shortlist —
    both distances quantized so ordering is engine-exact. ``rerank=0``
    returns the pure-ADC ordering (d2_micro is then the ADC estimate)."""
    # one subvector explode shared by training, encoding, and the query
    # table (it feeds 2·lloyd_iters + 2 plan references)
    subs = pq_subvectors(emb, m).localCheckpoint(eager=False)
    cb = pq_train(emb, m, k_codes, lloyd_iters, seed, _subs=subs)
    codes = _pq_assign(subs, cb)
    qsubs = subs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "sub", F.col("sv").alias("qsv")
    )
    dtable = qsubs.join(F.broadcast(cb), "sub").select(
        "query_id",
        "sub",
        F.col("code_id").alias("code"),
        F.floor(_sub_l2(F.col("qsv"), F.col("cw")) * 1e6 + 0.5)
        .cast("long")
        .alias("d2_micro"),
    )
    adc = (
        codes.join(F.broadcast(dtable), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2_micro").alias("adc_micro"))
    )
    if not rerank:
        return _topl(adc, "adc_micro", k).select(
            "query_id", "rank", "vec_id", F.col("adc_micro").alias("d2_micro")
        )
    short = _topl(adc, "adc_micro", rerank).select("query_id", "vec_id")
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    exact = (
        emb.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.floor(_sub_l2(F.col("q_emb"), F.col("embedding")) * 1e6 + 0.5)
            .cast("long")
            .alias("d2_micro"),
        )
    )
    return _topl(exact, "d2_micro", k).select(
        "query_id", "rank", "vec_id", "d2_micro"
    )
