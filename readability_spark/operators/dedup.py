"""Deduplication operators for training-data pipelines.

Four families over the ``documents`` table, all expressed with JVM-side
column expressions and shuffles that scale (no driver-side loops, no Python
UDFs). Hash choice is md5 — portable across Spark and DuckDB so every stage
has an exact SQL oracle. Pair generation is always candidate-banded (never a
blind cross join): at 10^12 docs only same-bucket pairs are materialized.

A deterministic duplicate-injection helper makes the small test tables
actually contain duplicates so the queries return non-trivial results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DUP_OFFSET = 1_000_000


def round4(col):
    """Engine-portable 4-decimal rounding: floor(x*1e4 + 0.5)/1e4 — the same
    double operations on both Spark and DuckDB, so no banker's/HALF_UP
    boundary disagreements in value-hash comparisons."""
    return F.floor(col * 10000.0 + 0.5) / 10000.0


def with_injected_duplicates(docs: DataFrame, every: int = 10) -> DataFrame:
    """documents ∪ copies of every `every`-th doc (doc_id += DUP_OFFSET).

    Deterministic, SQL-expressible (the oracle applies the same union), and
    gives dedup queries real duplicates to find.
    """
    dupes = docs.filter((F.col("doc_id") % every) == 0).withColumn(
        "doc_id", F.col("doc_id") + DUP_OFFSET
    )
    return docs.unionByName(dupes)


# ---------------------------------------------------------------------------
# 1. Exact dedup: hash-groupBy (map-side combine; one shuffle on the hash)
# ---------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame, max_ids: int = 100) -> DataFrame:
    """Groups of byte-identical texts: (fp, n_copies, keep_id, dup_ids...).

    ``doc_ids`` is capped at the ``max_ids`` smallest ids per group — an
    adversarial corpus can put millions of copies behind one fingerprint.
    The cap is applied BEFORE any list materializes: ids are ranked with a
    window (sort-based, disk-spillable) and only rank <= max_ids rows reach
    collect_list, so aggregation state is bounded too — a post-agg slice
    would still buffer the full multi-million-element array first.
    ``n_copies`` always carries the true count.
    """
    from pyspark.sql.window import Window

    w_fp = docs.select(F.md5("text").alias("fp"), "doc_id")
    stats = w_fp.groupBy("fp").agg(
        F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_id")
    )
    rn = F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    capped_ids = (
        w_fp.withColumn("rn", rn)
        .filter(F.col("rn") <= max_ids)
        .groupBy("fp")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("doc_ids"))
    )
    return (
        stats.filter(F.col("n_copies") > 1)
        .join(capped_ids, "fp")
        .select("fp", "n_copies", "keep_id", "doc_ids")
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """The dedup itself: keep the smallest doc_id per identical text."""
    w_fp = docs.select("doc_id", F.md5("text").alias("fp"))
    keep = w_fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return keep.join(w_fp.select("doc_id", "fp"), ["fp", "doc_id"]).select("doc_id", "fp")


# ---------------------------------------------------------------------------
# 2. MinHash + LSH (shingle → K minhashes → bands → bucket join → verify)
# ---------------------------------------------------------------------------

def _shingles(col, size: int = 3):
    toks = F.split(col, " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - size, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, size)),
        )
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 16) -> DataFrame:
    """K minhash values per doc. 'Permutation' k = md5 keyed by the hash
    index; the minimum is lexicographic over hex strings (portable).

    Plan shape: explode shingles → K md5s per (doc, shingle) → groupBy-min.
    The explode prevents Catalyst's CollapseProject from re-inlining (and
    re-computing) the shingle expression K times, and the min-aggregate gets
    map-side partial aggregation — one cheap shuffle of K×32-byte rows.
    """
    exploded = docs.select("doc_id", F.explode(_shingles(F.col("text"))).alias("s"))
    sig_cols = [
        F.min(F.md5(F.concat(F.lit(f"{k}:"), F.col("s")))).alias(f"mh{k}")
        for k in range(num_hashes)
    ]
    return exploded.groupBy("doc_id").agg(*sig_cols)


def minhash_band_buckets(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(doc_id, band, key) LSH bucket rows: the K signatures split into
    ``bands`` groups, each group md5-combined into one bucket key."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                )
            ).alias("key"),
        )
        for b in range(bands)
    ]
    return sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    _stages: "dict | None" = None,
) -> DataFrame:
    """Candidate pairs from LSH banding, verified with exact shingle Jaccard.

    Scale shape: one shuffle to explode (doc, band, band_key), a self-join on
    (band, band_key) — only same-bucket pairs materialize — then the verify
    join recomputes shingle sets for candidates only.

    ``_stages``: optional dict the intermediate DataFrames are stuffed into
    (bench cardinality reporting — candidate volume is the number that
    predicts 100x behavior).
    """
    # 4 small (long, int, 32-byte) rows per doc, consumed by both self-join
    # sides — checkpoint so the K-md5s-per-shingle signature pipeline runs
    # once, not once per side (self-join aliasing defeats exchange reuse)
    buckets = minhash_band_buckets(docs, num_hashes, bands).localCheckpoint(
        eager=False
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    if _stages is not None:
        _stages["band_rows"] = buckets
        _stages["candidate_pairs"] = cands
    # verify side: the shingle arrays join in twice (id_a, id_b) — one
    # materialization instead of two text scans
    sh = docs.select("doc_id", _shingles(F.col("text")).alias("sh")).localCheckpoint(
        eager=False
    )
    return (
        cands.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            round4(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def incremental_minhash_new(
    new_docs: DataFrame,
    history: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-dup admission for a crawl increment: is each NEW document a
    near-duplicate of anything already in the corpus? The companion of
    :func:`~readability_spark.operators.bloom.incremental_new_docs` (exact
    hashes there, minhash similarity here) — the pass a daily-crawl
    pipeline runs before admitting documents into the training corpus.

    Bands the new docs and probes the history's bucket table; only
    colliding (new, history) pairs are verified with exact shingle Jaccard
    (over ALL candidates, not just those above the threshold, so
    ``max_jaccard`` is informative). Returns one row per new doc:
    ``(doc_id, n_candidates, max_jaccard, is_new)`` with ``is_new`` true
    when no verified history neighbor reaches ``jaccard_threshold``.

    Scale shape at 100 TB: the history side's signatures/buckets are
    computed once per corpus snapshot in production and persisted (here
    recomputed — same plan); the probe join keys are (band, 32-hex-key)
    short strings, the increment side is small by definition, and the
    verify join touches candidates only. No new-vs-new comparison happens
    (that's :func:`minhash_lsh_pairs` within the increment).
    """
    buckets_new = minhash_band_buckets(new_docs, num_hashes, bands)
    buckets_hist = minhash_band_buckets(history, num_hashes, bands)
    cands = (
        buckets_new.join(
            buckets_hist.withColumnRenamed("doc_id", "hist_id"), ["band", "key"]
        )
        .select("doc_id", "hist_id")
        .distinct()
    )
    sh_new = new_docs.select("doc_id", _shingles(F.col("text")).alias("sh_a"))
    sh_hist = history.select(
        F.col("doc_id").alias("hist_id"), _shingles(F.col("text")).alias("sh_b")
    )
    verified = (
        cands.join(sh_new, "doc_id")
        .join(sh_hist, "hist_id")
        .select(
            "doc_id",
            round4(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_candidates"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )
    return (
        new_docs.select("doc_id")
        .join(verified, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.col("max_jaccard"),
            (
                F.col("max_jaccard").isNull()
                | (F.col("max_jaccard") < jaccard_threshold)
            ).alias("is_new"),
        )
    )


# ---------------------------------------------------------------------------
# 3. SimHash (32-bit, portable nibble arithmetic) + byte-banding near-dup
# ---------------------------------------------------------------------------

def _hash32_expr(token_col: str, locate_fn: str = "instr", offset: int = 0) -> str:
    """32-bit integer from 8 hex chars of md5 (starting at ``offset``) — via
    nibble decode, identical semantics in Spark SQL (instr) and DuckDB
    (strpos)."""
    parts = []
    for i in range(8):
        parts.append(
            f"({locate_fn}('0123456789abcdef', substr(md5({token_col}), {offset + i + 1}, 1)) - 1) "
            f"* cast(pow(16, {7 - i}) as bigint)"
        )
    return "(" + " + ".join(parts) + ")"


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """Per-doc 32-bit simhash: sign of per-bit vote sums over token hashes."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).withColumn("h", F.expr("cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint)"))
    votes = [
        F.sum(
            F.when(((F.col("h") / F.lit(2**i)).cast("long") % 2) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim = sum(
        F.when(F.col(f"v{i}") >= 0, F.lit(2**i)).otherwise(F.lit(0)) for i in range(bits)
    )
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """DEMO ONLY — not a production path and not exposed in `queries()`.

    Near-dup pairs: band the 32-bit simhash into 4 bytes; pairs sharing
    any byte are candidates (pigeonhole: hamming<=3 ⇒ one byte equal);
    verify by popcount of xor. The 8-bit band keys cap at 256 buckets per
    band, so the banded self-join goes quadratic past ~10^8 docs; use
    `simhash64_near_pairs` (4×16-bit bands, 65,536 buckets) at scale."""
    sh = simhash(docs)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        ((F.col("simhash") / F.lit(2 ** (8 * i))).cast("long") % 256).alias(
                            "key"
                        ),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.expr("bit_count(sh_a ^ sh_b)")
    return (
        cands.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# 3b. SimHash64 (two portable 32-bit halves) + 4×16-bit banding — prod path
# ---------------------------------------------------------------------------

def simhash64(docs: DataFrame, use_xxhash64: bool = False) -> DataFrame:
    """Per-doc 64-bit simhash as two 32-bit halves (sim_hi, sim_lo).

    The 32-bit variant's 8-bit band keys cap out at 256 buckets per band —
    quadratic candidate joins at 10^9+ docs (VERDICT r1). 64 bits with
    4×16-bit bands gives 65,536 buckets per band, and the wider hash stops
    false bit-collisions dominating the vote sums at corpus scale.

    Token hash = first 16 hex chars of md5 (hi: chars 1-8, lo: 9-16) — the
    same nibble arithmetic runs in DuckDB, so the full pipeline keeps an
    exact SQL oracle. ``use_xxhash64=True`` swaps in Spark's JVM-native
    ``xxhash64`` split into two halves — cheaper per token, for prod jobs
    that don't need cross-engine oracle parity.
    """
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    if use_xxhash64:
        # xxhash64 is signed; take the low 32 bits of each half via
        # floor-division against 2^32 after shifting into non-negative space
        h64 = F.xxhash64("tok")
        toks = toks.withColumn("h_hi", F.shiftrightunsigned(h64, 32)).withColumn(
            "h_lo", h64.bitwiseAND(F.lit(0xFFFFFFFF))
        )
    else:
        # conv(hex, 16, 10) == the oracle's nibble arithmetic (verified
        # value-identical) at 1/8 the expression work per token
        toks = toks.withColumn(
            "h_hi", F.expr("cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint)")
        ).withColumn(
            "h_lo", F.expr("cast(conv(substr(md5(tok), 9, 8), 16, 10) as bigint)")
        )
    votes = [
        F.sum(
            F.when(((F.col("h_hi") / F.lit(2**i)).cast("long") % 2) == 1, 1).otherwise(-1)
        ).alias(f"hv{i}")
        for i in range(32)
    ] + [
        F.sum(
            F.when(((F.col("h_lo") / F.lit(2**i)).cast("long") % 2) == 1, 1).otherwise(-1)
        ).alias(f"lv{i}")
        for i in range(32)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim_hi = sum(
        F.when(F.col(f"hv{i}") >= 0, F.lit(2**i)).otherwise(F.lit(0)) for i in range(32)
    )
    sim_lo = sum(
        F.when(F.col(f"lv{i}") >= 0, F.lit(2**i)).otherwise(F.lit(0)) for i in range(32)
    )
    return agg.select(
        "doc_id", sim_hi.cast("long").alias("sim_hi"), sim_lo.cast("long").alias("sim_lo")
    )


def simhash64_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    use_xxhash64: bool = False,
    bucket_cap: int = 64,
    _stages: "dict | None" = None,
) -> DataFrame:
    """Near-dup pairs on the 64-bit simhash: 4 bands of 16 bits each
    (pigeonhole: hamming<=3 ⇒ at least one band equal), verify by popcount.

    Scale shape: 65,536 buckets per band keep per-bucket membership ~N/2^16
    on high-entropy corpora — but template-similar populations (mirrors,
    forums, listing pages) concentrate into a few band buckets and the
    bucket-local self-join goes quadratic (measured 105× candidate growth
    per 10× docs on the low-entropy synthetic corpus, BENCH/CARDINALITY.md
    pre-r4). So buckets past ``bucket_cap`` members are *refined*, not
    joined directly: each hot-bucket member re-bands its remaining 48 bits
    into 4 sub-bands of 12 bits and the join adds (sub, subkey) to the key.

    The refinement is EXACT for ``max_hamming <= 3``: a near pair that is
    band-equal in a hot band has ≤3 differing bits among the other 48, so
    by pigeonhole at least one 12-bit sub-band is equal — no verified pair
    is lost, which is why the SQL oracle keeps the plain one-level banding.
    (Measured on the 55k-doc low-entropy sweep: verified pairs identical at
    every cap in {32,64,128,256,∞}; the default 64 minimizes the decade-2
    candidate growth ratio, 105× uncapped → 26×. BENCH/CARDINALITY.md.)
    Per-bucket candidate volume drops from c² to Σ(sub-bucket²): hot-bucket
    members must now agree on 28 bits (16+12) rather than 16 to meet.
    Worst-case identical-hash floods remain quadratic — those pairs ARE all
    verified near-dups, so the output itself is quadratic (output-sensitive
    cost, the property that survives 100×).

    Plan: one extra same-key count aggregation + join to tag bucket sizes
    (map-side combined, (long,long,long) rows), then cold/hot split —
    two joins instead of one, both on bounded buckets.
    """
    return hash64_near_pairs(
        simhash64(docs, use_xxhash64=use_xxhash64),
        max_hamming=max_hamming,
        bucket_cap=bucket_cap,
        _stages=_stages,
    )


def _hash64_value_pairs(
    sig: DataFrame,
    max_hamming: int = 3,
    bucket_cap: int = 64,
    _stages: "dict | None" = None,
):
    """Shared banding core: returns ``(sh, dh, vpairs)`` — the checkpointed
    signature table, the distinct-value roll-up ``(sim_hi, sim_lo, members,
    rep)``, and the verified DISTINCT-VALUE near pairs ``(hi_a, lo_a, hi_b,
    lo_b, hamming)`` at 1..max_hamming. :func:`hash64_near_pairs` expands
    these to all document pairs; :func:`hash64_cluster_edges` to the
    star-reduced connectivity edge set."""
    if max_hamming > 3:
        # both pigeonhole arguments (4 bands of 16; 4 sub-bands of 12 on the
        # hot path) are sound only up to 3 differing bits
        raise ValueError("hash64_near_pairs supports max_hamming <= 3")
    # The signature table is 3 longs/doc but feeds several branches (the
    # distinct-hash roll-up, both sides of the hamming-0 self-join, and the
    # two pair-expansion joins) and self-join aliasing defeats exchange
    # reuse — without the cut, the signature computation (token-explode +
    # 64-vote aggregation, or an Arrow image decode) runs once per branch.
    # Lazy local checkpoint = compute once on first action.
    sh = sig.localCheckpoint(eager=False)
    # Band over DISTINCT hash VALUES, not rows. Identical-signature floods
    # (byte-identical copies, template farms — the population that made the
    # pre-r4 row-level banding go quadratic in CANDIDATES) collapse to one
    # banded row each; `members` keeps the flood size so bucket-heat is
    # still judged on rows, and the hamming-0 pairs those floods owe the
    # output come from one plain equi-join on the full hash below instead
    # of surviving a 4x-banded candidate pile + distinct.
    # NOT checkpointed: a lazy checkpoint nested under sh's would become
    # the topmost marked RDD, and doCheckpoint only materializes the first
    # marked ancestor — sh's blocks would never persist and the expensive
    # signature computation would re-run per branch. The roll-up is a plain
    # aggregate whose shuffle exchange Spark reuses across the cold/hot/
    # count branches (ReusedExchange), which is all the sharing it needs.
    dh = sh.groupBy("sim_hi", "sim_lo").agg(
        F.count("*").alias("members"), F.min("doc_id").alias("rep")
    )
    band_structs = [
        F.struct(F.lit(0).alias("band"), (F.col("sim_hi") / F.lit(65536)).cast("long").alias("key")),
        F.struct(F.lit(1).alias("band"), (F.col("sim_hi") % 65536).alias("key")),
        F.struct(F.lit(2).alias("band"), (F.col("sim_lo") / F.lit(65536)).cast("long").alias("key")),
        F.struct(F.lit(3).alias("band"), (F.col("sim_lo") % 65536).alias("key")),
    ]
    bands = dh.select(
        "sim_hi", "sim_lo", "members", F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        "sim_hi", "sim_lo", "members",
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
    )
    # bucket heat counts ROWS (member-weighted), same meaning as the
    # pre-distinct implementation: a bucket is hot when many documents land
    # in it, however many distinct hashes they carry
    counts = bands.groupBy("band", "key").agg(F.sum("members").alias("bk_n"))
    # counts is bounded by 4 bands × 2^16 keys = 262,144 rows at ANY corpus
    # size — always broadcast; the size tag never costs bands a shuffle
    tagged = bands.join(F.broadcast(counts), ["band", "key"])
    cold = tagged.filter(F.col("bk_n") <= bucket_cap)
    hot = tagged.filter(F.col("bk_n") > bucket_cap)
    # the 48 bits outside this row's band, as one bigint (< 2^48, exact)
    rem = F.expr(
        "CASE band "
        "WHEN 0 THEN (sim_hi % 65536) * 4294967296 + sim_lo "
        "WHEN 1 THEN (sim_hi div 65536) * 4294967296 + sim_lo "
        "WHEN 2 THEN sim_hi * 65536 + (sim_lo % 65536) "
        "ELSE sim_hi * 65536 + (sim_lo div 65536) END"
    )
    sub_structs = [
        F.struct(
            F.lit(j).alias("sub"),
            ((F.col("rem") / F.lit(4096**j)).cast("long") % 4096).alias("subkey"),
        )
        for j in range(4)
    ]
    hot_sub = (
        hot.withColumn("rem", rem)
        .select(
            "sim_hi", "sim_lo", "band", "key",
            F.explode(F.array(*sub_structs)).alias("sk"),
        )
        .select(
            "sim_hi", "sim_lo", "band", "key",
            F.col("sk.sub").alias("sub"), F.col("sk.subkey").alias("subkey"),
        )
    )

    def _pairs(side: DataFrame, keys: list) -> DataFrame:
        # candidate pairs of DISTINCT hash values, ordered lexicographically
        # on (hi, lo) so each unordered value pair appears once
        a, b = side.alias("a"), side.alias("b")
        lex_lt = (F.col("a.sim_hi") < F.col("b.sim_hi")) | (
            (F.col("a.sim_hi") == F.col("b.sim_hi"))
            & (F.col("a.sim_lo") < F.col("b.sim_lo"))
        )
        return (
            a.join(b, keys)
            .filter(lex_lt)
            .select(
                F.col("a.sim_hi").alias("hi_a"),
                F.col("a.sim_lo").alias("lo_a"),
                F.col("b.sim_hi").alias("hi_b"),
                F.col("b.sim_lo").alias("lo_b"),
            )
        )

    cands = (
        _pairs(cold, ["band", "key"])
        .unionByName(_pairs(hot_sub, ["band", "key", "sub", "subkey"]))
        .distinct()
    )
    if _stages is not None:
        _stages["candidate_pairs"] = cands
        _stages["hot_band_keys"] = counts.filter(F.col("bk_n") > bucket_cap)
        _stages["hot_rows"] = hot
    # native popcount on both engines (Spark bit_count / DuckDB bit_count);
    # distinct value pairs differ in >= 1 bit, so hamming here is 1..64
    ham = F.expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)")
    vpairs = (
        cands.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
    )
    return sh, dh, vpairs


def hash64_near_pairs(
    sig: DataFrame,
    max_hamming: int = 3,
    bucket_cap: int = 64,
    _stages: "dict | None" = None,
) -> DataFrame:
    """Banded Hamming near-pair join over ANY 64-bit signature split into
    two 32-bit halves ``(doc_id, sim_hi, sim_lo)`` — the machinery behind
    :func:`simhash64_near_pairs` (text simhash) and
    :func:`~readability_spark.operators.imaging.image_near_dup`
    (perceptual aHash). Same banding, hot-bucket refinement, and popcount
    verify; see :func:`simhash64_near_pairs` for the scale analysis.

    r4: banding runs over DISTINCT hash values (one row per value,
    member-weighted bucket-heat counts), and identical-value groups emit
    their hamming-0 pairs through a single full-hash equi-join. The
    candidate stage is then sized by signature ENTROPY, not corpus size —
    a template-heavy segment where 10^6 documents share 10^3 signatures
    bands 10^3 rows, where the row-level implementation banded 10^6 and
    went quadratic inside every flooded bucket (the r3-VERDICT weakness).
    Output is unchanged: every pair at hamming <= max_hamming, id_a < id_b.
    """
    sh, _dh, vpairs = _hash64_value_pairs(sig, max_hamming, bucket_cap, _stages)
    # expand verified value pairs back to document pairs; the hash-value
    # pair key is canonical and value groups are disjoint, so each doc pair
    # appears exactly once and least/greatest restores id_a < id_b
    cross = (
        vpairs.join(
            sh.select(
                F.col("doc_id").alias("_da"),
                F.col("sim_hi").alias("hi_a"),
                F.col("sim_lo").alias("lo_a"),
            ),
            ["hi_a", "lo_a"],
        )
        .join(
            sh.select(
                F.col("doc_id").alias("_db"),
                F.col("sim_hi").alias("hi_b"),
                F.col("sim_lo").alias("lo_b"),
            ),
            ["hi_b", "lo_b"],
        )
        .select(
            F.least("_da", "_db").alias("id_a"),
            F.greatest("_da", "_db").alias("id_b"),
            "hamming",
        )
    )
    # hamming-0 pairs = all pairs within one identical-signature group: one
    # equi-join on the full 64-bit value, no banding involved. Output is
    # quadratic in the flood size because those pairs ARE the answer —
    # output-sensitive cost, and the join key is the full hash so the only
    # skew is the one the output itself demands.
    a, b = sh.alias("a"), sh.alias("b")
    same = (
        a.join(b, ["sim_hi", "sim_lo"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.select("id_a", "id_b", "hamming").unionByName(same)


def hash64_cluster_edges(
    sig: DataFrame, max_hamming: int = 3, bucket_cap: int = 64
) -> DataFrame:
    """Star-reduced connectivity edges ``(id_a, id_b)`` over the same
    verified near-pair relation as :func:`hash64_near_pairs` — for feeding
    :func:`pair_graph_clusters` when only the COMPONENTS are wanted, not
    the pair list itself.

    An identical-signature group is a clique in the pair graph, but a
    clique's connectivity needs only its star: (min-doc, member) edges.
    Cross-value pairs likewise connect the two groups however many member
    pairs exist, so ONE (rep, rep) edge carries the same information. Edge
    count drops from Σ C(g,2) + Σ |g_a|·|g_b| (quadratic in flood sizes —
    412k edges on the sf0.1 image corpus) to Σ (g−1) + |distinct near
    pairs| (linear), the node set is identical (members of ≥2-groups via
    stars, singleton-group docs via rep edges), and every component —
    hence every (doc_id, cluster_id, cluster_size) row downstream — is
    byte-identical to clustering the full pair list."""
    sh, dh, vpairs = _hash64_value_pairs(sig, max_hamming, bucket_cap)
    stars = (
        sh.join(dh.select("sim_hi", "sim_lo", "rep"), ["sim_hi", "sim_lo"])
        .filter(F.col("doc_id") != F.col("rep"))
        .select(F.col("rep").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    cross = (
        vpairs.join(
            dh.select(
                F.col("sim_hi").alias("hi_a"),
                F.col("sim_lo").alias("lo_a"),
                F.col("rep").alias("_ra"),
            ),
            ["hi_a", "lo_a"],
        )
        .join(
            dh.select(
                F.col("sim_hi").alias("hi_b"),
                F.col("sim_lo").alias("lo_b"),
                F.col("rep").alias("_rb"),
            ),
            ["hi_b", "lo_b"],
        )
        .select(
            F.least("_ra", "_rb").alias("id_a"),
            F.greatest("_ra", "_rb").alias("id_b"),
        )
    )
    return stars.unionByName(cross)


def joint_near_dup(text_pairs: DataFrame, media_pairs: DataFrame) -> DataFrame:
    """Joint multimodal near-dup: pairs that are near-duplicate in BOTH
    modalities — the image-text-dataset dedup criterion (LAION-style
    curation drops a pair only when the caption AND the image both match;
    matching on one modality alone is legitimate reuse — stock photos
    under different captions, syndicated text with fresh art).

    Inputs are two verified near-pair sets from the shared banded Hamming
    machinery — :func:`simhash64_near_pairs` on caption text and
    :func:`~readability_spark.operators.imaging.image_near_dup` (or the
    audio analogue) on the media fingerprint. Output:
    ``id_a, id_b, text_hamming, media_hamming``.

    Scale shape: each input is output-sensitive near-linear (banded +
    capped, BENCH/CARDINALITY.md), and the composition is one equi-join
    on the composite pair key ``(id_a, id_b)`` — keys are unique within
    each side, so the join is skew-free by construction and never larger
    than the smaller pair set.
    """
    t = text_pairs.select(
        "id_a", "id_b", F.col("hamming").alias("text_hamming")
    )
    m = media_pairs.select(
        "id_a", "id_b", F.col("hamming").alias("media_hamming")
    )
    return t.join(m, ["id_a", "id_b"])


# ---------------------------------------------------------------------------
# 3c. Connected components over the near-dup pair graph → dedup clusters
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Label every node of the pair graph with its component's minimum id:
    (doc_id, cluster_id) — delegates to the alternating large-star /
    small-star algorithm (graph.cc_large_small_star, Kiveris et al.
    SoCC'14), which converged 5x faster than the min-label pointer-jump
    variant below on the long-chain aHash pair graph (4.3s vs 24.4s at
    sf0.1, 21 pointer-jump rounds vs 7 star rounds: a single jump per
    round contracts chains at Fibonacci rate, not true doubling). Both
    implementations remain and are cross-checked equal in
    tests/test_links.py."""
    from readability_spark.operators.graph import cc_large_small_star

    return cc_large_small_star(pairs, src=src, dst=dst, max_iter=max_iter)


def connected_components_pointer_jump(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Label every node of the pair graph with its component's minimum id:
    (doc_id, cluster_id). This is the step that turns near-dup PAIRS into
    dedup CLUSTERS — "keep one doc per cluster" is wrong if done per-pair
    (a~b, b~c must collapse to ONE survivor, not two).

    Algorithm: iterative min-label propagation with pointer jumping. Each
    round a node takes the min label over {itself} ∪ {neighbors' labels}
    ∪ {its current label's label} — the last term (pointer jump) doubles
    label-chain hops per round, so convergence is O(log n) rounds even on
    path-shaped graphs (same asymptotics as large-star/small-star, Kiveris
    et al., MapReduce CC). Near-dup clusters from LSH banding are near-
    cliques, so 2-3 rounds are typical.

    Scale shape: every round is two long-key hash joins + one map-side-
    combined min aggregation; all shuffled rows are (long, long).
    `localCheckpoint` truncates lineage each round (no exponential plan).
    The driver loop itself is O(log n) iterations with a single scalar
    fixpoint probe per round — the same structure GraphX/GraphFrames use;
    labels only ever decrease, so an unchanged sum(label) is a fixpoint
    proof, not a heuristic.
    """
    # Both edge orientations from ONE scan of `pairs` (explode, not a
    # two-branch union): the pair graph is usually the output of an
    # expensive pipeline (LSH banding, media decode + hamming verify), and
    # a self-union executes that pipeline twice when edges first
    # materialize — measured 34.5s -> ~20s on the sf0.1 image aHash graph.
    s = F.col(src).cast("long")
    d = F.col(dst).cast("long")
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(s.alias("src"), d.alias("dst")),
                    F.struct(d.alias("src"), s.alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("v")).distinct().select("v", F.col("v").alias("lbl"))
    ).localCheckpoint()
    prev_sum = None
    for _ in range(max_iter):
        nbr = edges.join(labels.withColumnRenamed("v", "src"), "src").select(
            F.col("dst").alias("v"), "lbl"
        )
        jump = (
            labels.alias("l1")
            .join(labels.alias("l2"), F.col("l1.lbl") == F.col("l2.v"))
            .select(F.col("l1.v").alias("v"), F.col("l2.lbl").alias("lbl"))
        )
        # Lazy checkpoint + the fixpoint probe as its materializing action:
        # ONE Spark job per round (an eager checkpoint followed by the sum
        # probe ran the round's plan once and scanned it again — 2 jobs).
        labels = (
            labels.unionByName(nbr)
            .unionByName(jump)
            .groupBy("v")
            .agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("lbl")).first()[0]
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select(F.col("v").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def pair_graph_clusters(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) over ANY verified near-dup pair
    graph — the modality-agnostic clustering layer: the same
    :func:`connected_components` + size rejoin serves the text minhash
    graph (:func:`near_dup_clusters`), the image aHash graph, and the
    audio fingerprint graph unchanged. ``cluster_id`` is the smallest
    doc_id in the component — the canonical survivor. Cluster size rides
    along via one map-side-combined count + broadcast-sized rejoin (the
    cluster table is tiny relative to the corpus — only docs with
    near-dups appear)."""
    labels = connected_components(pairs)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", F.col("cluster_size").cast("int").alias("cluster_size")
    )


def near_dup_clusters(docs: DataFrame) -> DataFrame:
    """MinHash-LSH near-dup clusters: (doc_id, cluster_id, cluster_size) for
    every doc that has at least one verified near-duplicate — the text
    instantiation of :func:`pair_graph_clusters`."""
    return pair_graph_clusters(minhash_lsh_pairs(docs))


def canonical_survivors(docs: DataFrame) -> DataFrame:
    """Keep/drop election per near-dup cluster — the decision a production
    dedup stage actually emits: within each MinHash-LSH component keep the
    member with the highest composite quality score (ties to the smallest
    doc_id), drop the rest.

    Scale shape: cluster labels come from :func:`near_dup_clusters`
    (log-round large/small-star components); the quality join is doc_id-to-doc_id (both
    sides hash-partitioned on doc_id); the per-cluster argmax is ONE
    map-side-combined struct-max ``groupBy`` — ``max(struct(quality,
    -doc_id))`` orders by quality first and breaks ties toward the smallest
    id, so there is no window and no single-task sort anywhere. The elected
    table is cluster-count sized (far smaller than the corpus) and rejoins
    membership on cluster_id.
    """
    from readability_spark.operators.textstats import quality_score

    # member feeds two consumers (the election aggregate and the final
    # rejoin); without a barrier the whole cluster pipeline (LSH pairs +
    # pointer-jumping components) re-executes per consumer.
    member = near_dup_clusters(docs).join(
        quality_score(docs).select("doc_id", "quality"), "doc_id"
    ).localCheckpoint(eager=False)
    best = (
        member.groupBy("cluster_id")
        .agg(F.max(F.struct(F.col("quality"), (-F.col("doc_id")).alias("neg_id"))).alias("b"))
        .select("cluster_id", (-F.col("b.neg_id")).alias("keep_id"))
    )
    return member.join(best, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        "quality",
        "keep_id",
        (F.col("doc_id") == F.col("keep_id")).alias("keep"),
    )


def near_dup_source_matrix(docs: DataFrame) -> DataFrame:
    """Mirror/syndication detection: aggregate the verified near-dup pairs
    by the UNORDERED pair of sources they connect — the report that tells
    a crawl operator which hosts copy from which (a hot off-diagonal cell
    is a mirror or syndication feed; the diagonal is within-site
    duplication). Scale shape: the pair table (candidate-bounded, far
    smaller than the corpus) joins the slim (doc_id, source) projection
    on each endpoint — two doc_id-keyed hash joins — then one map-side-
    combined groupBy over at most K^2 source cells.

    Output: (source_lo, source_hi, n_pairs, avg_jaccard).
    """
    pairs = minhash_lsh_pairs(docs)
    s = docs.select("doc_id", "source")
    j = pairs.join(
        s.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")), "id_a"
    ).join(
        s.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")), "id_b"
    )
    return j.groupBy(
        F.least("sa", "sb").alias("source_lo"),
        F.greatest("sa", "sb").alias("source_hi"),
    ).agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        round4(F.avg("jaccard")).alias("avg_jaccard"),
    )


def soft_dedup_weights(docs: DataFrame, alpha: float = 1.0) -> DataFrame:
    """Duplicate-aware *soft* dedup (SlimPajama/SoftDeDup-style): instead of
    dropping near-duplicates, keep every document and down-weight each
    near-dup cluster member to ``cluster_size ** -alpha`` so the cluster
    contributes ~one document's worth of gradient mass to training
    (``alpha=1``: exactly one; ``alpha<1``: mild duplication bonus —
    common-crawl duplication correlates with quality, so some recipes keep
    a sublinear remnant). Unique documents keep weight 1.0.

    Scale shape: cluster labels come from :func:`near_dup_clusters`
    (banded LSH + log-round large/small-star components); the weight join is
    doc_id-to-doc_id, both sides hash-partitioned on doc_id, and the label
    side carries only docs that HAVE a near-duplicate — on a real crawl a
    minority, but not assumed broadcast-small. The corpus's text/html
    payload never enters the join (ids and one int only).

    Output: (doc_id, cluster_size, weight) for EVERY input doc.
    """
    labels = near_dup_clusters(docs).select("doc_id", "cluster_size")
    joined = docs.select("doc_id").join(labels, "doc_id", "left")
    weight = F.when(F.col("cluster_size").isNull(), F.lit(1.0)).otherwise(
        F.pow(F.col("cluster_size").cast("double"), F.lit(-float(alpha)))
    )
    return joined.select(
        "doc_id",
        F.coalesce(F.col("cluster_size"), F.lit(1)).cast("int").alias("cluster_size"),
        round4(weight).alias("weight"),
    )


# ---------------------------------------------------------------------------
# 4. N-gram Jaccard (DF-capped shingle candidate join + exact set verify)
# ---------------------------------------------------------------------------

def _ngram_pair_common(
    docs: DataFrame,
    max_df: int = 100,
    _stages: "dict | None" = None,
) -> DataFrame:
    """Shared candidate machinery for the exact n-gram set-overlap family
    (:func:`ngram_jaccard_pairs`, :func:`ngram_containment_pairs`): DF-capped
    candidate generation + exact intersection completion. Returns
    ``(id_a, id_b, n_a, n_b, _common)`` where ``_common`` is the exact
    shingle-set intersection size and ``n_*`` the exact set sizes.

    Candidate generation joins docs on *shared shingles*, which goes
    quadratic on any shingle common to many documents (one 3-gram shared by
    a million docs → 10^12 candidate rows — VERDICT r1). Fix: compute each
    shingle's document frequency first and generate candidates only from
    discriminative shingles (2 <= df <= max_df); df=1 shingles can't form a
    pair, df>max_df shingles are boilerplate. Only pairs whose *every*
    shared shingle is hot can be missed — LSH-style documented discovery
    approximation; the reported overlap values themselves are exact.

    Every shuffle here carries longs/short strings, never shingle arrays:
    the candidate groupBy counts shared discriminative shingles directly,
    and the count is completed to the exact full-set intersection by a
    second bounded join of candidate pairs against the *hot* posting rows
    (few distinct hot shingles by construction). Exact |intersection| =
    common_rare + common_hot; sizes come from the per-doc shingle arrays.
    """
    # The shingle table feeds four branches (df counts, rare postings, hot
    # postings, per-doc sizes) and Spark recomputes the shingle transform
    # per branch (self-join aliasing defeats exchange reuse). Lazy local
    # checkpoint = one corpus-sized executor-local materialization instead
    # of four text scans; measured 4x on the sf0.1 bench (16.7s -> 4.2s).
    sh = docs.select("doc_id", _shingles(F.col("text")).alias("sh")).localCheckpoint(
        eager=False
    )
    exploded = sh.select("doc_id", F.explode("sh").alias("g"))
    # Document frequency via groupBy (map-side combined: a hot shingle adds
    # one partial count per input partition, never its full posting list in
    # one task — the Window.partitionBy('g') variant this replaces routed
    # every posting row of a hot boilerplate shingle through a single
    # task's sort, recreating at the tagging stage the straggler the DF cap
    # exists to avoid).
    dfreq = exploded.groupBy("g").agg(F.count("*").alias("df"))
    # The hot set is small by construction (boilerplate shingles above
    # max_df document frequency) — broadcast it. Hot posting rows then
    # never shuffle on g at all, and the rare join below is provably
    # skew-free: every surviving key has at most max_df posting rows.
    hot_set = dfreq.filter(F.col("df") > max_df).select("g")
    rare_keys = dfreq.filter((F.col("df") >= 2) & (F.col("df") <= max_df)).select("g")
    rare = (
        exploded.join(F.broadcast(hot_set), "g", "left_anti")
        .join(rare_keys, "g")
        .select("doc_id", "g")
    )
    hot_src = exploded.join(F.broadcast(hot_set), "g").select("doc_id", "g")
    a, b = rare.alias("a"), rare.alias("b")
    cands = (
        a.join(b, "g")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common_rare"))
    )
    if _stages is not None:
        _stages["shingle_rows"] = exploded
        _stages["discriminative_shingle_rows"] = rare
        _stages["candidate_pairs"] = cands
    hot_a = hot_src.select(F.col("doc_id").alias("id_a"), "g")
    hot_b = hot_src.select(F.col("doc_id").alias("id_b"), "g")
    common_hot = (
        cands.select("id_a", "id_b")
        .join(hot_a, "id_a")
        .join(hot_b, ["id_b", "g"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common_hot"))
    )
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    common = F.col("common_rare") + F.coalesce(F.col("common_hot"), F.lit(0))
    return (
        cands.join(common_hot, ["id_a", "id_b"], "left")
        .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
        .select("id_a", "id_b", "n_a", "n_b", common.alias("_common"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    max_df: int = 100,
    _stages: "dict | None" = None,
) -> DataFrame:
    """Exact-Jaccard near-dup pairs over the DF-capped candidate machinery
    (see :func:`_ngram_pair_common` for the scale analysis)."""
    scored = _ngram_pair_common(docs, max_df=max_df, _stages=_stages)
    return (
        scored.withColumn(
            "jaccard",
            round4(F.col("_common") / (F.col("n_a") + F.col("n_b") - F.col("_common"))),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


FRAG_OFFSET = 2_000_000


def with_injected_fragments(docs: DataFrame, every: int = 9) -> DataFrame:
    """documents ∪ half-length fragments of every ``every``-th doc (first
    half of its tokens, doc_id += FRAG_OFFSET) — asymmetric-overlap cases
    for containment detection: the fragment is (nearly) contained in its
    parent while plain Jaccard between them stays moderate. Deterministic
    and SQL-expressible, like :func:`with_injected_duplicates`."""
    toks = F.split(F.col("text"), " ")
    frags = (
        docs.filter((F.col("doc_id") % every) == 4)
        .filter(F.size(toks) >= 8)
        .select(
            (F.col("doc_id") + FRAG_OFFSET).alias("doc_id"),
            F.concat_ws(" ", F.slice(toks, 1, (F.size(toks) / 2).cast("int"))).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .withColumn("n_chars", F.length("text"))
    )
    return docs.unionByName(frags)


def ngram_containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    max_df: int = 100,
    _stages: "dict | None" = None,
) -> DataFrame:
    """Asymmetric set-containment pairs — quote/fragment/superset detection,
    the signal Jaccard misses (a 100-token excerpt inside a 10k-token page
    has Jaccard ≈ 0.01 but containment ≈ 1.0). For every DF-capped candidate
    pair, ``containment_a`` = |A∩B|/|A| and ``containment_b`` = |A∩B|/|B|
    (both exact); pairs survive when either side is ≥ ``threshold``.

    Same plan as :func:`ngram_jaccard_pairs` — only the final projection
    differs, so every scale property of the shared machinery carries over.
    """
    scored = _ngram_pair_common(docs, max_df=max_df, _stages=_stages)
    c_a = round4(F.col("_common") / F.col("n_a"))
    c_b = round4(F.col("_common") / F.col("n_b"))
    return (
        scored.withColumn("containment_a", c_a)
        .withColumn("containment_b", c_b)
        .filter(F.greatest(F.col("containment_a"), F.col("containment_b")) >= threshold)
        .select("id_a", "id_b", "containment_a", "containment_b")
    )


def dedup_eval_recall(docs_with_dups: DataFrame, dup_offset: int = DUP_OFFSET) -> DataFrame:
    """Measured recall of the MinHash-LSH pair discovery against the
    injected ground truth — the evaluation row a production dedup stage
    publishes per corpus build (banding is probabilistic; the measured
    number, not the analytic one, is what operators watch).

    Ground truth: every injected copy forms the pair (x, x + dup_offset).
    One DataFrame plan, no driver collects: truth LEFT JOINs discovered
    pairs, two one-row aggregates cross-join into the report row. The
    truth table is corpus/10 rows of longs; everything heavy is inside
    :func:`minhash_lsh_pairs` itself.

    Output: (n_truth, n_truth_found, recall, n_discovered, n_extra) —
    n_extra counts discovered pairs outside the injected truth (organic
    near-dups, not false positives; every pair is Jaccard-verified).
    """
    pairs = minhash_lsh_pairs(docs_with_dups).select("id_a", "id_b")
    truth = docs_with_dups.filter(F.col("doc_id") >= dup_offset).select(
        (F.col("doc_id") - dup_offset).alias("id_a"),
        F.col("doc_id").alias("id_b"),
    )
    hits = truth.join(pairs.withColumn("_found", F.lit(1)), ["id_a", "id_b"], "left")
    t = hits.agg(
        F.count("*").alias("n_truth"),
        F.sum(F.coalesce(F.col("_found"), F.lit(0))).cast("long").alias("n_truth_found"),
    )
    c = pairs.agg(F.count("*").alias("n_discovered"))
    return t.crossJoin(c).select(
        "n_truth",
        "n_truth_found",
        round4(F.col("n_truth_found") / F.col("n_truth")).alias("recall"),
        "n_discovered",
        (F.col("n_discovered") - F.col("n_truth_found")).alias("n_extra"),
    )


def minhash_band_buckets_projection(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4, keep: tuple = ()
) -> DataFrame:
    """The same (doc_id, band, key) bucket rows as
    :func:`minhash_band_buckets`, computed WITHOUT aggregation:
    sig_k = array_min(transform(shingles, md5(k:shingle))) — array_min
    over strings is the identical lexicographic minimum the exploded
    groupBy-min takes, so the two forms are row-identical (pinned in
    tests). The projection form exists for Structured Streaming, where a
    signature aggregation would burn the query's single allowed stateful
    aggregation; batch pipelines keep the explode+groupBy form (map-side
    partial agg beats recomputing the shingle array K times per row).

    ``keep`` names extra input columns to carry through (the streaming
    triage rides its shingle array along so no stream-stream self-join
    is needed to re-attach it).
    """
    rows_per_band = num_hashes // bands
    sh = _shingles(F.col("text"))
    def _sig(k: int):
        # NB: a two-arg lambda would make pyspark pass the ARRAY INDEX as
        # the second argument — capture k via closure, not a default arg.
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{k}:"), s)))
        ).alias(f"mh{k}")

    sigs = [_sig(k) for k in range(num_hashes)]
    with_sigs = docs.select("doc_id", *keep, *sigs)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
                )
            ).alias("key"),
        )
        for b in range(bands)
    ]
    return with_sigs.select(
        "doc_id", *keep, F.explode(F.array(*band_cols)).alias("bk")
    ).select(
        "doc_id", *keep, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
