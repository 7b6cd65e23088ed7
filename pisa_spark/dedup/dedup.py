"""Deduplication operators for web-scale training-data pipelines.

Five families, all pure DataFrame algebra (whole-stage codegen; the
only hash primitive is md5, chosen because the identical expression
exists in the DuckDB oracle — engine and oracle share every bit):

* exact            — hash-groupBy on normalized text, keep min doc_id
* minhash + LSH    — shingle -> H minhashes -> B bands -> bucket join
* simhash          — 64-bit sign-of-weighted-bit-sums fingerprint
* n-gram jaccard   — exact pairwise Jaccard over shingle sets
* embedding cosine — near-dup pairs by cosine over embedding vectors

Scale notes (10^12 docs): every operator here is a shuffle on a
bounded-width key (hash, band bucket, shingle) — no all-pairs products.
``ngram_jaccard_pairs`` is the verification stage run AFTER
``minhash_lsh_candidates`` restricts pairs (its ``candidates`` arg);
the all-pairs default exists for small-corpus oracle checks only.
The md5-based hash family is deterministic across runs, partitions and
engines — the determinism discipline the reference enforces with
seeded RNGs (/root/reference/src/utils/utils.py:82-87).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col

# ---------------------------------------------------------------------------
# shared primitives
# ---------------------------------------------------------------------------


def hash64(col: Column, salt: str = "") -> Column:
    """Deterministic 32-bit-range hash as long: first 8 hex chars of
    md5(salt || value). Oracle parity:
    CAST('0x'||substring(md5(salt||x),1,8) AS BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 8), 16, 10
    ).cast("long")


def hash_wide(col: Column, salt: str = "") -> Column:
    """Full-width 64-bit deterministic hash as a (possibly negative)
    long: two md5 32-bit halves composed with shift+or, so the sign bit
    wraps exactly like Java two's complement. Oracle parity via HUGEINT
    arithmetic: hi::HUGEINT * 2^32 + lo, wrapped to signed BIGINT
    (DuckDB's << overflows at bit 63, HUGEINT doesn't)."""
    m = F.md5(F.concat(F.lit(salt), col))
    hi = F.conv(F.substring(m, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(m, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct n-gram (word) shingles as array<string> ('a b c')."""
    toks = tokens_col(text)
    # transform over start positions; slice+join builds the shingle
    return F.array_distinct(
        F.filter(
            F.transform(
                toks,
                lambda _, i: F.when(
                    i + n <= F.size(toks),
                    F.array_join(F.slice(toks, i + 1, n), " "),
                ),
            ),
            lambda s: s.isNotNull(),
        )
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) -> (doc_id, keep_id, content_hash) for every doc in
    a duplicate group of size > 1; keep_id = min doc_id of the group.

    One hash-shuffle; content never shuffles (only its md5)."""
    hashed = docs.select(
        "doc_id", F.md5(F.col(text_col)).alias("content_hash")
    )
    w = Window.partitionBy("content_hash")
    return (
        hashed.withColumn("keep_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .filter(F.col("group_size") > 1)
        .select("doc_id", "keep_id", "content_hash")
    )


def distinct_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-dedup pass: keep the min-doc_id representative per distinct
    text (the canonical first-seen-wins rule, made deterministic)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 16, shingle_n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig:array<long>[n_hashes]) — sig[i] = min over shingles
    of hash64('mh{i}:' || shingle).

    Expressed with array higher-order functions: no explode, no
    shuffle at all — a narrow map over docs. Docs with no shingles get
    NULL sig and are excluded."""
    sh = shingles_col(F.col(text_col), shingle_n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                sh,
                lambda s: F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("mh"), i.cast("string"), F.lit(":"), s
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
            )
        ),
    )
    return (
        docs.select("doc_id", sig.alias("sig"))
        .filter(F.size(F.filter("sig", lambda x: x.isNull())) == 0)
    )


def minhash_lsh_candidates(
    signatures: DataFrame, n_bands: int = 4
) -> DataFrame:
    """(doc_id, sig) -> candidate near-dup pairs (doc_a, doc_b, est_jaccard).

    Split each signature into n_bands equal bands; docs sharing any
    band's full value collide. Self-equi-join on (band_idx, band_key) —
    a key-hash shuffle, never an all-pairs product. est_jaccard =
    fraction of matching signature positions (unbiased MinHash
    estimate). Pairs deduped across bands, doc_a < doc_b."""
    n_hashes_col = F.size("sig")
    rows_per_band = (n_hashes_col / n_bands).cast("int")
    banded = signatures.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.array_join(
                    F.transform(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                ),
            )
        ).alias("band_idx", "band_key"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"),
        "band_idx", "band_key",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"),
        "band_idx", "band_key",
    )
    pairs = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        (matches.cast("double") / F.size("sig_a")).alias("est_jaccard"),
    )


def near_duplicate_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Scale path for text near-dup, wired as ONE call: MinHash
    signatures -> LSH band-bucket candidates -> exact n-gram Jaccard
    verification restricted to the candidates. Output
    (doc_a, doc_b, jaccard >= threshold); recall is governed by the
    (n_hashes, n_bands) S-curve — pairs the LSH misses are absent, but
    every emitted jaccard is exact. No stage touches an all-pairs
    product: signatures are a narrow map, candidates a band-key
    equi-join, verification a shingle equi-join pre-filtered to
    candidate pairs.

    The candidate pair set is eagerly persisted (MEMORY_AND_DISK)
    before the verify: the verification plan references it three
    times (both sides of the doc semi-join plus the pair join), and
    each unpersisted reference would re-run the whole signature map +
    LSH self-join — measured 10x+ slower on a 5k-doc corpus. At
    extreme scale run the stages explicitly and commit signatures to
    a table instead of relying on executor-local persistence."""
    from pyspark import StorageLevel

    sigs = minhash_signatures(docs, n_hashes, shingle_n, text_col)
    cands = (
        minhash_lsh_candidates(sigs, n_bands)
        .select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cands.count()  # materialize once; the verify scans the cache
    return ngram_jaccard_pairs(
        docs, threshold, shingle_n, text_col, candidates=cands
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash(
    docs: DataFrame, bits: int = 64, text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash:long) — classic Charikar sketch over tokens
    weighted by tf: bit_i = 1 iff sum over distinct tokens of
    tf * (+1 if bit_i(hash(token)) else -1) > 0.

    bits <= 64, default the full 64 (a 16-bit fingerprint has only 65k
    distinct values — constant collisions at >=10^6 docs). Bit 63 makes
    the long negative; both engines treat >> as arithmetic shift and
    bit_count ignores sign, so parity holds across the full width.

    Three hash-aggregations, all on NARROW rows: (doc,token) tf, then
    (doc,bit) signed sums over an exploded bit axis, then a (doc)
    bit_or composing the fingerprint. The exploded-bit shape replaces
    round 2's 64 unrolled when/otherwise sum columns — the shuffle row
    carried 64 partial sums per doc and the generated code 64 aggregate
    buffers; here each row is (doc_id, bit, contrib) and map-side
    partial aggregation compresses to <=bits rows per doc per
    partition. Structurally identical to the DuckDB twin's
    range(0,64) join — no UDF, identical arithmetic in the oracle."""
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    h = tf.withColumn("h", hash_wide(F.col("token"), salt="sh:"))
    sums = (
        h.select(
            "doc_id", "tf", "h",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        )
        .select(
            "doc_id",
            "bit",
            F.when(F.expr("shiftright(h, bit) & 1") == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
            .alias("contrib"),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("contrib").alias("s"))
    )
    # shiftleft(1L, 63) wraps into the sign bit by definition (no
    # overflow); bit_or composes the disjoint bits — safe under ANSI
    # where a SUM of bit values could overflow-error
    bit_val = F.when(
        F.col("s") > 0, F.expr("shiftleft(1L, bit)")
    ).otherwise(F.lit(0).cast("long"))
    return (
        sums.groupBy("doc_id")
        .agg(F.bit_or(bit_val).alias("simhash"))
        .select("doc_id", "simhash")
    )


def simhash_near_pairs(
    fingerprints: DataFrame, max_hamming: int = 2, bits: int = 64
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance <= max_hamming.

    Banding trick for scale: split the fingerprint into (max_hamming+1)
    chunks — any pair within distance max_hamming agrees exactly on at
    least one chunk (pigeonhole), so a chunk-equality self-join finds
    all of them without an all-pairs product; exact popcount filters.
    ``bits`` must match the fingerprint width simhash() was built with
    (chunks are derived from it; every chunk is masked to its width so
    the sign bit can't leak through the arithmetic shift)."""
    n_chunks = max_hamming + 1
    chunk = bits // n_chunks
    widths = [
        chunk if i < n_chunks - 1 else bits - chunk * (n_chunks - 1)
        for i in range(n_chunks)
    ]
    def _chunk_col(i: int) -> Column:
        c = F.shiftright("simhash", i * chunk)
        if widths[i] < 64:  # width-64 chunk needs no mask (whole long)
            c = c.bitwiseAND(F.lit((1 << widths[i]) - 1))
        return c.alias(f"c{i}")

    chunks = [_chunk_col(i) for i in range(n_chunks)]
    tagged = fingerprints.select("doc_id", "simhash", *chunks)
    pieces = []
    for i in range(n_chunks):
        a = tagged.select(
            F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"),
            F.col(f"c{i}").alias("ck"),
        )
        b = tagged.select(
            F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"),
            F.col(f"c{i}").alias("ck"),
        )
        pieces.append(
            a.join(b, "ck").filter(F.col("doc_a") < F.col("doc_b")).select(
                "doc_a", "doc_b", "sh_a", "sh_b"
            )
        )
    cand = pieces[0]
    for p in pieces[1:]:
        cand = cand.union(p)
    cand = cand.distinct()
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# n-gram jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over n-gram shingle sets: (doc_a, doc_b, jaccard).

    candidates: optional (doc_a, doc_b) pre-filter (e.g. LSH output) —
    REQUIRED at scale; without it the shingle self-join is exact but
    only viable when shingle df is modest (oracle-scale corpora).

    When candidates IS given the restriction is applied BELOW the
    self-join, not just on its output: the exploded shingle relation is
    semi-joined to the candidate doc-id set on both sides (so only
    shingles of candidate docs enter the join at all), and the
    candidate pair set is joined onto (doc_a, doc_b) BEFORE the
    pair-count aggregate (so non-candidate collisions on head shingles
    are dropped pre-shuffle). Work, not just output, is then bounded
    by |candidates| — the verification stage a 10^12-doc pipeline
    needs after LSH. Restricting to candidate docs cannot change any
    candidate pair's intersection count (both endpoints are candidate
    docs by construction), so results are identical to the unfiltered
    plan and the DuckDB oracle twin composes unchanged.

    Plan: explode distinct shingles [-> semi-join candidate docs] ->
    self-join on shingle [-> join candidate pairs] -> pair-count =
    |A∩B| -> sizes join -> Jaccard filter."""
    sh = docs.select(
        "doc_id", F.explode(shingles_col(F.col(text_col), shingle_n)).alias("sh")
    )
    if candidates is not None:
        # distinct: the pre-aggregate pair join multiplies n_inter by
        # each duplicate candidate row (jaccard could exceed 1.0 and
        # false pairs leak through) — the contract is a pair SET
        cand_pairs = candidates.select("doc_a", "doc_b").distinct()
        cand_docs = (
            cand_pairs.select(F.col("doc_a").alias("doc_id"))
            .union(cand_pairs.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        sh = sh.join(cand_docs, "doc_id", "left_semi")
        # the shingle relation is referenced three times below (sizes
        # + both join sides); bounded by candidate docs here, so
        # persist instead of re-running the explode + semi-join per use
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    pair_rel = a.join(b, "sh").filter(F.col("doc_a") < F.col("doc_b"))
    if candidates is not None:
        pair_rel = pair_rel.join(cand_pairs, ["doc_a", "doc_b"])
    inter = pair_rel.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_inter")
    )
    jac = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns, float64 math,
    pure JVM (aggregate over zip_with) — no UDF."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    return dot / (na * nb)


def embedding_near_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
    exact: bool = False,
    nbits: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """(vec_a, vec_b, cosine) pairs with cosine >= threshold.

    Scale-safe by default: without ``candidates`` the call routes
    through :func:`embedding_near_pairs_lsh` (bucketed candidate
    equi-joins, never an all-pairs product; recall < 1 by
    construction — raise ``n_tables`` to trade cost for recall).

    candidates: (vec_a, vec_b) pre-computed pair set — the bounded
    exact-verify stage a large pipeline runs after its own blocking;
    each pair is scored exactly, work is O(|candidates|).

    exact=True: the O(n²) crossJoin all-pairs path, oracle parity with
    DuckDB list_cosine_similarity — ONLY for oracle-scale corpora; the
    plan contains a CartesianProduct and must never ship at 10^12
    rows. (The default path is asserted CartesianProduct-free in
    docs/PLANS.md §14.)"""
    if candidates is not None:
        emb = embeddings.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_emb")
        )
        cand = candidates.select("vec_a", "vec_b").distinct()
        pairs = cand.join(
            emb.select(F.col("_id").alias("vec_a"), F.col("_emb").alias("emb_a")),
            "vec_a",
        ).join(
            emb.select(F.col("_id").alias("vec_b"), F.col("_emb").alias("emb_b")),
            "vec_b",
        )
        return pairs.select(
            "vec_a",
            "vec_b",
            cosine_expr(F.col("emb_a"), F.col("emb_b")).alias("cosine"),
        ).filter(F.col("cosine") >= threshold)
    if not exact:
        if dim is None:
            # hyperplanes are driver-generated, so the signature width
            # must be known at plan-construction time. Inferring it
            # costs ONE bounded Spark job (a limit-1 scan) — pipelines
            # that assemble plans without executing them (or run over
            # mixed-width vectors) should pass dim= explicitly.
            rows = embeddings.select(
                F.size(vec_col).alias("d")
            ).limit(1).collect()
            if not rows:
                raise ValueError(
                    "embedding_near_pairs: cannot infer vector dim from"
                    " an empty relation; pass dim= explicitly"
                )
            dim = int(rows[0]["d"])
        return embedding_near_pairs_lsh(
            embeddings,
            threshold,
            nbits=nbits,
            n_tables=n_tables,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
        )
    a = embeddings.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("emb_a")
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("emb_b")
    )
    pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    return pairs.select(
        "vec_a", "vec_b", cosine_expr(F.col("emb_a"), F.col("emb_b")).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def embedding_near_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    nbits: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for embedding near-dup pairs, wired as ONE call:
    random-hyperplane LSH bucket candidates -> exact cosine filter.

    Each vector gets n_tables independent nbits-bit signatures
    (deterministic md5-derived hyperplanes, similarity.ann); a pair is
    a candidate iff SOME table's signatures are equal — n_tables
    key-equi self-joins on (table, signature), never an all-pairs
    product. Candidates are scored exactly and filtered at
    ``threshold``. Recall < 1 by construction (a high-cosine pair can
    straddle hyperplanes in every table); raise n_tables / lower nbits
    to trade cost for recall. Deterministic across engines — the DuckDB
    gate twin recomputes the identical signatures."""
    from pisa_spark.similarity.ann import _hyperplanes_salted, signature_col

    cols = [F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_emb")]
    for t in range(n_tables):
        planes = _hyperplanes_salted(dim, nbits, salt=f"t{t}")
        cols.append(signature_col(F.col(vec_col), planes).alias(f"sig{t}"))
    tagged = embeddings.select(*cols)
    pieces = []
    for t in range(n_tables):
        a = tagged.select(
            F.col("vec_id").alias("vec_a"), F.col("_emb").alias("emb_a"),
            F.col(f"sig{t}").alias("sig"),
        )
        b = tagged.select(
            F.col("vec_id").alias("vec_b"), F.col("_emb").alias("emb_b"),
            F.col(f"sig{t}").alias("sig"),
        )
        pieces.append(
            a.join(b, "sig")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b", "emb_a", "emb_b")
        )
    cand = pieces[0]
    for p in pieces[1:]:
        cand = cand.unionByName(p)
    return (
        cand.dropDuplicates(["vec_a", "vec_b"])
        .select(
            "vec_a",
            "vec_b",
            cosine_expr(F.col("emb_a"), F.col("emb_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def substring_duplicate_spans(
    docs: DataFrame,
    n: int = 6,
    min_docs: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-duplication spans, the curation primitive behind
    'deduplicating training data makes language models better' (Lee et
    al. 2022): find every maximal token span of a document that is
    covered by n-grams occurring in >= min_docs DISTINCT documents —
    the spans a dedup pipeline trims (boilerplate, licenses, syndicated
    passages) instead of dropping whole near-dup docs.

    Returns (doc_id, span_start, span_end, span_tokens): token offsets,
    end exclusive, overlapping/adjacent duplicated n-grams coalesced
    into maximal islands.

    Shape (all codegen + one window):
      1. per doc, the n-gram array via transform(sequence) + slice —
         no UDF, no self-join on text;
      2. posexplode -> (doc_id, pos, ngram); corpus-duplicated grams
         via one hash agg (count distinct doc_id >= min_docs);
      3. semi-join positions to duplicated grams (candidate-bounded:
         only covered positions survive);
      4. gaps-and-islands per doc: equal-length spans sorted by start
         merge iff pos <= prev_pos + n, rendered as a lag + running
         sum window — one narrow shuffle on doc_id.

    The join key is the literal n-gram string so the DuckDB twin is
    replayable verbatim; a web-scale profile swaps it for
    hash64(ngram) (same md5 primitive the MinHash path uses, still
    oracle-replicable) to shrink the shuffle — the span semantics are
    unchanged up to md5 collisions."""
    from pisa_spark.corpus import tokens_col

    toks = docs.select(
        "doc_id", tokens_col(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") >= n)
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
            )
        ).alias("pos", "ngram"),
    )
    dup = (
        grams.groupBy("ngram")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("ngram")
    )
    covered = grams.join(dup, "ngram", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = covered.withColumn(
        "new_island",
        F.when(
            F.col("pos") > F.lag("pos").over(w) + F.lit(n), 1
        ).otherwise(
            F.when(F.lag("pos").over(w).isNull(), 1).otherwise(0)
        ),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n)).alias("span_end"),
        )
        .select(
            "doc_id",
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start"))
            .cast("int")
            .alias("span_tokens"),
        )
    )


def trim_duplicate_spans(
    docs: DataFrame,
    n: int = 6,
    min_docs: int = 2,
    text_col: str = "text",
    spans: DataFrame | None = None,
) -> DataFrame:
    """Apply substring_duplicate_spans as a TRIM: (doc_id, trimmed)
    for every doc that had at least one duplicated span, with the
    covered tokens excised and the remainder re-joined on single
    spaces. Output is in normalized token space (the tokenizer's
    lowercase-alnum rendering) — the representation the downstream
    curation pipeline consumes.

    Plan: spans collect to one (start, end) array per doc (bounded by
    spans-per-doc, not corpus size), join back, then pure higher-order
    expressions — transform/filter/exists — drop covered offsets. No
    UDF, one narrow doc_id shuffle beyond the span computation.

    spans: pass a precomputed/persisted span relation to skip the
    n-gram pass (e.g. the output of substring_duplicate_spans run once
    and audited)."""
    from pisa_spark.corpus import tokens_col

    if spans is None:
        spans = substring_duplicate_spans(
            docs, n=n, min_docs=min_docs, text_col=text_col
        )
    sp = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    toks = docs.select(
        "doc_id", tokens_col(F.col(text_col)).alias("toks")
    ).join(sp, "doc_id")
    with_idx = F.transform(
        "toks", lambda t, i: F.struct(t.alias("t"), i.alias("i"))
    )
    kept = F.filter(
        with_idx,
        lambda s: ~F.exists(
            "spans",
            lambda b: (s["i"] >= b["span_start"]) & (s["i"] < b["span_end"]),
        ),
    )
    return toks.select(
        "doc_id",
        F.array_join(
            F.transform(kept, lambda s: s["t"]), " "
        ).alias("trimmed"),
    )
