"""Distributed cardinality sketches — deterministic HyperLogLog
(Flajolet et al. 2007, with the standard small-range correction), the
workhorse approximate-distinct operator of every large-scale pipeline
(Spark's own approx_count_distinct is HLL++; this one is built from
the engine's md5 hash family so the DuckDB oracle replays it REGISTER
FOR REGISTER — a property no library HLL offers).

Determinism contract: bucket and rank come from the shared
deterministic hash pair (dedup.hash64 / hash_wide); registers are
integer maxes (order-free); the harmonic sum is computed as an EXACT
scaled integer (sum of 2^(56-M) as decimal — no float reassociation),
and only the final estimate touches floating point, from identical
integer inputs on both engines.

Why p=9 (512 registers): standard error 1.04/sqrt(m) ~ 4.6% — the
curation use case (budget split by near-distinct counts) at one
shuffle of m rows per group. Mergeability: registers are per-group
maxes, so unions of sketches = max of registers — the same groupBy
again; partial aggregation gives map-side combine for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.dedup.dedup import hash64, hash_wide

CMS_DEPTH = 4
CMS_WIDTH = 1024

HLL_P = 9
_W_BITS = 55
_W_MOD = 1 << _W_BITS  # rank word drawn uniform from [0, 2^55)
_SCALE = 1 << (_W_BITS + 1)  # 2^56: exact-integer harmonic scaling


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005): (row, b, cnt)
    counters — ``depth`` independent hash rows, each a width-``width``
    counter array. One explode (x depth) + one hash aggregation; all
    integer, so the oracle replays every counter. Counters are sums —
    sketches merge by groupBy-sum, and Catalyst's partial aggregation
    is the map-side combine. Width 1024 / depth 4: overestimate
    <= 2N/1024 with prob 1 - 2^-4 (never underestimates)."""
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("row")
    e = df.select(F.col(col).alias("x"), rows)
    return (
        e.select(
            "row",
            F.pmod(
                hash64(F.concat(F.col("row").cast("string"),
                                F.lit(":"), F.col("x")), "cm:"),
                F.lit(width),
            ).alias("b"),
        )
        .groupBy("row", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str = "x",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(x, est): count-min frequency estimate for each probe value —
    min over the depth rows of that value's counter (missing counter
    = 0). The probe side is small (broadcast); the sketch is
    depth x width rows regardless of data size."""
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("row")
    p = probes.select(F.col(col).alias("x")).distinct().select("x", rows)
    p = p.select(
        "x",
        "row",
        F.pmod(
            hash64(F.concat(F.col("row").cast("string"),
                            F.lit(":"), F.col("x")), "cm:"),
            F.lit(width),
        ).alias("b"),
    )
    joined = p.join(sketch, ["row", "b"], "left").fillna({"cnt": 0})
    return joined.groupBy("x").agg(F.min("cnt").alias("est"))


def hll_alpha(m: int) -> float:
    """Bias-correction constant (the published m >= 128 formula)."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, col: str, by: list[str] | None = None, p: int = HLL_P
) -> DataFrame:
    """(by..., b, mreg): HLL registers — max rank per bucket per group.
    Duplicates are free (max is idempotent); merging sketches is the
    same groupBy-max over unioned register frames."""
    by = by or []
    m = 1 << p
    w = F.pmod(hash_wide(F.col(col), "hw:"), F.lit(_W_MOD))
    rank = F.when(w == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS + 1) - F.length(F.bin(w))
    )
    bucket = F.pmod(hash64(F.col(col), "hb:"), F.lit(m))
    return (
        df.select(*by, bucket.alias("b"), rank.alias("r"))
        .groupBy(*by, "b")
        .agg(F.max("r").alias("mreg"))
    )


def hll_distinct(
    df: DataFrame, col: str, by: list[str] | None = None, p: int = HLL_P
) -> DataFrame:
    """(by..., distinct_est): HyperLogLog distinct-count estimate of
    ``col`` per group. Estimate pipeline: exact integer Z =
    sum_registers 2^(56 - M) (empty registers contribute 2^56), then

        E_raw = alpha_m * m^2 * 2^56 / Z
        E     = m * ln(m / zeros)   if E_raw <= 2.5m and zeros > 0

    rounded to 4 dp. Both branches and the branch CONDITION evaluate
    from exact integers, so the oracle replays the decision too."""
    by = by or []
    m = 1 << p
    regs = hll_registers(df, col, by, p)
    agg = regs.groupBy(*by).agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(
            F.expr(f"CAST(shiftleft(1L, {_W_BITS + 1} - mreg) AS DECIMAL(38,0))")
        ).alias("zne"),
    )
    zeros = F.lit(m) - F.col("nb")
    z = F.col("zne") + zeros.cast("decimal(38,0)") * F.lit(_SCALE).cast(
        "decimal(38,0)"
    )
    e_raw = F.lit(hll_alpha(m) * m * m * float(_SCALE)) / z.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(m) / zeros),
    ).otherwise(e_raw)
    return agg.select(*by, F.round(est, 4).alias("distinct_est"))


# --- Bloom filter -----------------------------------------------------

BLOOM_M = 1 << 13  # bits
BLOOM_K = 4

_BW = 32  # word width: 32-bit words keep every value positive on both
#           engines (DuckDB's << wraps at bit 63; 1<<31 in a BIGINT is
#           safe, and Spark's long holds it exactly)


def _bloom_positions(x: F.Column, m_bits: int, k: int) -> list:
    """The k deterministic bit positions of value ``x``: row-salted
    members of the shared md5 family, so the oracle replays each
    position as CAST('0x'||substring(md5('bl:'||i||':'||x),1,8) AS
    BIGINT) % m."""
    return [
        F.pmod(
            hash64(F.concat(F.lit(str(i)), F.lit(":"), x), "bl:"),
            F.lit(m_bits),
        )
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
    by: list[str] | None = None,
) -> DataFrame:
    """(by..., w, word): Bloom filter (Bloom 1970) over ``col`` as a
    sparse relation of set 32-bit words — w = bit_pos / 32, word =
    bit_or of 1 << (bit_pos % 32). One explode (x k) + one hash
    aggregation; bit_or is idempotent and order-free, so duplicates
    are free, partial aggregation combines map-side, and two sketches
    merge by the SAME groupBy-bit_or over their union. m=8192/k=4:
    for n inserted keys FPR ~ (1 - e^(-kn/m))^k (~2.4% at n=1024).

    Use case at scale: build over the small side of a semi/anti join
    (e.g. a benchmark-decontamination gram set), broadcast the <=
    m/32-row word relation, and pre-filter the corpus side before the
    exact join — same results, shuffle bounded by maybe-members."""
    by = by or []
    pos = F.explode(
        F.array(*_bloom_positions(F.col("x"), m_bits, k))
    ).alias("p")
    e = df.select(*by, F.col(col).alias("x")).select(*by, pos)
    return (
        e.select(
            *by,
            (F.col("p") / _BW).cast("long").alias("w"),
            F.expr(f"CAST(shiftleft(1L, CAST(pmod(p, {_BW}) AS INT)) AS LONG)")
            .alias("m"),
        )
        .groupBy(*by, "w")
        .agg(F.bit_or("m").alias("word"))
    )


def bloom_contains(
    sketch: DataFrame,
    probes: DataFrame,
    col: str = "x",
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """(x, present): membership test per distinct probe — present iff
    ALL k bits are set (min over the k per-bit hits). No false
    negatives ever; false positives at the design FPR. The probe side
    is explode(x k) of a small relation and the sketch is <= m/32
    rows, so the join broadcasts whichever side is declared small."""
    pos = F.explode(
        F.array(*_bloom_positions(F.col("x"), m_bits, k))
    ).alias("p")
    p = probes.select(F.col(col).alias("x")).distinct().select("x", pos)
    p = p.select(
        "x",
        (F.col("p") / _BW).cast("long").alias("w"),
        F.expr(f"CAST(shiftleft(1L, CAST(pmod(p, {_BW}) AS INT)) AS LONG)")
        .alias("m"),
    )
    j = p.join(F.broadcast(sketch), "w", "left").fillna({"word": 0})
    hit = (F.col("word").bitwiseAND(F.col("m")) == F.col("m")).cast("int")
    return (
        j.select("x", hit.alias("h"))
        .groupBy("x")
        .agg((F.min("h") == 1).alias("present"))
    )


def bloom_stats(sketch: DataFrame, m_bits: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """One row (set_bits, fill_ratio, fpr_est): observed load — set
    bits via bit_count over the word relation, fill ratio against m,
    and the plug-in false-positive estimate fill^k (the probability
    all k probe bits land on set bits)."""
    agg = sketch.agg(F.sum(F.bit_count("word")).alias("set_bits"))
    fill = F.col("set_bits").cast("double") / F.lit(float(m_bits))
    return agg.select(
        "set_bits",
        F.round(fill, 6).alias("fill_ratio"),
        F.round(F.pow(fill, F.lit(float(k))), 6).alias("fpr_est"),
    )
