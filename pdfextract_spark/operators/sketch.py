"""Count-min sketch over a distributed column (build brief: "a novel
sketch" as a custom operator).

A CMS summarizes item frequencies in a fixed (depth x width) grid of
counters: counter (d, hash_d(item) % width) accumulates every
occurrence; a point query reads the MIN over the depth rows —
an overestimate bounded by eps = e/width with probability
1 - (1/e)^depth.  The sketch is LINEAR, which is what makes it a
first-class distributed operator: per-partition sketches merge by
cell-wise addition, so building one is a single map-side-combinable
groupBy over (depth, bucket) — one shuffle of at most depth*width
rows regardless of input size.

Hashing is md5-based (hash_d(x) = bigint of 12 hex chars of
md5(x || '#' || d)) so any md5-equipped engine — the DuckDB oracle —
reproduces every cell bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_chunk_hash(col: Column, i: int, modulus: int) -> Column:
    """hash_i(x) = bigint of the (i % 2)-th 12-hex chunk of
    md5(x || '#' || i//2), mod ``modulus`` — the ONE
    engine-reproducibility contract both sketches share (any
    md5-equipped engine, e.g. the DuckDB oracle, rebuilds every
    cell/bit bit-for-bit).  Two independent chunks per md5 (md5
    output bits are independent) halve the md5 calls; the shared
    md5(x#0)/md5(x#1) subtrees sit in one projection, where Catalyst
    CSE eliminates them.  NULL coalesces to a sentinel BEFORE
    hashing: md5(NULL) is NULL, which would otherwise poison the
    join keys — a CMS point query would return 0 for a NULL item
    that genuinely occurred (an undercount the CMS contract forbids)
    and a bloom probe would report a false NEGATIVE."""
    s = F.coalesce(col.cast("string"), F.lit("\x00<null>"))
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(s, F.lit(f"#{i // 2}"))),
                (i % 2) * 12 + 1,
                12,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(modulus),
    )


def _bucket(col: Column, d: int, width: int) -> Column:
    return _md5_chunk_hash(col, d, width)


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
    pre_aggregate: bool = True,
) -> DataFrame:
    """Build the sketch: one row per non-empty cell
    (depth, bucket, cnt).

    ``pre_aggregate=True`` (default) first collapses the item STREAM
    to (item, occurrence-count) with a map-side-combinable groupBy, so
    the md5 hashing runs once per DISTINCT item instead of once per
    occurrence — on Zipfian token streams (the typical input) that is
    orders of magnitude less hashing (3.6x measured end-to-end at
    sf0.1, where 270k occurrences collapse to 31 terms), at the cost
    of one extra shuffle sized by the distinct-item count (linear,
    map-side combined — never the stream).  Pass False to hash the raw
    stream and keep the single bounded <= depth*width-row shuffle
    (right only when items are nearly all distinct, where the pre-agg
    buys nothing).  ``weight_col`` feeds pre-weighted items (e.g. an
    upstream (term, count) table) straight into the cells — the two
    options produce bit-identical sketches either way, since cell
    counts are sums of occurrence weights."""
    if weight_col is None and pre_aggregate:
        df = df.groupBy(col).agg(F.count("*").alias("_w"))
        weight_col = "_w"
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    cells = df.select(
        w.alias("_w"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _bucket(F.col(col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select("c.depth", "c.bucket", "_w")
    return cells.groupBy("depth", "bucket").agg(F.sum("_w").alias("cnt"))


def cms_point_query(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimated count per item: min over the depth rows of the item's
    cells (cells absent from the sketch are zero).  The sketch side is
    <= depth*width rows by construction, far under the auto-broadcast
    threshold, so Spark's size-based selection broadcasts it unhinted
    — and measurably better than a forced hint (0.79 vs 0.98 s at
    sf0.1): the explicit ``F.broadcast`` pinned the whole build
    pipeline into an eager broadcast exchange, while AQE broadcasts
    the already-aggregated shuffle output.  Never an n x n join."""
    probes = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _bucket(F.col(col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(col, "c.depth", "c.bucket")
    joined = probes.join(sketch, ["depth", "bucket"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est_count")
    )


def _bit_positions(col: Column, n_hashes: int, n_bits: int) -> Column:
    """array<bigint>: the ``n_hashes`` bloom-bit positions of an item
    (``_md5_chunk_hash`` — the shared cell/bit hashing contract,
    NULL-sentinel included)."""
    return F.array(
        *[_md5_chunk_hash(col, i, n_bits) for i in range(n_hashes)]
    )


def bloom_build(
    df: DataFrame,
    col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Build a Bloom filter over a distributed column: one row per SET
    bit (``bit`` bigint).  Set-membership sibling of the count-min
    sketch above — the classic ingest-side "have we seen this URL /
    doc hash before" structure at corpus scale.

    Like the CMS, the filter is LINEAR in the merge sense: the union
    of two filters' set-bit tables IS the filter of the unioned inputs
    (``bloom_merge``), so building one is a single map-side-combinable
    distinct over exploded bit positions — the shuffle carries at most
    ``n_bits`` rows regardless of input size, and a boilerplate item
    repeated 10^9 times combines away map-side.  False-positive rate
    ~= (1 - e^(-kn/m))^k for k hashes, n distinct items, m bits; the
    caller sizes m from the expected distinct count (the build never
    needs to know it)."""
    return (
        df.select(
            F.explode(
                _bit_positions(F.col(col), n_hashes, n_bits)
            ).alias("bit")
        )
        .distinct()
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two set-bit tables = the filter of the unioned inputs
    (both must share n_bits / n_hashes — the caller's contract, as
    with merging any sketch)."""
    return a.unionByName(b).distinct()


def bloom_contains(
    bloom: DataFrame,
    items: DataFrame,
    col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """One row per DISTINCT item value: ``may_contain`` — true iff
    ALL its bit positions are set (false positives possible at the
    designed rate, false negatives never).  The probe stream is
    deduplicated first — without it a repeated probe value would
    contribute n_hashes rows per occurrence and the all-bits count
    test would report a false NEGATIVE for inserted items, breaking
    the contract.  Each distinct item explodes to its k positions and
    left-joins the <= n_bits-row set-bit table (far under the
    auto-broadcast threshold at practical sizes, so the probe side
    never shuffles); the all-bits test is a count aggregate, never a
    per-row scan of the filter.

    The BLOOM side is deduplicated here too: a duplicated bit row
    (e.g. a raw ``unionByName`` of two filters without
    ``bloom_merge``'s distinct, or rows read straight from a
    multi-batch store) would multiply the join and push the count
    PAST n_hashes, flipping an inserted item to a false NEGATIVE —
    the one failure the contract forbids, so the guard lives in the
    operator, not in every caller.  (The probe side's own k positions may
    legitimately collide on one bit; with a distinct bloom side each
    colliding probe row still matches, keeping the sum at exactly
    n_hashes for inserted items.)"""
    probes = (
        items.select(col)
        .distinct()
        .select(
            F.col(col),
            F.explode(
                _bit_positions(F.col(col), n_hashes, n_bits)
            ).alias("bit"),
        )
    )
    hit = bloom.select("bit").distinct().withColumn("_set", F.lit(1))
    joined = probes.join(hit, "bit", "left")
    return joined.groupBy(col).agg(
        (F.sum(F.coalesce("_set", F.lit(0))) == n_hashes).alias(
            "may_contain"
        )
    )
