"""Deterministic sampling for training-data pipelines.

Training corpora need REPRODUCIBLE sampling — the same doc set must
come out on every rerun, on any cluster size, after any repartition.
`df.sample()` gives none of that (seed is per-partition-split), so
both operators here derive keep/rank decisions from a content hash of
the row's id: pure column math, no RNG, no state.

Cross-engine note: ranks/thresholds use the md5-hex prefix trick from
operators/dedup.py (`_hash60`) so a DuckDB oracle reproduces the
EXACT sample, bit for bit — that is what makes a sampler testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 60-bit hash space: top 15 md5 hex digits (see dedup._hash60)
HASH_SPACE = 1 << 60


def _rank_hash(id_col: str):
    """60-bit uniform hash of the id's decimal string — identical in
    DuckDB: CAST('0x'||substr(md5(CAST(id AS VARCHAR)),1,15) AS BIGINT).
    """
    s = F.col(id_col).cast("string")
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows: hash(id) < f·2^60.

    This is the ONLY sampler that scales without cost: a narrow
    filter, no shuffle, no window — it composes with any upstream scan
    and pushes to the row-group level when the id is a file-sort key.
    Membership depends only on the id, so reruns, retries, and
    different partition layouts all keep the same rows, and a 1%
    sample is a strict subset of a 10% sample (nested samples — the
    property ablation studies need).
    """
    return df.filter(_rank_hash(id_col) < int(fraction * HASH_SPACE))


def stratified_sample(
    df: DataFrame, strata_cols: list[str], k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Exactly ``k`` rows per stratum (fewer if the stratum is small),
    chosen by hash rank — deterministic across reruns and cluster
    sizes, with ``id_col`` as the total-order tie-break.

    Plan: one shuffle on the strata key + a rank window. Right when
    strata counts are dimension-sized (languages, sources, buckets);
    a single hot stratum serializes into one partition's window sort,
    so for per-stratum *rates* over skewed strata use
    :func:`hash_sample` after a stratum filter instead.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        _rank_hash(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
