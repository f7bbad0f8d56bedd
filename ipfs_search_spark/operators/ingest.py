"""Reference crawler dataflow semantics as DataFrame operators.

Each operator mirrors a behavior of /root/reference's crawler/sniffer pipeline
(SURVEY.md §2); all are pure DataFrame/SQL (whole-stage codegen, no Python).
They are exercised both by pytest and by the DuckDB-oracle queries in
__spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ipfs_search_spark import MAX_LINKS_PER_DIR, MIN_UPDATE_AGE_HOURS


def latest_wins(df: DataFrame, key: str, ts: str,
                tiebreak: list | None = None) -> DataFrame:
    """W2 latest-observation-wins: keep the newest row per key.

    Reference: the sniffer's LastSeenFilter keeps only the most recent
    sighting inside its window
    (/root/reference/components/sniffer/providerfilters/lastseenfilter.go:55-90).
    One shuffle on the key; ranking window + row_number=1 compiles to a single
    sort within partitions (no global sort)."""
    order = [F.desc(ts)] + [F.desc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(key).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def first_last_seen(df: DataFrame, key: str, ts: str) -> DataFrame:
    """A3 first-seen/last-seen per key, second-truncated like the reference
    (/root/reference/components/crawler/index.go:19-43). Partial (map-side)
    aggregation is automatic for min/max/count."""
    return df.groupBy(key).agg(
        F.date_trunc("second", F.min(ts)).alias("first_seen"),
        F.date_trunc("second", F.max(ts)).alias("last_seen"),
        F.count(F.lit(1)).alias("n_sightings"),
    )


def anti_join_new(batch: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """J2 new-item path: items absent from all state stores get crawled as new
    (/root/reference/components/crawler/update.go:141-160). left_anti is the
    whole Redis-exists-set + mget machinery collapsed into one operator."""
    return batch.join(existing.select(key), key, "left_anti")


def multiget_probe(batch: DataFrame, stores: list[tuple[str, DataFrame, str]],
                   batch_key: str) -> DataFrame:
    """J1 existence multi-probe: probe N state stores, first-match wins in
    priority order (/root/reference/components/index/multiget.go:24-73 probes
    [Files, Directories, Invalids, Partials] concurrently; priority = list
    order here). stores: [(store_name, df, key_col)]. Adds `found_in`
    (store name or 'missing').

    Spark shape: union the (small, projected) store keysets with a source tag
    + priority, min(priority) per key, then ONE left join — not N sequential
    lookups. Store sides are key-only projections so Catalyst prunes columns
    at the scan."""
    tagged = None
    for prio, (name, df, key_col) in enumerate(stores):
        t = df.select(F.col(key_col).alias("_probe_key")).distinct() \
              .withColumn("_store", F.lit(name)) \
              .withColumn("_prio", F.lit(prio))
        tagged = t if tagged is None else tagged.unionByName(t)
    w = Window.partitionBy("_probe_key").orderBy("_prio")
    best = (tagged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).select("_probe_key", "_store"))
    return (batch.join(best, batch[batch_key] == best["_probe_key"], "left")
            .withColumn("found_in", F.coalesce(F.col("_store"), F.lit("missing")))
            .drop("_probe_key", "_store"))


def merge_references(existing_refs: DataFrame, new_edges: DataFrame,
                     key: str = "url") -> DataFrame:
    """J4/A2 reference merge: append {parent, name} edge iff not already
    present (/root/reference/components/crawler/update.go:16-34) — set-union
    semantics. Inputs are exploded edge rows (key, parent_hash, name); output
    is deduped edges, i.e. the MERGE payload."""
    cols = [key, "parent_hash", "name"]
    return (existing_refs.select(*cols)
            .unionByName(new_edges.select(*cols))
            .dropDuplicates(cols))


def update_last_seen_hysteresis(state: DataFrame, batch: DataFrame,
                                key: str, state_ts: str = "last_seen",
                                batch_ts: str = "ts",
                                min_age_hours: int = MIN_UPDATE_AGE_HOURS
                                ) -> DataFrame:
    """A3/T3 conditional last-seen update: rewrite last_seen only when the new
    sighting is > min_age newer than the stored one — the reference's
    write-amplification bound
    (/root/reference/components/crawler/update.go:58-86, config.go:20).
    Returns (key, last_seen) — the effective post-merge state."""
    newest = batch.groupBy(key).agg(F.max(batch_ts).alias("_new_ts"))
    joined = state.join(newest, key, "left")
    updated = F.when(
        F.col("_new_ts") > F.col(state_ts) + F.expr(f"INTERVAL {min_age_hours} HOURS"),
        F.date_trunc("second", F.col("_new_ts")),
    ).otherwise(F.col(state_ts))
    return joined.withColumn("last_seen_effective", updated).drop("_new_ts")


def classify_status(df: DataFrame, size_col: str, parent_col: str | None = None,
                    max_size: int = 1 << 20, partial_size: int = 262144
                    ) -> DataFrame:
    """S5/F6 classification: oversize → invalid; exactly-256KiB unreferenced
    blobs → partial (/root/reference/components/protocol/ipfs/stat.go:66-68,
    extractor/util.go:15-29); else ok. Pure CASE expression."""
    size = F.col(size_col)
    partial_cond = size == partial_size
    if parent_col:
        partial_cond = partial_cond & F.col(parent_col).isNull()
    return df.withColumn(
        "status",
        F.when(size > max_size, F.lit("invalid_too_large"))
        .when(partial_cond, F.lit("partial"))
        .when(size <= 0, F.lit("partial"))
        .otherwise(F.lit("ok")),
    )


def aggregate_links(edges: DataFrame, parent_col: str, child_struct_cols: list,
                    cap: int = MAX_LINKS_PER_DIR) -> DataFrame:
    """A1/F7 directory link aggregation with the 32768 cap: fold child edges
    into links[], mark oversize parents invalid but KEEP the first `cap` links
    (/root/reference/components/crawler/crawldirectory.go:109-143).

    Deterministic: links sorted (the reference keeps arrival order, which is
    nondeterministic in a distributed shuffle — sorted order is our stable
    contract)."""
    st = F.struct(*[F.col(c) for c in child_struct_cols])
    agg = edges.groupBy(parent_col).agg(
        F.sort_array(F.collect_list(st)).alias("_links"),
        F.count(F.lit(1)).alias("n_links"),
    )
    return (agg.withColumn("dir_status",
                           F.when(F.col("n_links") > cap, F.lit("invalid"))
                           .otherwise(F.lit("ok")))
            .withColumn("links", F.slice("_links", 1, cap))
            .drop("_links"))


def merge_documents(state: DataFrame, batch: DataFrame, key: str = "url"
                    ) -> DataFrame:
    """The full MERGE-INTO upsert the reference performs against OpenSearch
    (bulk update path, /root/reference/components/index/opensearch/index.go):
    new keys inserted, existing keys get last_seen hysteresis + reference
    union. DataFrame form (full outer + resolve) — on Iceberg this is a single
    MERGE INTO statement; this operator is the semantics contract + the local
    fallback. Expects both sides to carry (key, first_seen, last_seen,
    references:array<struct<parent_hash,name>>)."""
    s = state.alias("s")
    b = batch.alias("b")
    j = s.join(b, key, "full_outer")
    return j.select(
        F.coalesce(f"s.{key}", f"b.{key}").alias(key),
        F.coalesce(F.least("s.first_seen", "b.first_seen"),
                   "s.first_seen", "b.first_seen").alias("first_seen"),
        F.when(
            F.col("b.last_seen") >
            F.col("s.last_seen") + F.expr(f"INTERVAL {MIN_UPDATE_AGE_HOURS} HOURS"),
            F.col("b.last_seen"),
        ).otherwise(F.coalesce("s.last_seen", "b.last_seen")).alias("last_seen"),
        F.array_distinct(
            F.concat(
                F.coalesce("s.references", F.expr("array()")),
                F.coalesce("b.references", F.expr("array()")),
            )
        ).alias("references"),
    )
