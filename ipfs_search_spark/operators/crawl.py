"""Crawl-frontier expansion: the reference's queue-driven directory recursion
as an iterative DataFrame fixpoint.

Reference behavior: crawling a directory streams its entries and re-enqueues
every child onto the work queues — the recursion happens THROUGH the AMQP
queue (/root/reference/components/crawler/crawldirectory.go:157-180, priority
1..7 children). On Spark the "queue" is the frontier DataFrame of one
iteration; each round expands links of the newly-discovered parents and
anti-joins against everything already seen (J2). Iterations are plain batch
jobs — at 100 TB each round is one explode + one anti-join, frontier size
bounded by the web's branching, and the loop ends at a fixpoint or max_depth
(web crawls use max_depth; the reference bounds work by queue TTL instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def child_priority(seed: int = 42, url_col: str = "url") -> "F.Column":
    """Deterministic analogue of the reference's random child priority 1..7
    (/root/reference/components/crawler/crawldirectory.go:157-163 — children
    get mixed priorities so queue consumers see a blended availability
    workload). Derived from md5(seed|url), NOT rand(seed): rand() folds the
    partition index into its stream, so the "same" seed yields different
    priorities whenever partitioning changes — a hash of the url is
    unconditionally deterministic across reruns, resumes and cluster sizes,
    and stays uniform over 1..7. md5 (not xxhash64) so the value is
    bit-mirrorable in the DuckDB oracle."""
    h4 = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), F.col(url_col))), 1, 4), 16, 10)
    return (h4.cast("long") % 7 + 1).cast("int")


def expand_frontier(frontier: DataFrame, links: DataFrame,
                    seen: DataFrame) -> DataFrame:
    """One crawl round: children of the frontier not yet seen.
    frontier/seen: (url); links: (parent_url, child_url, name)."""
    children = (frontier.select(F.col("url").alias("parent_url"))
                .join(links, "parent_url")
                .select(F.col("child_url").alias("url"),
                        F.col("parent_url").alias("ref_parent"),
                        F.col("name").alias("ref_name"))
                .dropDuplicates(["url"]))
    return children.join(seen, "url", "left_anti")


def crawl_fixpoint(roots: DataFrame, links: DataFrame,
                   max_depth: int = 16) -> DataFrame:
    """Expand roots through the link graph to a fixpoint (or max_depth).
    Returns (url, depth, ref_parent, ref_name, priority) for every reached
    doc — priority is the reference's 1..7 re-enqueue jitter
    (child_priority, W1/C7: hash-of-url, so a resumed crawl re-derives
    identical priorities). Each round's frontier is checkpoint-truncated
    via localCheckpoint so the plan doesn't grow with depth (the
    iterative-algorithm pitfall)."""
    seen = roots.select("url").withColumn("depth", F.lit(0)) \
                .withColumn("ref_parent", F.lit(None).cast("string")) \
                .withColumn("ref_name", F.lit(None).cast("string"))
    frontier = seen
    for depth in range(1, max_depth + 1):
        nxt = expand_frontier(frontier.select("url"), links,
                              seen.select("url"))
        nxt = nxt.withColumn("depth", F.lit(depth)) \
                 .select("url", "depth", "ref_parent", "ref_name") \
                 .localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return seen.withColumn("priority", child_priority())


def links_name_text(agg_links: DataFrame, parent_col: str,
                    name_field: str = "name",
                    links_col: str = "links") -> DataFrame:
    """Child link NAMES of a directory parent as ONE analyzed text value —
    the reference's directories index makes `links.Name` a full-text
    searchable field (/root/reference/docs/indices/directories.json:19-27),
    so a search for a filename surfaces the directories containing it.

    Input: aggregate_links output (parent, links:array<struct>, ...).
    Output: (parent_col, links_name) — feed as a field of
    build_fielded_index ({'links.name': 'links_name'}) so child names get
    their own BM25 statistics and boost, exactly like title/content.
    Space-joined in the links array's (sorted) order: the analyzer splits
    on non-alphanumerics anyway, so joining is lossless for term search."""
    return agg_links.select(
        F.col(parent_col),
        F.concat_ws(
            " ", F.transform(F.col(links_col),
                             lambda s: s[name_field].cast("string"))
        ).alias("links_name"))
