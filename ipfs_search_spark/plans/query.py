"""Top-k BM25 query engine over the sharded posting index.

Plan shape (SURVEY.md §3.3 Spark restatement):

  query strings ──parse──> (query_id, term) + idf (exact df from term_stats,
                            idf computed with python math.log so it is
                            bit-identical to the oracle)
  postings scan:  bucket IN (...) AND term IN (...)   ← partition + row-group
                                                        pruning, no full scan
  broadcast-join tiny query-term side onto postings
  groupBy(query_id, shard).applyInPandas(score_shard)  ← numpy decode + BM25,
       block-max pruning, per-shard top-k (docs are disjoint across shards so
       per-shard top-k merge is EXACT — same as Lucene's 20-shard search)
  window rank over (query_id) → global top-k  (candidates ≤ Q·S·k rows)
  broadcast-join doc_map for url display fields

Float determinism: per-doc sums accumulate in ascending-term order via a
stable argsort + np.add.reduceat — the identical operation order to
oracle.py, so scores are bit-comparable (SURVEY.md §7 hard part 2).

Block-max pruning (sound, never changes results — test-asserted):
  θ = k-th best single-term score of the highest-idf term within the shard
  (a valid lower bound on the shard's k-th best total). A block B of term t
  is skipped iff idf_t·ub(B) + Σ_{t'≠t} idf_{t'}·ub(t') < θ, where
  ub = tfnorm(max_tf, min_dl, avgdl) is the avgdl-at-query-time block bound:
  every doc in B then has total score < θ and cannot reach the top-k.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

from ipfs_search_spark.catalog import TableIO
from ipfs_search_spark.plans.parser import Query, filter_to_sql, parse_query

CANDIDATE_SCHEMA = StructType([
    StructField("query_id", IntegerType()),
    StructField("doc_id", LongType()),
    StructField("score", DoubleType()),
])


def idf(n_docs: int, df: int) -> float:
    """Lucene BM25 idf — must stay in python math.log (oracle parity)."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _make_scorer(k: int, mode: str, prune: bool, keep_all: bool):
    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        from ipfs_search_spark.functions.codec import (
            block_ub, decode_block, tfnorm,
        )

        qid = int(pdf["query_id"].iloc[0])
        pdf = pdf.sort_values("term", kind="stable")
        n_terms = len(pdf)
        avgdl = float(pdf["avgdl"].iloc[0])
        idfs = pdf["idf"].to_numpy(dtype=np.float64)
        term_max_ub = np.array(
            [i * max((float(block_ub(b["max_tf"], b["min_dl"], avgdl))
                      for b in blks), default=0.0)
             for i, blks in zip(idfs, pdf["blocks"])], dtype=np.float64)

        theta = 0.0
        solo = None
        best_i = None
        if prune and n_terms > 1 and not keep_all and mode == "or":
            best_i = int(np.argmax(term_max_ub))
            ids_l, sc_l = [], []
            for blk in pdf["blocks"].iloc[best_i]:
                ids_b, tfs_b, dls_b = decode_block(blk)
                ids_l.append(ids_b)
                sc_l.append(idfs[best_i] * tfnorm(tfs_b, dls_b, avgdl))
            solo = (np.concatenate(ids_l) if ids_l else np.empty(0, np.int64),
                    np.concatenate(sc_l) if sc_l else np.empty(0))
            if solo[1].size >= k:
                theta = float(np.partition(solo[1], -k)[-k])

        ids_parts, sc_parts, cnt_parts = [], [], []
        for row_i in range(n_terms):
            blocks = pdf["blocks"].iloc[row_i]
            t_idf = idfs[row_i]
            if row_i == best_i and solo is not None:
                ids_parts.append(solo[0]); sc_parts.append(solo[1])
                cnt_parts.append(np.ones(solo[0].size, dtype=np.int64))
                continue
            others_ub = float(term_max_ub.sum() - term_max_ub[row_i])
            for blk in blocks:
                if theta > 0.0 and t_idf * float(
                        block_ub(blk["max_tf"], blk["min_dl"], avgdl)
                ) + others_ub < theta:
                    continue
                ids_b, tfs_b, dls_b = decode_block(blk)
                ids_parts.append(ids_b)
                sc_parts.append(t_idf * tfnorm(tfs_b, dls_b, avgdl))
                cnt_parts.append(np.ones(ids_b.size, dtype=np.int64))
        if not ids_parts:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}
                                ).astype({"query_id": "int32",
                                          "doc_id": "int64",
                                          "score": "float64"})
        ids = np.concatenate(ids_parts)
        scores = np.concatenate(sc_parts)
        counts = np.concatenate(cnt_parts)
        # ascending-term contribution order survives the stable sort, so
        # reduceat adds each doc's terms in the same order as the oracle
        order = np.argsort(ids.view(np.uint64), kind="stable")
        ids, scores, counts = ids[order], scores[order], counts[order]
        seg = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
        doc_ids = ids[seg]
        doc_scores = np.add.reduceat(scores, seg)
        if mode == "and":
            doc_counts = np.add.reduceat(counts, seg)
            keep = doc_counts == n_terms
            doc_ids, doc_scores = doc_ids[keep], doc_scores[keep]
        if not keep_all and doc_ids.size > k:
            part = np.argpartition(doc_scores, -k)[-k:]
            doc_ids, doc_scores = doc_ids[part], doc_scores[part]
        return pd.DataFrame({
            "query_id": np.full(doc_ids.size, qid, dtype=np.int32),
            "doc_id": doc_ids.astype(np.int64),
            "score": doc_scores.astype(np.float64),
        })

    return score_shard


class Searcher:
    """Reusable query handle: caches the (tiny, static) index_stats and the
    postings/term_stats/documents DataFrames so repeated queries skip the
    per-call setup jobs. `search()` below is the one-shot convenience form."""

    def __init__(self, spark: SparkSession, io: TableIO):
        self.spark, self.io = spark, io
        row = io.read("index_stats").collect()[0]
        self.n_docs, self.avgdl = int(row["n_docs"]), float(row["avgdl"])
        self.term_stats = io.read("term_stats")
        self.postings = io.read("postings")
        self.documents = io.read("documents")

    def search(self, queries: list, k: int = 10, mode: str = "or",
               prune: bool = True) -> DataFrame:
        return _search_impl(self.spark, self, queries, k, mode, prune)


def search(spark: SparkSession, io: TableIO, queries: list,
           k: int = 10, mode: str = "or", prune: bool = True) -> DataFrame:
    """queries: list of (query_id:int, query_string) → DataFrame
    (query_id, rank, doc_id, url, score), rank 1..k, ties by doc_id asc."""
    return Searcher(spark, io).search(queries, k=k, mode=mode, prune=prune)


def _search_impl(spark: SparkSession, sx: "Searcher", queries: list,
                 k: int, mode: str, prune: bool) -> DataFrame:
    n_docs, avgdl = sx.n_docs, sx.avgdl

    parsed: dict[int, Query] = {int(q): parse_query(s, mode=mode)
                                for q, s in queries}
    all_terms = sorted({t for p in parsed.values()
                        for t in (p.terms + p.not_terms)})
    if not all_terms:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, url string, score double")

    tstats = {r["term"]: (int(r["df"]), int(r["bucket"]))
              for r in sx.term_stats
              .filter(F.col("term").isin(all_terms)).collect()}

    qterm_rows, qmeta = [], []
    for qid, p in parsed.items():
        pos_terms = [t for t in p.terms if t in tstats]
        neg_terms = [t for t in p.not_terms if t in tstats]
        qmeta.append((qid, len(pos_terms)))
        for t in pos_terms:
            qterm_rows.append((qid, t, idf(n_docs, tstats[t][0]), False))
        for t in neg_terms:
            qterm_rows.append((qid, t, 0.0, True))
    if not qterm_rows:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, url string, score double")

    buckets = sorted({tstats[t][1] for _, t, _, _ in qterm_rows})
    live_terms = sorted({t for _, t, _, _ in qterm_rows})

    qterms = spark.createDataFrame(
        qterm_rows, "query_id int, term string, idf double, neg boolean")
    postings = (sx.postings
                .filter(F.col("bucket").isin(buckets) &
                        F.col("term").isin(live_terms)))
    probe = postings.join(F.broadcast(qterms), "term").withColumn(
        "avgdl", F.lit(avgdl))

    has_filters = any(p.filters for p in parsed.values())
    has_neg = any(p.not_terms for p in parsed.values())
    keep_all = has_filters or has_neg

    pos_probe = probe.filter(~F.col("neg"))
    candidates = pos_probe.groupBy("query_id", "shard").applyInPandas(
        _make_scorer(k, mode, prune, keep_all), CANDIDATE_SCHEMA)

    if has_neg:
        neg_probe = probe.filter(F.col("neg"))
        neg_docs = neg_probe.groupBy("query_id", "shard").applyInPandas(
            _make_scorer(k, "or", False, True), CANDIDATE_SCHEMA
        ).select("query_id", "doc_id")
        candidates = candidates.join(neg_docs, ["query_id", "doc_id"],
                                     "left_anti")

    docs = sx.documents
    if has_filters:
        flt_df = None
        for qid, p in parsed.items():
            if not p.filters:
                allowed = docs.select(F.lit(qid).alias("query_id"), "doc_id")
            else:
                pred = " AND ".join(filter_to_sql(f) for f in p.filters)
                allowed = docs.filter(F.expr(pred)).select(
                    F.lit(qid).alias("query_id"), "doc_id")
            flt_df = allowed if flt_df is None else flt_df.unionByName(allowed)
        candidates = candidates.join(flt_df, ["query_id", "doc_id"], "left_semi")

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    topk = (candidates.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
    # Display-field lookup: broadcast the tiny top-k side so the big documents
    # table never shuffles (at 100 TB the doc_map is bucketed by doc_id and
    # this becomes a storage-partitioned join; the projection below prunes the
    # scan to two columns either way).
    return (docs.select("doc_id", "url")
            .join(F.broadcast(topk), "doc_id", "right")
            .select("query_id", "rank", "doc_id", "url", "score")
            .orderBy("query_id", "rank"))
