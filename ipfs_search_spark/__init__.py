"""ipfs_search_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch Spark rebuild of the extract-and-index core of
ipfs-search/ipfs-search (reference at /root/reference, read-only). The
reference delegates its inverted index and ranking to OpenSearch/Lucene
(reference: docs/architecture.md:12-48, docs/indices/files.json); this package
implements that layer natively on Spark DataFrames:

- vectorized HTML→text extraction (pandas/Arrow UDF, byte-identical per url)
- tokenization + per-partition posting-list construction
  (docID delta + varbyte encoding, block-max metadata)
- salted term-partitioned shuffle + k-way merge into a global segment index
- DataFrame-native top-k BM25 scoring with block-max pruning
- the reference crawler's dataflow semantics (dedup, update-in-place,
  reference merging, invalid/partial classification) as DataFrame operators
- large-scale training-data pipeline operators (dedup family, ANN similarity,
  text analysis, multimodal column plumbing)

Everything is DataFrame/SQL + Arrow-batched UDFs; no per-row Python.
"""

__version__ = "0.1.0"

BM25_K1 = 1.2  # OpenSearch/Lucene default (reference delegates BM25 to Lucene)
BM25_B = 0.75
BLOCK_SIZE = 128  # postings block size for block-max metadata

# Reference operating limits we preserve as engine defaults
# (see /root/reference/components/crawler/config.go:19-23,
#  /root/reference/components/extractor/tika/config.go:16-22)
MAX_LINKS_PER_DIR = 32768
MAX_EXTRACT_BYTES = 4 * 1024**3
PARTIAL_SIZE = 262144  # /root/reference/components/protocol/ipfs/stat.go:66-68
MIN_UPDATE_AGE_HOURS = 1  # /root/reference/components/crawler/config.go:20
DEDUP_WINDOW = "1 hour"  # /root/reference/components/sniffer/config.go:16
