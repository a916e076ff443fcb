"""Engine facade — the user-facing entry point.

Mirrors the reference plugin's install surface: where the reference is
enabled via ``spark.sql.extensions=com.intel.oap.ColumnarPlugin``
(ColumnarPlugin.scala:387-394) and then transparently accelerates
``spark.sql(...)``, this engine wraps a SparkSession with table registration,
``sql()``, and the extended operator library (dedup / similarity / text /
multimodal / streaming) as first-class methods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import DEFAULT_SF_DIR, TABLES, register_tables


class Engine:
    """Facade over a SparkSession + registered tables.

    >>> eng = Engine(spark, sf_dir="/root/testdata/sf0.01")
    >>> eng.sql("select count(*) from lineitem")
    >>> eng.dedup_minhash(eng.table("documents"), "doc_id", "text")
    """

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self.tables = register_tables(spark, sf_dir)

    # -- core relational surface (reference parity) -----------------------

    def table(self, name: str) -> DataFrame:
        return self.tables[name]

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def explain(self, query: str) -> str:
        """Formatted physical plan — the engine's plan-inspection hook."""
        return self.spark.sql(query)._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    def join(self, left: DataFrame, right: DataFrame, on, how: str = "inner",
             strategy: str | None = None) -> DataFrame:
        """Join with an explicit physical strategy (reference's three execs)."""
        from .operators.joins import join as _join

        return _join(left, right, on, how, strategy)

    # -- sources / sinks ---------------------------------------------------

    def read_parquet(self, path: str, columns: list[str] | None = None) -> DataFrame:
        from .sources import read_parquet

        return read_parquet(self.spark, path, columns)

    def read_jsonl_corpus(self, path: str, schema, corrupt_col: str = "_corrupt_record") -> DataFrame:
        from .sources.io import read_jsonl_corpus

        return read_jsonl_corpus(self.spark, path, schema, corrupt_col)

    def read_csv(self, path: str, schema=None, **options) -> DataFrame:
        from .sources import read_csv

        return read_csv(self.spark, path, schema, **options)

    def write_parquet_zordered(self, df: DataFrame, path: str,
                               zorder_cols: list[str], num_files: int | None = None,
                               bits: int = 12, mode: str = "overwrite") -> None:
        from .operators.layout import write_parquet_zordered

        write_parquet_zordered(df, path, zorder_cols, num_files, bits, mode)

    def compact_parquet(self, src: str, dst: str,
                        target_file_bytes: int = 128 * 1024 * 1024) -> int:
        from .sources.io import compact_parquet

        return compact_parquet(self.spark, src, dst, target_file_bytes)

    def write_parquet(self, df: DataFrame, path: str, **kwargs) -> None:
        from .sources import write_parquet

        write_parquet(df, path, **kwargs)

    # -- LLM-pipeline operators (beyond-reference) -------------------------

    def dedup_exact(self, df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
        from .operators.dedup import dedup_exact

        return dedup_exact(df, cols, id_col)

    def dedup_jaccard(self, df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.8) -> DataFrame:
        from .operators.dedup import ngram_jaccard_pairs

        return ngram_jaccard_pairs(df, id_col, text_col, threshold)

    def dedup_minhash(self, df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.8) -> DataFrame:
        from .operators.dedup import minhash_lsh_pairs

        return minhash_lsh_pairs(df, id_col, text_col, threshold)

    def dedup_simhash(self, df: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 7) -> DataFrame:
        from .operators.dedup import simhash_pairs

        return simhash_pairs(df, id_col, text_col, max_hamming)

    def dedup_embedding(self, df: DataFrame, id_col: str, vec_col: str,
                        threshold: float = 0.95) -> DataFrame:
        from .operators.dedup import embedding_neardup_pairs

        return embedding_neardup_pairs(df, id_col, vec_col, threshold)

    def dedup_clusters(self, df: DataFrame, id_col: str, pairs: DataFrame,
                       a_col: str = "a_id", b_col: str = "b_id") -> DataFrame:
        """Cluster id + canonical flag per row from any pairwise dedup output
        (connected components; filter ``is_canonical`` to materialize the
        deduplicated corpus)."""
        from .operators.dedup import dedup_clusters

        return dedup_clusters(df, id_col, pairs, a_col, b_col)

    def similar_topk(self, df: DataFrame, query_vec: list[float], k: int = 10,
                     method: str = "exact", **kwargs) -> DataFrame:
        """Cosine top-k: ``exact`` (brute force), ``lsh`` (sign-LSH +
        multiprobe), or ``ivf`` (centroid lists + nprobe)."""
        from .operators.similarity import cosine_topk, cosine_topk_ivf, cosine_topk_lsh

        fn = {"exact": cosine_topk, "lsh": cosine_topk_lsh, "ivf": cosine_topk_ivf}[method]
        return fn(df, query_vec, k, **kwargs)

    def knn_join(self, left: DataFrame, right: DataFrame, k: int,
                 left_id: str, right_id: str) -> DataFrame:
        from .operators.similarity import knn_join_exact

        return knn_join_exact(left, right, k, left_id, right_id)

    def text_quality(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        from .operators.text import quality_metrics

        return quality_metrics(df, text_col)

    def language_id(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        from .operators.text import language_id

        return language_id(df, text_col)

    def rebalance_mix(self, df: DataFrame, key_col: str, class_col: str,
                      target: dict[str, float], buckets: int = 256) -> DataFrame:
        from .operators.text import rebalance_mix

        return rebalance_mix(df, key_col, class_col, target, buckets)

    def contamination_check(self, train: DataFrame, eval_: DataFrame,
                            id_col: str, text_col: str, n: int = 8) -> DataFrame:
        from .operators.text import ngram_contamination

        return ngram_contamination(train, eval_, id_col, text_col, n)

    def repetition_stats(self, df: DataFrame, id_col: str,
                         text_col: str = "text", n: int = 3) -> DataFrame:
        from .operators.text import repetition_stats

        return repetition_stats(df, id_col, text_col, n)

    def pack_sequences(self, df: DataFrame, id_col: str, group_col: str,
                       n_tokens_col, capacity: int) -> DataFrame:
        from .operators.text import pack_sequences

        return pack_sequences(df, id_col, group_col, n_tokens_col, capacity)

    def chunk_documents(self, df: DataFrame, id_col: str, text_col: str = "text",
                        size: int = 512, stride: int = 384) -> DataFrame:
        from .operators.text import chunk_documents

        return chunk_documents(df, id_col, text_col, size, stride)

    def quantize_int8(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        from .operators.similarity import quantize_int8

        return quantize_int8(df, id_col, vec_col)

    # -- temporal / skew joins (beyond-reference) --------------------------

    def asof_join(self, left: DataFrame, right: DataFrame, key: str,
                  left_ts: str, right_ts: str, value_cols: list[str],
                  tie_break: str | None = None, direction: str = "backward",
                  tolerance=None) -> DataFrame:
        from .operators.temporal import asof_join

        return asof_join(left, right, key, left_ts, right_ts, value_cols,
                         tie_break, direction, tolerance)

    def merge_upsert(self, target: DataFrame, source: DataFrame, key: str,
                     op_col: str = "op") -> DataFrame:
        from .operators.cdc import merge_upsert

        return merge_upsert(target, source, key, op_col)

    def range_join(self, points: DataFrame, intervals: DataFrame,
                   point_col: str, start_col: str, end_col: str,
                   bucket_width: float, extra_key: str | None = None) -> DataFrame:
        from .operators.temporal import range_join_buckets

        return range_join_buckets(
            points, intervals, point_col, start_col, end_col, bucket_width, extra_key
        )

    def ewma(self, df: DataFrame, key_col: str, ts_col: str, value_col: str,
             alpha: float = 0.3, out_col: str = "ewma") -> DataFrame:
        from .operators.temporal import ewma

        return ewma(df, key_col, ts_col, value_col, alpha, out_col)

    def scd2_history(self, df: DataFrame, key_col: str, attr_col: str,
                     ts_col: str, tie_break: str) -> DataFrame:
        from .operators.temporal import scd2_history

        return scd2_history(df, key_col, attr_col, ts_col, tie_break)

    def salted_join(self, probe: DataFrame, build: DataFrame, probe_key: str,
                    build_key: str, salt: int = 8, how: str = "inner") -> DataFrame:
        from .operators.skew import salted_join

        return salted_join(probe, build, probe_key, build_key, salt, how)

    # -- streaming ---------------------------------------------------------

    def events_stream(self, sf_dir: str | None = None) -> DataFrame:
        from .streaming.windows import read_events_stream

        return read_events_stream(self.spark, sf_dir or self.sf_dir)

    # -- graph analytics ---------------------------------------------------

    def pagerank(self, edges: DataFrame, iterations: int = 3,
                 damping: float = 0.85, symmetric: bool = False) -> DataFrame:
        from .operators.graph import pagerank

        return pagerank(edges, iterations, damping, symmetric)

    def shortest_paths(self, edges: DataFrame, sources: DataFrame,
                       max_hops: int = 3) -> DataFrame:
        from .operators.graph import shortest_paths

        return shortest_paths(edges, sources, max_hops)

    def triangle_count(self, edges: DataFrame) -> DataFrame:
        from .operators.graph import triangle_count

        return triangle_count(edges)

    # -- custom Python data sources ---------------------------------------

    def register_python_datasources(self) -> None:
        """Register pyarrow_parquet (batch read/write) and pyarrow_chunks
        (streaming) on this session."""
        from .sources.pyds import register

        register(self.spark)

    def nfc_normalize(self, col):
        from .operators.text import nfc_normalize

        return nfc_normalize(col)

    def dedup_containment(self, df: DataFrame, id_col: str, text_col: str,
                          threshold: float = 0.9, ngram: int = 3) -> DataFrame:
        """Directional doc-inside-doc pairs, |A∩B|/|A| ≥ threshold."""
        from .operators.dedup import containment_pairs

        return containment_pairs(df, id_col, text_col, threshold, ngram)

    def connected_components(self, edges: DataFrame, src: str, dst: str) -> DataFrame:
        """(node, component) labels — driver union-find on small graphs,
        distributed min-label propagation beyond."""
        from .operators.dedup import connected_components

        return connected_components(edges, src, dst)

    def image_ahash(self, decoded: DataFrame, grid: int = 8) -> DataFrame:
        """Perceptual average-hash per DECODED_IMAGE row (integer math)."""
        from .operators.multimodal import image_ahash

        return image_ahash(decoded, grid)

    def audio_vad(self, df: DataFrame, audio_col: str = "audio",
                  id_col: str = "doc_id", frame: int = 128,
                  threshold: float = 64.0) -> DataFrame:
        """Voice-activity segments per PCM track (frame energy islands)."""
        from .operators.multimodal import audio_vad

        return audio_vad(df, audio_col, id_col, frame, threshold)

    def write_bucketed(self, df: DataFrame, table: str, bucket_cols: list[str],
                       n_buckets: int, sort_cols: list[str] | None = None) -> None:
        """Hash-clustered managed table; same-key joins run shuffle-free."""
        from .sources.io import write_bucketed

        write_bucketed(df, table, bucket_cols, n_buckets, sort_cols)
