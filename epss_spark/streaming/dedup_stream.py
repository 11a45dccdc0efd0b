"""Streaming incremental dedup — the continuous face of the nightly
minhash_index/minhash_lookup flow (a Spark-native extension; the reference
is strictly batch).

A crawl pipeline lands new document files continuously; each micro-batch
must be deduplicated against everything accepted so far WITHOUT
re-shingling the corpus. Structured Streaming's foreachBatch is the right
primitive: the lookup itself is a batch join against the persistent index
artifacts (band rows + shingle arrays on parquet), and the sink appends
both the surviving docs and their index rows transactionally per batch —
so batch N+1 sees batch N's survivors, exactly like `dedup --method
incremental --update-index` on a timer, but driven by file arrival.

In-flight batch ordering: foreachBatch micro-batches execute serially, so
intra-stream duplicates are caught by the index update between batches,
plus drop_batch_duplicates inside each batch. State is bounded: nothing
lives in streaming state at all — the "state" IS the on-disk index, which
is also what makes the job restartable (checkpoint + idempotent parquet
appends per epoch would make it exactly-once; this module keeps the
simple at-least-once append, the standard trade for dedup sinks where
re-appending a survivor is itself an exact duplicate the NEXT lookup
would catch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from epss_spark.operators import dedup


def stream_documents(
    spark: SparkSession,
    path: str,
    schema: str = "doc_id long, text string",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """readStream over a document-drop directory: new parquet files become
    micro-batches."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def start_incremental_dedup(
    docs_stream: DataFrame,
    index_dir: str,
    accepted_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    available_now: bool = True,
):
    """Wire the stream into the incremental-dedup ACTION: per micro-batch,
    look the batch up against the on-disk index, drop duplicates
    (indexed partner wins regardless of id order; batch twins drop
    greedily), append survivors to `accepted_dir`, and extend the index
    with their band rows + shingles.

    available_now=True drains the backlog and stops (the catch-up/nightly
    mode — same availableNow pattern as the scores streams); False keeps
    the query running for continuous arrival. Returns the StreamingQuery.

    Scale shape per batch: identical to the batch operator — the index
    side never re-shingles and its band rows never shuffle
    (minhash_lookup's broadcast-join formulation); the index update is
    O(survivors)."""
    bands_path = os.path.join(index_dir, "bands")
    sh_path = os.path.join(index_dir, "shingles")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        ib = spark.read.parquet(bands_path)
        ish = spark.read.parquet(sh_path)
        with dedup.shingle_cache(batch_df, id_col, text_col) as bshmap:
            pairs = dedup.minhash_lookup(
                batch_df,
                ib,
                ish,
                id_col,
                text_col,
                num_hashes=num_hashes,
                bands=bands,
                threshold=threshold,
                new_shmap=bshmap,
            )
            # persist the survivor set so the accepted-append and the index
            # extension share ONE computation of the lookup + ACTION
            kept = dedup.drop_batch_duplicates(batch_df, pairs, id_col).persist()
            try:
                kept.write.mode("append").parquet(accepted_dir)
                # index hygiene: exactly one row set per id. A re-crawled
                # survivor (id already indexed) must NOT append fresh rows
                # next to its stale ones — duplicate ids make later
                # verification nondeterministic; refreshing content is an
                # index rebuild/compaction, not an append. Survivors'
                # shingle arrays are already in the batch cache, so reuse
                # it instead of re-normalizing/re-shingling the texts.
                indexed_ids = ish.select(id_col).distinct().persist()
                indexed_ids.count()  # snapshot BEFORE appending to sh_path
                try:
                    fresh = kept.join(indexed_ids, id_col, "left_anti")
                    fshmap = bshmap.join(fresh.select(id_col), id_col, "semi")
                    kb, ks = dedup.minhash_index(
                        fresh,
                        id_col,
                        text_col,
                        num_hashes=num_hashes,
                        bands=bands,
                        shmap=fshmap,
                    )
                    kb.write.mode("append").parquet(bands_path)
                    ks.write.mode("append").parquet(sh_path)
                finally:
                    indexed_ids.unpersist()
            finally:
                kept.unpersist()

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_incremental_line_dedup(
    docs_stream: DataFrame,
    index_dir: str,
    accepted_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 1,
    available_now: bool = True,
):
    """The line-level sibling of `start_incremental_dedup`: per
    micro-batch, drop every line the on-disk fingerprint index has seen
    (operators/dedup.py::dedup_batch_lines), append the reassembled
    surviving docs to `accepted_dir`, and append the batch's new
    fingerprints to the index — so batch N+1 cannot re-admit batch N's
    lines. foreachBatch's serial execution is the ordering guarantee;
    state is the on-disk index, nothing lives in streaming state.

    Scale shape per batch: O(batch lines) — one anti-join of the batch's
    exploded lines against the index scan plus the same two-exchange
    dedup/reassembly as the batch operator; the corpus text is never
    touched."""
    fps_path = os.path.join(index_dir, "line_fps")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # bootstrap detection must go through Spark's filesystem layer —
        # a driver-local os.path.exists is always False for hdfs://, s3a://
        # etc., which would silently treat the index as empty on EVERY
        # batch (cross-batch dedup off, duplicate fps accumulating). Only
        # a missing-path error means "first batch"; any other read error
        # propagates.
        try:
            idx = spark.read.parquet(fps_path)
            idx.schema  # force path resolution now, inside the try
        except Exception as e:
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            idx = spark.createDataFrame([], "line_fp string")
        kept, new_fps = dedup.dedup_batch_lines(
            batch_df, idx, id_col, text_col, min_line_chars
        )
        # snapshot new_fps BEFORE the accepted/index appends: its lazy
        # plan reads fps_path, and appending to that same path first
        # would be a read-your-own-append hazard
        new_fps = new_fps.persist()
        try:
            new_fps.count()
            kept.write.mode("append").parquet(accepted_dir)
            new_fps.write.mode("append").parquet(fps_path)
        finally:
            new_fps.unpersist()

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_incremental_span_dedup(
    docs_stream: DataFrame,
    index_dir: str,
    accepted_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    available_now: bool = True,
):
    """The span-level sibling of `start_incremental_line_dedup`: per
    micro-batch, remove every >= k-token span the on-disk gram-
    fingerprint index has seen (operators/dedup.py::dedup_batch_spans,
    Lee et al. 2022 semantics), append the reassembled surviving docs to
    `accepted_dir`, and append the batch's fresh gram fingerprints to
    the index — so batch N+1 cannot re-admit batch N's spans.
    foreachBatch's serial execution is the ordering guarantee; state is
    the on-disk index, nothing lives in streaming state.

    Scale shape per batch: O(batch grams) — one join of the batch's gram
    rows against the index scan plus the batch operator's coverage/
    reassembly exchanges; the corpus text is never touched."""
    fps_path = os.path.join(index_dir, "gram_fps")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # same filesystem-layer bootstrap rule as the line stream: only a
        # missing path means "first batch"
        try:
            idx = spark.read.parquet(fps_path)
            idx.schema
        except Exception as e:
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            idx = spark.createDataFrame([], "gram_fp string")
        kept, new_fps = dedup.dedup_batch_spans(batch_df, idx, k, id_col, text_col)
        # snapshot new_fps BEFORE the appends (read-your-own-append hazard)
        new_fps = new_fps.persist()
        try:
            new_fps.count()
            kept.write.mode("append").parquet(accepted_dir)
            new_fps.write.mode("append").parquet(fps_path)
        finally:
            new_fps.unpersist()

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_bm25_index_maintenance(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Continuous lexical-index maintenance: per micro-batch, append the
    batch's postings (term, id, tf) and doc_stats (id, dl) to the BM25
    index artifacts (operators/retrieval.py::bm25_index). Terms are
    per-document facts, so appends need no read-modify-write and no
    cross-batch state at all — the simplest of the index streams; the
    bounded N/avgdl/df statistics are computed at QUERY time by
    bm25_lookup, so the index is always current the moment a batch
    lands. Upstream dedup streams should run first (index accepted docs,
    not raw crawl).

    Scale shape per batch: one tokenize pass + one (term, id) aggregate
    over the batch only."""
    from epss_spark.operators import retrieval

    postings_path = os.path.join(index_dir, "postings")
    stats_path = os.path.join(index_dir, "doc_stats")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        postings, doc_stats = retrieval.bm25_index(batch_df, id_col, text_col)
        postings.write.mode("append").parquet(postings_path)
        doc_stats.write.mode("append").parquet(stats_path)

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
