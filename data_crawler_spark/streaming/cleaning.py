"""Streaming corpus cleaning: the subset of clean_corpus that is
expressible on an UNBOUNDED stream, for ingest-time filtering (clean
pages as they are crawled, before they ever land in the corpus table).

Streaming-legal stages are exactly the pipeline's pure-map gates —
text hygiene, Gopher rules, duplicate-line repetition rules, C4 rules
(all zero-exchange row-local expressions, so they run identically on a
streaming DataFrame) — plus watermarked exact dedup
(``dropDuplicatesWithinWatermark`` on the SAME content hash as batch
dd01). The corpus-wide stages (MinHash near-dup, connected components,
shard packing) are inherently batch: they need the whole corpus and
run as the post-ingest compaction pass; this module deliberately does
NOT imitate them on the stream. The one streamable near-dup form —
LSH-candidate flagging with per-bucket first-arrival state — lives in
streaming/neardup.py as a separate index stream (its per-doc fold
can't ride this pipeline: watermarks don't propagate through the
state op).

Batch/stream agreement is the contract: for the same rows, the kept
set equals `clean_corpus(quality/repetition/c4 flags, exact dedup)` up
to the dedup horizon (the stream keeps the FIRST arrival per content
hash within the watermark; batch keeps the min-id — same cardinality,
tested doc-for-doc on timestamp-ordered fixtures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import (c4_rules, clean_text_col, gopher_rules,
                              repetition_signals, token_count_col)
from .windows import streaming_exact_dedup


def clean_stream(pages_stream: DataFrame, ts_col: str = "warc_ts",
                 text_col: str = "text", *,
                 hygiene: bool = True, quality: bool = True,
                 repetition: bool = True, c4: bool = False,
                 c4_banned_words: tuple[str, ...] = (),
                 dedup_watermark: str | None = "2 hours",
                 min_words: int = 50) -> DataFrame:
    """Apply the streaming-legal cleaning stages to a page stream and
    return the surviving rows (original columns + ``n_tokens``).
    ``dedup_watermark=None`` skips the stateful dedup (pure-map only —
    the result is then usable with any output mode)."""
    cols = pages_stream.columns
    out = pages_stream

    if hygiene:
        out = out.withColumn(text_col, clean_text_col(F.col(text_col)))
    if c4:
        staged = c4_rules(out, text_col, banned_words=c4_banned_words)
        out = (staged.filter("c4_keep")
               .withColumn(text_col, F.col("c4_text")).select(cols))
    if quality:
        out = (gopher_rules(out, text_col, min_words=min_words)
               .filter("gopher_keep").select(cols))
    if repetition:
        out = (repetition_signals(out, text_col)
               .filter("repetition_keep").select(cols))
    if dedup_watermark is not None:
        out = (streaming_exact_dedup(out, ts_col, text_col,
                                     dedup_watermark)
               .drop("content_hash"))
    return out.withColumn("n_tokens",
                          token_count_col(F.col(text_col)).cast("long"))
