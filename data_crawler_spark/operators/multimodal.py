"""Multimodal plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode libraries (PIL/ffmpeg/...) are NOT in this container, so the
actual codec step is stubbed two ways (per the build directive):
``decode=\"strict\"`` raises NotImplementedError at the exact seam where
a real decoder plugs in; ``decode=\"fake\"`` derives deterministic
pseudo-metadata/features from the bytes so the Spark-side plumbing —
schema, batching, partitioning, UDF signature — is real and tested.

At 100 TB the rules encoded here: binary payloads never enter a
shuffle (feature-extract FIRST, carry only features + keys), and the
pipeline is mapInPandas so each task streams Arrow batches instead of
materializing rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "meta struct<n_bytes: long, declared_format: string>"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, width int, height int, "
    "channels int, feature array<double>"
)


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: each document's utf-8 bytes as an
    opaque payload with typed metadata — the stand-in corpus for the
    multimodal path (no external data allowed in this sandbox)."""
    payload = F.encode("text", "utf-8")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("doc_id"), F.lit(3)) + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.upper(F.substring("source", 1, 4)).alias("declared_format"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic pseudo-decode: dims from byte length, 8-bin byte
    histogram as the 'feature' — a stand-in with real data flow."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    channels = 3
    if n:
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr >> 5, minlength=8).astype(np.float64) / n
    else:
        hist = np.zeros(8)
    return width, height, channels, np.round(hist, 6)


def decode_and_featurize(media: DataFrame, decode: str = "fake",
                         batch_limit: int = 1024) -> DataFrame:
    """binary payloads -> (dims, feature vector) via mapInPandas.

    ``decode="strict"`` marks the real-codec seam: it raises
    NotImplementedError (image/audio libs absent in this container).
    Unknown modes fail fast on the DRIVER — a typo must not silently
    run the fake decoder. Null payloads (a failed fetch) yield null
    dims/features, not a task crash.
    """
    if decode not in ("fake", "strict"):
        raise ValueError(
            f"decode must be 'fake' or 'strict', got {decode!r}")
    if decode == "strict":
        raise NotImplementedError(
            "real media decoding requires codec libraries not "
            "present in this environment; use decode='fake' for "
            "the deterministic stand-in")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_fake_decode(p) if p is not None else None
                    for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pd.array(
                    [len(p) if p is not None else None
                     for p in pdf["payload"]], dtype="Int64"),
                "width": pd.array(
                    [r[0] if r else None for r in rows], dtype="Int32"),
                "height": pd.array(
                    [r[1] if r else None for r in rows], dtype="Int32"),
                "channels": pd.array(
                    [r[2] if r else None for r in rows], dtype="Int32"),
                "feature": [list(r[3]) if r else None for r in rows],
            })

    # project payload as late as possible; features leave, bytes don't
    return media.select("media_id", "media_type", "payload") \
                .mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (posexplode of a native sequence — the decode of each frame
    is the same strict/fake seam). Demonstrates the fan-out schema."""
    n_frames = (F.length("payload") / 1024).cast("int") + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", F.posexplode(idx).alias("pos", "frame_idx"))
        .select("media_id", "frame_idx")
    )


# ---------------------------------------------------------------------------
# Perceptual hashing: DCT pHash + hamming near-dup over media payloads
# ---------------------------------------------------------------------------

_PHASH_N = 32  # grayscale side length the DCT runs on (standard pHash)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (the standard image-hash
    transform), as a plain numpy matmul — no scipy in this container."""
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


_DCT32 = _dct_matrix(_PHASH_N)


def phash64(gray: np.ndarray) -> int:
    """The REAL pHash math (the part that is pure published algorithm,
    independent of any codec): 32x32 grayscale -> 2-D DCT-II -> keep
    the 8x8 low-frequency block -> threshold each coefficient at the
    median of the 63 AC coefficients (DC excluded from the median — it
    is pure mean brightness; its own bit uses the same threshold) ->
    64 bits, bit i = coefficient_i > median. A uniform brightness
    shift changes ONLY the DC coefficient, so at most one bit moves —
    the invariance that makes pHash a *perceptual* hash. Returns a
    signed int64 (Spark's long), row-major bit order."""
    if gray.shape != (_PHASH_N, _PHASH_N):
        raise ValueError(
            f"phash64 wants a {_PHASH_N}x{_PHASH_N} grayscale array, "
            f"got {gray.shape}")
    d = _DCT32 @ gray.astype(np.float64) @ _DCT32.T
    block = d[:8, :8].ravel()
    med = np.median(block[1:])
    bits = np.uint64(0)
    for i, v in enumerate(block):
        if v > med:
            bits |= np.uint64(1) << np.uint64(i)
    return int(np.int64(bits))


def _fake_gray(payload: bytes) -> np.ndarray:
    """Deterministic pseudo-grayscale for the stubbed codec seam: the
    payload bytes tiled into a 32x32 float array. Identical bytes give
    identical 'images' — the property the plumbing tests need."""
    if not payload:
        return np.zeros((_PHASH_N, _PHASH_N))
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return np.resize(arr, _PHASH_N * _PHASH_N).reshape(_PHASH_N, _PHASH_N)


def phash_media(media: DataFrame, decode: str = "fake",
                id_col: str = "media_id",
                payload_col: str = "payload") -> DataFrame:
    """(id, phash) per payload — the 64-bit perceptual hash a media
    crawl dedups on. The codec step (bytes -> 32x32 grayscale) is the
    same strict/fake seam as decode_and_featurize (a real deployment
    plugs PIL/ffmpeg in at ``_fake_gray``'s position); the
    DCT/median/threshold math downstream of the seam is the real
    published algorithm and is tested directly on synthetic grayscale.
    One Arrow-batched mapInPandas pass; payload bytes never shuffle —
    only (id, phash) leaves the scan. Null payloads -> null phash.
    ``id_col``'s type is carried from the input schema (long media
    ids, string media URLs — both work)."""
    if decode not in ("fake", "strict"):
        raise ValueError(
            f"decode must be 'fake' or 'strict', got {decode!r}")
    if decode == "strict":
        raise NotImplementedError(
            "real media decoding requires codec libraries not "
            "present in this environment; use decode='fake' for "
            "the deterministic stand-in")

    id_type = media.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField(id_col, id_type),
        T.StructField("phash", T.LongType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "phash": pd.array(
                    [phash64(_fake_gray(bytes(p))) if p is not None
                     else None for p in pdf[payload_col]],
                    dtype="Int64"),
            })

    return (media.select(id_col, payload_col)
            .mapInPandas(fn, out_schema))


def media_near_dups(media: DataFrame, max_hamming: int = 6,
                    decode: str = "fake", id_col: str = "media_id",
                    payload_col: str = "payload") -> DataFrame:
    """Perceptual near-duplicate media pairs: phash_media then EXACT
    hamming blocking (dedup.hamming_near_dups — by pigeonhole,
    max_hamming+1 chunks guarantee zero false negatives), the image
    analogue of simhash_near_dups. Emits (id_a, id_b, hamming) with
    id_a < id_b; the payload bytes feed exactly one Arrow stage and
    never ride the blocking shuffle."""
    from data_crawler_spark.operators.dedup import hamming_near_dups

    hashes = (phash_media(media, decode, id_col, payload_col)
              .where(F.col("phash").isNotNull()))
    return hamming_near_dups(hashes, id_col, "phash", max_hamming)


# ---------------------------------------------------------------------------
# Image-text pairs: <img alt> mining -> caption rules -> paired corpus
# (the LAION recipe, Schuhmann et al. 2022: alt-text pairs from Common
# Crawl, rule-gated, CLIP-score filtered, image-deduped)
# ---------------------------------------------------------------------------

_IMG_TAG_RE = r"(?is)<img\b[^>]*>"

# generic alt texts that caption nothing (the CC3M/LAION-style deny
# set): lowercased exact match after whitespace collapse
GENERIC_CAPTIONS = frozenset({
    "image", "img", "photo", "picture", "pic", "logo", "icon",
    "banner", "thumbnail", "thumb", "spacer", "graphic", "untitled",
    "alt", "photo of", "image of", "no image", "image not found",
})


def _caption_clean_col(c: Column) -> Column:
    """Entity-decode + Unicode-whitespace collapse + strip — the alt
    attribute arrives HTML-escaped and newline-wrapped."""
    from data_crawler_spark.operators.links import _decode_entities
    from data_crawler_spark.operators.text import UNICODE_WS

    collapsed = F.regexp_replace(_decode_entities(c),
                                 f"[{UNICODE_WS}]+", " ")
    return F.regexp_replace(collapsed, "^ | $", "")


def img_entries_col(html: Column) -> Column:
    """html -> array<struct<src, alt, title>> of the document's
    ``<img>`` tags in document order — native regexp extraction with
    the structured-data module's three-quote-form attribute grammar
    (double/single/unquoted; real pages mix all three). Absent
    attributes are empty strings; alt/title are entity-decoded and
    whitespace-collapsed, src only entity-decoded (URLs keep their
    bytes for the canonicalizer)."""
    from data_crawler_spark.operators.links import _decode_entities
    from data_crawler_spark.operators.structured import _attr
    from data_crawler_spark.operators.text import ws_strip_col

    tags = F.regexp_extract_all(html.cast("string"),
                                F.lit(_IMG_TAG_RE), 0)
    return F.transform(tags, lambda tag: F.struct(
        ws_strip_col(_decode_entities(F.coalesce(_attr(tag, "src"),
                                                 F.lit("")))).alias("src"),
        _caption_clean_col(F.coalesce(_attr(tag, "alt"),
                                      F.lit(""))).alias("alt"),
        _caption_clean_col(F.coalesce(_attr(tag, "title"),
                                      F.lit(""))).alias("title"),
    ))


def image_caption_pairs(pages: DataFrame, url_col: str = "url",
                        html_col: str = "html") -> DataFrame:
    """(page_url, img_idx, media_url, caption, title) per ``<img>``
    with a non-empty src that resolves to http(s) — the raw pair
    stream a LAION-style multimodal corpus starts from. ``caption`` is
    the alt text (possibly empty — gate with caption_rules, which is a
    separate op so the pass/fail accounting stays inspectable);
    media_url is resolved against the page URL and canonicalized with
    the frontier's own canonicalizer, so the pair stream joins the
    media crawl's fetch log BY KEY. data:/javascript: URIs keep their
    scheme through resolve and fall to the http(s) filter.

    Pure map + explode over the page scan — zero Exchange, zero
    Python (plan-tested); html never leaves the scan."""
    from data_crawler_spark.operators.links import (canonicalize_col,
                                                    is_http_col,
                                                    resolve_href_col)

    e = F.col("_e")
    media_url = canonicalize_col(
        resolve_href_col(F.col("page_url"), e["src"]))
    return (pages
            .select(F.col(url_col).alias("page_url"),
                    F.posexplode(img_entries_col(F.col(html_col)))
                    .alias("img_idx", "_e"))
            .where(e["src"] != "")
            .select("page_url", "img_idx",
                    media_url.alias("media_url"),
                    e["alt"].alias("caption"),
                    e["title"].alias("title"))
            .where(is_http_col(F.col("media_url"))))


def caption_rules(pairs: DataFrame, caption_col: str = "caption",
                  min_chars: int = 5, max_chars: int = 1000,
                  min_words: int = 1) -> DataFrame:
    """LAION-style caption quality gate: per-pair metrics, one boolean
    per rule, and the conjunction ``caption_keep`` — the gopher_rules
    shape, so gate_pass_rates reports removal per rule unchanged.
    Rules: length bounds (LAION-400M drops alt < 5 chars), a word
    minimum, at least one Unicode letter (digits-and-punct alts are
    dimensions or filenames), not a bare URL, and not a generic
    placeholder ("image", "logo", ... — exact lowercase match). Pure
    map, native expressions only; language/NSFW/CLIP gates are the
    sibling ops (langid, classifier, clip_score_filter)."""
    from data_crawler_spark.operators.text import ws_split_col

    c = F.col(caption_col)
    n_chars = F.length(c)
    n_words = F.size(ws_split_col(c))
    r_len = (n_chars >= min_chars) & (n_chars <= max_chars)
    r_words = n_words >= min_words
    r_letter = c.rlike(r"\p{L}")
    r_not_url = ~c.rlike(r"(?i)^https?://\S+$")
    r_not_generic = ~F.lower(c).isin(*sorted(GENERIC_CAPTIONS))
    return (pairs
            .withColumn("n_chars", n_chars)
            .withColumn("n_words", n_words)
            .withColumn("rule_len", r_len)
            .withColumn("rule_words", r_words)
            .withColumn("rule_letter", r_letter)
            .withColumn("rule_not_url", r_not_url)
            .withColumn("rule_not_generic", r_not_generic)
            .withColumn("caption_keep",
                        r_len & r_words & r_letter & r_not_url
                        & r_not_generic))


def image_text_corpus(pairs: DataFrame, media: DataFrame,
                      max_hamming: int = 6, decode: str = "fake",
                      media_url_col: str = "media_url",
                      payload_col: str = "payload") -> DataFrame:
    """Compose gated (page_url, media_url, caption) pairs with the
    media crawl's fetched payloads into a deduplicated image-text
    corpus: one row per surviving (image cluster, caption), ready for
    write_webdataset_shards(key_col='sample_id', text_col='caption',
    bin_col='payload').

    Pipeline (the LAION dedup step done on perceptual identity, not
    URL identity): (1) pHash near-dup pairs over the media table
    (payload crosses ONE Arrow stage; only (url, hash) rides the
    blocking shuffle); (2) connected components over the hamming
    pairs — labels are min vertex ids, so each cluster's label IS its
    representative URL; (3) pair stream remapped onto representatives
    (inner join: pairs whose image was never fetched drop — there is
    nothing to train on) and collapsed to distinct (media_url,
    caption) with the min page_url kept for provenance; (4) surviving
    representatives' payloads joined back — payload bytes cross
    exactly one exchange, AFTER dedup pruned the set. sample_id =
    zero-padded hex of xxhash64(media_url, caption) — deterministic,
    64-bit (collisions negligible below ~10^9 pairs; the webdataset
    writer raises on in-shard key collisions rather than merging).

    Contract: ``media`` has one row per ``media_url_col`` (a fetch
    log's latest-capture view; duplicate rows would duplicate
    samples)."""
    from data_crawler_spark.operators.dedup import connected_components

    nd = media_near_dups(media, max_hamming, decode,
                         id_col=media_url_col, payload_col=payload_col)
    verts = media.select(media_url_col).distinct()
    clusters = connected_components(verts, nd, id_col=media_url_col)
    remapped = (pairs
                .join(clusters, media_url_col)
                .groupBy(F.col("cluster_id").alias(media_url_col),
                         "caption")
                .agg(F.min("page_url").alias("page_url")))
    rep_payloads = (media
                    .join(clusters.where(
                        F.col(media_url_col) == F.col("cluster_id"))
                        .select(media_url_col), media_url_col, "left_semi")
                    .select(media_url_col, payload_col))
    sample_id = F.lpad(
        F.hex(F.xxhash64(F.col(media_url_col), F.col("caption"))),
        16, "0")
    return (remapped.join(rep_payloads, media_url_col)
            .select(sample_id.alias("sample_id"), media_url_col,
                    "caption", "page_url", payload_col))


# ---------------------------------------------------------------------------
# Video near-dup: frame-sampled perceptual hashes + shared-frame overlap
# ---------------------------------------------------------------------------

_FRAME_BYTES = 1024   # frame_sample_plan's frame-count rule: len//1024+1


def frame_hashes(media: DataFrame, every_n: int = 10,
                 decode: str = "fake",
                 id_col: str = "media_id",
                 payload_col: str = "payload") -> DataFrame:
    """(id, frame_idx, phash) per sampled frame of each video payload —
    frame_sample_plan's sampling rule (every ``every_n``-th of
    ``len//1024+1`` frames) with the frame DECODED and pHashed in the
    same pass. The codec seam is the usual strict/fake pair: a real
    deployment decodes frame ``k`` with ffmpeg where the fake path
    reads the payload's k-th 1024-byte slice through ``_fake_gray``
    (deterministic: equal payload bytes -> equal frame hashes — the
    property the overlap tests need). One Arrow stage; payload bytes
    never shuffle — ~16 bytes per sampled frame leave the scan."""
    if decode not in ("fake", "strict"):
        raise ValueError(
            f"decode must be 'fake' or 'strict', got {decode!r}")
    if decode == "strict":
        raise NotImplementedError(
            "real video decoding requires codec libraries not "
            "present in this environment; use decode='fake' for "
            "the deterministic stand-in")
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    id_type = media.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField(id_col, id_type),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("phash", T.LongType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                b = bytes(p)
                n_frames = len(b) // _FRAME_BYTES + 1
                for k in range(0, n_frames, every_n):
                    frame = b[k * _FRAME_BYTES:(k + 1) * _FRAME_BYTES]
                    ids.append(mid)
                    idxs.append(k)
                    hashes.append(phash64(_fake_gray(frame)))
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                "frame_idx": pd.array(idxs, dtype="Int32"),
                "phash": pd.array(hashes, dtype="Int64"),
            })

    return (media.select(id_col, payload_col)
            .mapInPandas(fn, out_schema))


def video_near_dups(media: DataFrame, max_hamming: int = 6,
                    min_overlap: float = 0.5, every_n: int = 10,
                    decode: str = "fake", id_col: str = "media_id",
                    payload_col: str = "payload") -> DataFrame:
    """Near-duplicate video pairs by sampled-frame overlap — the
    re-encode/re-upload detection a video crawl dedups on: two videos
    are near-dups when a large fraction of one's sampled frames
    perceptually match frames of the other. Emits ``(id_a, id_b,
    matched_a, matched_b, frames_a, frames_b, overlap)`` with
    ``overlap = max(matched_a/frames_a, matched_b/frames_b)`` — a
    CONTAINMENT score, so a clip cut out of a longer video still
    surfaces (the dedup.containment_pairs rationale, one modality
    over) — filtered to ``overlap >= min_overlap``.

    Plan shape: one Arrow pass (frame_hashes), exact hamming blocking
    over the frame keys (hamming_near_dups on (id, frame_idx)
    structs — pigeonhole, zero false negatives), then a count-distinct
    per video pair and a broadcast-joinable O(videos) frame-count
    table. Payloads never shuffle; everything past the scan is 16-24
    byte rows. A popular identical frame (black intro) inflates its
    bucket — the documented hamming-blocking tradeoff; raise
    ``max_hamming`` chunks or pre-drop such frames upstream if it
    bites."""
    from data_crawler_spark.operators.dedup import hamming_near_dups

    fh = frame_hashes(media, every_n, decode, id_col, payload_col)
    keyed = fh.select(
        F.struct(F.col(id_col).alias("vid"),
                 F.col("frame_idx").alias("fi")).alias("fkey"),
        "phash")
    fpairs = (hamming_near_dups(keyed, "fkey", "phash", max_hamming)
              .where(F.col("id_a.vid") != F.col("id_b.vid")))
    # canonical orientation: pair key = (min vid, max vid); count the
    # DISTINCT matched frames on each side
    a_first = F.col("id_a.vid") < F.col("id_b.vid")
    lo = F.when(a_first, F.col("id_a")).otherwise(F.col("id_b"))
    hi = F.when(a_first, F.col("id_b")).otherwise(F.col("id_a"))
    matched = (fpairs
               .select(lo["vid"].alias("id_a"), lo["fi"].alias("fa"),
                       hi["vid"].alias("id_b"), hi["fi"].alias("fb"))
               .groupBy("id_a", "id_b")
               .agg(F.count_distinct("fa").alias("matched_a"),
                    F.count_distinct("fb").alias("matched_b")))
    counts = fh.groupBy(F.col(id_col).alias("_v")) \
               .agg(F.count("*").alias("_n"))
    ca = counts.select(F.col("_v").alias("id_a"),
                       F.col("_n").alias("frames_a"))
    cb = counts.select(F.col("_v").alias("id_b"),
                       F.col("_n").alias("frames_b"))
    out = (matched.join(F.broadcast(ca), "id_a")
           .join(F.broadcast(cb), "id_b"))
    overlap = F.greatest(
        F.col("matched_a") / F.col("frames_a"),
        F.col("matched_b") / F.col("frames_b"))
    return (out.withColumn("overlap", F.round(overlap, 6))
            .where(F.col("overlap") >= min_overlap))
