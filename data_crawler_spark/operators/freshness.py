"""Recrawl scheduling from capture history — per-URL change-rate
estimation and freshness-driven priority.

A web-scale crawler cannot re-fetch 10^10 URLs uniformly; it revisits
each page at a rate matched to how often the page actually CHANGES.
The standard model (Cho & Garcia-Molina, "Estimating Frequency of
Change", ACM TOIT 3(3), 2003) treats each page's changes as a Poisson
process with rate λ and estimates λ from sampled observations — which
is exactly what the CDX capture index (operators/cdx.py) provides:
per-URL capture timestamps plus content digests, where a digest flip
between consecutive captures is a detected change.

Estimator: with n inter-capture intervals, X of which detected a
change, the naive X/n underestimates λ badly (two changes inside one
interval are observed as one). The paper's bias-corrected estimator

    changes-per-capture  r̂ = -log((n - X + 0.5) / (n + 0.5))
    changes-per-second   λ̂ = r̂ / mean_interval

is consistent, finite at X = n (the +0.5 smoothing), and exactly 0 at
X = 0. A page's staleness probability after `age` seconds is then the
Poisson  P(changed) = 1 - exp(-λ·age),  which is the recrawl priority:
fast-changing pages not seen recently float to the top, static pages
sink regardless of age rank.

Scale shape: one hash exchange on surt_key total — the lag window
partitions by surt_key and the per-key aggregate reuses that
partitioning (plan-tested); everything is native expressions, no
Python. At 100 TB the history table is the CDX index the archive
already maintains, so freshness is a by-product of a scan it already
does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["capture_intervals", "change_rate", "recrawl_priority",
           "sitemap_staleness", "conditional_fetch_plan",
           "cache_directives_col", "revalidation_schedule",
           "capture_change_fraction"]


def capture_intervals(index: DataFrame) -> DataFrame:
    """CDX index -> per-capture observation rows.

    Adds ``interval_s`` (seconds since the key's previous capture) and
    ``changed`` (digest differs from the previous capture). The first
    capture of each key has both null — it observes no interval.
    Ordering within a key breaks ts ties by url, matching
    cdx_revisits' determinism rule."""
    w = Window.partitionBy("surt_key").orderBy("warc_ts", "url")
    prev_ts = F.lag(F.col("warc_ts").cast("double")).over(w)
    prev_digest = F.lag("digest").over(w)
    return (
        index
        .withColumn("interval_s", F.col("warc_ts").cast("double") - prev_ts)
        .withColumn("changed", F.col("digest") != prev_digest)
    )


def change_rate(index: DataFrame) -> DataFrame:
    """CDX index -> one row per surt_key:
    ``(surt_key, url, n_intervals, n_changes, span_s, last_ts,
    lambda_per_s)``.

    ``lambda_per_s`` is the Cho–Garcia-Molina bias-corrected Poisson
    rate; null when the key has a single capture or zero elapsed span
    (no information — callers supply a prior via recrawl_priority).
    ``url`` is the latest capture's URL (the fetchable form of the
    key). The lag window and this aggregate share one exchange."""
    iv = capture_intervals(index)
    n = F.col("n_intervals")
    x = F.col("n_changes")
    mean_iv = F.col("span_s") / n
    lam = F.when(
        (n > 0) & (F.col("span_s") > 0),
        -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / mean_iv,
    )
    return (
        iv.groupBy("surt_key")
        .agg(
            F.count("interval_s").alias("n_intervals"),
            F.coalesce(F.sum(F.col("changed").cast("long")), F.lit(0))
            .alias("n_changes"),
            F.sum("interval_s").alias("span_s"),
            F.max_by(F.struct("warc_ts", "url"),
                     F.struct("warc_ts", "url")).alias("_last"),
        )
        .select(
            "surt_key",
            F.col("_last.url").alias("url"),
            "n_intervals",
            "n_changes",
            "span_s",
            F.col("_last.warc_ts").alias("last_ts"),
            lam.alias("lambda_per_s"),
        )
    )


def recrawl_priority(rates: DataFrame, now,
                     default_changes_per_day: float = 1.0) -> DataFrame:
    """change_rate output -> + ``p_changed``: the probability the page
    changed since its last capture, evaluated at ``now`` (a datetime
    or ISO string). Keys with no rate estimate (single capture) use
    the ``default_changes_per_day`` prior, so brand-new URLs still
    age into the queue instead of starving. p_changed is directly a
    scheduler ``priority`` (DESC): in [0, 1), monotone in both change
    rate and staleness age."""
    age = (F.lit(now).cast("timestamp").cast("double")
           - F.col("last_ts").cast("double"))
    lam = F.coalesce(
        F.col("lambda_per_s"),
        F.lit(float(default_changes_per_day) / 86400.0),
    )
    p = F.lit(1.0) - F.exp(-lam * F.greatest(age, F.lit(0.0)))
    return rates.withColumn("p_changed", p)


def sitemap_staleness(entries: DataFrame, captures: DataFrame,
                      url_col: str = "url",
                      ts_col: str = "warc_ts") -> DataFrame:
    """``links.sitemap_entries`` output × captured pages → per-url
    ``(url, lastmod, last_capture, stale)``: the publisher-declared
    freshness signal. ``stale`` = we never captured the url, or its
    sitemap ``lastmod`` postdates our latest capture — the rows a
    recrawl should fetch first (feed as a scheduler priority term
    next to ``p_changed``; lastmod is a claim, p_changed a
    measurement). One map-side-partial max per url + one equi-join;
    urls the sitemap stamps with no/invalid lastmod are stale only if
    uncaptured (no claim, no boost)."""
    last = captures.groupBy(F.col(url_col).alias("url")).agg(
        F.max(ts_col).alias("last_capture"))
    e = entries.select(F.col(url_col).alias("url"), "lastmod") \
        .join(last, "url", "left")
    stale = (F.col("last_capture").isNull()
             | (F.col("lastmod").isNotNull()
                & (F.col("lastmod") > F.col("last_capture"))))
    return e.withColumn("stale", stale)


def conditional_fetch_plan(captures: DataFrame,
                           url_col: str = "url",
                           ts_col: str = "warc_ts",
                           etag_col: str | None = None,
                           last_modified_col: str | None = None
                           ) -> DataFrame:
    """Per-URL conditional-revalidation plan from capture history:
    ``(url, last_capture, if_none_match, if_modified_since)`` — the
    headers a polite recrawl sends so an unchanged page costs a 304
    instead of a re-download (at recrawl scale, MOST pages are
    unchanged, so this is the big bandwidth lever next to λ-driven
    scheduling).

    ``if_none_match`` carries the LATEST capture's ETag when the
    capture table recorded one (``etag_col``); ``if_modified_since``
    prefers the server's own Last-Modified claim
    (``last_modified_col``) and falls back to our capture time — a
    server that stamps responses should be asked about ITS timestamp,
    not ours (clock skew). Both stay typed (string / timestamp); the
    fetcher formats RFC 9110 IMF-fixdate at send time.

    One map-side-partial ``max_by`` aggregate keyed on the url —
    O(urls) output, no window, no join."""
    etag = F.col(etag_col) if etag_col else F.lit(None).cast("string")
    lm = (F.col(last_modified_col) if last_modified_col
          else F.lit(None).cast("timestamp"))
    # tie-break same-ts captures on the values themselves (null lowest)
    # so the picked validators are layout-independent, change_rate's
    # max_by convention
    picked = F.max_by(
        F.struct(etag.alias("etag"), lm.alias("lm")),
        F.struct(F.col(ts_col), etag, lm))
    return (captures
            .groupBy(F.col(url_col).alias("url"))
            .agg(F.max(ts_col).alias("last_capture"),
                 picked.alias("_p"))
            .select("url", "last_capture",
                    F.col("_p.etag").alias("if_none_match"),
                    F.coalesce(F.col("_p.lm"), F.col("last_capture"))
                    .alias("if_modified_since")))


def cache_directives_col(headers):
    """Typed struct of the RFC 9111 response caching directives from a
    raw HTTP response-header block: ``(max_age, no_store, no_cache,
    age, expires)``. Native expressions only; malformed values null.

    - ``max_age``/``age`` are seconds (s-maxage is a shared-cache
      directive and deliberately ignored — a crawler is a private
      client); ``max-age`` wants a word boundary on the LEFT too, so
      s-maxage never feeds it.
    - ``expires`` parses the IMF-fixdate form (RFC 9110 §5.6.7); the
      day-of-week prefix is stripped first because Spark's parser
      formats-but-won't-parse 'E' patterns; per the RFC an unparsable
      Expires means "already stale", which stays distinguishable here
      as (null expires, had_expires true).
    """
    h = headers
    # RFC 9110 §5.3: repeated field lines combine as a comma-joined
    # list — a CDN appending its own Cache-Control line must not make
    # the origin's directives vanish (regexp_extract reads only the
    # first match; extract_all + join reads them all)
    cc = F.array_join(
        F.regexp_extract_all(h, F.lit(r"(?im)^cache-control:\s*(.*?)\s*$"),
                             1), ",")
    max_age = F.nullif(
        F.regexp_extract(cc, r"(?i)(?:^|[^a-z\-])max-age\s*=\s*\"?(\d+)", 1),
        F.lit("")).try_cast("long")
    age = F.nullif(
        F.regexp_extract(h, r"(?im)^age:\s*(\d+)\s*$", 1),
        F.lit("")).try_cast("long")
    expires_raw = F.nullif(
        F.regexp_extract(h, r"(?im)^expires:\s*(.*?)\s*$", 1), F.lit(""))
    # 'zzz' parses the zone (GMT/UTC) instead of treating the wall time
    # as session-local — a 'GMT' literal would shift fresh_until by the
    # session offset whenever spark.sql.session.timeZone != UTC
    expires = F.try_to_timestamp(
        F.regexp_replace(expires_raw, r"^[A-Za-z]+,\s*", ""),
        F.lit("dd MMM yyyy HH:mm:ss zzz"))
    return F.struct(
        max_age.alias("max_age"),
        cc.rlike(r"(?i)(?:^|[^a-z\-])no-store(?:$|[^a-z\-])")
          .alias("no_store"),
        cc.rlike(r"(?i)(?:^|[^a-z\-])no-cache(?:$|[^a-z\-])")
          .alias("no_cache"),
        age.alias("age"),
        expires.alias("expires"),
        expires_raw.isNotNull().alias("had_expires"),
    )


def revalidation_schedule(captures: DataFrame, url_col: str = "url",
                          ts_col: str = "warc_ts",
                          headers_col: str = "headers") -> DataFrame:
    """Per-URL earliest honest re-fetch time from the LATEST capture's
    caching headers — the publisher-declared side of recrawl
    scheduling (``change_rate`` is the measured side; a scheduler
    takes the max of "allowed by cache policy" and "worth it by λ").

    RFC 9111 freshness: ``fresh_until = capture_ts + max-age − Age``
    when Cache-Control carries max-age, else the Expires date, else
    the capture time itself (no freshness granted). ``no-store`` /
    ``no-cache`` / an unparsable-but-present Expires also grant
    nothing (RFC: invalid Expires = already stale). Returns
    ``(url, last_capture, fresh_until, revalidate_from)`` where
    ``revalidate_from`` never precedes the capture. One map-side-
    partial max_by keyed on url — O(urls) output, same shape as
    ``conditional_fetch_plan``."""
    d = cache_directives_col(F.col(headers_col))
    rows = captures.select(
        F.col(url_col).alias("url"), F.col(ts_col).alias("ts"),
        d.alias("d"))
    # tie-break same-ts captures on the directive values themselves so
    # the pick is layout-independent (conditional_fetch_plan's rule)
    latest = (rows.groupBy("url")
              .agg(F.max("ts").alias("last_capture"),
                   F.max_by(F.col("d"),
                            F.struct(F.col("ts"), F.col("d")))
                   .alias("d")))
    granted = F.when(
        F.col("d.no_store") | F.col("d.no_cache"), F.lit(None)
    ).when(
        F.col("d.max_age").isNotNull(),
        F.timestamp_add(
            "SECOND",
            F.col("d.max_age") - F.coalesce(F.col("d.age"), F.lit(0)),
            F.col("last_capture"))
    ).when(
        F.col("d.had_expires"), F.col("d.expires")  # null if unparsable
    )
    fresh_until = F.coalesce(granted, F.col("last_capture"))
    return latest.select(
        "url", "last_capture", fresh_until.alias("fresh_until"),
        F.greatest(fresh_until, F.col("last_capture"))
        .alias("revalidate_from"))


def capture_change_fraction(captures: DataFrame,
                            key_col: str = "surt_key",
                            ts_col: str = "warc_ts",
                            text_col: str = "text",
                            n_hashes: int = 64,
                            shingle_n: int = 3) -> DataFrame:
    """Magnitude of content change between CONSECUTIVE captures of the
    same key — the weighted companion to ``capture_intervals``' binary
    ``changed`` flag: a front page rewriting 90% of its text and a
    footer-timestamp tweak both flip the digest, but they deserve
    different recrawl priority. ``change_frac`` = 1 − estimated shingle
    Jaccard vs the previous capture, with the Jaccard estimated as the
    fraction of agreeing MinHash components (the standard unbiased
    estimator, so E[change_frac] is the true 1−J with stderr
    ~1/sqrt(n_hashes)).

    Scale shape: the capture text crosses ONE Arrow signature sweep
    (``dedup.minhash_signatures`` — shuffle-free at scan scale) plus
    the signature groupBy's (id, text) projection; after that ONLY
    8·n_hashes-byte signatures plus the identity columns ride the
    join and the per-key lag window — the result frame is SLIM
    (identity + change_frac), so text never crosses an exchange and
    is never compared pairwise. Callers join the result back on the
    identity columns when they need the payload alongside.

    Returns one row per capture — (key_col, ts_col[, url],
    change_frac) — with change_frac double, null for a key's first
    capture or when either side has no shingles (text shorter than
    ``shingle_n`` tokens). A capture is identified by (key, ts[, url])
    — the ``capture_intervals`` determinism rule; several rows sharing
    that identity with DIFFERENT payloads collapse deterministically
    to the lexicographically greatest text (layout-invariant, unlike
    a dropDuplicates pick)."""
    from data_crawler_spark.operators.dedup import minhash_signatures

    has_url = "url" in captures.columns and key_col != "url"
    id_cols = [key_col, ts_col] + (["url"] if has_url else [])
    # nulls coalesce to a sentinel so concat_ws cannot merge distinct
    # identities (it silently SKIPS null fields)
    cid_parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                 for c in id_cols]
    slim = (captures
            .select(*id_cols, F.col(text_col).alias("_t"))
            .withColumn("_cap_id", F.concat_ws("\x1f", *cid_parts)))
    uniq = slim.groupBy("_cap_id").agg(
        F.max("_t").alias("_t"),
        *[F.first(c).alias(c) for c in id_cols])
    sigs = minhash_signatures(
        uniq.select("_cap_id", "_t"), id_col="_cap_id", text_col="_t",
        n_hashes=n_hashes, shingle_n=shingle_n)
    joined = uniq.drop("_t").join(sigs, "_cap_id", "left")
    order = [F.col(ts_col), F.col("url")] if has_url else [F.col(ts_col)]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag("sig").over(w)
    n_eq = F.aggregate(
        F.zip_with(F.col("sig"), prev,
                   lambda a, b: (a == b).cast("int")),
        F.lit(0), lambda acc, x: acc + x)
    change = F.when(F.col("sig").isNotNull() & prev.isNotNull(),
                    F.lit(1.0) - n_eq / F.lit(float(n_hashes)))
    return (joined.withColumn("change_frac", change)
            .select(*id_cols, "change_frac"))


def recrawl_candidates(index: DataFrame, now,
                       default_changes_per_day: float = 1.0,
                       sitemap: DataFrame | None = None,
                       stale_priority: float = 1.0) -> DataFrame:
    """The seam between the freshness estimators and the politeness
    scheduler: CDX capture history (+ optionally sitemap_staleness
    output) -> one candidate row per known URL, shaped for
    schedule_per_host / schedule_per_host_salted:
    ``(url, host, depth, discovered_round, priority, p_changed)``.

    priority = p_changed (the measured probability the page changed
    since its last capture — Cho–Garcia-Molina via change_rate +
    recrawl_priority); when a ``sitemap`` staleness frame says the
    publisher CLAIMS the page is newer than our capture, priority is
    lifted to at least ``stale_priority`` (claims rank ahead of
    estimates, but a measured p_changed above the lift still wins).
    depth/discovered_round are 0: a recrawl re-fetches a known root of
    its own history, and the scheduler's tie-break ordering stays
    total. Same shuffle shape as change_rate (one exchange on
    surt_key) plus a left join on the O(sitemap) staleness frame."""
    from data_crawler_spark.operators.links import host_col

    rates = recrawl_priority(change_rate(index), now,
                             default_changes_per_day)
    prio = F.col("p_changed")
    if sitemap is not None:
        # one row per url: sitemap_staleness is per sitemap ENTRY and
        # the same url listed in two sitemap files would otherwise
        # duplicate the candidate row through the left join (the
        # scheduler would fetch it twice)
        stale = (sitemap.where("stale")
                 .select("url", F.lit(True).alias("_stale"))
                 .dropDuplicates(["url"]))
        rates = rates.join(stale, "url", "left")
        prio = F.when(F.col("_stale"),
                      F.greatest(prio, F.lit(float(stale_priority)))
                      ).otherwise(prio)
    return (rates
            .select("url",
                    host_col(F.col("url")).alias("host"),
                    F.lit(0).alias("depth"),
                    F.lit(0).alias("discovered_round"),
                    prio.alias("priority"),
                    "p_changed"))
