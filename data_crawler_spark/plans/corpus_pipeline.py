"""End-to-end corpus cleaning: the composition a training-data pipeline
actually runs over 100 TB of webtext, built entirely from this repo's
already-plan-audited operators —

    quality gates -> repetition gates (line + n-gram rules)
    -> corpus-wide paragraph dedup -> exact dedup
    -> MinHash near-dup cluster removal -> benchmark decontamination
    -> LM perplexity bucketing (CCNet) -> mixture sampling
    -> train/val/test split -> token counting -> shard packing

Each stage is optional and keeps the corpus DataFrame's original
columns, so stages compose in any subset. Scale shape per stage:

- quality/repetition gates: pure map over the scan (zero exchange).
- exact dedup: ONE shuffle on the content hash; the survivor-id set is
  corpus-sized, so it comes back as a semi-join on the id (not a
  broadcast).
- near-dup removal: MinHash+LSH candidates (shuffle-free signatures,
  banded join), exact verification on candidates only, connected
  components over the verified pair graph (O(log diameter) rounds),
  keep the min-id representative per cluster. The non-representative
  id set can be corpus-scale on real webtext (near-dup fractions of
  20-50% are routine), so the anti-join carries no broadcast hint —
  AQE picks the strategy from measured sizes.
- decontamination: eval-side n-gram hashes broadcast; corpus never
  shuffled.
- shard packing: two-phase distributed prefix sum (P-row driver
  traffic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.classifier import pareto_quality_filter, train_nb
from ..operators.dedup import (cluster_survivors, connected_components,
                               decontaminate, exact_dedup,
                               minhash_near_dups, paragraph_dedup)
from ..operators.lm import lm_score, perplexity_buckets, train_ngram_lm
from ..operators.sampling import (cap_per_group, hash_split,
                                  sample_corpus_mixture, shuffle_key_col)
from ..operators.text import (c4_rules, clean_text_col, compression_ratio,
                              fingerprint_col, gopher_rules,
                              ngram_repetition_signals, repetition_signals,
                              shard_by_token_budget, token_count_col,
                              unicode_normalize)


def clean_corpus(docs: DataFrame, eval_df: DataFrame | None = None, *,
                 id_col: str = "doc_id", text_col: str = "text",
                 hygiene: bool = False, unicode_form: str | None = None,
                 c4: bool = False, c4_banned_words: tuple[str, ...] = (),
                 quality: bool = True, repetition: bool = True,
                 ngram_repetition: bool = False,
                 compression_bounds: tuple[float, float] | None = None,
                 lang_major_frac: float | None = None,
                 paragraph_dedup_keep: str | None = None,
                 min_paragraph_survival: float = 0.5,
                 exact: bool = True, near_dup_threshold: float | None = 0.7,
                 near_dup_keep_by: str | None = None,
                 semantic_threshold: float | None = None,
                 vec_col: str = "embedding", semantic_n_lists: int = 16,
                 decontam_n: int = 13,
                 group_cap: tuple[str, int] | None = None,
                 clf_labeled: DataFrame | None = None,
                 clf_positive: str = "good", clf_label_col: str = "label",
                 clf_n_buckets: int = 10_000,
                 clf_pareto_shape: float = 9.0,
                 lm_ref: DataFrame | None = None, lm_n: int = 3,
                 lm_min_count: int = 1,
                 lm_keep_buckets: tuple[str, ...] = ("head", "middle"),
                 lm_head_frac: float = 0.1, lm_middle_frac: float = 0.4,
                 lm_by: str | None = None,
                 mixture_group_col: str | None = None,
                 mixture_weights: dict[str, float] | None = None,
                 mixture_temperature: float | None = None,
                 split_fractions: dict[str, float] | None = None,
                 shard_budget: int | None = None,
                 shard_partitions: int = 1,
                 shard_shuffle_seed: int | None = None,
                 n_hashes: int = 64,
                 n_bands: int = 16, shingle_n: int = 3,
                 seed: int = 0) -> DataFrame:
    """Run the cleaning stages over ``docs`` and return the surviving
    documents with their original columns plus ``n_tokens`` (and
    ``split`` / ``shard_id`` when requested). ``eval_df=None`` skips
    decontamination; ``near_dup_threshold=None`` skips near-dup
    removal; the boolean flags skip their stages.

    Optional stages beyond the core chain:

    - ``hygiene=True`` rewrites the text through ``clean_text_col``
      (control/zero-width strip, CRLF + whitespace normalization)
      before any other stage; ``unicode_form`` ("NFKC" etc.) adds
      Unicode normalization right after it.
    - ``c4=True`` runs the C4 cleaning rules FIRST (line-level
      terminal-punctuation / ≥5-word / javascript cleaning rewrites
      the text, then the lorem-ipsum / brace / sentence-count /
      ``c4_banned_words`` page filters).
    - ``ngram_repetition=True`` adds the MassiveText Table A1 n-gram
      rules next to the duplicate-line rules.
    - ``compression_bounds=(lo, hi)`` gates on the zlib compression
      ratio (Dolma-style: template farms compress toward 0, junk
      toward 1; docs outside the band — or with empty text — drop).
    - ``lang_major_frac`` keeps only documents whose majority
      paragraph language holds at least that fraction of the char
      mass (the code-switching gate — a page whose chrome and body
      disagree poisons whichever per-language corpus it routes to).
    - ``paragraph_dedup_keep`` ("first" / "none") runs CCNet-style
      corpus-wide paragraph dedup BEFORE the doc-level dedups (the
      boilerplate it strips would otherwise mask near-dup signals);
      docs whose surviving-paragraph fraction falls below
      ``min_paragraph_survival`` are dropped as hollowed-out.
    - ``semantic_threshold`` (docs must carry ``vec_col``
      embeddings) runs SemDeDup after the text-side dedups: within-
      cluster cosine duplicate groups keep their farthest-from-
      centroid member (the D4 ordering — fuzzy text dedup first,
      semantic dedup on the survivors).
    - ``group_cap=(col, k)`` keeps at most k docs per value of ``col``
      (the C4/Dolma per-domain diversity cap), min-id survivors,
      after dedup so the cap counts distinct content.
    - ``clf_labeled`` (docs with a ``clf_label_col`` class column)
      trains the hashed-BoW Naive Bayes quality classifier and gates
      the deduped+decontaminated survivors with the GPT-3 Pareto
      acceptance rule on ``P(clf_positive)`` (deterministic in
      (id, seed)). Runs after dedup so each surviving doc is scored
      once — the cheaper order at corpus scale.
    - ``lm_ref`` (a clean reference corpus, CCNet uses Wikipedia)
      trains an order-``lm_n`` Stupid Backoff LM, scores the deduped
      survivors, and keeps ``lm_keep_buckets`` of the head/middle/tail
      perplexity split (thresholds per ``lm_by`` group when set).
    - ``mixture_group_col`` + (``mixture_weights`` |
      ``mixture_temperature``) downsamples the cleaned corpus to a
      target group mixture (deterministic in (id, seed)).
    - ``split_fractions`` appends a train/val/test ``split`` column
      (pure map, after sampling so the bins see the final corpus).
    - ``near_dup_keep_by`` (a column on ``docs``, e.g. a quality
      score) switches the near-dup survivor policy from min-id to
      keep-the-max-metric member per cluster (the RefinedWeb
      keep-longest rule with a length column), via the salted
      two-phase ``cluster_survivors``.
    - ``shard_shuffle_seed`` packs shards in a seeded pseudo-random
      order (IID training shards) instead of id order; the
      ``shuffle_key`` column stays on the output so the writer can
      sort in-shard by it. With ``split_fractions`` set, shards
      always pack PER SPLIT (shard_id restarts in each split).
    """
    cols = docs.columns
    out = docs

    if hygiene:
        # text hygiene runs before EVERYTHING: control/zero-width strip
        # + CRLF/whitespace normalization, so invisible characters can't
        # split duplicates or skew line-level rules downstream
        out = out.withColumn(text_col, clean_text_col(F.col(text_col)))
    if unicode_form is not None:
        out = unicode_normalize(out, text_col, unicode_form)

    if c4:
        # C4 runs FIRST: its line cleaning rewrites the text every later
        # stage (quality metrics, dedup shingles) should see
        staged = c4_rules(out, text_col, banned_words=c4_banned_words)
        out = (staged.filter("c4_keep")
               .withColumn(text_col, F.col("c4_text")).select(cols))
    if quality:
        out = gopher_rules(out, text_col).filter("gopher_keep").select(cols)
    if repetition:
        out = (repetition_signals(out, text_col)
               .filter("repetition_keep").select(cols))
    if ngram_repetition:
        out = (ngram_repetition_signals(out, id_col, text_col)
               .filter("ngram_repetition_keep").select(cols))
    if compression_bounds is not None:
        # Dolma-style repetitiveness gate: keep docs whose zlib ratio
        # sits inside [lo, hi] (template farms compress toward 0,
        # junk/binary toward 1). Empty/null text has no ratio -> drop.
        lo, hi = compression_bounds
        out = (compression_ratio(out, text_col)
               .filter(F.col("compression_ratio").between(lo, hi))
               .select(cols))
    if lang_major_frac is not None:
        # code-switching gate: keep docs whose majority paragraph
        # language holds >= the cutoff of the char mass (docs with no
        # non-empty paragraph have no majority and drop)
        from ..operators.text import lang_consistency
        lc = lang_consistency(out, id_col, text_col)
        out = out.join(lc.filter(F.col("major_frac") >= lang_major_frac)
                       .select(id_col), id_col, "left_semi")

    if paragraph_dedup_keep is not None:
        deduped = paragraph_dedup(out, id_col, text_col,
                                  keep=paragraph_dedup_keep)
        out = (deduped.filter(
                   (F.col("paras_total") > 0)
                   & ((F.col("paras_total") - F.col("paras_removed"))
                      >= F.col("paras_total") * F.lit(min_paragraph_survival)))
               .select(cols))

    if exact:
        keep = (exact_dedup(out, id_col, text_col)
                .select(F.col("keep_id").alias(id_col)))
        out = out.join(keep, id_col, "left_semi")

    if near_dup_threshold is not None:
        # the near-dup graph is built on the exact-deduped survivors so
        # identical copies don't re-verify as jaccard-1.0 pairs
        pairs = minhash_near_dups(out, id_col, text_col, n_hashes,
                                  n_bands, near_dup_threshold, shingle_n)
        comps = connected_components(out.select(id_col), pairs,
                                     id_col=id_col)
        if near_dup_keep_by is not None:
            # RefinedWeb-style survivor policy: keep the cluster member
            # maximizing ``near_dup_keep_by`` (a column already on the
            # docs at this stage, e.g. a quality score), id-tie-broken;
            # salted two-phase selection, only (id, cluster, metric)
            # rows ride it
            surv = cluster_survivors(
                comps, out.select(id_col, near_dup_keep_by),
                [F.desc(near_dup_keep_by)], id_col)
            out = out.join(surv.select(id_col), id_col, "left_semi")
        else:
            # default policy: min-id representative (id == cluster_id).
            # No broadcast hint: real webtext near-dup fractions run
            # 20-50% (RefinedWeb/CCNet-observed), so the drop set can be
            # corpus-scale — let Catalyst/AQE pick broadcast vs shuffle
            # anti-join from its size stats
            drop = (comps.filter(F.col(id_col) != F.col("cluster_id"))
                    .select(id_col))
            out = out.join(drop, id_col, "left_anti")

    if semantic_threshold is not None:
        # SemDeDup on the text-dedup survivors (the D4 composition):
        # only (id, embedding) enters the clustering; survivors come
        # back as a semi-join on the id
        from ..operators.similarity import semantic_dedup
        sd = semantic_dedup(out.select(id_col, vec_col),
                            threshold=semantic_threshold,
                            id_col=id_col, vec_col=vec_col,
                            n_lists=semantic_n_lists)
        out = out.join(sd.filter("semdedup_keep").select(id_col),
                       id_col, "left_semi")

    if eval_df is not None:
        out = decontaminate(out, eval_df, id_col, text_col, decontam_n)

    if group_cap is not None:
        cap_col, cap_k = group_cap
        out = cap_per_group(out, cap_col, cap_k, id_col=id_col)

    if clf_labeled is not None:
        # GPT-3's quality-classifier gate, placed after dedup /
        # decontamination so each surviving doc is scored exactly
        # once. The model/class frames are vocabulary-sized;
        # localCheckpoint materializes training once for both
        # broadcast reads inside the scoring plan.
        model, classes = train_nb(clf_labeled, clf_label_col, id_col,
                                  text_col, clf_n_buckets)
        out = pareto_quality_filter(
            out, model.localCheckpoint(), classes.localCheckpoint(),
            clf_positive, id_col, text_col, clf_n_buckets,
            pareto_shape=clf_pareto_shape, seed=seed + 2)

    if lm_ref is not None:
        # CCNet's LM stage: train on the clean reference, score the
        # (deduped, decontaminated) survivors, keep the requested
        # perplexity buckets. localCheckpoint materializes the model
        # ONCE (both scoring joins and the threshold aggregate read
        # it) with lineage cut; the blocks free on GC like
        # minhash_near_dups' pair set.
        model, total = train_ngram_lm(lm_ref, text_col, lm_n, lm_min_count)
        model = model.localCheckpoint()
        # the scored survivors are read twice (threshold pass + final
        # filter); without the checkpoint every upstream cleaning stage
        # would re-execute for each read
        scored = lm_score(out, model, total, lm_n, id_col,
                          text_col).localCheckpoint()
        bucketed = perplexity_buckets(scored, "lm_ppl", lm_head_frac,
                                      lm_middle_frac, by=lm_by)
        # null bucket = empty doc: nothing to train on, drop it
        out = (bucketed
               .filter(F.col("ppl_bucket").isin(list(lm_keep_buckets)))
               .select(cols))

    if mixture_group_col is not None:
        out = sample_corpus_mixture(
            out, mixture_group_col, id_col, mixture_weights,
            mixture_temperature, seed).drop("sample_rate")
    if split_fractions is not None:
        out = hash_split(out, id_col, split_fractions, seed + 1)

    out = out.withColumn("n_tokens",
                         token_count_col(F.col(text_col)).cast("long"))
    if shard_budget is not None:
        order_col = None
        if shard_shuffle_seed is not None:
            # seeded deterministic training-order shuffle: shards become
            # IID draws from the cleaned corpus instead of crawl-id
            # runs; the key stays a column so the writer can sort
            # in-shard by it (write_training_shards(
            # sort_in_shard="shuffle_key"))
            out = out.withColumn(
                "shuffle_key", shuffle_key_col(id_col, shard_shuffle_seed))
            order_col = "shuffle_key"
        # a split corpus packs per split — a global packing would leave
        # every (split, shard) directory under budget wherever other
        # splits' docs interleave the order
        out = shard_by_token_budget(
            out, shard_budget, "n_tokens", id_col, shard_partitions,
            order_col=order_col,
            group_col="split" if split_fractions is not None else None)
    return out


def write_training_shards(out: DataFrame, path: str,
                          partition_by: tuple[str, ...] = ("split",
                                                           "shard_id"),
                          mode: str = "overwrite",
                          sort_in_shard: str | None = "doc_id",
                          fmt: str = "parquet",
                          compression: str | None = None) -> None:
    """The pipeline's sink: lay the cleaned corpus out as the training
    job reads it — partitioned by the split/shard columns clean_corpus
    appended, one directory per (split, shard), rows inside a shard
    sorted by ``sort_in_shard`` so every rewrite of the same corpus is
    byte-stable. ``sortWithinPartitions`` keeps the sort shuffle-free
    (each shard's rows sort inside their task); dynamic partition
    overwrite semantics are format-native, so a re-run replaces only
    the partitions it writes.

    ``fmt="parquet"`` (default) for analytic re-reads; ``fmt="jsonl"``
    emits newline-delimited JSON (Spark's ``json`` source IS jsonl) —
    the layout most training loaders stream — with ``compression``
    (e.g. "gzip") when set.

    A corpus packed with ``clean_corpus(shard_shuffle_seed=...)``
    should pass ``sort_in_shard="shuffle_key"`` so rows inside each
    shard stream in the shuffled order too (the default id sort would
    re-cluster crawl-adjacent docs within the shard)."""
    missing = [c for c in partition_by if c not in out.columns]
    if missing:
        raise ValueError(
            f"partition columns not in frame (run clean_corpus with the "
            f"matching stages): {missing}")
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be 'parquet' or 'jsonl', got {fmt!r}")
    w = out
    if sort_in_shard is not None:
        w = w.repartition(*[F.col(c) for c in partition_by]) \
             .sortWithinPartitions(sort_in_shard)
    writer = w.write.mode(mode).partitionBy(*partition_by)
    if compression is not None:
        writer = writer.option("compression", compression)
    if fmt == "parquet":
        writer.parquet(path)
    else:
        writer.json(path)


def write_webdataset_shards(out: DataFrame, path: str, *,
                            partition_by: tuple[str, ...] = ("split",
                                                             "shard_id"),
                            key_col: str = "doc_id",
                            text_col: str = "text",
                            meta_cols: tuple[str, ...] = (),
                            bin_col: str | None = None,
                            sort_in_shard: str = "doc_id",
                            gzip_shards: bool = False) -> DataFrame:
    """WebDataset sink: one POSIX ``.tar`` per (split, shard) whose
    members are ``{key}.txt`` (the text), ``{key}.json`` (the
    ``meta_cols``, when any) and ``{key}.bin`` (an opaque binary
    column — the multimodal payload seam), samples adjacent and in
    ``sort_in_shard`` order — the sequential-read training format
    (Webdataset; the LAION layout). Tars are byte-stable: USTAR
    entries with zeroed mtime/uid/gid and a fixed member order, and
    ``gzip_shards`` writes ``.tar.gz`` with a zeroed gzip mtime — two
    builds of the same corpus produce identical archives regardless of
    input layout.

    Plan shape mirrors write_training_shards: ONE repartition on the
    partition columns, rows sorted inside each task by (partition
    cols, sort key) so each shard's samples stream contiguously, then
    an embarrassingly-parallel mapInArrow sink that rolls a new tar on
    each group change and streams records straight to the target file
    (a shard never materializes in executor memory). Layout:
    ``col=value`` directories for all but the last partition column,
    filename ``shard-%06d.tar`` when the last column is integral else
    ``{value}.tar``. Like _export_sink, ``path`` must be a
    task-writable shared filesystem and the returned manifest
    ``(tar_file, n_samples, n_bytes)`` is lazy — run an action to
    execute the export. Keys must be non-null and unique within their
    shard (both raise in-task: duplicate member names are tar-legal
    but merge into one corrupted sample at the reader's
    group-by-key); USTAR
    caps member names at 100 bytes, so keys longer than ~95 chars
    raise from tarfile."""
    import gzip as _gzip
    import json as _json
    import tarfile
    from pathlib import Path

    import pyarrow as pa

    missing = [c for c in (*partition_by, key_col, text_col, sort_in_shard,
                           *(meta_cols or ()),
                           *((bin_col,) if bin_col else ()))
               if c not in out.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    root = Path(path)
    root.mkdir(parents=True, exist_ok=True)
    last_integral = out.schema[partition_by[-1]].dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint")
    suffix = ".tar.gz" if gzip_shards else ".tar"
    cols = list(dict.fromkeys(
        [*partition_by, key_col, text_col, *(meta_cols or ()),
         *((bin_col,) if bin_col else ()), sort_in_shard]))
    w = (out.select(*cols)
         .repartition(*[F.col(c) for c in partition_by])
         .sortWithinPartitions(*partition_by, sort_in_shard))
    mschema = "tar_file string, n_samples long, n_bytes long"

    def _fpath(gvals) -> Path:
        dirs = [f"{c}={v}" for c, v in zip(partition_by[:-1], gvals[:-1])]
        last = (f"shard-{int(gvals[-1]):06d}{suffix}" if last_integral
                else f"{gvals[-1]}{suffix}")
        return root.joinpath(*dirs, last)

    def fn(batches):
        import io
        state = {"g": None, "tf": None, "fh": None, "raw": None,
                 "n": 0, "path": None, "keys": set()}
        rows_out: list[tuple[str, int, int]] = []

        def flush():
            if state["g"] is None:
                return
            state["tf"].close()
            if state["fh"] is not state["raw"]:
                state["fh"].close()  # the gzip wrapper, before the file
            state["raw"].close()
            rows_out.append((str(state["path"]), state["n"],
                             state["path"].stat().st_size))
            state.update(g=None, tf=None, fh=None, raw=None, n=0,
                         path=None, keys=set())

        def member(tf, name: str, data: bytes):
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))

        try:
            for b in batches:
                pdf = b.to_pandas()
                for d in pdf.to_dict("records"):
                    g = tuple(d[c] for c in partition_by)
                    if g != state["g"]:
                        flush()
                        fpath = _fpath(g)
                        fpath.parent.mkdir(parents=True, exist_ok=True)
                        raw = open(fpath, "wb")
                        fh = (_gzip.GzipFile(filename="", mode="wb",
                                             fileobj=raw, mtime=0)
                              if gzip_shards else raw)
                        state.update(g=g, raw=raw, fh=fh, path=fpath,
                                     tf=tarfile.open(
                                         fileobj=fh, mode="w",
                                         format=tarfile.USTAR_FORMAT))
                    key = d[key_col]
                    if key is None:
                        raise ValueError(
                            f"null {key_col} cannot name a webdataset "
                            f"sample")
                    key = str(key)
                    # duplicate member names would be silently
                    # tar-legal, and a webdataset reader groups
                    # members by key — two samples would merge into
                    # one corrupted one; raise instead (the in-shard
                    # key set is bounded by the shard size)
                    if key in state["keys"]:
                        raise ValueError(
                            f"duplicate {key_col} {key!r} in shard "
                            f"{state['path']}")
                    state["keys"].add(key)
                    member(state["tf"], f"{key}.txt",
                           (d[text_col] or "").encode("utf-8"))
                    if meta_cols:
                        # numpy scalars -> native (json's `default` hook
                        # would STRINGIFY np.int64 — it fires before ints
                        # serialize); anything non-numeric falls to str
                        meta = {c: (d[c].item()
                                    if hasattr(d[c], "item") else d[c])
                                for c in meta_cols}
                        member(state["tf"], f"{key}.json",
                               _json.dumps(meta, sort_keys=True,
                                           ensure_ascii=False,
                                           default=str).encode("utf-8"))
                    if bin_col is not None and d[bin_col] is not None:
                        member(state["tf"], f"{key}.bin",
                               bytes(d[bin_col]))
                    state["n"] += 1
            flush()
        except BaseException:
            # close (don't flush) the in-flight handles so a failed
            # task doesn't leak file descriptors; the partial tar on
            # disk is overwritten ('wb') by the retry
            for h in ("tf", "fh", "raw"):
                try:
                    if state[h] is not None:
                        state[h].close()
                except Exception:
                    pass
            raise
        if rows_out:
            yield pa.RecordBatch.from_pydict(
                {"tar_file": [r[0] for r in rows_out],
                 "n_samples": [r[1] for r in rows_out],
                 "n_bytes": [r[2] for r in rows_out]})

    return w.mapInArrow(fn, mschema)


def shard_manifest(out: DataFrame,
                   partition_by: tuple[str, ...] = ("split", "shard_id"),
                   id_col: str = "doc_id", text_col: str = "text",
                   tokens_col: str | None = "n_tokens") -> DataFrame:
    """Per-shard manifest for the corpus a training run consumed —
    the data-card / reproducibility record next to
    ``write_training_shards``: ``(partition cols, n_docs, n_tokens,
    content_digest)``. The digest is a bit_xor fold of
    xxhash64(id, text) — order- and partitioning-insensitive by
    construction (XOR is commutative and cannot overflow under ANSI,
    unlike a sum fold), so two corpus builds that disagree on any doc
    disagree on the digest regardless of layout (identical-pair
    cancellation is the one blind spot — n_docs covers it; shards are
    deduped upstream anyway). One map-side-partial groupBy; O(shards)
    output."""
    missing = [c for c in partition_by if c not in out.columns]
    if missing:
        raise ValueError(f"partition columns not in frame: {missing}")
    aggs = [F.count("*").alias("n_docs"),
            F.bit_xor(F.xxhash64(F.col(id_col), F.col(text_col)))
            .alias("content_digest")]
    if tokens_col is not None:
        aggs.insert(1, F.sum(tokens_col).alias("n_tokens"))
    return out.groupBy(*[F.col(c) for c in partition_by]).agg(*aggs)


def prepare_pages(pages: DataFrame, *,
                  url_col: str = "url", html_col: str = "html",
                  blocklist=None, traps: DataFrame | None = None,
                  param_rules: DataFrame | None = None,
                  decode: bool = True,
                  respect_robots_meta: bool = True,
                  canonical: bool = True,
                  extract_main: bool = True,
                  soft404: bool = True,
                  **main_text_params) -> DataFrame:
    """The PAGE-level pre-pipeline: captured pages -> clean_corpus-ready
    docs ``(doc_id, url, text, + passthrough)``. This is the seam
    between the crawl/WARC side and the text side — a user holding raw
    captures runs ``prepare_pages`` then ``clean_corpus`` and has the
    full published-pipeline composition.

    Stages, cheapest first so each drops rows before the next pays:

    0. ``dust.apply_param_rules`` — strip mined-irrelevant query
       params (broadcast rule join + pure map) so URL variants of one
       page share a doc_id before any dedup. Optional
       (``param_rules``).
    1. ``links.host_blocklist_filter`` — URL-only, pure map (literal
       list) or broadcast semi-join (DataFrame list). Optional.
    2. ``links.trap_filter`` — drop mined spider-trap templates
       (broadcast anti-join). Optional (pass the mined frame).
    3. ``hygiene.decode_pages`` — charset sniff + tolerant re-encode
       to valid UTF-8 (ONE Arrow stage). ``decode=False`` when the
       capture table already holds clean UTF-8.
    4. ``structured.noindex_filter`` — the robots-meta publisher
       opt-out (pure map on the decoded html).
    5. ``structured.canonical_dedup`` — collapse declared-canonical
       variants (the pipeline's single page-level shuffle, salted).
    6. ``boilerplate.main_text`` — jusText-style main-content
       extraction (ONE Arrow stage) into ``text``; otherwise ``text``
       is the decoded html as a string.
    7. ``hygiene.drop_soft404`` — error-pages-served-as-content, on
       the EXTRACTED text (the published ordering: boilerplate first,
       then content heuristics) plus the native <title>.

    ``doc_id`` is the page URL (stable, total-ordering-friendly — the
    dedup/sampling tie-breaks all accept strings). 100 TB shape: html
    bytes cross exactly the two Arrow stages and the one canonical
    shuffle (phase-1 salted survivors only); every gate is a map."""
    from ..operators.boilerplate import main_text
    from ..operators.hygiene import decode_pages, drop_soft404
    from ..operators.links import host_blocklist_filter, trap_filter
    from ..operators.structured import canonical_dedup, noindex_filter

    out = pages
    if param_rules is not None:
        # DUST rewrite first (operators/dust.py — mined-irrelevant
        # query params stripped, broadcast rule join + pure map): the
        # url IS doc_id downstream, so session-id variants of one page
        # must fold to one key before the canonical shuffle collapses
        # them (pair with canonical=True or a downstream exact dedup —
        # the rewrite itself keeps both captures)
        from ..operators.dust import apply_param_rules
        out = apply_param_rules(out, param_rules, url_col=url_col)
    if blocklist is not None:
        out = host_blocklist_filter(out, blocklist, url_col=url_col)
    if traps is not None:
        if "host" not in out.columns:
            from ..operators.links import host_col
            out = out.withColumn("host", host_col(F.col(url_col)))
        out = trap_filter(out, traps, url_col=url_col)
    hcol = html_col
    if decode:
        out = decode_pages(out, html_col=html_col, out_col="html_utf8")
        hcol = "html_utf8"
    if respect_robots_meta:
        out = noindex_filter(out, html_col=hcol)
    if canonical:
        out = canonical_dedup(out, url_col=url_col, html_col=hcol)
    # the crawl's PAGES shape already carries a `text` column (the
    # extractor's output); prepare_pages REPLACES it — appending a
    # second one would leave an ambiguous duplicate (drop is a no-op
    # when absent)
    out = out.drop("text")
    if extract_main:
        out = main_text(out, html_col=hcol, out_col="text",
                        **main_text_params)
    else:
        out = out.withColumn("text", F.col(hcol).cast("string"))
    if soft404:
        title = F.regexp_extract(
            F.col(hcol).cast("string"),
            r"(?is)<title[^>]*>\s*(.*?)\s*</title>", 1)
        out = out.withColumn("_title", title)
        out = drop_soft404(out, text_col="text", title_col="_title")
        out = out.drop("_title")
    return out.withColumn("doc_id", F.col(url_col))


class IncrementalCorpusCleaner:
    """O(delta) nightly cleaning: run each new crawl snapshot through
    the map gates and BOTH dedups against the corpus-so-far without
    ever reprocessing the corpus — the workflow a 100 TB pipeline
    actually runs after day one (the batch ``clean_corpus`` is the
    bootstrap; this is every day after).

    State (under one ``state_dir``, both tables snapshot-versioned,
    crash-safe, time-travelable — plans/snapshots.py):

    - ``content_hashes``: (id, content_hash) of every doc that survived
      the exact stage — the exact-dedup memory.
    - the ``IncrementalMinHashIndex`` signature table — the near-dup
      memory. Both indexes keep entries for docs LATER dropped by
      near-dup: conservative by design, so a future copy of a dropped
      near-duplicate is still recognized as seen.

    ``clean(delta)`` = map gates (delta-only) -> within-delta exact
    dedup (min id per hash) -> anti-join vs stored hashes -> commit
    survivor hashes -> ``index.add`` (O(delta) signaturing + banded
    delta-vs-corpus join) -> drop delta members paired with the corpus
    (the corpus is canonical: it is already published/trained on) ->
    connected components over the remaining delta-delta pairs, keep
    the min id. Returns the surviving delta rows (+ ``n_tokens``).

    Shuffle story: gates are maps; the exact stage shuffles ~50-byte
    (id, hash) rows once; the hash anti-join and the banded join are
    the two delta-vs-corpus probes, both O(delta + matches); corpus
    text is never re-read. Contract: ``id_col`` is int64, ids unique
    within a delta and NEVER re-added (the index's append-only guard
    raises otherwise, and ``clean`` rolls BOTH tables back to their
    entry versions on any failure, so a failed call never leaves the
    two indexes disagreeing). Corpus-wide publish stages (group caps,
    mixtures, splits, shard packing) are deliberately rejected from
    ``gates`` — they need the whole corpus and belong to the publish
    step, not the delta path."""

    _FORBIDDEN_GATES = frozenset({
        "exact", "near_dup_threshold", "semantic_threshold",
        "group_cap", "mixture_group_col", "mixture_weights",
        "mixture_temperature", "split_fractions", "shard_budget"})

    def __init__(self, spark, state_dir, *, id_col: str = "doc_id",
                 text_col: str = "text",
                 near_dup_threshold: float = 0.7,
                 n_hashes: int = 64, n_bands: int = 16,
                 shingle_n: int = 3,
                 gates: dict | None = None):
        from pyspark.sql.types import (LongType, StringType, StructField,
                                       StructType)

        from ..operators.dedup import IncrementalMinHashIndex
        from .snapshots import SnapshotTable

        bad = self._FORBIDDEN_GATES & set(gates or {})
        if bad:
            raise ValueError(
                f"corpus-wide stages {sorted(bad)} are not delta-safe; "
                "run them at publish time over the accumulated corpus")
        self.id_col, self.text_col = id_col, text_col
        self.threshold = near_dup_threshold
        self.gates = dict(gates or {})
        self.hashes = SnapshotTable(
            spark, state_dir, "content_hashes",
            StructType([StructField(id_col, LongType(), False),
                        StructField("content_hash", StringType(), True)]))
        self.index = IncrementalMinHashIndex(
            spark, state_dir, id_col=id_col, n_hashes=n_hashes,
            n_bands=n_bands, shingle_n=shingle_n)

    def versions(self) -> tuple[int, int]:
        return (self.hashes.current_version(),
                self.index.table.current_version())

    def rollback(self, versions: tuple[int, int]) -> None:
        self.hashes.rollback(versions[0])
        self.index.table.rollback(versions[1])

    def clean(self, delta: DataFrame) -> DataFrame:
        from ..operators.dedup import connected_components
        from ..operators.text import fingerprint_col

        id_col, text_col = self.id_col, self.text_col
        v0 = self.versions()
        try:
            gated = clean_corpus(delta, id_col=id_col, text_col=text_col,
                                 exact=False, near_dup_threshold=None,
                                 **self.gates)
            hashed = gated.withColumn(
                "_ch", fingerprint_col(F.col(text_col)))
            within = (hashed.groupBy("_ch")
                      .agg(F.min(id_col).alias(id_col))
                      .select(id_col))
            seen = self.hashes.read().select("content_hash")
            # one materialization feeds the hash commit, the signature
            # pass, and the final result
            fresh = (hashed.join(within, id_col, "left_semi")
                     .join(seen.withColumnRenamed("content_hash", "_ch"),
                           "_ch", "left_anti")
                     .localCheckpoint())

            self.hashes.write(
                fresh.select(id_col, F.col("_ch").alias("content_hash")),
                mode="append")
            pairs = self.index.add(fresh.select(id_col, text_col),
                                   text_col=text_col,
                                   threshold=self.threshold)

            ids = fresh.select(id_col)
            flagged = (
                pairs
                .join(ids.withColumnRenamed(id_col, "id_a")
                      .withColumn("_in_a", F.lit(True)), "id_a", "left")
                .join(ids.withColumnRenamed(id_col, "id_b")
                      .withColumn("_in_b", F.lit(True)), "id_b", "left"))
            in_a = F.coalesce("_in_a", F.lit(False))
            in_b = F.coalesce("_in_b", F.lit(False))
            # delta member paired with a corpus doc: the corpus wins
            drop_vs_corpus = (
                flagged.filter(in_a & ~in_b).select(F.col("id_a")
                                                    .alias(id_col))
                .union(flagged.filter(in_b & ~in_a)
                       .select(F.col("id_b").alias(id_col))))
            dd_pairs = flagged.filter(in_a & in_b).select("id_a", "id_b")
            comps = connected_components(ids, dd_pairs, id_col=id_col)
            drop_dd = (comps.filter(F.col(id_col) != F.col("cluster_id"))
                       .select(id_col))
            return (fresh
                    .join(drop_vs_corpus.union(drop_dd), id_col,
                          "left_anti")
                    .drop("_ch"))
        except Exception:
            self.rollback(v0)
            raise


def dataset_card(docs: DataFrame, text_col: str = "text",
                 lang_col: str | None = None,
                 url_col: str | None = None,
                 tokens_col: str | None = None,
                 top_k: int = 10,
                 exact_distinct: bool = False) -> dict:
    """The data-card record for a published corpus (Gebru et al.'s
    datasheets; what Dolma/FineWeb ship next to the shards), as plain
    driver-side values: global corpus_stats; the top-``top_k``
    languages with their per-language stats (``lang_col``); the
    top-``top_k`` registrable domains by doc count (``url_col``);
    pass rates for every boolean gate column already on the frame
    (``rule_*`` / ``*_keep`` — gopher/c4/repetition/caption outputs
    ride along uninvoked); and tokenizer encoding stats when
    ``tokens_col`` is given.

    Every section is a map-side-partial aggregate with O(top_k) or
    O(rules) output — safe to run on the full corpus; nothing here is
    a sampling estimate except corpus_stats' HLL distinct (swap with
    ``exact_distinct=True`` at fixture scale). Returns a nested dict
    (JSON-ready; Row values converted)."""
    from ..operators.links import registered_domain_col
    from ..operators.stats import corpus_stats, gate_pass_rates
    from ..operators.tokenizer import encoding_stats

    card: dict = {
        "n_input_columns": len(docs.columns),
        "stats": corpus_stats(docs, text_col,
                              exact_distinct=exact_distinct)
        .first().asDict(),
    }
    if lang_col is not None:
        rows = (corpus_stats(docs, text_col, group_cols=(lang_col,),
                             exact_distinct=exact_distinct)
                .orderBy(F.desc("n_docs"), F.asc(lang_col))
                .limit(top_k).collect())
        card["languages"] = [r.asDict() for r in rows]
    if url_col is not None:
        rows = (docs
                .groupBy(registered_domain_col(F.col(url_col))
                         .alias("domain"))
                .count()
                .orderBy(F.desc("count"), F.asc("domain"))
                .limit(top_k).collect())
        card["top_domains"] = [{"domain": r["domain"],
                                "n_docs": r["count"]} for r in rows]
    gate_cols = tuple(
        name for name, dtype in docs.dtypes
        if dtype == "boolean"
        and (name.startswith("rule_") or name.endswith("_keep")))
    if gate_cols:
        card["gate_pass_rates"] = (gate_pass_rates(docs, gate_cols)
                                   .first().asDict())
    if tokens_col is not None:
        card["encoding"] = (encoding_stats(docs, tokens_col, text_col)
                            .first().asDict())
    return card


def corpus_diff_card(old: DataFrame, new: DataFrame,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> dict:
    """The release-notes record between two corpus versions: doc and
    token counts for added / removed / changed / unchanged documents
    (change = the dd01 content fingerprint moved), plus both totals —
    what a dataset card publishes next to 'v2 differs from v1 by …'.

    Both sides reduce to (id, fingerprint, n_tokens) BEFORE the one
    full-outer join — text never rides the diff shuffle (the
    diff_snapshots rule) — and everything folds in ONE map-side-partial
    aggregate into a single driver row. Each side is treated as a SET
    of documents keyed by id: duplicate ids (a data bug in the input)
    deterministically keep the smallest (fingerprint, n_tokens) row
    instead of silently double-counting through the join."""

    def slim(df: DataFrame, tag: str) -> DataFrame:
        t = F.coalesce(F.col(text_col), F.lit(""))
        return (df.select(F.col(id_col).alias("_id"),
                          fingerprint_col(t).alias("fp"),
                          token_count_col(t).alias("nt"))
                .groupBy("_id")
                .agg(F.min(F.struct("fp", "nt")).alias("_s"))
                .select("_id", F.col("_s.fp").alias(f"fp_{tag}"),
                        F.col("_s.nt").alias(f"nt_{tag}")))

    j = slim(old, "old").join(slim(new, "new"), "_id", "full_outer")
    cls = (F.when(F.col("fp_old").isNull(), F.lit("added"))
           .when(F.col("fp_new").isNull(), F.lit("removed"))
           .when(F.col("fp_old") == F.col("fp_new"), F.lit("unchanged"))
           .otherwise(F.lit("changed")))
    row = j.select(cls.alias("c"), "nt_old", "nt_new").agg(
        *[F.sum(F.when(F.col("c") == c, 1).otherwise(0)).alias(f"n_{c}")
          for c in ("added", "removed", "changed", "unchanged")],
        F.sum(F.when(F.col("c") == "added", F.col("nt_new"))
              .otherwise(0)).alias("tok_added"),
        F.sum(F.when(F.col("c") == "removed", F.col("nt_old"))
              .otherwise(0)).alias("tok_removed"),
        F.sum(F.when(F.col("c") == "changed", F.col("nt_old"))
              .otherwise(0)).alias("tok_changed_old"),
        F.sum(F.when(F.col("c") == "changed", F.col("nt_new"))
              .otherwise(0)).alias("tok_changed_new"),
        F.sum(F.coalesce("nt_old", F.lit(0))).alias("tok_old_total"),
        F.sum(F.coalesce("nt_new", F.lit(0))).alias("tok_new_total"),
    ).first()

    def _i(v) -> int:
        # an agg over ZERO rows (both corpora empty) sums to null
        return int(v) if v is not None else 0

    return {
        "n_old": _i(row.n_removed) + _i(row.n_changed) + _i(row.n_unchanged),
        "n_new": _i(row.n_added) + _i(row.n_changed) + _i(row.n_unchanged),
        "added": {"docs": _i(row.n_added), "tokens": _i(row.tok_added)},
        "removed": {"docs": _i(row.n_removed),
                    "tokens": _i(row.tok_removed)},
        "changed": {"docs": _i(row.n_changed),
                    "tokens_old": _i(row.tok_changed_old),
                    "tokens_new": _i(row.tok_changed_new)},
        "unchanged": {"docs": _i(row.n_unchanged)},
        "tokens_old_total": _i(row.tok_old_total),
        "tokens_new_total": _i(row.tok_new_total),
    }
