"""Multimodal plumbing: binary payload schema, mapInPandas batching,
deterministic fake decode, strict seam raises."""

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.multimodal import (
    decode_and_featurize,
    frame_sample_plan,
    synth_media_from_documents,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return synth_media_from_documents(docs)


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "media_id": "bigint", "media_type": "string", "payload": "binary",
        "meta": "struct<n_bytes:bigint,declared_format:string>"}
    r = media.first()
    assert isinstance(r.payload, (bytes, bytearray))
    assert r.meta.n_bytes == len(r.payload)


def test_fake_decode_deterministic(media):
    a = {r.media_id: (r.width, r.height, tuple(r.feature))
         for r in decode_and_featurize(media).collect()}
    b = {r.media_id: (r.width, r.height, tuple(r.feature))
         for r in decode_and_featurize(media).collect()}
    assert a == b
    assert all(len(f) == 8 for (_, _, f) in a.values())
    assert all(abs(sum(f) - 1.0) < 1e-6 for (_, _, f) in a.values())


def test_strict_decode_raises(media):
    with pytest.raises(Exception) as ei:
        decode_and_featurize(media.limit(2), decode="strict").collect()
    assert "NotImplementedError" in str(ei.value) or "real media decoding" in str(ei.value)


def test_frame_sample(media):
    frames = frame_sample_plan(media, every_n=10)
    rows = frames.collect()
    assert rows, "some media rows are videos"
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in per.values():
        assert idxs == sorted(idxs)
        assert all(i % 10 == 0 for i in idxs)


def test_fake_decode_values_vs_inline_oracle(spark, media):
    """Value check against an INDEPENDENT inline reference (the spec
    re-stated in the test, not a call into the operator): dims from
    byte length, feature = round-6 normalized 8-bin histogram of
    byte >> 5, n_bytes = payload length. Pins the Arrow batch path
    end-to-end, not just determinism."""
    import numpy as np

    got = {r.media_id: r for r in decode_and_featurize(media).collect()}
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert set(got) == set(src)
    for mid, payload in src.items():
        n = len(payload)
        r = got[mid]
        assert r.n_bytes == n
        assert (r.width, r.height, r.channels) == (
            16 + n % 64, 16 + (n // 64) % 64, 3)
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr >> 5, minlength=8) / n if n else np.zeros(8)
        assert np.allclose(r.feature, np.round(hist, 6), atol=1e-12), mid


def test_frame_sample_counts_vs_inline_oracle(media):
    """Every video's sampled frame list equals range(0, len//1024+1, 10)
    exactly; non-videos emit nothing."""
    rows = frame_sample_plan(media, every_n=10).collect()
    per: dict = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    vids = {r.media_id: len(r.payload)
            for r in media.filter(F.col("media_type") == "video").collect()}
    assert set(per) == set(vids)
    for mid, n in vids.items():
        assert sorted(per[mid]) == list(range(0, n // 1024 + 1, 10)), mid


def test_null_payload_and_decode_validation(spark):
    from data_crawler_spark.operators.multimodal import decode_and_featurize

    media = spark.createDataFrame(
        [(1, "image", b"\x01\x02\x03"), (2, "image", None)],
        "media_id long, media_type string, payload binary")
    got = {r.media_id: r for r in decode_and_featurize(media).collect()}
    assert got[1].n_bytes == 3 and got[1].width is not None
    # a failed fetch is null dims/features, not a task crash
    assert got[2].n_bytes is None and got[2].width is None
    assert got[2].feature is None

    with pytest.raises(ValueError):
        decode_and_featurize(media, decode="Strict")
    with pytest.raises(NotImplementedError):
        decode_and_featurize(media, decode="strict")


# ---------------------------------------------------------------------------
# perceptual hash (phash64 math + media plumbing)
# ---------------------------------------------------------------------------

def test_phash64_math_properties():
    import numpy as np

    from data_crawler_spark.operators.multimodal import phash64

    rng = np.random.default_rng(11)
    img = rng.uniform(0, 255, (32, 32))

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    h = phash64(img)
    assert phash64(img.copy()) == h                     # deterministic
    # uniform brightness shift moves only the DC coefficient -> at
    # most one bit differs (the defining perceptual invariance)
    assert ham(h, phash64(img + 40.0)) <= 1
    # small noise -> small hamming; unrelated image -> large
    noisy = img + rng.uniform(-4, 4, (32, 32))
    other = rng.uniform(0, 255, (32, 32))
    assert ham(h, phash64(noisy)) <= 10
    assert ham(h, phash64(other)) > 16
    with pytest.raises(ValueError):
        phash64(np.zeros((16, 16)))


def test_phash_media_and_near_dups(spark):
    from data_crawler_spark.operators.multimodal import (media_near_dups,
                                                         phash_media)

    import numpy as np

    # non-degenerate payload: a periodic ramp tiles into an image whose
    # low-frequency AC coefficients are ALL exactly at the median, so
    # any perturbation flips half the bits — random bytes give the
    # spread a real image has
    blob = bytes(np.random.default_rng(7).integers(0, 256, 2048,
                                                   dtype=np.uint8))
    near = bytearray(blob)
    near[100] ^= 0x01                 # tiny payload perturbation
    rows = [(1, "image", blob, None),
            (2, "image", bytes(near), None),   # near dup of 1
            (3, "image", blob[::-1], None),      # different
            (4, "image", None, None)]            # failed fetch
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, "
              "meta string")
    hashes = {r["media_id"]: r["phash"]
              for r in phash_media(media).collect()}
    assert hashes[4] is None
    assert hashes[1] != hashes[3]
    pairs = {(r["id_a"], r["id_b"]) for r in
             media_near_dups(media, max_hamming=16).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs
    with pytest.raises(NotImplementedError):
        phash_media(media, decode="strict")


# ---------------------------------------------------------------------------
# image-text pairs (img extraction -> caption rules -> paired corpus)
# ---------------------------------------------------------------------------

def test_image_caption_pairs_extraction_and_plan(spark):
    from data_crawler_spark.operators.multimodal import image_caption_pairs

    html = (
        '<p>x</p>'
        '<img src="/a.jpg" alt="A &quot;red&quot; car &amp; a bike">'
        "<IMG SRC='b.png' ALT='  spaced\n  alt  ' title='t1'>"
        '<img src=c.gif>'                                  # unquoted, no alt
        '<img src="//cdn.example.net/d.webp" alt="proto-relative">'
        '<img src="data:image/png;base64,AAAA" alt="inline">'
        '<img alt="no src at all">'
        '<img src="javascript:void(0)" alt="js">'
        '<img src="HTTPS://Other.EXAMPLE.com/E.jpg" alt="abs">'
    )
    pages = spark.createDataFrame(
        [("https://example.com/dir/page.html", html)],
        "url string, html string")
    got = {r["media_url"]: r for r in
           image_caption_pairs(pages).collect()}
    assert set(got) == {
        "https://example.com/a.jpg",
        "https://example.com/dir/b.png",
        "https://example.com/dir/c.gif",
        "https://cdn.example.net/d.webp",
        "https://other.example.com/E.jpg",
    }
    a = got["https://example.com/a.jpg"]
    assert a["caption"] == 'A "red" car & a bike'
    assert a["page_url"] == "https://example.com/dir/page.html"
    assert a["img_idx"] == 0
    b = got["https://example.com/dir/b.png"]
    assert b["caption"] == "spaced alt" and b["title"] == "t1"
    assert got["https://example.com/dir/c.gif"]["caption"] == ""
    # pure map + explode: html fuses into the scan
    txt = (image_caption_pairs(pages)._jdf.queryExecution()
           .executedPlan().toString())
    assert "Exchange" not in txt
    assert "Python" not in txt


def test_caption_rules_mirror(spark):
    from data_crawler_spark.operators.multimodal import caption_rules

    rows = [
        (1, "a photograph of a striped cat"),   # keep
        (2, "img"),                              # too short + generic
        (3, "Logo"),                             # generic (case-folded)
        (4, "https://example.com/x.jpg"),        # bare URL
        (5, "1024"),                             # no letter
        (6, "x" * 2000),                         # too long
        (7, ""),                                 # empty
    ]
    df = spark.createDataFrame(rows, "pair_id long, caption string")
    got = {r["pair_id"]: r for r in caption_rules(df).collect()}
    assert got[1]["caption_keep"]
    assert got[1]["n_words"] == 6 and got[1]["n_chars"] == 29
    assert not got[2]["caption_keep"] and not got[2]["rule_len"]
    assert not got[2]["rule_not_generic"]
    assert not got[3]["rule_not_generic"] and got[3]["rule_letter"]
    assert not got[4]["rule_not_url"] and got[4]["rule_len"]
    assert not got[5]["rule_letter"]
    assert not got[6]["rule_len"] and got[6]["rule_words"]
    assert not got[7]["caption_keep"] and got[7]["n_words"] == 0


def test_image_text_corpus_end_to_end(spark):
    import numpy as np

    from data_crawler_spark.operators.multimodal import image_text_corpus

    blob = bytes(np.random.default_rng(9).integers(0, 256, 2048,
                                                   dtype=np.uint8))
    near = bytearray(blob)
    near[7] ^= 0x01
    other = blob[::-1]
    url_a = "https://a.example.com/cat.jpg"
    url_b = "https://b.example.com/cat-copy.jpg"   # near-dup of a
    url_c = "https://c.example.com/dog.jpg"
    url_d = "https://d.example.com/never-fetched.jpg"
    media = spark.createDataFrame(
        [(url_a, blob), (url_b, bytes(near)), (url_c, other)],
        "media_url string, payload binary")
    pairs = spark.createDataFrame(
        [("https://p1.com/", url_a, "a cat"),
         ("https://p2.com/", url_b, "a cat"),      # collapses with ^
         ("https://p2.com/", url_b, "feline"),
         ("https://p3.com/", url_c, "a dog"),
         ("https://p4.com/", url_d, "missing")],   # unfetched -> drops
        "page_url string, media_url string, caption string")
    out = image_text_corpus(pairs, media, max_hamming=16).collect()
    rep_ab = min(url_a, url_b)
    got = {(r["media_url"], r["caption"]): r for r in out}
    assert set(got) == {(rep_ab, "a cat"), (rep_ab, "feline"),
                        (url_c, "a dog")}
    # provenance = min page_url across the collapsed pair copies
    assert got[(rep_ab, "a cat")]["page_url"] == "https://p1.com/"
    # payload is the REPRESENTATIVE's bytes
    assert bytes(got[(rep_ab, "a cat")]["payload"]) == blob
    assert bytes(got[(url_c, "a dog")]["payload"]) == bytes(other)
    # sample ids: 16-hex, deterministic, unique
    sids = [r["sample_id"] for r in out]
    assert len(set(sids)) == 3
    assert all(len(s) == 16 for s in sids)
    out2 = image_text_corpus(pairs.repartition(7), media.repartition(5),
                             max_hamming=16).collect()
    assert {(r["media_url"], r["caption"], r["sample_id"])
            for r in out2} == {(r["media_url"], r["caption"],
                                r["sample_id"]) for r in out}


# ---------------------------------------------------------------------------
# video near-dup (frame-sampled perceptual hashes + overlap)
# ---------------------------------------------------------------------------

def test_frame_hashes_mirror(spark):
    import numpy as np

    from data_crawler_spark.operators.multimodal import (_fake_gray,
                                                         frame_hashes,
                                                         phash64)

    rng = np.random.default_rng(21)
    v1 = bytes(rng.integers(0, 256, 5000, dtype=np.uint8))   # 5 frames
    v2 = bytes(rng.integers(0, 256, 100, dtype=np.uint8))    # 1 frame
    media = spark.createDataFrame(
        [(1, v1), (2, v2), (3, None)],
        "media_id long, payload binary")
    got = {(r["media_id"], r["frame_idx"]): r["phash"]
           for r in frame_hashes(media, every_n=2).collect()}
    exp = {}
    for mid, b in ((1, v1), (2, v2)):
        for k in range(0, len(b) // 1024 + 1, 2):
            exp[(mid, k)] = phash64(_fake_gray(b[k * 1024:(k + 1) * 1024]))
    assert got == exp                       # null payload emits nothing
    assert {(1, 0), (1, 2), (1, 4), (2, 0)} == set(got)
    with pytest.raises(NotImplementedError):
        frame_hashes(media, decode="strict")
    with pytest.raises(ValueError):
        frame_hashes(media, every_n=0)


def test_video_near_dups_overlap(spark):
    import numpy as np

    from data_crawler_spark.operators.multimodal import video_near_dups

    rng = np.random.default_rng(22)
    base = bytes(rng.integers(0, 256, 40960, dtype=np.uint8))  # 41 frames
    # re-encode stand-in: a few bytes perturbed in two sampled frames
    ham = bytearray(base)
    ham[0] ^= 0x01
    ham[10240] ^= 0x01
    # clip: the first quarter of base (containment case)
    clip = base[:10240]
    unrelated = bytes(rng.integers(0, 256, 40960, dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, base), (2, bytes(ham)), (3, clip), (4, unrelated)],
        "media_id long, payload binary")
    out = {(r["id_a"], r["id_b"]): r for r in
           video_near_dups(media, max_hamming=16, min_overlap=0.5,
                           every_n=10).collect()}
    # 1 vs 2: every sampled frame matches (perturbations are tiny)
    r12 = out[(1, 2)]
    assert r12["overlap"] == 1.0
    assert r12["frames_a"] == 5 and r12["frames_b"] == 5
    # 1 vs 3: the clip's sampled frames (0, 10) are base's frames ->
    # containment 1.0 on the clip side even though base matches 2/5
    r13 = out[(1, 3)]
    assert r13["frames_b"] == 2 and r13["matched_b"] == 2
    assert r13["overlap"] == 1.0
    assert (1, 4) not in out and (2, 4) not in out
    # threshold: demanding >1.0-side coverage of BASE drops the clip
    strict = {(r["id_a"], r["id_b"]) for r in
              video_near_dups(media, max_hamming=16, min_overlap=0.9,
                              every_n=10).collect()}
    assert (1, 2) in strict and (1, 3) in strict  # max() is containment


def test_img_src_not_confused_by_data_src(spark):
    # lazy-load markup puts data-src BEFORE the real src; the
    # attribute grammar must not treat the hyphen as a word boundary
    from data_crawler_spark.operators.multimodal import img_entries_col

    df = spark.createDataFrame(
        [('<img data-src="/lazy.jpg" src="/real.gif" alt="a dog">',),
         ('<img data-src="/only-lazy.jpg" alt="js only">',)],
        "html string")
    rows = (df.select(F.explode(img_entries_col(F.col("html"))).alias("e"))
            .select("e.*").collect())
    assert rows[0]["src"] == "/real.gif" and rows[0]["alt"] == "a dog"
    # no real src at all -> empty (a JS-dependent image, not /only-lazy.jpg)
    assert rows[1]["src"] == ""
