"""Corpus operators: TF-IDF top-k, token-bin packing, caption pairing.

Oracles here are fresh, independent Python (collections / math) —
no shared code with the operators under test.
"""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cello_spark.operators.corpus import pack_token_bins, tfidf_top_terms
from cello_spark.operators.multimodal import caption_pairs

DOCS = [
    ("d01", "the cat sat on the mat"),
    ("d02", "the dog sat on the log"),
    ("d03", "cat and dog and cat"),
    ("d04", "quantum flux capacitor"),
    ("d05", "the the the the"),
    ("d06", ""),
    ("d07", "mat log flux"),
    ("d08", "a b c d e f g h i j k l"),
]


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().replace("\t", " ").split(" ") if t]


def _tfidf_oracle(docs, k):
    n = len(docs)
    tf = {d: Counter(_toks(t)) for d, t in docs}
    df = Counter()
    for d, c in tf.items():
        for term in c:
            df[term] += 1
    out = {}
    for d, c in tf.items():
        scored = [
            (term, cnt, df[term], cnt * (math.log((n + 1) / (df[term] + 1)) + 1))
            for term, cnt in c.items()
        ]
        scored.sort(key=lambda r: (-r[3], r[0]))
        out[d] = scored[:k]
    return out


def test_tfidf_matches_fresh_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df, r.tfidf)
        for r in tfidf_top_terms(df, k=3).collect()
    }
    want = _tfidf_oracle(DOCS, 3)
    expected = {
        (d, i + 1): row
        for d, rows in want.items()
        for i, row in enumerate(rows)
    }
    assert set(got) == set(expected)
    for key, (term, tf, dfc, score) in expected.items():
        gterm, gtf, gdf, gscore = got[key]
        assert (gterm, gtf, gdf) == (term, tf, dfc), key
        assert gscore == pytest.approx(score, rel=1e-12), key


def test_tfidf_rare_term_outranks_stopword(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    top1 = {
        r.doc_id: r.term
        for r in tfidf_top_terms(df, k=1).collect()
    }
    # d04 = 'quantum flux capacitor': quantum/capacitor are df=1 and
    # tie on score; the (score desc, term asc) tie-break picks
    # 'capacitor' over 'quantum', and both outrank df=2 'flux'
    assert top1["d04"] == "capacitor"
    # a doc made ONLY of the stopword still ranks it
    assert top1["d05"] == "the"


def _shard_oracle(doc_id: str, n_shards: int) -> int:
    return int(hashlib.md5(doc_id.encode()).hexdigest()[:15], 16) % n_shards


def test_pack_token_bins_layout(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    rows = pack_token_bins(df, capacity=8, n_shards=3).collect()
    assert len(rows) == len(DOCS)
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r.shard == _shard_oracle(r.doc_id, 3)
        assert r.n_tokens == len(_toks(dict(DOCS)[r.doc_id]))
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in shard_rows:
            assert r.start_tok == offset  # contiguous layout, no gaps
            assert r.bin_id == offset // 8
            offset += r.n_tokens


def test_pack_token_bins_single_shard_is_global_stream(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    rows = sorted(
        pack_token_bins(df, capacity=10, n_shards=1).collect(),
        key=lambda r: r.doc_id,
    )
    total = 0
    for r in rows:
        assert r.start_tok == total
        total += r.n_tokens
    assert total == sum(len(_toks(t)) for _, t in DOCS)


SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _span(kind, text=None, ref=None, off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_caption_pairs_nearest_preceding_text(spark):
    docs = spark.createDataFrame(
        [
            # media before any text -> no caption
            (
                "da",
                [
                    _span("image", ref="img0", off=0),
                    _span("text", text="first caption", off=1),
                    _span("image", ref="img1", off=2),
                    _span("text", text="second caption", off=3),
                    _span("audio", ref="aud0", off=4),
                    _span("video", ref="vid0", off=5),
                ],
            ),
            # text-only doc -> contributes no rows
            ("db", [_span("text", text="no media here", off=0)]),
        ],
        SPAN_SCHEMA,
    )
    got = {
        (r.doc_id, r.media_ref): (r.media_idx, r.caption_idx, r.caption_text, r.kind)
        for r in caption_pairs(docs).collect()
    }
    assert got == {
        ("da", "img0"): (0, -1, "", "image"),
        ("da", "img1"): (2, 1, "first caption", "image"),
        ("da", "aud0"): (4, 3, "second caption", "audio"),
        ("da", "vid0"): (5, 3, "second caption", "video"),
    }


def test_caption_pairs_on_fixture_world(spark, small_world):
    """Every fixture media span gets the last text span before it (the
    fixture generator interleaves media after text), and the input
    documents frame is untouched (span-sequence invariant)."""
    docs = spark.createDataFrame(small_world["documents"])
    before = docs.select("doc_id", "spans").collect()
    pairs = caption_pairs(docs).collect()
    media_total = sum(
        1 for row in before for s in row.spans if s.kind != "text"
    )
    assert len(pairs) == media_total
    by_doc = {r.doc_id: r.spans for r in before}
    for p in pairs:
        spans = by_doc[p.doc_id]
        assert spans[p.media_idx].kind != "text"
        want_idx = -1
        for i in range(p.media_idx - 1, -1, -1):
            if spans[i].kind == "text":
                want_idx = i
                break
        assert p.caption_idx == want_idx
        if want_idx >= 0:
            assert p.caption_text == spans[want_idx].text
    after = docs.select("doc_id", "spans").collect()
    assert sorted(map(repr, before)) == sorted(map(repr, after))


def test_media_triples_grounding(spark):
    """has_media for every media span; depicts for every alias mention
    in the caption; no depicts for an uncaptioned media span."""
    from cello_spark.operators.multimodal import media_triples

    docs = spark.createDataFrame(
        [
            (
                "da",
                [
                    _span("image", ref="img0", off=0),  # no caption
                    _span("text", text="spark hash join demo", off=1),
                    _span("image", ref="img1", off=2),
                    _span("text", text="plain words only", off=3),
                    _span("audio", ref="aud0", off=4),
                ],
            ),
            ("db", [_span("text", text="no media", off=0)]),
        ],
        SPAN_SCHEMA,
    )
    alias_df = spark.createDataFrame(
        [("spark", "T1"), ("hash join", "T2"), ("plain", "T3")],
        "alias_norm string, term_id string",
    )
    got = {(r.subj, r.pred, r.obj) for r in media_triples(docs, alias_df).collect()}
    assert got == {
        ("da", "has_media", "img0"),
        ("da", "has_media", "img1"),
        ("da", "has_media", "aud0"),
        # img1's caption 'spark hash join demo' mentions T1 and T2
        ("img1", "depicts", "T1"),
        ("img1", "depicts", "T2"),
        # aud0's caption 'plain words only' mentions T3
        ("aud0", "depicts", "T3"),
        # img0 has no preceding text -> no depicts triples
    }


def test_hash_sample_deterministic_and_calibrated(spark):
    from cello_spark.operators.corpus import hash_sample

    docs = spark.createDataFrame(
        [(f"d{i:05d}", "x") for i in range(4000)], "doc_id string, text string"
    )
    a = {r.doc_id for r in hash_sample(docs, 0.25).collect()}
    b = {r.doc_id for r in hash_sample(docs, 0.25).collect()}
    assert a == b  # pure function of the id
    # matches the fresh-python membership rule exactly
    want = {
        f"d{i:05d}"
        for i in range(4000)
        if int(hashlib.md5(f"d{i:05d}".encode()).hexdigest()[:15], 16) % 1_000_000
        < 250_000
    }
    assert a == want
    # calibrated (md5 is uniform): 25% ± a generous band
    assert 0.2 < len(a) / 4000 < 0.3
    # nested rates: a lower-rate sample is a subset of a higher-rate one
    c = {r.doc_id for r in hash_sample(docs, 0.1).collect()}
    assert c <= a
    # a different salt draws an (almost surely) different sample
    d = {r.doc_id for r in hash_sample(docs, 0.25, salt="v2").collect()}
    assert d != a


def test_stratified_hash_sample_rates_and_default(spark):
    from cello_spark.operators.corpus import stratified_hash_sample

    rows = [
        (f"d{i:05d}", ["en", "fr", "xx"][i % 3], "t") for i in range(3000)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    got = stratified_hash_sample(
        docs, {"en": 0.1, "fr": 1.0}, strata_col="lang", default_rate=0.0
    ).collect()
    by_lang: dict[str, int] = {}
    for r in got:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    assert by_lang.get("xx", 0) == 0  # default 0 drops unmapped strata
    assert by_lang["fr"] == 1000  # rate 1.0 keeps every row
    assert 50 < by_lang["en"] < 150  # ~10% of 1000
    # membership agrees with the uniform sampler at the same rate
    from cello_spark.operators.corpus import hash_sample

    from pyspark.sql import functions as F

    en_docs = docs.filter(F.col("lang") == "en")
    want = {r.doc_id for r in hash_sample(en_docs, 0.1).collect()}
    assert {r.doc_id for r in got if r.lang == "en"} == want


def test_length_quantiles_exact_vs_numpy(spark):
    import numpy as np

    from cello_spark.operators.corpus import length_quantiles

    rng = np.random.RandomState(7)
    rows = [
        (int(i), ["web", "books", "code"][i % 3], int(v))
        for i, v in enumerate(rng.randint(1, 10_000, size=600))
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {
        r.source: r.asDict()
        for r in length_quantiles(
            df, probs=(0.25, 0.5, 0.75, 0.95), exact=True
        ).collect()
    }
    for src in ("web", "books", "code"):
        vals = np.array([v for _, s, v in rows if s == src], dtype=float)
        want = np.percentile(vals, [25, 50, 75, 95], method="linear")
        assert got[src]["n"] == len(vals)
        assert abs(got[src]["mean"] - vals.mean()) < 1e-9
        for name, w in zip(("p25", "p50", "p75", "p95"), want):
            assert abs(got[src][name] - w) < 1e-9, (src, name)


def test_length_quantiles_approx_bounded_by_exact(spark):
    import numpy as np

    from cello_spark.operators.corpus import length_quantiles

    rng = np.random.RandomState(11)
    rows = [(int(i), "s", int(v)) for i, v in enumerate(rng.randint(1, 1000, 2000))]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    approx = length_quantiles(df, probs=(0.5, 0.95), exact=False).collect()[0]
    vals = np.array([v for _, _, v in rows], dtype=float)
    # GK sketch with accuracy=10000 on 2000 rows is exact up to rank
    # rounding — allow a generous rank-error band of 1% of the range
    for name, p in (("p50", 50), ("p95", 95)):
        lo, hi = np.percentile(vals, [max(p - 1, 0), min(p + 1, 100)])
        assert lo - 1 <= approx[name] <= hi + 1, (name, approx[name], lo, hi)


def _chunk_oracle(text, chunk, overlap):
    toks = " ".join(text.lower().split()).split()
    if not toks:
        return []
    stride = chunk - overlap
    out = []
    i = 0
    idx = 0
    while True:
        piece = toks[i : i + chunk]
        out.append((idx, " ".join(piece), len(piece)))
        if i + chunk >= len(toks):
            break
        i += stride
        idx += 1
    return out


def test_chunk_documents_vs_oracle(spark):
    from cello_spark.operators.corpus import chunk_documents

    docs = [
        (1, " ".join(f"w{i}" for i in range(25))),   # multi-chunk
        (2, " ".join(f"w{i}" for i in range(10))),   # exactly one chunk
        (3, "single"),                                # short
        (4, ""),                                      # empty -> no chunks
        (5, " ".join(f"w{i}" for i in range(11))),   # boundary: chunk+1
        (6, " ".join(f"w{i}" for i in range(17))),   # boundary: chunk+stride
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, chunk_tokens=10, overlap=3).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.chunk_text, r.n_tokens)
        )
    for doc_id, text in docs:
        want = _chunk_oracle(text, 10, 3)
        assert sorted(got.get(doc_id, [])) == want, doc_id


def test_chunk_documents_coverage_invariant(spark):
    """Every token index is covered by >=1 chunk and consecutive
    chunks overlap by exactly `overlap` (except a short last chunk)."""
    from cello_spark.operators.corpus import chunk_documents

    n_tok, chunk, ov = 83, 16, 5
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(n_tok)))],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=ov).collect(),
        key=lambda r: r.chunk_idx,
    )
    stride = chunk - ov
    covered = set()
    for r in rows:
        start = r.chunk_idx * stride
        assert r.chunk_text.split()[0] == f"w{start}"
        covered.update(range(start, start + r.n_tokens))
    assert covered == set(range(n_tok))
    # all but the last chunk are full-length
    assert all(r.n_tokens == chunk for r in rows[:-1])


def test_chunk_documents_errors(spark):
    from cello_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=10, overlap=10)
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=10, overlap=-1)


def test_temperature_mixture_rates_math():
    from cello_spark.operators.corpus import temperature_mixture_rates

    sizes = {"big": 90_000, "mid": 9_000, "tail": 1_000}
    # alpha=1 -> proportional sampling -> uniform rates
    r1 = temperature_mixture_rates(sizes, alpha=1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in r1.values())
    # alpha=0 -> uniform target distribution -> the smallest stratum
    # binds at rate 1.0 and every stratum keeps the same COUNT
    r0 = temperature_mixture_rates(sizes, alpha=0.0)
    kept = {s: r0[s] * n for s, n in sizes.items()}
    assert abs(r0["tail"] - 1.0) < 1e-12
    assert max(kept.values()) - min(kept.values()) < 1e-6
    # intermediate alpha: tail keeps a LARGER rate than head
    r = temperature_mixture_rates(sizes, alpha=0.3)
    assert r["tail"] > r["mid"] > r["big"]
    # target_total scales expected kept rows
    rt = temperature_mixture_rates(sizes, alpha=0.3, target_total=1_000)
    expect = sum(rt[s] * n for s, n in sizes.items())
    assert abs(expect - 1_000) < 1.0
    assert temperature_mixture_rates({}) == {}
    import pytest as _p

    with _p.raises(ValueError):
        temperature_mixture_rates(sizes, alpha=-1)


def test_temperature_sample_rebalances(spark):
    from cello_spark.operators.corpus import temperature_sample

    rows = [(i, "head" if i < 9_000 else "tail") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_sample(df, alpha=0.0, strata_col="source")
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # alpha=0 targets a uniform mix: the tail keeps everything, the
    # head downsamples to ~tail size (hash sampling is approximate)
    assert counts["tail"] == 1_000
    assert 800 < counts["head"] < 1_200
    # deterministic: same input -> identical sample
    again = {
        r.source: r.n
        for r in temperature_sample(df, alpha=0.0, strata_col="source")
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert again == counts


def test_temperature_sample_rejects_null_strata(spark):
    from cello_spark.operators.corpus import temperature_sample

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "doc_id long, source string"
    )
    with pytest.raises(ValueError, match="NULL"):
        temperature_sample(df, strata_col="source")


def test_cap_per_stratum_deterministic_uniform(spark):
    from cello_spark.operators.corpus import cap_per_stratum

    rows = [(i, "big" if i < 970 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_stratum(df, 50, strata_col="source")
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # big stratum capped, small (30 rows, under the cap) kept whole
    assert counts == {"big": 50, "small": 30}
    # deterministic across partitionings
    again = {
        r.doc_id
        for r in cap_per_stratum(df.repartition(13), 50, strata_col="source").collect()
    }
    assert again == {r.doc_id for r in out.collect()}
    # different salt -> different survivor set (same sizes)
    other = {
        r.doc_id
        for r in cap_per_stratum(df, 50, strata_col="source", salt="x").collect()
    }
    assert other != again and len(other) == len(again)
    import pytest as _p

    with _p.raises(ValueError):
        cap_per_stratum(df, 0)


def test_tfidf_cached_matches_plain_and_scopes_cache(spark):
    from cello_spark.operators.corpus import tfidf_top_terms_cached

    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    plain = sorted(map(tuple, tfidf_top_terms(df, k=3).collect()))
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    with tfidf_top_terms_cached(df, k=3) as top:
        got = sorted(map(tuple, top.collect()))
        # the tf cache is alive inside the block
        during = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        assert during == before + 1
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after == before  # unpersisted on exit
    assert got == plain
