"""Text analysis + multimodal plumbing + scalar function tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from jena_spark.data import multimodal as MM
from jena_spark.data import text as TX
from jena_spark.functions.scalar import SPARQL_FUNCTIONS, sha224_udf


def test_token_count_and_quality(spark):
    df = spark.createDataFrame(
        [(0, "the cat is on the mat"), (1, ""), (2, "x!!!???...")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("tc"),
        TX.quality_score(F.col("text")).alias("q"),
        TX.punct_ratio(F.col("text")).alias("pr"),
    ).collect()}
    assert rows[0]["tc"] == 6 and rows[1]["tc"] == 0
    assert rows[0]["q"] > rows[2]["q"]  # stopwordy prose beats punctuation soup
    assert rows[2]["pr"] > 0.5


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat is on the mat and it is happy"),
            (1, "le chat est dans la maison et il est content"),
            (2, "der Hund ist in dem Haus und er ist mit"),
            (3, "zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang"] for r in
           df.select("doc_id", TX.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {0: "en", 1: "fr", 2: "de", 3: "und"}


def test_fingerprint_deterministic_and_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e"), (2, "e d c b a"), (3, "xy")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", TX.fingerprint(F.col("text")).alias("fp")).collect()}
    assert got[0] == got[1]
    assert got[0] != got[2]
    assert len(got[3]) == 32  # <3 words falls back to md5(text)


def test_multimodal_features(spark):
    media = MM.synthetic_media(spark, n=30)
    feats = MM.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(r["n_bytes"] > 0 and 0 <= r["mean_intensity"] <= 255 for r in rows)
    # deterministic: same input -> same feature hash
    again = {r["media_id"]: r["feature_hash"] for r in MM.extract_features(media).collect()}
    first = {r["media_id"]: r["feature_hash"] for r in rows}
    assert first == again


def test_multimodal_resize_and_frames(spark):
    media = MM.synthetic_media(spark, n=30)
    thumbs = MM.resize_images(media, out_w=8, out_h=8).collect()
    assert all(len(bytes(t["thumb"])) == 64 for t in thumbs)
    assert len(thumbs) == 10  # every 3rd is an image
    frames = MM.frame_sample(media, every_ms=500)
    one = frames.where(F.col("media_id") == 2).collect()  # video, duration 1020ms
    assert [r["frame_ts_ms"] for r in one] == [0, 500, 1000]


def test_scalar_functions(spark):
    df = spark.createDataFrame([("Hello World", "2026-03-01 10:20:30")],
                               "s string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    fns = SPARQL_FUNCTIONS
    row = df.select(
        fns["strlen"](F.col("s")).alias("len"),
        fns["ucase"](F.col("s")).alias("up"),
        fns["substr"](F.col("s"), 1, 5).alias("sub"),
        fns["strbefore"](F.col("s"), " ").alias("before"),
        fns["strafter"](F.col("s"), " ").alias("after"),
        fns["strbefore"](F.col("s"), "zzz").alias("before_missing"),
        fns["sha256"](F.col("s")).alias("h"),
        fns["year"](F.col("ts")).alias("y"),
        fns["if"](F.lit(True), F.lit("a"), F.lit("b")).alias("iff"),
        fns["langmatches"](F.lit("fr-CA"), "fr").alias("lm"),
    ).collect()[0]
    assert row["len"] == 11 and row["up"] == "HELLO WORLD" and row["sub"] == "Hello"
    assert row["before"] == "Hello" and row["after"] == "World"
    assert row["before_missing"] == ""
    assert len(row["h"]) == 64 and row["y"] == 2026 and row["iff"] == "a" and row["lm"]
    sha224 = sha224_udf()
    out = df.select(sha224(F.col("s")).alias("h224")).collect()[0]["h224"]
    import hashlib
    assert out == hashlib.sha224(b"Hello World").hexdigest()


def test_streaming_ingest(spark, transcripts_pdf, tmp_path):
    from jena_spark.schemas import TRANSCRIPTS_SCHEMA
    from jena_spark.streaming.ingest import start_ingest
    from jena_spark.pipeline.extract import raw_triples
    from jena_spark.pipeline.materialize import triple_set

    tdf, _ = transcripts_pdf
    inp = str(tmp_path / "in")
    spark.createDataFrame(tdf.head(60), TRANSCRIPTS_SCHEMA).write.parquet(inp)
    out = str(tmp_path / "out")
    q = start_ingest(spark, inp, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = triple_set(spark.read.parquet(out))
    want = triple_set(raw_triples(
        spark.createDataFrame(tdf.head(60), TRANSCRIPTS_SCHEMA)))
    assert got == want


def test_term_constructors_and_accessors(spark):
    """E_IRI/E_BNode/E_StrDatatype/E_StrLang + E_Str/E_Datatype/E_Lang
    + E_Is* over the struct term model."""
    from jena_spark.functions import scalar as SC

    df = spark.createDataFrame([("x", "5", "en")], "rel string, num string, lg string")
    out = df.select(
        SC.term_str(SC.make_iri(F.col("rel"), base="http://b/")).alias("iri"),
        SC.term_str(SC.make_iri(F.lit("https://abs/x"), base="http://b/")).alias("abs_iri"),
        SC.is_blank(SC.make_bnode(F.col("rel"))).alias("isb"),
        SC.term_datatype(SC.make_strdt(F.col("num"), "http://www.w3.org/2001/XMLSchema#integer")).alias("dt"),
        SC.is_numeric(SC.make_strdt(F.col("num"), "http://www.w3.org/2001/XMLSchema#integer")).alias("isnum"),
        SC.is_numeric(SC.make_strdt(F.lit("abc"), "http://www.w3.org/2001/XMLSchema#integer")).alias("isnum_bad"),
        SC.term_lang(SC.make_strlang(F.lit("hi"), F.col("lg"))).alias("lang"),
        SC.term_lang(SC.make_iri(F.col("rel"))).alias("lang_iri"),
        SC.term_datatype(SC.make_strlang(F.lit("hi"), F.col("lg"))).alias("dt_lang"),
    ).collect()[0]
    assert out["iri"] == "http://b/x"
    assert out["abs_iri"] == "https://abs/x"
    assert out["isb"] is True
    assert out["dt"] == "http://www.w3.org/2001/XMLSchema#integer"
    assert out["isnum"] is True and out["isnum_bad"] is False
    assert out["lang"] == "en" and out["lang_iri"] == ""
    assert out["dt_lang"] == "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def test_regex_flags(spark):
    """E_Regex / E_StrReplace flag translation (i/s/m/x/q)."""
    import pytest as _pytest

    from jena_spark.functions.scalar import sparql_regex, sparql_replace

    df = spark.createDataFrame([("Hello\nWorld", "a.b")], "s string, lit string")
    row = df.select(
        sparql_regex(F.col("s"), "hello", "i").alias("ci"),
        sparql_regex(F.col("s"), "hello", None).alias("cs"),
        sparql_regex(F.col("s"), "Hello.World", "s").alias("dotall"),
        sparql_regex(F.col("s"), "^World", "m").alias("multi"),
        sparql_regex(F.col("lit"), "a.b", "q").alias("quoted"),
        sparql_regex(F.lit("axb"), "a.b", "q").alias("quoted_no"),
        sparql_replace(F.col("s"), "hello", "Bye", "i").alias("rep"),
    ).collect()[0]
    assert row["ci"] is True and row["cs"] is False
    assert row["dotall"] is True and row["multi"] is True
    assert row["quoted"] is True and row["quoted_no"] is False
    assert row["rep"] == "Bye\nWorld"
    with _pytest.raises(ValueError, match="unsupported regex flags"):
        sparql_regex(F.col("s"), "x", "z")


def test_custom_datatype_registry(spark):
    """TypeMapper analog: registered datatype feeds the o_num shadow."""
    from jena_spark.pipeline.shadows import (
        register_datatype,
        registered_datatypes,
        with_typed_shadows,
    )

    dt = "http://ex.org/percent"
    register_datatype(dt, lambda c: F.regexp_replace(c, "%$", "").try_cast("decimal(38,18)") / 100)
    assert dt in registered_datatypes()
    rows = [
        ("bnode", "_:a", "http://ex.org/p", "literal", "75%", dt, None),
        ("bnode", "_:a", "http://ex.org/p", "literal", "oops", dt, None),
        ("bnode", "_:a", "http://ex.org/p", "literal", "5",
         "http://www.w3.org/2001/XMLSchema#integer", None),
    ]
    df = spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string, "
              "o_val string, o_datatype string, o_lang string")
    out = {r["o_val"]: r["o_num"] for r in with_typed_shadows(df).collect()}
    assert float(out["75%"]) == 0.75
    assert out["oops"] is None  # invalid lexical form -> NULL shadow
    assert float(out["5"]) == 5.0


def test_operator_family_functions(spark):
    """E_* operator families via the registry: arithmetic, comparison,
    logical, dynamic call, timezone, casts."""
    from jena_spark.functions.scalar import SPARQL_FUNCTIONS as FN
    from jena_spark.functions.scalar import call

    df = spark.createDataFrame(
        [(6, 3, "2024-03-05 10:30:00")], "a long, b long, t string"
    ).withColumn("ts", F.col("t").cast("timestamp"))
    row = df.select(
        FN["add"](F.col("a"), F.col("b")).alias("add"),
        FN["divide"](F.col("a"), F.col("b")).alias("div"),
        FN["unary_minus"](F.col("a")).alias("neg"),
        FN["gt"](F.col("a"), F.col("b")).alias("gt"),
        FN["and"](F.col("a") > 0, F.col("b") > 0).alias("conj"),
        FN["not"](F.col("a") > 0).alias("neg_b"),
        FN["not_in"](F.col("a"), 1, 2, 3).alias("nin"),
        FN["cast"](F.lit("12"), "long").alias("cast_ok"),
        FN["cast"](F.lit("xy"), "long").alias("cast_bad"),
        FN["timezone"](F.lit("2024-03-05T10:30:00Z")).alias("tz"),
        FN["timezone"](F.lit("2024-03-05T10:30:00+05:30")).alias("tz_ist"),
        FN["timezone"](F.lit("2024-03-05T10:30:00-08:00")).alias("tz_pst"),
        FN["timezone"](F.lit("2024-03-05T10:30:00")).alias("tz_none"),
        call("strlen", F.lit("abcd")).alias("via_call"),
        FN["version"]().alias("ver"),
    ).collect()[0]
    assert row["add"] == 9 and row["div"] == 2.0 and row["neg"] == -6
    assert row["gt"] is True and row["conj"] is True and row["neg_b"] is False
    assert row["nin"] is True
    assert row["cast_ok"] == 12 and row["cast_bad"] is None
    # TIMEZONE() reads the literal's OWN zone from the lexical form
    assert row["tz"] == "PT0S"
    assert row["tz_ist"] == "PT5H30M" and row["tz_pst"] == "-PT8H"
    assert row["tz_none"] is None  # zoneless -> error value
    assert row["via_call"] == 4
    assert row["ver"].startswith("jena-spark/")
    # uuid family: shape only (nondeterministic by design, like E_Random)
    u = spark.range(1).select(FN["struuid"]().alias("u")).collect()[0]["u"]
    assert len(u) == 36 and u.count("-") == 4
    import pytest as _pytest

    with _pytest.raises(KeyError):
        call("no_such_function", F.lit(1))


def test_real_netpbm_and_wav_decode():
    """Round-3: the image/audio decode is REAL for netpbm/WAV (pure
    numpy) — exact round-trips, not fakes."""
    import numpy as np

    from jena_spark.data.multimodal import (
        decode_audio,
        decode_image,
        encode_ppm,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    img = decode_image(encode_ppm(px))
    assert img.shape == (5, 9)
    assert np.array_equal(img, px.mean(axis=2).astype(np.uint8))
    # P5 grayscale + comment header
    p5 = b"P5\n# a comment\n4 2\n255\n" + bytes(range(8))
    g = decode_image(p5)
    assert g.shape == (2, 4) and g[1, 3] == 7
    assert decode_image(b"\x89PNG....") is None  # fallback signal

    samples = rng.integers(-3000, 3000, size=1600, dtype=np.int16)
    back, rate = decode_audio(encode_wav_pcm16(samples, rate=8000))
    assert rate == 8000 and np.array_equal(back, samples)
    assert decode_audio(b"not-a-wav") is None


def test_features_use_real_decode(spark):
    """synthetic_media carries genuine PPM/WAV payloads; the features
    must equal an independent numpy computation (no fake path)."""
    import hashlib

    import numpy as np

    from jena_spark.data import multimodal as MM

    media = MM.synthetic_media(spark, n=9, seed=11)
    feats = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    raw = {r["media_id"]: r for r in media.collect()}
    for mid, r in raw.items():
        content = bytes(r["content"])
        if r["kind"] == "image":
            img = MM.decode_image(content)
            assert img is not None  # the REAL path decoded it
            assert feats[mid]["mean_intensity"] == float(img.mean())
            assert feats[mid]["feature_hash"] == hashlib.sha256(
                img.tobytes()).hexdigest()[:16]
        elif r["kind"] == "audio":
            samples, rate = MM.decode_audio(content)
            assert rate == 16_000
            assert feats[mid]["mean_intensity"] == float(
                np.abs(samples).mean()) / 128.0


def test_pii_redaction(spark):
    """Redaction order and counts: email hosts never double-count as
    IPs, phone never eats an SSN, all-categories text scrubs fully."""
    from jena_spark.data.redact import redact_docs

    rows = [
        (1, "mail a@b.co and c.d+x@e-f.org end"),
        (2, "ip 10.0.0.1 and 255.255.255.255 ssn 123-45-6789"),
        (3, "call +1 555-0100 or +44 20 7946 0958 now"),
        (4, "clean text with numbers 12345 and dots a.b"),
        (5, "combo x@y.io 192.168.1.1 111-22-3333 +1 555-0199"),
        # domestic formats (ADVICE r3 recall gap): parenthesized area
        # code, dash-joined, dot-joined; space-only triples stay
        (6, "call (415) 555-0134 or 415-555-0134 or 415.555.0134"),
        (7, "meeting room 415 at 555 until 0134 stays"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_docs(df).collect()}
    assert got[1]["redacted"] == "mail [EMAIL] and [EMAIL] end"
    assert got[1]["n_email"] == 2 and got[1]["n_ip"] == 0
    assert got[2]["redacted"] == "ip [IP] and [IP] ssn [SSN]"
    assert got[2]["n_ip"] == 2 and got[2]["n_ssn"] == 1
    assert got[3]["redacted"] == "call [PHONE] or [PHONE] now"
    assert got[3]["n_phone"] == 2
    assert got[4]["redacted"] == rows[3][1]  # untouched
    assert got[5]["redacted"] == "combo [EMAIL] [IP] [SSN] [PHONE]"
    assert (got[5]["n_email"], got[5]["n_ip"], got[5]["n_ssn"],
            got[5]["n_phone"]) == (1, 1, 1, 1)
    assert got[6]["redacted"] == "call [PHONE] or [PHONE] or [PHONE]"
    assert got[6]["n_phone"] == 3
    assert got[7]["redacted"] == rows[6][1]  # bare digit triples stay


def test_pii_census_conversations(spark):
    """Conversation rollup: per-category totals sum over turns,
    n_pii_turns counts turns with ANY hit once, clean flags only
    fully PII-free conversations."""
    from jena_spark.data.redact import pii_census_conversations

    rows = [
        ("c1", "user", "mail a@b.co please"),
        ("c1", "assistant", "noted, also 10.0.0.1 is up"),
        ("c1", "user", "thanks"),
        ("c2", "user", "all clean here"),
        ("c2", "assistant", "indeed clean"),
        # one turn, two categories -> n_pii_turns counts it ONCE
        ("c3", "user", "x 1.2.3.4 and 999-88-7777"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, role string, "
                                     "text string")
    got = {r["conv_id"]: r for r in pii_census_conversations(df).collect()}
    assert (got["c1"]["n_email"], got["c1"]["n_ip"],
            got["c1"]["n_pii_turns"], got["c1"]["clean"]) == (1, 1, 2, 0)
    assert got["c2"]["n_pii_turns"] == 0 and got["c2"]["clean"] == 1
    assert (got["c3"]["n_ip"], got["c3"]["n_ssn"],
            got["c3"]["n_pii_turns"], got["c3"]["clean"]) == (1, 1, 1, 0)


def test_repetition_stats(spark):
    """Bigram repetition fraction: repeated boilerplate scores high,
    all-distinct text scores 1/total, short docs are omitted."""
    from jena_spark.data.text import repetition_stats

    rows = [
        (1, "buy now buy now buy now"),          # "buy now" x3, "now buy" x2
        (2, "a b c d e"),                        # 4 distinct bigrams
        (3, "word"),                             # < 2 words -> omitted
        (4, "  "),                               # empty -> omitted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert set(got) == {1, 2}
    assert (got[1]["n_grams"], got[1]["max_freq"]) == (5, 3)
    assert got[1]["rep_frac"] == 0.6
    assert (got[2]["n_grams"], got[2]["max_freq"]) == (4, 1)
    assert got[2]["rep_frac"] == 0.25


def test_temporal_shadows(spark):
    """duration/Gregorian value-space shadows (XSDDatatype.java:
    174-195): durations split into XPath's two comparison dimensions,
    Gregorian lexicals anchor on reference instants (leap year 2000
    keeps --02-29), invalid lexicals and explicit ±offsets stay NULL."""
    from datetime import datetime

    from jena_spark.pipeline.shadows import with_typed_shadows

    X = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        (1, "P1Y2M3DT4H5M6.5S", X + "duration"),
        (2, "-P10M", X + "yearMonthDuration"),
        (3, "PT90M", X + "dayTimeDuration"),
        (4, "garbage", X + "duration"),
        (5, "2024", X + "gYear"),
        (6, "--02-29", X + "gMonthDay"),
        (7, "---05", X + "gDay"),
        (8, "--11", X + "gMonth"),
        (9, "13:45:06", X + "time"),
        (10, "2024-03-05Z", X + "date"),
        (11, "2024-03", X + "gYearMonth"),
        (12, "2024-03-05+05:00", X + "date"),  # offsets out of profile
    ]
    df = spark.createDataFrame(
        [("iri", f"e{i}", "p", "literal", v, dt, None)
         for i, v, dt in rows],
        "s_kind string, s_val string, p_val string, o_kind string,"
        "o_val string, o_datatype string, o_lang string")
    got = {r["s_val"]: r for r in with_typed_shadows(df).collect()}
    assert (got["e1"]["o_dur_months"],
            int(got["e1"]["o_dur_secs"])) == (14, 273906)
    assert got["e2"]["o_dur_months"] == -10
    assert (got["e3"]["o_dur_months"],
            int(got["e3"]["o_dur_secs"])) == (0, 5400)
    assert got["e4"]["o_dur_months"] is None \
        and got["e4"]["o_dur_secs"] is None
    assert got["e5"]["o_ts"] == datetime(2024, 1, 1)
    assert got["e6"]["o_ts"] == datetime(2000, 2, 29)
    assert got["e7"]["o_ts"] == datetime(2000, 1, 5)
    assert got["e8"]["o_ts"] == datetime(2000, 11, 1)
    assert got["e9"]["o_ts"] == datetime(1970, 1, 1, 13, 45, 6)
    assert got["e10"]["o_ts"] == datetime(2024, 3, 5)
    assert got["e11"]["o_ts"] == datetime(2024, 3, 1)
    assert got["e12"]["o_ts"] is None
    # value order beats lexical order: P10M > P2M in months
    from jena_spark.pipeline.shadows import duration_months
    from pyspark.sql import functions as F
    two = spark.createDataFrame([("P10M",), ("P2M",)], "v string") \
        .select(duration_months(F.col("v")).alias("m")).collect()
    assert sorted(r["m"] for r in two) == [2, 10]
