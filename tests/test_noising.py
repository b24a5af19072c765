"""Span corruption + FIM (jena_spark.data.noising)."""

import pytest

from jena_spark.data.noising import fim_transform, span_corruption


def _doc(n):
    return " ".join(f"t{i}" for i in range(n))


def test_span_corruption_roundtrip(spark):
    """Replacing each sentinel in `corrupted` by its `targets` span
    reconstructs the original token stream exactly."""
    df = spark.createDataFrame(
        [(1, _doc(45)), (2, "short doc only"), (3, "")],
        "doc_id long, text string")
    out = {r.doc_id: r
           for r in span_corruption(df, block_size=10,
                                    span_len=3).collect()}
    r = out[1]
    assert r.n_spans == 4
    spans, cur = {}, None
    for w in r.targets.split():
        if w.startswith("<extra_id_"):
            cur = w
            spans[cur] = []
        else:
            spans[cur].append(w)
    assert len(spans) == 4 and all(len(v) == 3 for v in spans.values())
    rebuilt = []
    for w in r.corrupted.split():
        rebuilt.extend(spans[w] if w in spans else [w])
    assert rebuilt == _doc(45).split()
    # below one block: untouched passthrough
    assert out[2].n_spans == 0
    assert out[2].corrupted == "short doc only" and out[2].targets == ""
    # empty text
    assert out[3].corrupted == "" and out[3].n_spans == 0


def test_span_corruption_determinism_and_guards(spark):
    df = spark.createDataFrame([(7, _doc(60))], "doc_id long, text string")
    a = span_corruption(df).collect()[0]
    b = span_corruption(df).collect()[0]
    assert a == b
    c = span_corruption(df, salt="other").collect()[0]
    assert c.corrupted != a.corrupted  # salt redraws offsets
    with pytest.raises(ValueError):
        span_corruption(df, span_len=0)
    with pytest.raises(ValueError):
        span_corruption(df, block_size=3, span_len=3)


def test_fim_transform_partition_and_modes(spark):
    df = spark.createDataFrame(
        [(i, f"abcdefghij-{i}-0123456789") for i in range(20)],
        "doc_id long, text string")
    texts = {r.doc_id: r.text for r in df.collect()}
    out = {r.doc_id: r for r in fim_transform(df, rate=1.0).collect()}
    for i, r in out.items():
        assert r.applied == 1
        assert r.n_prefix + r.n_middle + r.n_suffix == len(texts[i])
        body = r.fim_text
        assert body.startswith("<PRE>")
        p, rest = body[5:].split("<SUF>", 1)
        s, m = rest.split("<MID>", 1)
        assert p + m + s == texts[i]
        assert (len(p), len(m), len(s)) == (r.n_prefix, r.n_middle,
                                            r.n_suffix)
    # spm reorders, same pieces
    sp = {r.doc_id: r
          for r in fim_transform(df, rate=1.0, mode="spm").collect()}
    assert all(v.fim_text.startswith("<SUF>") for v in sp.values())
    # rate 0: full passthrough; fractional rate: deterministic subset
    zero = fim_transform(df, rate=0.0).collect()
    assert all(r.applied == 0 and r.fim_text == texts[r.doc_id]
               for r in zero)
    half1 = {r.doc_id: r.applied
             for r in fim_transform(df, rate=0.5).collect()}
    half2 = {r.doc_id: r.applied
             for r in fim_transform(df, rate=0.5).collect()}
    assert half1 == half2 and 0 < sum(half1.values()) < len(half1)
    with pytest.raises(ValueError):
        fim_transform(df, mode="mps")
    with pytest.raises(ValueError):
        fim_transform(df, rate=1.5)
