"""JSON-LD reader/writer tests (JsonLDReader parity, restricted
profile: inline contexts, node/value objects, lists, @graph)."""

from __future__ import annotations

import pytest

from jena_spark.sources.jsonld import (
    RDF_NS,
    XSD,
    format_jsonld,
    parse_jsonld,
    read_jsonld,
    write_jsonld,
)


def test_parse_context_and_terms():
    doc = """{
      "@context": {
        "ex": "http://e/",
        "name": "http://e/name",
        "knows": {"@id": "http://e/knows", "@type": "@id"},
        "age": {"@id": "http://e/age", "@type": "http://www.w3.org/2001/XMLSchema#integer"},
        "@vocab": "http://v/"
      },
      "@id": "http://e/alice",
      "@type": ["ex:Person", "Agent"],
      "name": "Alice",
      "knows": ["http://e/bob", "_:b1"],
      "age": "30",
      "nick": {"@value": "Al", "@language": "en"},
      "score": 7,
      "ok": true
    }"""
    rows = set(parse_jsonld(doc))
    A = "http://e/alice"
    assert ("iri", A, RDF_NS + "type", "iri", "http://e/Person", None, None) in rows
    assert ("iri", A, RDF_NS + "type", "iri", "http://v/Agent", None, None) in rows
    assert ("iri", A, "http://e/name", "literal", "Alice", None, None) in rows
    assert ("iri", A, "http://e/knows", "iri", "http://e/bob", None, None) in rows
    assert ("iri", A, "http://e/knows", "bnode", "_:b1", None, None) in rows
    assert ("iri", A, "http://e/age", "literal", "30", XSD + "integer", None) in rows
    assert ("iri", A, "http://v/nick", "literal", "Al", None, "en") in rows
    assert ("iri", A, "http://v/score", "literal", "7", XSD + "integer", None) in rows
    assert ("iri", A, "http://v/ok", "literal", "true", XSD + "boolean", None) in rows


def test_parse_graph_nesting_and_lists():
    doc = """{
      "@context": {"p": "http://e/p", "l": "http://e/l"},
      "@graph": [
        {"@id": "http://e/s", "p": {"@id": "http://e/mid", "p": "deep"},
         "l": {"@list": ["a", "b"]}},
        {"p": "anon subject"}
      ]
    }"""
    rows = parse_jsonld(doc)
    assert ("iri", "http://e/s", "http://e/p", "iri", "http://e/mid",
            None, None) in rows
    assert ("iri", "http://e/mid", "http://e/p", "literal", "deep",
            None, None) in rows
    firsts = {r[4] for r in rows if r[2] == RDF_NS + "first"}
    assert firsts == {"a", "b"}
    anon = [r for r in rows if r[4] == "anon subject"]
    assert anon and anon[0][0] == "bnode"
    # deterministic anonymous labels
    assert rows == parse_jsonld(doc)


def test_parse_unsupported():
    with pytest.raises(ValueError, match="remote @context"):
        parse_jsonld('{"@context": "http://schema.org/", "@id": "http://e/x"}')
    with pytest.raises(ValueError, match="unsupported"):
        parse_jsonld('{"@id": "http://e/x", "@index": "a"}')


def test_format_parse_roundtrip_pure():
    rows = [
        ("iri", "http://e/s", RDF_NS + "type", "iri", "http://e/T", None, None),
        ("iri", "http://e/s", "http://e/p", "literal", 'u "q" \n t', None, None),
        ("iri", "http://e/s", "http://e/p", "literal", "5", XSD + "integer", None),
        ("iri", "http://e/s", "http://e/q", "literal", "oui", None, "fr"),
        ("bnode", "_:b0", "http://e/r", "iri", "http://e/o", None, None),
        ("iri", "http://e/s", "http://e/r", "bnode", "_:b0", None, None),
    ]
    assert set(parse_jsonld(format_jsonld(rows))) == set(rows)


def test_jsonld_distributed_equals_ntriples(spark, transcripts_df, tmp_path):
    from jena_spark import terms as TM
    from jena_spark.pipeline.extract import raw_triples
    from jena_spark.sources.ntriples import read_ntriples, write_ntriples

    triples = raw_triples(transcripts_df).select(*TM.TERM_COLS).limit(200)
    nt, jl = str(tmp_path / "g.nt"), str(tmp_path / "g.jsonld")
    write_ntriples(triples, nt)
    write_jsonld(triples, jl)
    from_nt = {tuple(r) for r in
               read_ntriples(spark, nt).select(*TM.TERM_COLS).collect()}
    from_jl = {tuple(r) for r in
               read_jsonld(spark, jl + "/part-*").select(*TM.TERM_COLS).collect()}
    assert from_jl == from_nt and len(from_jl) == 200


def test_reverse_and_default_language():
    """Round-3 profile extensions: node-level @reverse, context
    @reverse term definitions, context default @language."""
    doc = """{
      "@context": {
        "@language": "en",
        "ex": "http://e/",
        "name": "http://e/name",
        "childOf": {"@reverse": "http://e/parentOf"}
      },
      "@id": "http://e/alice",
      "name": "Alice",
      "childOf": {"@id": "http://e/bob"},
      "@reverse": {"ex:knows": [{"@id": "http://e/carol"}]}
    }"""
    rows = set(parse_jsonld(doc))
    # default language applies to the plain string
    assert ("iri", "http://e/alice", "http://e/name", "literal", "Alice",
            None, "en") in rows
    # context @reverse term: (bob, parentOf, alice)
    assert ("iri", "http://e/bob", "http://e/parentOf", "iri",
            "http://e/alice", None, None) in rows
    # node-level @reverse: (carol, knows, alice)
    assert ("iri", "http://e/carol", "http://e/knows", "iri",
            "http://e/alice", None, None) in rows
    assert len(rows) == 3

    # explicit value objects are NOT language-tagged by the default
    doc2 = """{
      "@context": {"@language": "fr", "p": "http://e/p"},
      "@id": "http://e/s",
      "p": [{"@value": "plain"}, "tagged", {"@value": "de", "@language": "de"}]
    }"""
    rows2 = set(parse_jsonld(doc2))
    assert ("iri", "http://e/s", "http://e/p", "literal", "plain", None, None) in rows2
    assert ("iri", "http://e/s", "http://e/p", "literal", "tagged", None, "fr") in rows2
    assert ("iri", "http://e/s", "http://e/p", "literal", "de", None, "de") in rows2

    import pytest

    with pytest.raises(ValueError, match="@reverse"):
        parse_jsonld(
            '{"@id": "http://e/s", "@reverse": {"http://e/p": {"@value": "x"}}}'
        )


def test_container_term_definitions():
    """@container handling (JsonLDReader / JSON-LD 1.0 deserialization):
    @list containers chain implicit arrays, @language containers expand
    language maps, @index maps flatten (no RDF meaning), @set is a
    no-op, anything else errors loudly."""
    doc = """{
      "@context": {
        "steps": {"@id": "http://e/steps", "@container": "@list"},
        "label": {"@id": "http://e/label", "@container": "@language"},
        "byidx": {"@id": "http://e/byidx", "@container": "@index"},
        "tags": {"@id": "http://e/tags", "@container": "@set"}
      },
      "@id": "http://e/s",
      "steps": ["a", "b"],
      "label": {"en": "cat", "fr": ["chat", "minou"]},
      "byidx": {"k1": "v1", "k2": ["v2", "v3"]},
      "tags": ["t1", "t2"]
    }"""
    rows = parse_jsonld(doc)
    S = "http://e/s"
    # @list: one chain hangs off steps
    heads = [r for r in rows if r[2] == "http://e/steps"]
    assert len(heads) == 1 and heads[0][3] == "bnode"
    firsts = [r[4] for r in rows if r[2] == RDF_NS + "first"]
    assert firsts == ["a", "b"]
    # @language map: one tagged literal per (lang, value)
    labels = {(r[4], r[6]) for r in rows if r[2] == "http://e/label"}
    assert labels == {("cat", "en"), ("chat", "fr"), ("minou", "fr")}
    # @index: values flattened, index keys dropped
    byidx = {r[4] for r in rows if r[2] == "http://e/byidx"}
    assert byidx == {"v1", "v2", "v3"}
    # @set: plain multi-value
    tags = {r[4] for r in rows if r[2] == "http://e/tags"}
    assert tags == {"t1", "t2"}

    with pytest.raises(ValueError, match="@language container"):
        parse_jsonld("""{
          "@context": {"l": {"@id": "http://e/l", "@container": "@language"}},
          "@id": "http://e/s", "l": "plain"}""")
    with pytest.raises(ValueError, match="language-map values"):
        parse_jsonld("""{
          "@context": {"l": {"@id": "http://e/l", "@container": "@language"}},
          "@id": "http://e/s", "l": {"en": 5}}""")
    with pytest.raises(ValueError, match="unsupported"):
        parse_jsonld("""{
          "@context": {"m": {"@id": "http://e/m", "@container": "@nope"}},
          "@id": "http://e/s", "m": {"http://e/a": {}}}""")
    # implicit single value through a @list container is still a list
    single = parse_jsonld("""{
      "@context": {"steps": {"@id": "http://e/steps", "@container": "@list"}},
      "@id": "http://e/s", "steps": "only"}""")
    assert [r[4] for r in single if r[2] == RDF_NS + "first"] == ["only"]


def test_container_id_and_type_node_maps():
    """JSON-LD 1.1 node maps: @container:@id keys become @id,
    @container:@type keys add @type, @none keys supply nothing."""
    doc = """{
      "@context": {
        "ex": "http://e/",
        "byId": {"@id": "http://e/member", "@container": "@id"},
        "byType": {"@id": "http://e/item", "@container": ["@type"]}
      },
      "@id": "http://e/root",
      "byId": {
        "http://e/m1": {"http://e/name": "one"},
        "http://e/m2": {"@id": "http://e/explicit", "http://e/name": "two"},
        "@none": {"http://e/name": "anon"}
      },
      "byType": {
        "http://e/Widget": {"@id": "http://e/w1"},
        "@none": {"@id": "http://e/w2"}
      }
    }"""
    rows = set(parse_jsonld(doc))
    R = "http://e/root"
    assert ("iri", R, "http://e/member", "iri", "http://e/m1", None, None) in rows
    assert ("iri", "http://e/m1", "http://e/name", "literal", "one", None, None) in rows
    # explicit @id wins over the map key
    assert ("iri", R, "http://e/member", "iri", "http://e/explicit", None, None) in rows
    assert not any(r[4] == "http://e/m2" for r in rows)
    # @none: value kept, no @id from key -> bnode member with the name
    assert any(r[2] == "http://e/member" and r[3] == "bnode" for r in rows)
    assert any(r[2] == "http://e/name" and r[4] == "anon" for r in rows)
    # type map
    assert ("iri", R, "http://e/item", "iri", "http://e/w1", None, None) in rows
    assert ("iri", "http://e/w1", RDF_NS + "type", "iri", "http://e/Widget",
            None, None) in rows
    assert ("iri", R, "http://e/item", "iri", "http://e/w2", None, None) in rows
    assert not any(r[1] == "http://e/w2" and r[2] == RDF_NS + "type" for r in rows)


def test_container_id_map_rejects_value_objects():
    doc = """{
      "@context": {"byId": {"@id": "http://e/p", "@container": "@id"}},
      "@id": "http://e/r",
      "byId": {"http://e/x": {"@value": "nope"}}
    }"""
    with pytest.raises(ValueError, match="node objects"):
        parse_jsonld(doc)


def test_container_array_with_set():
    doc = """{
      "@context": {"byId": {"@id": "http://e/m", "@container": ["@id", "@set"]},
                   "tags": {"@id": "http://e/t", "@container": ["@set"]}},
      "@id": "http://e/r",
      "byId": {"http://e/a": {"http://e/name": "x"}},
      "tags": ["t1", "t2"]
    }"""
    rows = set(parse_jsonld(doc))
    assert ("iri", "http://e/r", "http://e/m", "iri", "http://e/a", None, None) in rows
    assert {r[4] for r in rows if r[2] == "http://e/t"} == {"t1", "t2"}


def test_named_graph_node_objects_quads():
    """JSON-LD 1.1 named-graph node objects: the node's id names the
    graph for its @graph children; the node's own properties stay in
    the parent (default) graph; plain nodes land in the default graph."""
    from jena_spark.sources.jsonld import parse_jsonld_quads

    doc = """{
      "@context": {"p": "http://e/p", "name": "http://e/name"},
      "@graph": [
        {"@id": "http://e/g1", "name": "graph one",
         "@graph": [{"@id": "http://e/a", "p": "in g1"}]},
        {"@id": "http://e/plain", "p": "default"}
      ]
    }"""
    rows = set(parse_jsonld_quads(doc))
    assert ("iri", "http://e/a", "http://e/p", "literal", "in g1",
            None, None, "http://e/g1") in rows
    # the graph node's own property is in the DEFAULT graph
    assert ("iri", "http://e/g1", "http://e/name", "literal", "graph one",
            None, None, None) in rows
    assert ("iri", "http://e/plain", "http://e/p", "literal", "default",
            None, None, None) in rows
    # triple API merges into the default graph view
    assert {r[:7] for r in rows} == set(parse_jsonld(doc))


def test_jsonld_quads_roundtrip_and_trig_equality(spark, tmp_path):
    """write_jsonld_quads -> read_jsonld(quads=True) is lossless, and
    the same quads through the TriG writer/reader land identically."""
    from jena_spark.sources.jsonld import read_jsonld, write_jsonld_quads
    from jena_spark.sources.turtle import read_trig, write_trig

    rows = [
        ("iri", "http://e/s", "http://e/p", "literal", "x", None, None, None),
        ("iri", "http://e/s", "http://e/p", "iri", "http://e/o", None, None,
         "http://e/g1"),
        ("bnode", "_:b0", "http://e/q", "literal", "5",
         XSD + "integer", None, "http://e/g2"),
    ]
    schema = ("s_kind string, s_val string, p_val string, o_kind string,"
              "o_val string, o_datatype string, o_lang string, graph string")
    quads = spark.createDataFrame(rows, schema)
    jl = str(tmp_path / "g.jsonld")
    tg = str(tmp_path / "g.trig")
    write_jsonld_quads(quads, jl)
    write_trig(quads, tg)
    cols = ["s_kind", "s_val", "p_val", "o_kind", "o_val",
            "o_datatype", "o_lang", "graph"]
    from_jl = {tuple(r) for r in
               read_jsonld(spark, jl, quads=True).select(*cols).collect()}
    from_tg = {tuple(r) for r in
               read_trig(spark, tg).select(*cols).collect()}
    assert from_jl == set(rows) == from_tg


def test_graph_container():
    """JSON-LD 1.1 @container:@graph — each value becomes its own
    bnode-named graph linked from the subject (expansion 13.9)."""
    from jena_spark.sources.jsonld import parse_jsonld, parse_jsonld_quads

    doc = """{
      "@context": {
        "claims": {"@id": "http://e/claims", "@container": "@graph"},
        "p": "http://e/p"
      },
      "@id": "http://e/s",
      "claims": [
        {"@id": "http://e/a", "p": "one"},
        {"@id": "http://e/b", "p": "two"}
      ]
    }"""
    rows = set(parse_jsonld_quads(doc))
    links = sorted(r for r in rows if r[2] == "http://e/claims")
    assert len(links) == 2 and all(
        r[0] == "iri" and r[1] == "http://e/s" and r[3] == "bnode"
        and r[7] is None for r in links)
    g1, g2 = links[0][4], links[1][4]
    assert g1 != g2
    graphs = {r[7] for r in rows if r[2] == "http://e/p"}
    assert graphs == {g1, g2}
    inner = {(r[1], r[4], r[7]) for r in rows if r[2] == "http://e/p"}
    assert ("http://e/a", "one", g1) in inner or ("http://e/a", "one", g2) in inner
    # deterministic across parses (skolem of document hash)
    assert set(parse_jsonld_quads(doc)) == rows
    # triple API merges graphs away but keeps all triples
    assert {r[:7] for r in rows} == set(parse_jsonld(doc))
    # literal values are rejected loudly
    bad = """{
      "@context": {"c": {"@id": "http://e/c", "@container": "@graph"}},
      "@id": "http://e/s", "c": "scalar"
    }"""
    import pytest as _pytest
    with _pytest.raises(ValueError, match="@graph-container"):
        parse_jsonld(bad)


def test_remote_context_map():
    """Remote @context URL resolved OFFLINE from a caller-supplied map
    — both a bare context value and a full remote document; a URL
    absent from the map refuses loudly."""
    import json

    url = "https://schema.example/ctx.jsonld"
    doc = json.dumps({
        "@context": url,
        "@id": "http://e/s",
        "name": "Ada",
        "knows": {"@id": "http://e/o"},
    })
    ctx = {"name": "http://e/name",
           "knows": {"@id": "http://e/knows", "@type": "@id"}}
    want = {
        ("iri", "http://e/s", "http://e/name", "literal", "Ada", None, None),
        ("iri", "http://e/s", "http://e/knows", "iri", "http://e/o",
         None, None),
    }
    # bare context value
    assert set(parse_jsonld(doc, context_map={url: ctx})) == want
    # full remote context DOCUMENT ({"@context": ...} wrapper)
    assert set(parse_jsonld(doc, context_map={url: {"@context": ctx}})) == want
    # refusal without the map
    with pytest.raises(ValueError, match="refusing to fetch"):
        parse_jsonld(doc)
    # list contexts mix remote + inline
    doc2 = json.dumps({
        "@context": [url, {"age": "http://e/age"}],
        "@id": "http://e/s", "name": "Ada", "age": 3,
    })
    got = set(parse_jsonld(doc2, context_map={url: ctx}))
    assert ("iri", "http://e/s", "http://e/age", "literal", "3",
            XSD + "integer", None) in got


def test_remote_context_roundtrip_spark(spark, tmp_path):
    """read_jsonld ships the context map to executors — a directory of
    remote-@context documents parses without network."""
    import json

    url = "https://schema.example/ctx.jsonld"
    d = tmp_path / "docs"
    d.mkdir()
    for i in range(3):
        (d / f"doc{i}.jsonld").write_text(json.dumps({
            "@context": url,
            "@id": f"http://e/s{i}", "name": f"n{i}",
        }))
    out = read_jsonld(spark, str(d), context_map={
        url: {"name": "http://e/name"}})
    got = {(r["s_val"], r["o_val"]) for r in out.collect()}
    assert got == {(f"http://e/s{i}", f"n{i}") for i in range(3)}


def test_frame_jsonld():
    """Framing-lite: @type matcher, context compaction, embed-once
    nesting, cycle termination, property-presence matcher."""
    from jena_spark.sources.jsonld import frame_jsonld

    E = "http://e/"
    rows = [
        ("iri", E + "lib", RDF_NS + "type", "iri", E + "Library", None, None),
        ("iri", E + "lib", E + "contains", "iri", E + "book", None, None),
        ("iri", E + "book", RDF_NS + "type", "iri", E + "Book", None, None),
        ("iri", E + "book", E + "title", "literal", "Dracula", None, None),
        ("iri", E + "book", E + "pages", "literal", "418",
         XSD + "integer", None),
        # cycle back to the library
        ("iri", E + "book", E + "heldBy", "iri", E + "lib", None, None),
    ]
    frame = {
        "@context": {"ex": E, "contains": E + "contains",
                     "title": E + "title", "pages": E + "pages",
                     "heldBy": E + "heldBy"},
        "@type": "ex:Library",
    }
    out = frame_jsonld(rows, frame)
    assert out["@context"] == frame["@context"]
    [lib] = out["@graph"]
    assert lib["@id"] == "ex:lib" and lib["@type"] == "ex:Library"
    book = lib["contains"]
    assert book["@type"] == "ex:Book" and book["title"] == "Dracula"
    assert book["pages"]["@value"] == "418"
    # the cycle stays a reference — lib is already embedded
    assert book["heldBy"] == {"@id": "ex:lib"}

    # property-presence matcher selects only subjects carrying title
    out2 = frame_jsonld(rows, {"@context": frame["@context"],
                               "title": {}})
    assert [n["@id"] for n in out2["@graph"]] == ["ex:book"]

    # unsupported keywords refuse loudly
    with pytest.raises(ValueError, match="unsupported"):
        frame_jsonld(rows, {"@explicit": True})


def _ctx_server(ctx_doc: dict):
    """Tiny HTTP server serving one JSON context document (the
    reference fetches remote contexts through jsonld-java's
    DocumentLoader; FusekiLite serves SPARQL, not static docs, so the
    stub here plays the remote host)."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: N802
            pass

        def do_GET(self):  # noqa: N802
            body = _json.dumps(ctx_doc).encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "application/ld+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address[:2]
    return srv, f"http://{host}:{port}/ctx.jsonld"


def test_remote_context_http_fetch(spark, tmp_path):
    """Opt-in fetch=True resolves an absent @context URL over real
    HTTP (process-cached); offline default is unchanged."""
    import json

    from jena_spark.sources.jsonld import _FETCH_CACHE

    srv, url = _ctx_server(
        {"@context": {"name": "http://e/name",
                      "knows": {"@id": "http://e/knows",
                                "@type": "@id"}}})
    try:
        doc = json.dumps({
            "@context": url, "@id": "http://e/s",
            "name": "Ada", "knows": {"@id": "http://e/o"},
        })
        # offline default still refuses
        with pytest.raises(ValueError, match="refusing to fetch"):
            parse_jsonld(doc)
        got = set(parse_jsonld(doc, fetch=True))
        assert got == {
            ("iri", "http://e/s", "http://e/name", "literal", "Ada",
             None, None),
            ("iri", "http://e/s", "http://e/knows", "iri", "http://e/o",
             None, None),
        }
        assert url in _FETCH_CACHE  # resolved once per process
        # a supplied context_map entry wins over the network
        got2 = set(parse_jsonld(
            doc, context_map={url: {"name": "http://e/other"}}))
        assert ("iri", "http://e/s", "http://e/other", "literal", "Ada",
                None, None) in got2

        # distributed read: executors fetch (local mode shares the
        # process, so this also exercises the executor path shape)
        d = tmp_path / "fdocs"
        d.mkdir()
        for i in range(2):
            (d / f"doc{i}.jsonld").write_text(json.dumps({
                "@context": url, "@id": f"http://e/s{i}",
                "name": f"n{i}"}))
        out = read_jsonld(spark, str(d), fetch=True)
        got3 = {(r["s_val"], r["o_val"]) for r in out.collect()}
        assert got3 == {(f"http://e/s{i}", f"n{i}") for i in range(2)}
    finally:
        srv.shutdown()
    # non-http scheme refused even with fetch=True
    from jena_spark.sources.jsonld import fetch_remote_context
    with pytest.raises(ValueError, match="non-http"):
        fetch_remote_context("file:///etc/passwd")
