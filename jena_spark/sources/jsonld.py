"""JSON-LD reader / writer (RIOT parity, restricted profile).

Reference: ``jena-arq/.../riot/lang/JsonLDReader.java`` (term maps with
``@id``/``@value``/``@type``/``@language`` keys, ``:181``), registered
``riot/RDFLanguages.java:94``; writer ``riot/writer/JsonLDWriter``.

Supported profile (documented, errors loudly outside it):

* inline ``@context`` with term -> IRI strings, prefix definitions
  (``"ex": "http://e/"``), and expanded term definitions
  ``{"@id": ..., "@type": "@id" | datatype-IRI}``
* node objects: ``@id`` (IRI or ``_:`` bnode; absent -> deterministic
  per-document skolem bnode), ``@type`` (string or list), nested node
  objects (object embedding), ``@graph`` arrays — top-level (default
  graph) AND named-graph node objects (the node's id names the graph;
  quads via ``parse_jsonld_quads`` / ``read_jsonld(quads=True)``,
  the triple API merges into the default graph)
* value objects: ``@value`` with ``@language`` / ``@type``; JSON
  shorthand scalars (string / number / boolean -> xsd typed literals)
* ``@list`` -> rdf:first/rest/nil
* ``@reverse`` — node-level maps AND context term definitions
  (``{"@reverse": iri}``) emit inverted triples
* context default ``@language`` (applies to plain string values;
  term-level ``@language`` overrides, ``null`` clears)
* ``@container`` term definitions: ``@list`` (implicit rdf list),
  ``@set`` (no-op), ``@language`` (language maps), ``@index`` (index
  stripped, values flattened — the RDF deserialization semantics),
  ``@id`` / ``@type`` node maps (JSON-LD 1.1: map key supplies the
  value's ``@id`` / an extra ``@type``; ``@none`` keys supply nothing),
  ``@graph`` containers (each item gets a fresh bnode-named graph,
  linked from the subject — expansion §13.9 semantics; the triple API
  merges them into the default graph, the quads API keeps them)
* remote ``@context`` URLs resolve OFFLINE through a caller-supplied
  ``context_map={url: context-or-document}`` by default, with an
  opt-in ``fetch=True`` HTTP path (process-cached,
  :func:`fetch_remote_context`) for deployments that allow network
  (the engine otherwise never fetches; a URL absent from the map errors loudly)
* framing-LITE via :func:`frame_jsonld` — @type / property-presence
  matchers, @context compaction, recursive embed-once; @default /
  @explicit / @omitDefault / @embed overrides are out of profile
* NOT supported: network fetches of any kind,
  ``@vocab``-less relative IRI resolution beyond ``@base``/``@vocab``
  prefixes.

One JSON document per file is the parse unit (``wholetext`` +
``mapInPandas`` — per-file parallelism like the other document
formats).
"""

from __future__ import annotations

import hashlib
import json
import re

from pyspark.sql import DataFrame, SparkSession

from jena_spark import terms as TM

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"

TERM_COLS7 = ["s_kind", "s_val", "p_val", "o_kind", "o_val", "o_datatype", "o_lang"]

_ABS = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


#: process-level cache for opt-in remote @context fetches: each
#: driver/executor process resolves a given context URL once (the
#: reference's jsonld-java ``DocumentLoader`` caches the same way).
_FETCH_CACHE: dict[str, object] = {}


def fetch_remote_context(url: str, timeout: float = 30.0) -> object:
    """Opt-in HTTP resolution of a remote ``@context`` URL (the
    reference's ``riot/lang/JsonLDReader.java`` path through
    jsonld-java's ``DocumentLoader.loadDocument``). http(s) only;
    the JSON document is cached per process. The OFFLINE
    ``context_map`` profile stays the default everywhere — this
    function only runs when a caller passes ``fetch=True``."""
    if url in _FETCH_CACHE:
        return _FETCH_CACHE[url]
    if not url.startswith(("http://", "https://")):
        raise ValueError(
            f"JSON-LD: refusing non-http(s) @context fetch {url!r}")
    import urllib.request

    req = urllib.request.Request(
        url, headers={"Accept": "application/ld+json, application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        doc = json.loads(r.read().decode("utf-8"))
    _FETCH_CACHE[url] = doc
    return doc


class JsonLdParser:
    def __init__(self, text: str,
                 context_map: dict[str, object] | None = None,
                 fetch: bool = False):
        self.doc = json.loads(text)
        self.scope = hashlib.md5(text.encode("utf-8")).hexdigest()
        self.anon = 0
        self.rows: list[tuple] = []
        self._g: str | None = None  # current named-graph IRI/bnode (or None)
        self.terms: dict[str, dict] = {}
        self.base = ""
        self.vocab = ""
        self.default_lang: str | None = None
        # offline remote-@context resolution: url -> context (either
        # the context value itself or a full remote document carrying
        # "@context"). By default the engine NEVER fetches — documents
        # whose @context URL is absent from the map error loudly;
        # fetch=True opts into HTTP resolution for absent URLs.
        self.context_map = context_map or {}
        self.fetch = fetch

    def _fresh(self) -> str:
        self.anon += 1
        return TM.skolem(self.scope, f"anon-{self.anon}")

    # --- context ------------------------------------------------------------
    def _load_context(self, ctx) -> None:
        if ctx is None:
            return
        if isinstance(ctx, list):
            for c in ctx:
                self._load_context(c)
            return
        if isinstance(ctx, str):
            mapped = self.context_map.get(ctx)
            if mapped is None and self.fetch:
                mapped = fetch_remote_context(ctx)
            if mapped is not None:
                if isinstance(mapped, dict) and "@context" in mapped:
                    mapped = mapped["@context"]  # full remote document
                self._load_context(mapped)
                return
            raise ValueError(
                f"JSON-LD: remote @context {ctx!r} — refusing to fetch "
                "(offline by default); supply context_map={url: context} "
                "or opt in with fetch=True")
        if not isinstance(ctx, dict):
            raise ValueError("JSON-LD: bad @context")
        for term, defn in ctx.items():
            if term == "@base":
                self.base = defn
            elif term == "@vocab":
                self.vocab = defn
            elif term == "@language":
                self.default_lang = defn  # null clears
            elif isinstance(defn, str):
                self.terms[term] = {"@id": defn}
            elif isinstance(defn, dict):
                self.terms[term] = defn
            else:
                raise ValueError(f"JSON-LD: bad term definition for {term!r}")

    def _expand_iri(self, s: str, vocab: bool = False) -> str:
        if s.startswith("_:") or _ABS.match(s):
            # prefix:suffix via context prefixes
            pfx, _, local = s.partition(":")
            if pfx in self.terms and not s.startswith("_:") and local and not local.startswith("//"):
                return self.terms[pfx]["@id"] + local
            return s
        if s in self.terms:
            return self.terms[s]["@id"]
        if vocab and self.vocab:
            return self.vocab + s
        return self.base + s

    # --- node / value objects ----------------------------------------------
    def _subject_term(self, node: dict):
        nid = node.get("@id")
        if nid is None:
            return ("bnode", self._fresh())
        nid = self._expand_iri(nid)
        return ("bnode", nid) if nid.startswith("_:") else ("iri", nid)

    def _scalar_literal(self, v):
        if isinstance(v, bool):
            return ("literal", "true" if v else "false", XSD + "boolean", None)
        if isinstance(v, int):
            return ("literal", str(v), XSD + "integer", None)
        if isinstance(v, float):
            return ("literal", repr(v), XSD + "double", None)
        return ("literal", v, None, None)

    def _object_term(self, v, type_coercion: str | None, lang: str | None = None):
        if isinstance(v, dict):
            if "@value" in v:
                lex = v["@value"]
                if isinstance(lex, (bool, int, float)):
                    return self._scalar_literal(lex)
                dt = v.get("@type")
                # explicit value objects are used as-is (JSON-LD 1.1
                # value expansion: the default language applies only to
                # plain string values, never to value objects)
                return ("literal", lex,
                        self._expand_iri(dt, vocab=True) if dt else None,
                        v.get("@language"))
            if "@list" in v:
                return self._list(v["@list"], type_coercion, lang)
            return self._node(v)  # embedded node object
        if isinstance(v, str):
            if type_coercion == "@id":
                iri = self._expand_iri(v)
                return ("bnode", iri, None, None) if iri.startswith("_:") \
                    else ("iri", iri, None, None)
            if type_coercion:
                return ("literal", v, type_coercion, None)
            return ("literal", v, None, lang)
        return self._scalar_literal(v)

    def _list(self, items, type_coercion, lang: str | None = None):
        if not items:
            return ("iri", RDF_NS + "nil", None, None)
        heads = [self._fresh() for _ in items]
        for i, item in enumerate(items):
            o = self._object_term(item, type_coercion, lang)
            self._emit(("bnode", heads[i], RDF_NS + "first",
                              o[0], o[1], o[2], o[3]))
            rest = (("bnode", heads[i + 1]) if i + 1 < len(items)
                    else ("iri", RDF_NS + "nil"))
            self._emit(("bnode", heads[i], RDF_NS + "rest",
                              rest[0], rest[1], None, None))
        return ("bnode", heads[0], None, None)

    def _node(self, node: dict):
        subj = self._subject_term(node)
        for key, val in node.items():
            if key in ("@id", "@context"):
                continue
            if key == "@type":
                for t in val if isinstance(val, list) else [val]:
                    self._emit(
                        (subj[0], subj[1], RDF_NS + "type",
                         "iri", self._expand_iri(t, vocab=True), None, None))
                continue
            if key == "@graph":
                # named-graph node object: the node's OWN id names the
                # graph for its @graph children (json-ld-api toRdf);
                # the node's other properties stay in the parent graph
                prev = self._g
                self._g = subj[1]
                try:
                    for child in val if isinstance(val, list) else [val]:
                        self._node(child)
                finally:
                    self._g = prev
                continue
            if key == "@reverse":
                # node-level reverse map: {pred: nodes} -> (node, pred, subj)
                if not isinstance(val, dict):
                    raise ValueError("JSON-LD: @reverse must be a map")
                for rk, rv in val.items():
                    self._reverse_emit(subj, rk, rv)
                continue
            if key.startswith("@"):
                raise ValueError(f"JSON-LD: keyword {key!r} unsupported")
            defn = self.terms.get(key, {})
            if "@reverse" in defn:
                # context-defined reverse property term
                for v in val if isinstance(val, list) else [val]:
                    o = self._object_term(v, "@id")
                    if o[0] == "literal":
                        raise ValueError(
                            "JSON-LD: @reverse value must be a node")
                    self._emit(
                        (o[0], o[1], self._expand_iri(defn["@reverse"], vocab=True),
                         subj[0], subj[1], None, None))
                continue
            pred = self._expand_iri(key, vocab=True)
            coercion = defn.get("@type")
            if coercion and coercion != "@id":
                coercion = self._expand_iri(coercion, vocab=True)
            _MISSING = object()
            term_lang = defn.get("@language", _MISSING)
            lang = self.default_lang if term_lang is _MISSING else term_lang
            container = defn.get("@container")
            if isinstance(container, list):
                # JSON-LD 1.1 array form; "@set" combines with any
                # other member and is a no-op for deserialization
                members = [c for c in container if c != "@set"]
                container = members[0] if len(members) == 1 else (
                    "@set" if not members else container)
            if container == "@list":
                # list container: the whole (possibly implicit) array is
                # ONE rdf:first/rest chain
                o = self._list(val if isinstance(val, list) else [val],
                               coercion, lang)
                self._emit((subj[0], subj[1], pred,
                                  o[0], o[1], o[2], o[3]))
                continue
            if container == "@language":
                # language map: {"en": "x", "fr": ["y", "z"]}
                if not isinstance(val, dict):
                    raise ValueError("JSON-LD: @language container needs a map")
                for lg, vv in val.items():
                    for one in vv if isinstance(vv, list) else [vv]:
                        if not isinstance(one, str):
                            raise ValueError(
                                "JSON-LD: language-map values must be strings")
                        self._emit((subj[0], subj[1], pred,
                                          "literal", one, None, lg))
                continue
            if container == "@graph":
                # JSON-LD 1.1 graph container (expansion §13.9: each
                # item becomes its own graph object): allocate a fresh
                # bnode graph name per item, link (subj pred g) in the
                # CURRENT graph, and the item's triples land in g
                for v in val if isinstance(val, list) else [val]:
                    if not isinstance(v, dict) or "@value" in v:
                        raise ValueError(
                            "JSON-LD: @graph-container values must be "
                            "node objects")
                    gid = self._fresh()
                    self._emit((subj[0], subj[1], pred,
                                "bnode", gid, None, None))
                    prev = self._g
                    self._g = gid
                    try:
                        self._node(v)
                    finally:
                        self._g = prev
                continue
            if container == "@index":
                # index maps carry no RDF meaning: flatten the values
                if not isinstance(val, dict):
                    raise ValueError("JSON-LD: @index container needs a map")
                val = [one for vv in val.values()
                       for one in (vv if isinstance(vv, list) else [vv])]
            elif container in ("@id", "@type"):
                # JSON-LD 1.1 node maps: the map key supplies the
                # value's @id / an extra @type when absent ("@none"
                # keys supply nothing) — json-ld-api §, Jena reads
                # these through titanium-json-ld
                if not isinstance(val, dict):
                    raise ValueError(f"JSON-LD: {container} container needs a map")
                expanded = []
                for k, vv in sorted(val.items()):
                    for one in vv if isinstance(vv, list) else [vv]:
                        if not isinstance(one, dict) or "@value" in one:
                            raise ValueError(
                                f"JSON-LD: {container}-map values must be "
                                "node objects")
                        node = dict(one)
                        if k != "@none":
                            if container == "@id":
                                node.setdefault("@id", k)
                            else:
                                ts = node.get("@type", [])
                                ts = ts if isinstance(ts, list) else [ts]
                                node["@type"] = ts + [k]
                        expanded.append(node)
                val = expanded
            elif container not in (None, "@set"):
                raise ValueError(f"JSON-LD: container {container!r} unsupported")
            for v in val if isinstance(val, list) else [val]:
                o = self._object_term(v, coercion, lang)
                self._emit((subj[0], subj[1], pred, o[0], o[1], o[2], o[3]))
        return (subj[0], subj[1], None, None)

    def _reverse_emit(self, subj, rkey: str, rval) -> None:
        defn = self.terms.get(rkey, {})
        pred_iri = defn.get("@id", rkey) if defn else rkey
        pred = self._expand_iri(pred_iri, vocab=True)
        for v in rval if isinstance(rval, list) else [rval]:
            o = self._object_term(v, "@id")
            if o[0] == "literal":
                raise ValueError("JSON-LD: @reverse value must be a node")
            self._emit((o[0], o[1], pred, subj[0], subj[1], None, None))

    def _emit(self, row7: tuple) -> None:
        self.rows.append(row7 + (self._g,))

    def parse(self) -> list[tuple]:
        doc = self.doc
        if isinstance(doc, dict):
            self._load_context(doc.get("@context"))
            if "@graph" in doc and "@id" not in doc:
                nodes = doc["@graph"]
            else:
                nodes = [doc]
        elif isinstance(doc, list):
            nodes = doc
        else:
            raise ValueError("JSON-LD: top level must be object or array")
        for n in nodes:
            if not isinstance(n, dict):
                raise ValueError("JSON-LD: node must be an object")
            self._node(n)
        return self.rows


def parse_jsonld(text: str,
                 context_map: dict[str, object] | None = None,
                 fetch: bool = False) -> list[tuple]:
    """One JSON-LD document -> list of 7-tuples (TERM_COLS order);
    named-graph membership is dropped (default-graph merge view). Use
    :func:`parse_jsonld_quads` to keep it. ``context_map`` resolves
    remote ``@context`` URLs offline (url -> context value or full
    remote context document); ``fetch=True`` opts into HTTP
    resolution for URLs absent from the map."""
    return [r[:7] for r in JsonLdParser(text, context_map, fetch).parse()]


def parse_jsonld_quads(
    text: str, context_map: dict[str, object] | None = None,
    fetch: bool = False,
) -> list[tuple]:
    """One JSON-LD document -> list of 8-tuples (TERM_COLS + graph):
    a node object carrying ``@graph`` names a graph with its own
    ``@id`` (JSON-LD 1.1 named graph node objects, json-ld-api toRdf);
    top-level ``@graph`` arrays and plain nodes land in the default
    graph (graph = None). The TriG twin of this reader's quad view."""
    return JsonLdParser(text, context_map, fetch).parse()


def format_jsonld(rows: list[tuple]) -> str:
    """7-tuples -> flat expanded-form JSON-LD (@graph of node objects
    with expanded IRIs — the profile :func:`parse_jsonld` always
    accepts; deterministic ordering)."""
    by_subj: dict[tuple, dict] = {}
    for s_kind, s_val, p_val, o_kind, o_val, o_dt, o_lang in sorted(rows):
        node = by_subj.setdefault((s_kind, s_val), {"@id": s_val})
        if p_val == RDF_NS + "type" and o_kind == "iri":
            node.setdefault("@type", []).append(o_val)
            continue
        if o_kind in ("iri", "bnode"):
            obj = {"@id": o_val}
        else:
            obj = {"@value": o_val}
            if o_dt:
                obj["@type"] = o_dt
            if o_lang:
                obj["@language"] = o_lang
        node.setdefault(p_val, []).append(obj)
    return json.dumps(
        {"@graph": [by_subj[k] for k in sorted(by_subj)]},
        indent=1, sort_keys=True, ensure_ascii=False,
    ) + "\n"


def read_jsonld(
    spark: SparkSession, path: str, quads: bool = False,
    context_map: dict[str, object] | None = None,
    fetch: bool = False,
) -> DataFrame:
    """Read .jsonld file(s) into the triple-table schema
    (``quads=True``: + graph column from named-graph node objects).
    ``context_map`` ships with the task closure, so remote-@context
    documents parse on executors without any network; ``fetch=True``
    lets executors resolve absent context URLs over HTTP instead
    (cached once per executor process — the jsonld-java
    ``DocumentLoader`` posture)."""
    import pandas as pd

    files = spark.read.text(path, wholetext=True)

    def _parse(batches):
        for pdf in batches:
            out = []
            for txt in pdf["value"]:
                if txt.strip():
                    out.extend(parse_jsonld_quads(txt, context_map, fetch))
            yield pd.DataFrame(out, columns=TERM_COLS7 + ["graph"])

    schema = ("s_kind string, s_val string, p_val string, o_kind string, "
              "o_val string, o_datatype string, o_lang string, graph string")
    from pyspark.sql import functions as F

    out = files.mapInPandas(_parse, schema)
    if not quads:
        out = out.drop("graph").withColumn(
            "graph", F.lit(None).cast("string"))
    return out.withColumn("conv_id", F.lit(None).cast("string"))


def write_jsonld(triples: DataFrame, path: str) -> None:
    """Distributed JSON-LD sink: one expanded-form document per
    partition."""
    import pandas as pd

    def _fmt(batches):
        rows = []
        for pdf in batches:
            rows.extend([
                tuple(None if v is None or (isinstance(v, float) and pd.isna(v)) else v
                      for v in r)
                for r in pdf[TERM_COLS7].itertuples(index=False)
            ])
        yield pd.DataFrame({"value": [format_jsonld(rows)] if rows else []})

    triples.select(*TERM_COLS7).mapInPandas(_fmt, "value string").write.mode(
        "overwrite"
    ).text(path)


def format_jsonld_quads(rows: list[tuple]) -> str:
    """8-tuples (TERM_COLS + graph) -> expanded-form JSON-LD whose
    default-graph rows serialize exactly like :func:`format_jsonld`
    and whose named graphs become named-graph node objects
    (``{"@id": g, "@graph": [...]}``) — the inverse of
    :func:`parse_jsonld_quads` (round-trip tested)."""
    import json as _json

    by_graph: dict[str | None, list[tuple]] = {}
    for r in rows:
        by_graph.setdefault(r[7], []).append(tuple(r[:7]))
    nodes = []
    default = by_graph.pop(None, [])
    if default:
        nodes.extend(_json.loads(format_jsonld(default))["@graph"])
    for g in sorted(by_graph):
        nodes.append({
            "@id": g,
            "@graph": _json.loads(format_jsonld(by_graph[g]))["@graph"],
        })
    return _json.dumps({"@graph": nodes}, indent=1, sort_keys=True,
                       ensure_ascii=False)


def write_jsonld_quads(quads: DataFrame, path: str) -> None:
    """Distributed named-graph JSON-LD sink: one expanded-form document
    per partition (graph blocks may span partitions — documents union
    cleanly on read, like the TriG sink)."""
    import pandas as pd

    cols = TERM_COLS7 + ["graph"]

    def _fmt(batches):
        rows = []
        for pdf in batches:
            rows.extend([
                tuple(None if v is None or (isinstance(v, float) and pd.isna(v))
                      else v for v in r)
                for r in pdf[cols].itertuples(index=False)
            ])
        yield pd.DataFrame({"value": [format_jsonld_quads(rows)] if rows else []})

    quads.select(*cols).mapInPandas(_fmt, "value string").write.mode(
        "overwrite"
    ).text(path)


# --- framing-lite ------------------------------------------------------------

#: frame keywords the lite subset deliberately refuses (error loudly
#: instead of silently mis-framing — the module's profile discipline).
_FRAME_UNSUPPORTED = {"@default", "@explicit", "@omitDefault", "@null",
                      "@embed", "@requireAll"}


def frame_jsonld(rows: list[tuple], frame: dict) -> dict:
    """Framing-LITE (a documented subset of JSON-LD 1.1 framing — the
    reference delegates to jsonld-java's full processor via
    ``riot/lang/JsonLDReader.java`` / ``JsonLDWriter``; this engine
    reshapes its own triple rows):

    * the frame's ``@context`` (inline or resolved through the same
      offline map rules via :class:`JsonLdParser`) compacts property
      IRIs and ``@type`` values to terms, prefix terms compact IRIs;
    * ``@type`` in the frame selects the top-level nodes (string or
      list — any match); frame properties with ``{}`` values are
      presence matchers;
    * matched nodes embed their referenced node objects recursively,
      each graph node EMBEDDED AT MOST ONCE per output (the spec's
      default ``@embed: @once``) — later references stay
      ``{"@id": …}``; cycles therefore terminate.

    ``@default``/``@explicit``/``@omitDefault``/``@embed`` overrides
    are out of profile and raise. Output: ``{"@context": …, "@graph":
    [framed nodes]}`` with deterministic ordering.
    """
    bad = _FRAME_UNSUPPORTED & set(frame)
    if bad:
        raise ValueError(f"JSON-LD framing-lite: unsupported {sorted(bad)}")

    # frame context -> term machinery (reuse the parser's loader)
    p = JsonLdParser("{}")
    p._load_context(frame.get("@context"))
    iri_to_term = {}
    prefix_terms = []  # (iri_prefix, term) longest-first
    for term, defn in p.terms.items():
        iri = defn.get("@id")
        if not iri:
            continue
        iri_to_term.setdefault(iri, term)
        prefix_terms.append((iri, term))
    prefix_terms.sort(key=lambda t: -len(t[0]))

    def compact(iri: str) -> str:
        if iri in iri_to_term:
            return iri_to_term[iri]
        for pre, term in prefix_terms:
            if iri.startswith(pre) and len(iri) > len(pre):
                return term + ":" + iri[len(pre):]
        return iri

    # node map: subject -> {"@type": [...], props: {p: [obj-term]}}
    types: dict[tuple, list] = {}
    props: dict[tuple, dict] = {}
    for s_kind, s_val, p_val, o_kind, o_val, o_dt, o_lang in sorted(rows):
        subj = (s_kind, s_val)
        if p_val == RDF_NS + "type" and o_kind == "iri":
            types.setdefault(subj, []).append(o_val)
            continue
        props.setdefault(subj, {}).setdefault(p_val, []).append(
            (o_kind, o_val, o_dt, o_lang))

    # top-level matchers
    want_types = frame.get("@type")
    if isinstance(want_types, str):
        want_types = [want_types]
    want_types = {p._expand_iri(t, vocab=True) for t in (want_types or [])}
    must_have = [p._expand_iri(k, vocab=True) for k, v in frame.items()
                 if not k.startswith("@") and v == {}]

    subjects = sorted(set(types) | set(props))

    def matches(subj) -> bool:
        if want_types and not (want_types & set(types.get(subj, []))):
            return False
        return all(m in props.get(subj, {}) for m in must_have)

    embedded: set[tuple] = set()

    def value_obj(o):
        o_kind, o_val, o_dt, o_lang = o
        if o_kind in ("iri", "bnode"):
            ref = (o_kind, o_val)
            if ref in (set(types) | set(props)) and ref not in embedded:
                return build(ref)
            return {"@id": compact(o_val) if o_kind == "iri" else o_val}
        if o_dt or o_lang:
            out = {"@value": o_val}
            if o_dt:
                out["@type"] = compact(o_dt)
            if o_lang:
                out["@language"] = o_lang
            return out
        return o_val  # plain string compacts to a JSON scalar

    def build(subj) -> dict:
        embedded.add(subj)
        kind, val = subj
        node: dict = {"@id": val if kind == "bnode" else compact(val)}
        if subj in types:
            ts = [compact(t) for t in sorted(set(types[subj]))]
            node["@type"] = ts[0] if len(ts) == 1 else ts
        for p_iri in sorted(props.get(subj, {})):
            vals = [value_obj(o) for o in props[subj][p_iri]]
            node[compact(p_iri)] = vals[0] if len(vals) == 1 else vals
        return node

    graph = [build(s) for s in subjects if matches(s) and s not in embedded]
    out: dict = {}
    if "@context" in frame:
        out["@context"] = frame["@context"]
    out["@graph"] = graph
    return out
