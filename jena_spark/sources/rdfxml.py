"""RDF/XML reader / writer (RIOT parity, principal subset).

Reference: parser ``jena-arq/.../riot/lang/rdfxml/*`` (registered as the
default-priority language ``riot/RDFLanguages.java:62``), writer family
``riot/writer/RDFXML*``. Supported subset (the striped syntax):

* ``rdf:RDF`` root; ``rdf:Description`` and TYPED node elements
  (``<ex:Person rdf:about=..>`` emits the rdf:type triple)
* node ids: ``rdf:about`` (resolved against ``xml:base``/param base),
  ``rdf:ID`` (-> ``base#id``), ``rdf:nodeID`` (bnode as-given),
  anonymous (deterministic per-document skolem label,
  ``BlankNodeAllocatorHash`` posture)
* property elements: text literals with inherited ``xml:lang`` and
  ``rdf:datatype``; ``rdf:resource`` / ``rdf:nodeID`` object refs;
  nested node elements (striping); ``rdf:parseType="Resource"``;
  ``rdf:parseType="Collection"`` (rdf:first/rest/nil);
  ``rdf:li`` (-> ``rdf:_n``); property ATTRIBUTES on node elements
* ``rdf:parseType="Literal"`` -> rdf:XMLLiteral (deterministic
  ElementTree serialization of the content, NOT full exclusive
  canonicalization — stable under our own round-trip; documented
  deviation from exc-c14n)
* reification sugar: ``rdf:ID`` on a property element emits the four
  rdf:Statement triples (``ReaderRDFXML`` ``reifyStatement`` path)
* relative IRIs resolve per RFC 3986 (urljoin) against nested
  ``xml:base`` chains
* NOT supported (raise, documented): ``rdf:aboutEach``/``bagID``
  (obsolete since RDF 2004).

One XML document per file = parse unit (``wholetext`` + ``mapInPandas``
per-file parallelism, like the other document formats).
"""

from __future__ import annotations

import hashlib
import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame, SparkSession

from jena_spark import terms as TM

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"

_R = "{%s}" % RDF_NS
_LANG = "{%s}lang" % XML_NS
_BASE = "{%s}base" % XML_NS

TERM_COLS7 = ["s_kind", "s_val", "p_val", "o_kind", "o_val", "o_datatype", "o_lang"]


def _split(tag: str) -> str:
    """ElementTree {ns}local -> ns+local IRI."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


class RdfXmlParser:
    def __init__(self, text: str, base: str | None = None):
        self.root = ET.fromstring(text)
        self.base = base or ""
        self.scope = hashlib.md5(text.encode("utf-8")).hexdigest()
        self.anon = 0
        self.li = 0
        self.rows: list[tuple] = []

    def _fresh(self) -> str:
        self.anon += 1
        return TM.skolem(self.scope, f"anon-{self.anon}")

    def _resolve(self, iri: str, base: str) -> str:
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return iri
        if not base:
            return iri
        from urllib.parse import urljoin

        return urljoin(base, iri)

    def _emit(self, s, p, o):
        self.rows.append((s[0], s[1], p, o[0], o[1], o[2], o[3]))

    def parse(self) -> list[tuple]:
        base = self.root.get(_BASE, self.base)
        lang = self.root.get(_LANG)
        if _split(self.root.tag) == RDF_NS + "RDF":
            for child in self.root:
                self._node_element(child, base, lang)
        else:
            self._node_element(self.root, base, lang)
        return self.rows

    def _subject_of(self, el: ET.Element, base: str):
        about = el.get(_R + "about")
        rid = el.get(_R + "ID")
        node_id = el.get(_R + "nodeID")
        if about is not None:
            return ("iri", self._resolve(about, base))
        if rid is not None:
            return ("iri", base + "#" + rid)
        if node_id is not None:
            return ("bnode", "_:" + node_id)
        return ("bnode", self._fresh())

    def _node_element(self, el: ET.Element, base: str, lang):
        base = el.get(_BASE, base)
        lang = el.get(_LANG, lang)
        subj = self._subject_of(el, base)
        tag_iri = _split(el.tag)
        if tag_iri != RDF_NS + "Description":
            self._emit(subj, TM.RDF_TYPE, ("iri", tag_iri, None, None))
        # property attributes (non-rdf, non-xml namespace)
        for k, v in el.attrib.items():
            if k.startswith(_R) or k.startswith("{%s}" % XML_NS):
                continue
            self._emit(subj, _split(k), ("literal", v, None, lang))
        saved_li = self.li
        self.li = 0
        for prop in el:
            self._property_element(subj, prop, base, lang)
        self.li = saved_li
        return subj

    def _prop_iri(self, el: ET.Element) -> str:
        iri = _split(el.tag)
        if iri == RDF_NS + "li":
            self.li += 1
            return f"{RDF_NS}_{self.li}"
        return iri

    def _property_element(self, subj, el: ET.Element, base: str, lang):
        base = el.get(_BASE, base)
        lang = el.get(_LANG, lang)
        pred = self._prop_iri(el)
        parse_type = el.get(_R + "parseType")
        resource = el.get(_R + "resource")
        node_id = el.get(_R + "nodeID")
        datatype = el.get(_R + "datatype")
        children = list(el)

        rid = el.get(_R + "ID")

        def emit_stmt(o):
            """Emit (subj, pred, o) plus — under rdf:ID reification
            sugar (``ReaderRDFXML`` reifyStatement) — the four
            rdf:Statement triples describing it."""
            self._emit(subj, pred, o)
            if rid is not None:
                stmt = ("iri", self._resolve("#" + rid, base))
                self._emit(stmt, RDF_NS + "type",
                           ("iri", RDF_NS + "Statement", None, None))
                self._emit(stmt, RDF_NS + "subject", (subj[0], subj[1], None, None))
                self._emit(stmt, RDF_NS + "predicate", ("iri", pred, None, None))
                self._emit(stmt, RDF_NS + "object", o)

        if parse_type == "Literal":
            # rdf:XMLLiteral — deterministic ET serialization of the
            # element content (documented deviation: not exc-c14n)
            content = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in children
            )
            emit_stmt(("literal", content, RDF_NS + "XMLLiteral", None))
            return
        if parse_type == "Resource":
            inner = ("bnode", self._fresh())
            emit_stmt((inner[0], inner[1], None, None))
            saved_li = self.li
            self.li = 0
            for sub in children:
                self._property_element(inner, sub, base, lang)
            self.li = saved_li
            return
        if parse_type == "Collection":
            items = [self._node_element(c, base, lang) for c in children]
            if not items:
                emit_stmt(("iri", RDF_NS + "nil", None, None))
                return
            heads = [self._fresh() for _ in items]
            emit_stmt(("bnode", heads[0], None, None))
            for i, item in enumerate(items):
                self._emit(("bnode", heads[i]), RDF_NS + "first",
                           (item[0], item[1], None, None))
                rest = (("bnode", heads[i + 1], None, None) if i + 1 < len(items)
                        else ("iri", RDF_NS + "nil", None, None))
                self._emit(("bnode", heads[i]), RDF_NS + "rest", rest)
            return
        if resource is not None:
            emit_stmt(("iri", self._resolve(resource, base), None, None))
            return
        if node_id is not None:
            emit_stmt(("bnode", "_:" + node_id, None, None))
            return
        if children:
            if len(children) != 1:
                raise ValueError("RDF/XML: property element with >1 node element")
            inner = self._node_element(children[0], base, lang)
            emit_stmt((inner[0], inner[1], None, None))
            return
        text = el.text or ""
        if datatype is not None:
            emit_stmt(("literal", text, datatype, None))
        else:
            emit_stmt(("literal", text, None, lang))


def parse_rdfxml(text: str, base: str | None = None) -> list[tuple]:
    """One RDF/XML document -> list of 7-tuples (TERM_COLS order)."""
    return RdfXmlParser(text, base).parse()


_NCNAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.\-]*$")


def _split_qname(iri: str) -> tuple[str, str]:
    """Split a predicate IRI into (namespace, local) where local is a
    valid XML NCName — at the LAST possible split point, i.e. the
    longest NCName suffix (Jena's ``Util.splitNamespaceXML``,
    ``jena-core/.../rdfxml/xmloutput/impl/BaseXMLWriter.java`` posture).

    RDF/XML cannot serialize a predicate whose IRI has no NCName
    suffix (e.g. ``urn:isbn:123`` or ``http://e/123``) — that is a
    documented limitation of the format itself; raise a clear
    ValueError instead of emitting non-well-formed XML. ASCII NCName
    subset (non-ASCII local names also raise)."""
    i = len(iri)
    while i > 0 and re.match(r"[A-Za-z0-9_.\-]", iri[i - 1]):
        i -= 1
    j = i
    while j < len(iri) and not re.match(r"[A-Za-z_]", iri[j]):
        j += 1
    local = iri[j:]
    if j == 0 or not local or not _NCNAME_RE.match(local):
        raise ValueError(
            f"predicate IRI {iri!r} has no XML-NCName suffix — "
            "not serializable as RDF/XML (use Turtle/N-Triples)"
        )
    return iri[:j], local


def format_rdfxml(rows: list[tuple]) -> str:
    """7-tuples -> one RDF/XML document (rdf:Description striping;
    deterministic subject/predicate ordering)."""
    out = [f'<rdf:RDF xmlns:rdf="{RDF_NS}">']
    by_subj: dict[tuple, list] = {}
    for r in rows:
        by_subj.setdefault((r[0], r[1]), []).append(r)
    n = 0
    for (s_kind, s_val), group in sorted(by_subj.items()):
        attr = (f'rdf:about={quoteattr(s_val)}' if s_kind == "iri"
                else f'rdf:nodeID={quoteattr(s_val[2:])}')
        out.append(f"  <rdf:Description {attr}>")
        for r in sorted(group, key=lambda r: (r[2], r[4])):
            n += 1
            pfx = f"n{n}"
            p_ns, p_local = _split_qname(r[2])
            open_tag = f'{pfx}:{p_local} xmlns:{pfx}={quoteattr(p_ns)}'
            if r[3] == "iri":
                out.append(f"    <{open_tag} rdf:resource={quoteattr(r[4])}/>")
            elif r[3] == "bnode":
                out.append(f"    <{open_tag} rdf:nodeID={quoteattr(r[4][2:])}/>")
            elif r[5] == RDF_NS + "XMLLiteral":
                # raw XML content under parseType="Literal" — must be a
                # well-formed fragment or the document would corrupt
                try:
                    ET.fromstring(f"<x>{r[4]}</x>")
                except ET.ParseError as e:
                    raise ValueError(
                        f"rdf:XMLLiteral value is not well-formed XML: {e}"
                    ) from None
                out.append(
                    f'    <{open_tag} rdf:parseType="Literal">{r[4]}'
                    f"</{pfx}:{p_local}>"
                )
            else:
                extra = ""
                if r[5]:
                    extra = f" rdf:datatype={quoteattr(r[5])}"
                elif r[6]:
                    extra = f" xml:lang={quoteattr(r[6])}"
                out.append(
                    f"    <{open_tag}{extra}>{escape(r[4])}</{pfx}:{p_local}>"
                )
        out.append("  </rdf:Description>")
    out.append("</rdf:RDF>")
    return "\n".join(out) + "\n"


def read_rdfxml(spark: SparkSession, path: str, base: str | None = None) -> DataFrame:
    """Read .rdf file(s) into the triple-table schema."""
    import pandas as pd

    files = spark.read.text(path, wholetext=True)

    def _parse(batches):
        for pdf in batches:
            out = []
            for txt in pdf["value"]:
                if txt.strip():
                    out.extend(parse_rdfxml(txt, base))
            yield pd.DataFrame(out, columns=TERM_COLS7)

    schema = ("s_kind string, s_val string, p_val string, o_kind string, "
              "o_val string, o_datatype string, o_lang string")
    from pyspark.sql import functions as F

    return (
        files.mapInPandas(_parse, schema)
        .withColumn("graph", F.lit(None).cast("string"))
        .withColumn("conv_id", F.lit(None).cast("string"))
    )


def write_rdfxml(triples: DataFrame, path: str) -> None:
    """Distributed RDF/XML sink: one self-contained document per
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
        yield pd.DataFrame({"value": [format_rdfxml(rows)] if rows else []})

    triples.select(*TERM_COLS7).mapInPandas(_fmt, "value string").write.mode(
        "overwrite"
    ).text(path)
