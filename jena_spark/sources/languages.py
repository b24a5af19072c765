"""RDFLanguages / RDFDataMgr analog — one dispatch surface over every
registered RIOT language family.

Reference: ``jena-arq/.../riot/RDFLanguages.java`` (language registry,
filename-extension mapping, N3-treated-as-Turtle ``:77-78``) and
``riot/RDFDataMgr.java`` (``read``/``write`` entry points that pick
the parser from the language or the file extension).

Every language maps to this repo's distributed reader/writer pair; N3
is an alias of Turtle exactly as in the reference ("N3 (treat as
Turtle)") — Jena retired its bespoke N3 parser, so Turtle-profile
parsing IS the reference behavior for ``.n3`` files.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# lang name -> (reader, writer, default extension, is_quads)
_LANGS: dict[str, tuple[Callable, Callable | None, str, bool]] = {}
_EXT_TO_LANG: dict[str, str] = {}


def register_lang(
    name: str, reader: Callable, writer: Callable | None,
    extensions: list[str], quads: bool = False,
) -> None:
    """Register a language (RDFLanguages.register analog). The FIRST
    extension is canonical; all map back to the language."""
    _LANGS[name.lower()] = (reader, writer, extensions[0], quads)
    for ext in extensions:
        _EXT_TO_LANG[ext.lstrip(".").lower()] = name.lower()


def registered_languages() -> list[str]:
    return sorted(_LANGS)


def lang_for_path(path: str) -> str:
    """filenameToLang analog: pick the language from the extension
    (directories of part files use the directory suffix, e.g.
    ``out.ttl/``)."""
    stem = path.rstrip("/").rsplit("/", 1)[-1]
    if "." not in stem:
        raise ValueError(f"cannot infer RDF language from path {path!r}")
    ext = stem.rsplit(".", 1)[-1].lower()
    if ext not in _EXT_TO_LANG:
        raise ValueError(f"no registered RDF language for extension .{ext}")
    return _EXT_TO_LANG[ext]


def read_rdf(spark: SparkSession, path: str, lang: str | None = None) -> DataFrame:
    """RDFDataMgr.read analog: distributed read of any registered
    language, dispatched by ``lang`` or the path's extension."""
    name = (lang or lang_for_path(path)).lower()
    if name not in _LANGS:
        raise ValueError(f"unregistered RDF language: {lang!r}")
    reader = _LANGS[name][0]
    return reader(spark, path)


def read_rdf_bytes(spark: SparkSession, data: bytes, lang: str) -> DataFrame:
    """Parse an in-memory document (an HTTP request/response body)
    through the registered language's distributed reader. The parsed
    frame is ``localCheckpoint``-ed — bounded by construction (one
    protocol body) — so the backing temp file is removed before
    returning."""
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="jena_spark_body_")
    try:
        path = os.path.join(tmp, "body")
        with open(path, "wb") as f:
            f.write(data)
        return read_rdf(spark, path, lang=lang).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_rdf(df: DataFrame, path: str, lang: str | None = None) -> None:
    """RDFDataMgr.write analog (distributed part-file writers)."""
    name = (lang or lang_for_path(path)).lower()
    if name not in _LANGS:
        raise ValueError(f"unregistered RDF language: {lang!r}")
    writer = _LANGS[name][1]
    if writer is None:
        raise ValueError(f"language {name!r} has no writer")
    writer(df, path)


def _register_builtins() -> None:
    from jena_spark.sources.jsonld import read_jsonld, write_jsonld
    from jena_spark.sources.ntriples import read_ntriples, write_ntriples
    from jena_spark.sources.rdfjson import read_rdfjson, write_rdfjson
    from jena_spark.sources.rdfxml import read_rdfxml, write_rdfxml
    from jena_spark.sources.thrift import read_thrift, write_thrift
    from jena_spark.sources.trix import read_trix, write_trix
    from jena_spark.sources.turtle import (
        read_trig,
        read_turtle,
        write_trig,
        write_turtle,
    )

    register_lang("ntriples", read_ntriples, write_ntriples, [".nt"])
    register_lang(
        "nquads",
        lambda s, p: read_ntriples(s, p, quads=True),
        lambda d, p: write_ntriples(d, p, quads=True),
        [".nq"], quads=True,
    )
    register_lang("turtle", read_turtle, write_turtle, [".ttl"])
    # N3 (treat as Turtle) — RDFLanguages.java:77-78
    register_lang("n3", read_turtle, write_turtle, [".n3"])
    register_lang("trig", read_trig, write_trig, [".trig"], quads=True)
    register_lang("trix", read_trix, write_trix, [".trix"], quads=True)
    register_lang("rdfjson", read_rdfjson, write_rdfjson, [".rj"])
    register_lang("rdfxml", read_rdfxml, write_rdfxml, [".rdf", ".xml"])
    register_lang("jsonld", read_jsonld, write_jsonld, [".jsonld"])
    register_lang("thrift", read_thrift, write_thrift, [".trdf", ".rt"])
    # text/csv is a registered RIOT language (RDFLanguages.java:46,194):
    # the PropertyTable view is read-only (the retired jena-csv module
    # had no writer)
    from jena_spark.sources.csvpt import read_csv_pt

    register_lang("csv", read_csv_pt, None, [".csv"])


_register_builtins()
