"""DuckDB-SQL mirror of the KG construction pipeline.

The driver's correctness gate runs each Spark query side-by-side with an
ANSI-SQL oracle in DuckDB over the same parquet tables. This module
builds that oracle for the whole pipeline: a ``WITH`` prefix whose final
``triples`` relation must equal (row-for-row, as a set) the DataFrame
produced by ``pipeline.extract.raw_triples`` +
``pipeline.canonicalize.canonicalize_triples`` over
``data.transcripts.transcripts_df``.

This is the same testing idea as the reference's manifest-driven SPARQL
suite, which compares engine results value-by-value against
independently produced expected results
(``jena-arq/src/test/java/org/apache/jena/arq/junit/sparql/tests/QueryExecTest.java:297-304``)
— DuckDB plays the role of the independent engine.

Canonicalization note: emitted ``owl:sameAs`` edges form disjoint stars
(alias → canonical, because the gazetteer maps each surface to one
canonical), so the connected-component representative (lexicographic
min member) is computable with one grouped aggregation — no recursion
needed in SQL. The Spark side still runs the general large-star /
small-star algorithm; on star inputs both give identical components.
"""

from __future__ import annotations

from jena_spark import terms as TM
from jena_spark.data.transcripts import transcripts_cte
from jena_spark.gazetteer import DEFAULT_GAZETTEER, validate_gazetteer


def surfaces_values(gazetteer: dict | None = None) -> str:
    """VALUES literal (surface, surface_iri, canonical_iri)."""
    # validate_gazetteer: the one-aggregation component CTE below is
    # only correct for disjoint alias stars — fail loudly if violated
    s2c = validate_gazetteer(gazetteer or DEFAULT_GAZETTEER)
    rows = []
    for surface, canonical in sorted(s2c.items()):
        esc = surface.replace("'", "''")
        rows.append(
            f"('{esc}', '{TM.entity_iri(surface)}', '{TM.entity_iri(canonical)}')"
        )
    return ",\n      ".join(rows)


def triples_with() -> str:
    """Full ``WITH`` prefix ending in the canonical ``triples`` relation.

    Usage: ``triples_with() + "SELECT ... FROM triples ..."``.
    """
    return f"""WITH transcripts AS ({transcripts_cte()}),
    surfaces(surface, surface_iri, canonical_iri) AS (VALUES
      {surfaces_values()}
    ),
    turns AS (
      SELECT *,
        '{TM.NS_CONV}' || conv_id AS conv_iri,
        '_:' || md5(conv_id || ':turn-' || CAST(turn_idx AS VARCHAR)) AS turn_bnode
      FROM transcripts
    ),
    mentions AS (
      SELECT DISTINCT t.conv_id, t.turn_bnode, s.surface, s.surface_iri, s.canonical_iri
      FROM turns t JOIN surfaces s
        ON contains(' ' || t.text || ' ', ' ' || s.surface || ' ')
    ),
    raw_triples AS (
      SELECT DISTINCT * FROM (
        SELECT 'iri' AS s_kind, conv_iri AS s_val, '{TM.P_HAS_TURN}' AS p_val,
               'bnode' AS o_kind, turn_bnode AS o_val,
               CAST(NULL AS VARCHAR) AS o_datatype, CAST(NULL AS VARCHAR) AS o_lang
        FROM turns
        UNION ALL
        SELECT 'bnode', turn_bnode, '{TM.P_TURN_INDEX}',
               'literal', CAST(turn_idx AS VARCHAR), '{TM.XSD_INTEGER}', NULL
        FROM turns
        UNION ALL
        SELECT 'bnode', turn_bnode, '{TM.P_ROLE}', 'literal', role, NULL, NULL
        FROM turns
        UNION ALL
        SELECT 'bnode', turn_bnode, '{TM.P_TEXT}', 'literal', text, NULL, NULL
        FROM turns
        UNION ALL
        SELECT 'bnode', turn_bnode, '{TM.P_TOOL}', 'literal', tool, NULL, NULL
        FROM turns WHERE tool IS NOT NULL
        UNION ALL
        SELECT 'bnode', turn_bnode, '{TM.P_TS}',
               'literal', strftime(ts, '%Y-%m-%dT%H:%M:%SZ'), '{TM.XSD_DATETIME}', NULL
        FROM turns
        UNION ALL
        SELECT 'bnode', turn_bnode, '{TM.P_MENTIONS}', 'iri', surface_iri, NULL, NULL
        FROM mentions
        UNION ALL
        SELECT 'iri', surface_iri, '{TM.RDFS_LABEL}', 'literal', surface, NULL, NULL
        FROM mentions
        UNION ALL
        SELECT 'iri', surface_iri, '{TM.OWL_SAMEAS}', 'iri', canonical_iri, NULL, NULL
        FROM mentions WHERE surface_iri <> canonical_iri
      )
    ),
    sameas_edges AS (
      SELECT DISTINCT s_val AS a, o_val AS c FROM raw_triples
      WHERE p_val = '{TM.OWL_SAMEAS}'
    ),
    members AS (
      SELECT c, a AS m FROM sameas_edges
      UNION
      SELECT c, c FROM sameas_edges
    ),
    reps AS (SELECT c, min(m) AS rep FROM members GROUP BY c),
    mapping AS (
      SELECT DISTINCT members.m AS node, reps.rep
      FROM members JOIN reps ON members.c = reps.c
    ),
    triples AS (
      SELECT DISTINCT s_kind,
        CASE WHEN s_kind = 'iri' THEN coalesce(ms.rep, s_val) ELSE s_val END AS s_val,
        p_val, o_kind,
        CASE WHEN o_kind = 'iri' THEN coalesce(mo.rep, o_val) ELSE o_val END AS o_val,
        o_datatype, o_lang
      FROM raw_triples
      LEFT JOIN mapping ms ON raw_triples.s_val = ms.node
      LEFT JOIN mapping mo ON raw_triples.o_val = mo.node
      WHERE NOT (p_val = '{TM.OWL_SAMEAS}'
                 AND CASE WHEN s_kind = 'iri' THEN coalesce(ms.rep, s_val) ELSE s_val END
                     = CASE WHEN o_kind = 'iri' THEN coalesce(mo.rep, o_val) ELSE o_val END)
    )
    """
