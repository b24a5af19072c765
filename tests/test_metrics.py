"""Fuseki ``$/metrics`` Prometheus exposition (``ActionMetrics.java`` /
``FusekiRequestsMetrics.java`` analog)."""

from __future__ import annotations

import sys
import urllib.parse
import urllib.request
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.pipeline.server import FusekiLite  # noqa: E402

EX = "http://ex.org/"

_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
    "o_datatype string, o_lang string"
)


@pytest.fixture(scope="module")
def data(spark):
    rows = [
        ("iri", EX + "a", EX + "name", "literal", "a", None, None),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.headers.get("Content-Type", ""), \
            r.read().decode("utf-8")


def test_metrics_exposition(data):
    with FusekiLite({"ds": data}) as base:
        # drive one good query so the counter moves
        q = urllib.parse.quote("SELECT ?s WHERE { ?s ?p ?o }")
        urllib.request.urlopen(f"{base}/ds/sparql?query={q}", timeout=30)
        st, ct, body = _get(f"{base}/$/metrics")
    assert st == 200
    assert ct.startswith("text/plain") and "0.0.4" in ct
    lines = body.splitlines()
    # HELP/TYPE once per family, before its samples
    assert "# TYPE fuseki_requests gauge" in lines
    assert "# TYPE fuseki_requests_good gauge" in lines
    assert "# TYPE fuseki_requests_bad gauge" in lines
    sample = [ln for ln in lines if ln.startswith(
        'fuseki_requests{') and 'endpoint="sparql"' in ln]
    assert sample == [
        'fuseki_requests{dataset="/ds",description="SPARQL Query",'
        'endpoint="sparql",operation="query"} 1.0']
    good = [ln for ln in lines if ln.startswith('fuseki_requests_good{')
            and 'endpoint="sparql"' in ln]
    assert good[0].endswith("} 1.0")
    # read-only server still exposes the gsp-r endpoint family
    assert any('operation="gsp-r"' in ln for ln in lines)


def test_metrics_rejects_item_path(data):
    with FusekiLite({"ds": data}) as base:
        try:
            urllib.request.urlopen(f"{base}/$/metrics/ds", timeout=30)
            status = 200
        except urllib.error.HTTPError as e:
            status = e.code
    assert status == 404
