"""MVCC transactions (TDB2 / jena-dboe-transaction analog): snapshot
isolation, MRSW writer exclusion, the Transactional lifecycle errors,
Txn.executeRead/Write helpers, and durable pointer-swap commits."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jena_spark.pipeline.txn import (  # noqa: E402
    TransactionalStore,
    TransactionError,
)

EX = "http://ex.org/"
_SCHEMA = (
    "s_kind string, s_val string, p_val string, o_kind string, o_val string,"
    "o_datatype string, o_lang string"
)


def _triples(spark, names):
    return spark.createDataFrame(
        [("iri", EX + n, EX + "p", "literal", n, None, None) for n in names],
        _SCHEMA)


def test_snapshot_isolation_and_commit_visibility(spark):
    store = TransactionalStore(spark, _triples(spark, ["a"]))
    reader = store.begin()                      # pins version 0
    w = store.begin(write=True)
    w.load(_triples(spark, ["b"]))
    # uncommitted write invisible everywhere but inside the writer
    assert reader.dataset().count() == 1
    assert store.dataset().count() == 1
    assert w.dataset().count() == 2
    w.commit()
    # the pinned reader STILL sees version 0 (snapshot isolation)
    assert reader.dataset().count() == 1
    # new transactions see version 1
    assert store.begin().dataset().count() == 2
    assert store.version == 1


def test_mrsw_and_lifecycle_errors(spark):
    store = TransactionalStore(spark, _triples(spark, ["a"]))
    r = store.begin()
    with pytest.raises(TransactionError, match="READ transaction"):
        r.load(_triples(spark, ["b"]))
    w1 = store.begin(write=True)
    with pytest.raises(TransactionError, match="one\\s+writer"):
        store.begin(write=True)
    w1.abort()                                  # releases the writer slot
    w2 = store.begin(write=True)
    w2.load(_triples(spark, ["b"]))
    with pytest.raises(TransactionError, match="without commit"):
        w2.end()                                # active write -> abort + raise
    assert store.dataset().count() == 1         # nothing leaked
    with pytest.raises(TransactionError, match="aborted"):
        w2.dataset()
    # context manager: commit on clean exit, abort on exception
    with store.write() as w:
        w.load(_triples(spark, ["b"]))
    assert store.dataset().count() == 2
    with pytest.raises(RuntimeError, match="boom"):
        with store.write() as w:
            w.load(_triples(spark, ["c"]))
            raise RuntimeError("boom")
    assert store.dataset().count() == 2


def test_txn_helpers_and_sparql_update(spark):
    store = TransactionalStore(spark, _triples(spark, ["a"]))
    store.execute_write(lambda t: t.update(
        f'INSERT DATA {{ <{EX}x> <{EX}p> "x" . }}'))
    n = store.execute_read(lambda t: t.query(
        f"SELECT ?s WHERE {{ ?s <{EX}p> ?o . }}").count())
    assert n == 2
    with pytest.raises(ValueError):
        store.execute_write(lambda t: t.update("NONSENSE"))
    assert store.execute_read(lambda t: t.dataset().count()) == 2


def test_durable_pointer_swap_commit(spark, tmp_path):
    p = str(tmp_path / "txstore")
    store = TransactionalStore(spark, _triples(spark, ["a"]), path=p)
    with store.write() as w:
        w.load(_triples(spark, ["b"]))
    assert store.version == 1
    # a fresh store (new driver) attaches to the committed version
    again = TransactionalStore(spark, path=p)
    assert again.version == 1
    assert again.dataset().count() == 2
    with again.write() as w:
        w.update(f'DELETE WHERE {{ ?s <{EX}p> "a" . }}')
    assert again.version == 2
    third = TransactionalStore(spark, path=p)
    assert {r["o_val"] for r in third.dataset().collect()} == {"b"}
