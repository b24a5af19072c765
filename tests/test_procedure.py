"""OpProcedure registry (``queries/procedure.py`` —
``ProcEval.java`` / ``ProcedureRegistry.java`` /
``StandardProcedures.java`` analog)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from jena_spark.queries.procedure import (  # noqa: E402
    op_procedure,
    register_procedure,
    unregister_procedure,
)


def test_debug_proc_passthrough(spark, capsys):
    """debug:proc (library/debug.java): prints args, identity stream."""
    b = spark.createDataFrame([(1, "a"), (2, "b")], "x long, y string")
    out = op_procedure(b, "debug:proc", ("hello", 42))
    assert sorted(map(tuple, out.collect())) == [(1, "a"), (2, "b")]
    assert "Debug: ['hello', 42]" in capsys.readouterr().out


def test_custom_procedure_transforms_whole_stream(spark):
    """A procedure replaces the stream (ProcEval.eval), so it can
    aggregate — impossible for a per-binding property function."""
    register_procedure(
        "http://ex.org/proc#countBy",
        lambda b, args: b.groupBy(*args).agg(F.count("*").alias("n")))
    try:
        b = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], "k string, v long")
        out = op_procedure(b, "http://ex.org/proc#countBy", ("k",))
        assert sorted(map(tuple, out.collect())) == [("a", 2), ("b", 1)]
    finally:
        unregister_procedure("http://ex.org/proc#countBy")


def test_unknown_procedure_raises(spark):
    b = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="no registered procedure"):
        op_procedure(b, "http://ex.org/proc#missing")
    # unregister is idempotent (ProcedureRegistry.remove)
    unregister_procedure("http://ex.org/proc#missing")
