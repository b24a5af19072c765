"""PEP 249 (DB-API 2.0) surface over the engine — the jena-jdbc analog.

Reference contract (paths relative to /root/reference):

* ``jena-jdbc/jena-jdbc-core/.../jdbc/JenaDriver.java`` — a JDBC
  driver over a Jena dataset; the in-memory flavor is
  ``jena-jdbc-driver-mem/.../mem/MemDriver.java`` +
  ``mem/connections/MemConnection.java``. Python's standard DB client
  contract is PEP 249, so the analog is a DB-API module: ``connect()``
  -> Connection -> ``cursor()`` -> ``execute()/fetch*``.
* ``jdbc/connections/JenaConnection.java`` — autocommit/commit/
  rollback over dataset transactions. Here the engine's
  :class:`jena_spark.pipeline.api.Connection` is functional (every
  update REBINDS an immutable quad frame), so transactions are
  snapshot rebinding: ``commit`` promotes the working frame,
  ``rollback`` restores the last committed one — the same
  begin/commit/abort shape as ``pipeline/txn.py`` without a store.
* ``jdbc/statements/JenaStatement.java:executeQuery/executeUpdate`` —
  dispatch on the command form: SELECT/ASK/CONSTRUCT/DESCRIBE produce
  result sets (``results/SelectResults.java``, ``AskResults.java``,
  ``TripleIteratorResults.java`` — CONSTRUCT/DESCRIBE surface as a
  fixed triple-column result set, ``TripleResultsMetadata.java``);
  SPARQL updates return an update count of 0 (SPARQL reports none).
* ``jdbc/statements/JenaPreparedStatement.java:312`` (``setObject``) —
  parameters are rendered as RDF terms into the SPARQL string via
  ``ParameterizedSparqlString``; the qmark ``?`` placeholders here do
  the same (``paramstyle = "qmark"``).
* ``jdbc/results/metadata/columns/*.java`` — per-column JDBC type
  mapping; :attr:`Cursor.description` carries the Spark type name in
  the ``type_code`` slot.

Scale note: ``fetch*`` streams rows through ``toLocalIterator`` (one
partition in flight on the driver, never a full ``collect``) — the
posture jena-jdbc gets from streaming QueryExecution iterators. The
DB-API surface is a CLIENT protocol: use it for driver-side
consumption of query results, not as a data-movement path.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from jena_spark.pipeline.api import Connection as _EngineConnection

apilevel = "2.0"
threadsafety = 1  # threads may share the module, not connections
paramstyle = "qmark"


# --- PEP 249 exception hierarchy --------------------------------------------

class Warning(Exception):  # noqa: A001 — PEP 249 names are normative
    pass


class Error(Exception):
    pass


class InterfaceError(Error):
    pass


class DatabaseError(Error):
    pass


class DataError(DatabaseError):
    pass


class OperationalError(DatabaseError):
    pass


class IntegrityError(DatabaseError):
    pass


class InternalError(DatabaseError):
    pass


class ProgrammingError(DatabaseError):
    pass


class NotSupportedError(DatabaseError):
    pass


# --- parameter rendering (ParameterizedSparqlString analog) ------------------

@dataclass(frozen=True)
class IRI:
    """Marks a parameter as an IRI term (``setURL``,
    ``JenaPreparedStatement.java:560``)."""

    value: str


@dataclass(frozen=True)
class TypedLiteral:
    """A literal with an explicit datatype IRI (``setObject`` with a
    node value)."""

    lexical: str
    datatype: str


_LIT_ESC = str.maketrans({"\\": "\\\\", '"': '\\"', "\n": "\\n",
                          "\r": "\\r", "\t": "\\t"})


def _render_param(v) -> str:
    """One Python value -> one SPARQL term
    (``JenaPreparedStatement.setObject``'s type switch, ``:312-357``)."""
    if isinstance(v, IRI):
        if ">" in v.value or "\n" in v.value:
            raise DataError(f"invalid IRI parameter: {v.value!r}")
        return f"<{v.value}>"
    if isinstance(v, TypedLiteral):
        return f'"{v.lexical.translate(_LIT_ESC)}"^^<{v.datatype}>'
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        return f'"{v.translate(_LIT_ESC)}"'
    raise DataError(
        f"parameter of type {type(v).__name__} cannot be converted to an "
        "RDF term (JenaPreparedStatement.setObject contract)")


def _substitute(operation: str, parameters: Sequence) -> str:
    """qmark substitution OUTSIDE quoted strings and IRI brackets.

    Disambiguation against SPARQL's own ``?`` uses:

    * ``?name`` variables — a ``?`` followed by a name char is never a
      placeholder;
    * the ``<`` less-than operator — ``<`` opens an IRI only when a
      ``>`` follows before any whitespace (IRIs cannot contain spaces,
      ``FILTER(?a < ?)`` parses as the operator);
    * the ``?`` zero-or-one path modifier — a ``?`` directly attached
      to the preceding token (``<p>?``, ``(ex:p)?``, ``ex:p?``) is the
      modifier; a placeholder must stand alone (preceded by whitespace,
      start, or an opening bracket/comma)."""
    out: list[str] = []
    it = iter(parameters)
    used = 0
    i, n = 0, len(operation)
    in_str: str | None = None
    in_iri = False
    while i < n:
        ch = operation[i]
        if in_str:
            out.append(ch)
            if ch == "\\" and i + 1 < n:
                out.append(operation[i + 1])
                i += 2
                continue
            if operation.startswith(in_str, i):
                out.append(in_str[1:])
                i += len(in_str)
                in_str = None
                continue
            i += 1
            continue
        if in_iri:
            out.append(ch)
            if ch == ">":
                in_iri = False
            i += 1
            continue
        if ch in "\"'":
            trip = ch * 3
            in_str = trip if operation.startswith(trip, i) else ch
            out.append(operation[i:i + len(in_str)])
            i += len(in_str)
            continue
        if ch == "<":
            rest = operation[i + 1:]
            gt, ws = rest.find(">"), len(rest)
            for j, c in enumerate(rest):
                if c.isspace():
                    ws = j
                    break
            in_iri = gt != -1 and gt < ws
            out.append(ch)
            i += 1
            continue
        if (
            ch == "?"
            and (i + 1 >= n or not (operation[i + 1].isalnum()
                                    or operation[i + 1] == "_"))
            and (i == 0 or operation[i - 1].isspace()
                 or operation[i - 1] in "({,")
        ):
            try:
                out.append(_render_param(next(it)))
            except StopIteration:
                raise ProgrammingError(
                    "not enough parameters for the placeholders") from None
            used += 1
            i += 1
            continue
        out.append(ch)
        i += 1
    if used != len(parameters):
        raise ProgrammingError(
            f"{len(parameters)} parameters supplied for {used} placeholders")
    return "".join(out)


_UPDATE_KEYWORDS = (
    "insert", "delete", "load", "clear", "create", "drop", "add", "copy",
    "move", "with",
)


def _is_update(operation: str) -> bool:
    """Same form sniff as ``JenaStatement.execute`` (query vs update):
    skip PREFIX/BASE declarations, look at the first command word."""
    import re

    body = re.sub(
        r"^(\s*(PREFIX\s+\S+\s*<[^>]*>|BASE\s*<[^>]*>))*", "", operation,
        flags=re.IGNORECASE)
    first = body.lstrip().split(None, 1)
    return bool(first) and first[0].lower() in _UPDATE_KEYWORDS


# --- cursor ------------------------------------------------------------------

class Cursor:
    """PEP 249 cursor over SPARQL (``JenaStatement.java``)."""

    arraysize = 100

    def __init__(self, connection: "DBConnection"):
        self._conn: DBConnection | None = connection
        self._rows: Iterator | None = None
        self.description: list[tuple] | None = None
        self.rowcount = -1

    # -- plumbing --
    def _check(self) -> "DBConnection":
        if self._conn is None:
            raise InterfaceError("cursor is closed")
        if self._conn._engine is None:
            raise InterfaceError("connection is closed")
        return self._conn

    def close(self) -> None:
        self._rows = None
        self._conn = None

    def setinputsizes(self, sizes) -> None:  # PEP 249 no-ops
        pass

    def setoutputsize(self, size, column=None) -> None:
        pass

    # -- execution --
    def execute(self, operation: str, parameters: Sequence | None = None) -> "Cursor":
        conn = self._check()
        if parameters:
            operation = _substitute(operation, list(parameters))
        try:
            if _is_update(operation):
                conn._engine = conn._engine.update(operation)
                self.description = None
                self._rows = None
                # SPARQL updates report no count (JenaStatement.executeUpdate)
                self.rowcount = 0
                if conn.autocommit:
                    conn.commit()
                return self
            df = conn._engine.query(operation)
        except Error:
            raise
        except ValueError as e:
            raise ProgrammingError(str(e)) from e
        except Exception as e:  # noqa: BLE001 — engine/Spark failure
            raise OperationalError(str(e)) from e
        self.description = [
            (f.name, f.dataType.simpleString(), None, None, None, None, f.nullable)
            for f in df.schema.fields
        ]
        self._rows = df.toLocalIterator()
        self.rowcount = -1  # unknown until exhausted (streaming results)
        return self

    def executemany(self, operation: str, seq_of_parameters: Iterable[Sequence]) -> "Cursor":
        for params in seq_of_parameters:
            self.execute(operation, params)
        return self

    # -- fetching --
    def _it(self) -> Iterator:
        self._check()
        if self._rows is None:
            raise ProgrammingError("no result set (execute a query first)")
        return self._rows

    def fetchone(self) -> tuple | None:
        it = self._it()
        try:
            return tuple(next(it))
        except StopIteration:
            return None

    def fetchmany(self, size: int | None = None) -> list[tuple]:
        it = self._it()
        out: list[tuple] = []
        for _ in range(size or self.arraysize):
            try:
                out.append(tuple(next(it)))
            except StopIteration:
                break
        return out

    def fetchall(self) -> list[tuple]:
        return [tuple(r) for r in self._it()]

    def __iter__(self) -> Iterator[tuple]:
        it = self._it()
        return (tuple(r) for r in it)

    def __enter__(self) -> "Cursor":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# --- connection --------------------------------------------------------------

class DBConnection:
    """PEP 249 connection (``jdbc/connections/JenaConnection.java``).

    Transactions are snapshot rebinding over the functional engine
    connection: the working frame advances on updates; ``commit``
    promotes it, ``rollback`` restores the committed snapshot
    (``JenaConnection.commit/rollback``; autocommit defaults ON like
    ``JenaDriver.PARAM_AUTO_COMMIT``)."""

    def __init__(self, spark: SparkSession, quads: DataFrame | None = None,
                 autocommit: bool = True):
        self._engine: _EngineConnection | None = _EngineConnection(spark, quads)
        self._committed = self._engine
        self.autocommit = autocommit

    def cursor(self) -> Cursor:
        if self._engine is None:
            raise InterfaceError("connection is closed")
        return Cursor(self)

    def commit(self) -> None:
        if self._engine is None:
            raise InterfaceError("connection is closed")
        self._committed = self._engine

    def rollback(self) -> None:
        if self._engine is None:
            raise InterfaceError("connection is closed")
        self._engine = self._committed

    def close(self) -> None:
        self._engine = None

    @property
    def dataset(self) -> DataFrame:
        """The CURRENT working dataset (uncommitted changes included) —
        the engine-level escape hatch for bulk data paths."""
        if self._engine is None:
            raise InterfaceError("connection is closed")
        return self._engine.dataset

    def __enter__(self) -> "DBConnection":
        return self

    def __exit__(self, exc_type, *exc) -> None:
        if self._engine is not None:
            if exc_type is None:
                self.commit()
            else:
                self.rollback()
            self.close()


def connect(spark: SparkSession, quads: DataFrame | None = None,
            autocommit: bool = True) -> DBConnection:
    """``DriverManager.getConnection("jdbc:jena:mem:...")`` analog —
    connect to an (optionally empty) in-memory dataset frame."""
    return DBConnection(spark, quads, autocommit=autocommit)
