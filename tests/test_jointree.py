"""Join-tree plan explain (``queries/jointree.py`` — the
neo-optimizer fork's ``tdbqueryplan`` / ``VisitorJoinTreeNeo2`` /
``BinaryTreePlan`` surface) and its CLI subcommand."""

from __future__ import annotations

import json

from jena_spark.cli import main
from jena_spark.queries.jointree import (
    DELIM,
    join_tree,
    leaf,
    query_plan,
    tree_json,
)
from jena_spark.queries.algebra import Var

EX = "http://ex.org/"


def _pat(s, p, o):
    def term(t):
        if isinstance(t, str) and t.startswith("?"):
            return Var(t[1:])
        if isinstance(t, str):
            return ("iri", t)
        return t
    return (term(s), term(p), term(o))


def test_leaf_signature_and_anchor_preference():
    # concrete predicate anchors the leaf
    l1 = leaf(_pat("?s", EX + "p", "?o"))
    assert l1["tpf_type"] == "VAR_URI_VAR" and l1["predicates"] == [EX + "p"]
    # variable predicate: subject URI is the next anchor
    l2 = leaf(_pat(EX + "s", "?p", "?o"))
    assert l2["tpf_type"] == "URI_VAR_VAR" and l2["predicates"] == [EX + "s"]
    # then the object URI
    l3 = leaf(_pat("?s", "?p", EX + "o"))
    assert l3["tpf_type"] == "VAR_VAR_URI" and l3["predicates"] == [EX + "o"]
    # the reference's explicit NONE signatures stay anchorless
    l4 = leaf(_pat("?s", "?p", "?o"))
    assert l4["tpf_type"] == "VAR_VAR_VAR" and l4["predicates"] == []
    assert tree_json(dict(type="TPF", **l4)) == ["VAR_VAR_VAR" + DELIM + "NONE"]


def test_left_deep_fold_and_join_labels():
    pats = [
        _pat("?a", EX + "p1", "?b"),
        _pat("?b", EX + "p2", "?c"),
        _pat("?c", "?p", "?d"),
    ]
    t = join_tree(pats)
    # left-deep: root JOIN's right child is a TPF, left child a JOIN
    assert t["type"] == "JOIN"
    assert t["left"]["type"] == "JOIN" and t["right"]["type"] == "TPF"
    # join predicates = all leaf anchors underneath, in fold order
    assert t["predicates"] == [EX + "p1", EX + "p2"]
    arr = tree_json(t)
    assert arr[0] == "JOIN" + DELIM + EX + "p1" + DELIM + EX + "p2"
    assert isinstance(arr[1], list) and isinstance(arr[2], list)


def test_stats_reorder_changes_leaf_order():
    q = (f"SELECT * WHERE {{ ?s <{EX}common> ?a . "
         f"?s <{EX}rare> ?b . }}")
    fixed = json.loads(query_plan(q)[0])
    # fixed weights tie -> syntactic order: common leads
    assert fixed[1] == [f"VAR_URI_VAR{DELIM}{EX}common"]
    stats = json.loads(
        query_plan(q, {EX + "common": 10_000, EX + "rare": 2})[0]
    )
    # collected counts flip the order: the rare predicate scans first
    assert stats[1] == [f"VAR_URI_VAR{DELIM}{EX}rare"]


def test_runs_split_like_the_compiler():
    q = (f"SELECT * WHERE {{ ?s <{EX}a> ?x . ?x <{EX}b> ?y . "
         f"FILTER(?y != <{EX}z>) ?y <{EX}c> ?w . "
         f"OPTIONAL {{ ?w <{EX}d> ?v . }} }}")
    trees = query_plan(q)
    # FILTER and the OPTIONAL boundary flush: three separate trees
    assert len(trees) == 3
    assert json.loads(trees[1]) == [f"VAR_URI_VAR{DELIM}{EX}c"]
    assert json.loads(trees[2]) == [f"VAR_URI_VAR{DELIM}{EX}d"]


def test_path_triples_are_their_own_step():
    # the compiler flushes the BGP run at every PathExpr — the trees
    # must show the same three steps, the path leaf typed PATH
    q = (f"SELECT * WHERE {{ ?a <{EX}p1> ?b . "
         f"?a <{EX}q>+ ?c . ?c <{EX}p2> ?d . }}")
    trees = [json.loads(t) for t in query_plan(q)]
    assert len(trees) == 3
    assert trees[0] == [f"VAR_URI_VAR{DELIM}{EX}p1"]
    assert trees[1] == [f"VAR_PATH_VAR{DELIM}PATH"]
    assert trees[2] == [f"VAR_URI_VAR{DELIM}{EX}p2"]
    # a mixed list through the API errors instead of printing a join
    # order the engine never executes
    import pytest as _pytest
    from jena_spark.queries.sparql import Parser

    parsed = Parser(q).parse()
    pats = [el[1] for el in parsed.where.elements if el[0] == "triple"]
    with _pytest.raises(ValueError, match="own"):
        join_tree(pats)


def test_leaf_cardinality_matches_reorder_weight():
    from jena_spark.queries.algebra import stats_weight

    counts = {EX + "p": 42}
    pat = _pat("?s", EX + "p", "?o")
    assert leaf(pat, counts)["cardinality"] == stats_weight(pat, set(), counts)


def test_cli_queryplan(capsys, tmp_path, spark):
    ttl = tmp_path / "d.ttl"
    ttl.write_text(
        f"@prefix ex: <{EX}> .\n"
        "ex:a ex:rare ex:b .\n"
        "ex:a ex:common ex:c .\n"
        "ex:b ex:common ex:d .\n"
        "ex:c ex:common ex:e .\n"
    )
    qcsv = tmp_path / "q.csv"
    qcsv.write_text(
        "id;query\n"
        f"q1;SELECT * WHERE {{ ?s <{EX}common> ?a . ?s <{EX}rare> ?b . }}\n"
        "q2;NOT A QUERY AT ALL(\n"
        "short-row-without-a-query-column\n"
    )
    out = tmp_path / "plans.csv"
    rc = main([
        "--cores", "4", "--shuffle-partitions", "4",
        "queryplan", "--queries-file", str(qcsv),
        "--query-column", "1", "--id-column", "0",
        "--input-delimiter", ";", "--data", str(ttl),
        "--out", str(out),
    ])
    capsys.readouterr()
    assert rc == 0
    lines = out.read_text(encoding="utf-8").splitlines()
    # the unparseable query AND the short row are skipped (the
    # reference logs bad records and continues)
    assert len(lines) == 1
    qid, qtext, tree = lines[0].split("ᶶ")
    assert qid == "q1" and "SELECT" in qtext
    arr = json.loads(tree)
    # stats from --data put the rarer predicate first
    assert arr[1] == [f"VAR_URI_VAR{DELIM}{EX}rare"]


def test_measured_query_plan(spark):
    """--measure registries (tdbqueryplan.java:46-51 with EXECUTED
    numbers): per-pattern scan cardinalities from one shared pass,
    leaf labels annotated ᶷ<count>, real execution rows + wall ms."""
    from jena_spark.queries.jointree import (
        VAL_DELIM,
        measured_query_plan,
        pattern_cardinalities,
        pattern_key,
    )

    rows = [
        ("iri", EX + "a", EX + "rare", "iri", EX + "b", None, None),
        ("iri", EX + "a", EX + "common", "iri", EX + "c", None, None),
        ("iri", EX + "b", EX + "common", "iri", EX + "d", None, None),
        ("iri", EX + "c", EX + "common", "iri", EX + "e", None, None),
    ]
    data = spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string,"
              "o_val string, o_datatype string, o_lang string")
    q = (f"SELECT * WHERE {{ ?s <{EX}common> ?a . "
         f"?s <{EX}rare> ?b . }}")

    # the one-pass cardinality registry
    pats = [_pat("?s", EX + "common", "?a"), _pat("?s", EX + "rare", "?b")]
    cards = pattern_cardinalities(data, pats)
    assert cards == {
        f"?s <{EX}common> ?a": 3,
        f"?s <{EX}rare> ?b": 1,
    }

    reg = measured_query_plan(data, q)
    assert set(reg) == {"query", "execution_tree", "cardinality",
                        "rows", "time_ms"}
    assert reg["cardinality"] == cards
    assert reg["rows"] == 1  # ex:a joins rare+common
    assert reg["time_ms"] > 0
    [tree] = reg["execution_tree"]
    arr = json.loads(tree)
    # fixed reorder puts rare's weight equal; check annotated labels
    leaves = [arr[1][0], arr[2][0]]
    assert f"VAR_URI_VAR{DELIM}{EX}rare{VAL_DELIM}1" in leaves
    assert f"VAR_URI_VAR{DELIM}{EX}common{VAL_DELIM}3" in leaves


def test_cli_queryplan_measure(capsys, tmp_path, spark):
    ttl = tmp_path / "d.ttl"
    ttl.write_text(
        f"@prefix ex: <{EX}> .\n"
        "ex:a ex:rare ex:b .\n"
        "ex:a ex:common ex:c .\n"
        "ex:b ex:common ex:d .\n"
        "ex:c ex:common ex:e .\n"
    )
    qcsv = tmp_path / "q.csv"
    qcsv.write_text(
        "id;query\n"
        f"q1;SELECT * WHERE {{ ?s <{EX}common> ?a . ?s <{EX}rare> ?b . }}\n"
    )
    out = tmp_path / "plans.csv"
    rc = main([
        "--cores", "4", "--shuffle-partitions", "4",
        "queryplan", "--queries-file", str(qcsv),
        "--query-column", "1", "--id-column", "0",
        "--input-delimiter", ";", "--data", str(ttl), "--measure",
        "--out", str(out),
    ])
    capsys.readouterr()
    assert rc == 0
    [line] = out.read_text(encoding="utf-8").splitlines()
    qid, qtext, trees, cards, nrows, ms = line.split("ᶶ")
    assert qid == "q1" and nrows == "1" and float(ms) > 0
    assert json.loads(cards) == {
        f"?s <{EX}common> ?a": 3, f"?s <{EX}rare> ?b": 1}
    arr = json.loads(trees)
    # stats-fed reorder puts rare first; its measured count rides ᶷ
    assert arr[1] == [f"VAR_URI_VAR{DELIM}{EX}rareᶷ1"]
    assert arr[2] == [f"VAR_URI_VAR{DELIM}{EX}commonᶷ3"]

    # --measure without --data is a loud usage error
    assert main(["queryplan", "--queries-file", str(qcsv),
                 "--measure"]) == 2


def test_reorder_patterns_measured_feedback(spark):
    """The fork's feedback loop closed: cardinalities harvested from a
    run re-order the next run's BGP (ReorderWeighted with EXECUTED
    weights), and the reordered plan returns identical bindings."""
    from jena_spark.queries import algebra as A
    from jena_spark.queries.jointree import (
        pattern_cardinalities,
        reorder_patterns_measured,
    )

    rows = [("iri", EX + "a", EX + "rare", "iri", EX + "b", None, None)]
    rows += [("iri", EX + ("a" if i == 0 else f"x{i}"), EX + "common",
              "iri", EX + f"y{i}", None, None) for i in range(6)]
    data = spark.createDataFrame(
        rows, "s_kind string, s_val string, p_val string, o_kind string,"
              "o_val string, o_datatype string, o_lang string")
    # both patterns have the same SHAPE (VAR_URI_VAR) so ReorderFixed
    # keeps the written order; only measured weights can flip it
    pats = [_pat("?s", EX + "common", "?a"), _pat("?s", EX + "rare", "?b")]
    cards = pattern_cardinalities(data, pats)
    assert cards[f"?s <{EX}rare> ?b"] == 1
    ordered = reorder_patterns_measured(pats, cards)
    assert ordered[0][1] == ("iri", EX + "rare")  # measured-rare leads

    # unmeasured patterns defer to measured ones (max+1 prior) ...
    extra = _pat("?b", EX + "unseen", "?c")
    ordered2 = reorder_patterns_measured([extra, *pats], cards)
    assert ordered2[0][1] == ("iri", EX + "rare")
    # ... and fall back to the stats estimate when provided
    ordered3 = reorder_patterns_measured(
        [extra, *pats], cards, pred_counts={EX + "unseen": 1000})
    assert ordered3[-1][1] == ("iri", EX + "unseen")

    # end-to-end: bgp(measured_cards=...) binds identically
    want = sorted(map(tuple, A.flatten(
        A.bgp(data, pats), ["s", "a", "b"]).collect()))
    got = sorted(map(tuple, A.flatten(
        A.bgp(data, pats, measured_cards=cards), ["s", "a", "b"]).collect()))
    assert got == want and len(got) == 1
