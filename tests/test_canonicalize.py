"""Connected-components unit tests vs a union-find oracle."""

from __future__ import annotations

import random

from jena_spark.oracle.ref_pipeline import _components
from jena_spark.pipeline.canonicalize import connected_components


def _run(spark, pairs):
    e = spark.createDataFrame(pairs, "src string, dst string")
    got = {
        (r["node"], r["component"]) for r in connected_components(e).collect()
    }
    want_map = _components(pairs)
    # mapping contract: every node in some component appears, including
    # representatives self-mapped (rep -> rep)
    want = {(n, c) for n, c in want_map.items()}
    return got, want


def test_cc_star(spark):
    pairs = [("b", "a"), ("c", "a"), ("d", "a")]
    got, want = _run(spark, pairs)
    assert got == want


def test_cc_chain(spark):
    # long chain — the case naive label propagation handles slowly
    nodes = [f"n{i:03d}" for i in range(60)]
    pairs = list(zip(nodes[1:], nodes[:-1]))
    got, want = _run(spark, pairs)
    assert got == want


def test_cc_random_graph(spark):
    rng = random.Random(7)
    nodes = [f"x{i:02d}" for i in range(40)]
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(50)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    got, want = _run(spark, pairs)
    assert got == want


def test_cc_two_components(spark):
    pairs = [("b", "a"), ("c", "b"), ("z", "y")]
    got, want = _run(spark, pairs)
    assert got == want
    comp = dict(got)
    assert comp["c"] == "a" and comp["z"] == "y"


def test_connected_components_distributed_equals_driver(spark):
    """Force the distributed (encoded large-star/small-star) path with
    driver_threshold=0 and assert it matches the driver union-find on a
    graph with chains, stars, and multiple components — including the
    min-STRING representative election."""
    edges = [
        ("b", "a"), ("c", "b"), ("d", "c"),        # chain -> comp 'a'
        ("x2", "x1"), ("x3", "x1"), ("x4", "x1"),  # star  -> comp 'x1'
        ("m", "z"),                                 # pair  -> comp 'm'
        ("q", "q"),                                 # self-loop dropped
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    driver = {
        (r["node"], r["component"])
        for r in connected_components(e).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(e, driver_threshold=0).collect()
    }
    assert dist == driver
    comp_of = dict(dist)
    assert comp_of["d"] == "a" and comp_of["x4"] == "x1" and comp_of["z"] == "m"
    assert comp_of["a"] == "a"  # rep self-map present
