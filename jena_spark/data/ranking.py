"""Bradley-Terry strength estimation over pairwise preference data.

The standard aggregation behind RLHF reward evaluation and arena
leaderboards (Bradley & Terry 1952; the MM fixpoint is Hunter 2004,
"MM algorithms for generalized Bradley-Terry models", public method):
given ``(winner, loser)`` match rows, estimate a per-player strength
``s_i`` such that ``P(i beats j) = s_i / (s_i + s_j)``. Each MM
iteration is::

    s_i  <-  W_i / sum_j  n_ij / (s_i + s_j)

with ``W_i`` = total wins of ``i`` and ``n_ij`` = games between
``i`` and ``j``, followed by a mean-1 rescale (the likelihood is
scale-invariant).

Determinism (the ``kg_sparql_custom_fn`` lesson): every iteration is
EXACT INTEGER arithmetic — strengths live in micro-units (bigint),
each pair term is ``n_ij * 1e12 DIV (s_i + s_j)`` (bigint floor
division), so sums are order-independent and Spark and DuckDB agree
bit-for-bit. No floats anywhere.

Scale design (axis: arena logs at 10^9 matches, 10^2-10^4 players):
the only corpus-sized work is the two count aggregations (wins,
unordered pair counts) — both partial-aggregate map-side, shuffling
at most P^2 pair rows. The fixed-count MM loop then runs on P-row /
P^2-row frames (joins against the tiny strengths frame broadcast by
AQE); the loop is over ITERATIONS, never over data. Micro-unit bigint
headroom bounds W_i and n_ij at ~9e6 per pair — beyond that, rescale
to coarser units or decimal(38); documented rather than silently
truncated.

No reference-twin: Jena has no preference-aggregation operators —
this extends the repo's LLM-data-pipeline surface (SURVEY.md "beyond
the reference" mandate) next to data/preference.py's pair builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: strength quantum: strengths are bigints in units of 1e-6.
_MICRO = 1_000_000
#: pair-term quantum: n_ij * 1e12 DIV (s_i + s_j) keeps ~6 decimal
#: digits of the term once divided by micro-unit strengths.
_TERM = 1_000_000_000_000


def bt_scores(matches: DataFrame, n_iter: int = 5, *,
              winner: str = "winner", loser: str = "loser") -> DataFrame:
    """Bradley-Terry strengths after ``n_iter`` integer MM rounds.

    Returns ``(player, wins, games, score_micro)`` — one row per
    player appearing in any match; ``score_micro`` is the mean-1-
    normalized strength in micro-units (a never-winning player's MLE
    strength is 0, and stays 0 here).
    """
    if n_iter < 1:
        raise ValueError(f"bt_scores: n_iter must be >= 1, got {n_iter}")
    m = matches.select(F.col(winner).alias("w"), F.col(loser).alias("l"))
    players = (m.select(F.col("w").alias("player"))
               .union(m.select("l")).distinct())
    wins = (players.join(m.groupBy(F.col("w").alias("player"))
                          .agg(F.count("*").alias("wins")),
                         "player", "left")
            .select("player", F.coalesce("wins", F.lit(0))
                    .cast("bigint").alias("wins")))
    pairs = (m.groupBy(F.least("w", "l").alias("a"),
                       F.greatest("w", "l").alias("b"))
             .agg(F.count("*").cast("bigint").alias("n")))
    sym = (pairs.select(F.col("a").alias("i"), F.col("b").alias("j"), "n")
           .union(pairs.select(F.col("b").alias("i"),
                               F.col("a").alias("j"), "n")))
    games = sym.groupBy(F.col("i").alias("player")) \
               .agg(F.sum("n").cast("bigint").alias("games"))
    np_tot = players.agg(F.count("*").alias("p"))

    # The MM loop consumes wins/sym/np_tot once PER ITERATION and each
    # round's s feeds the next: without lineage truncation every
    # iteration's job re-scans the raw matches and the plan tree grows
    # superlinearly (Catalyst re-optimizes the whole prefix — measured
    # minutes of driver time at n_iter=6 on a 4-row input). These are
    # P/P^2-row aggregates, so checkpointing them is free; the matches
    # scan happens exactly once.
    wins = wins.localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)
    np_tot = np_tot.localCheckpoint(eager=True)

    s = players.select("player", F.lit(_MICRO).cast("bigint").alias("s"))
    for _ in range(n_iter):
        d = (sym
             .join(s.select(F.col("player").alias("i"),
                            F.col("s").alias("si")), "i")
             .join(s.select(F.col("player").alias("j"),
                            F.col("s").alias("sj")), "j")
             # greatest(.,1): a pair of two zero-strength players would
             # divide by zero (ANSI mode aborts); the huge resulting
             # term keeps both at strength 0, the MM fixpoint for
             # never-winners.
             .select("i", F.expr(f"n * {_TERM}"
                                 " DIV greatest(si + sj, 1)").alias("t"))
             .groupBy(F.col("i").alias("player"))
             .agg(F.sum("t").cast("bigint").alias("dn")))
        raw = (wins.join(d, "player")
               .select("player", F.expr(f"wins * {_TERM}"
                                        " DIV greatest(dn, 1)")
                       .cast("bigint").alias("sr")))
        tot = raw.agg(F.sum("sr").alias("ts"))
        s = (raw.crossJoin(F.broadcast(tot))
             .crossJoin(F.broadcast(np_tot))
             .select("player", F.expr(f"sr * p * {_MICRO}"
                                      " DIV greatest(ts, 1)")
                     .cast("bigint").alias("s"))
             .localCheckpoint(eager=True))
    return (wins.join(games, "player")
            .join(s, "player")
            .select("player", "wins", "games",
                    F.col("s").alias("score_micro")))


def bt_scores_sql(matches_cte: str, n_iter: int = 5) -> str:
    """DuckDB twin of :func:`bt_scores` — the MM loop fully unrolled
    as CTE blocks (the ``data_kmeans`` precedent). ``matches_cte``
    must yield columns ``winner, loser``."""
    blocks = [f"""m AS (SELECT winner AS w, loser AS l FROM ({matches_cte})),
p AS (SELECT DISTINCT player FROM
      (SELECT w AS player FROM m UNION ALL SELECT l FROM m)),
wins AS (
  SELECT p.player, CAST(coalesce(wn.c, 0) AS BIGINT) AS wins
  FROM p LEFT JOIN (SELECT w AS player, count(*) AS c FROM m GROUP BY w) wn
  USING (player)),
pr AS (SELECT least(w, l) AS a, greatest(w, l) AS b,
              CAST(count(*) AS BIGINT) AS n
       FROM m GROUP BY 1, 2),
sym AS (SELECT a AS i, b AS j, n FROM pr
        UNION ALL SELECT b, a, n FROM pr),
gm AS (SELECT i AS player, CAST(sum(n) AS BIGINT) AS games
       FROM sym GROUP BY i),
np AS (SELECT CAST(count(*) AS BIGINT) AS p FROM p),
s0 AS (SELECT player, CAST({_MICRO} AS BIGINT) AS s FROM p)"""]
    for it in range(1, n_iter + 1):
        prev = f"s{it - 1}"
        blocks.append(f"""d{it} AS (
  SELECT sym.i AS player,
         CAST(sum(n * {_TERM} // greatest(si.s + sj.s, 1)) AS BIGINT) AS dn
  FROM sym JOIN {prev} si ON si.player = sym.i
           JOIN {prev} sj ON sj.player = sym.j
  GROUP BY sym.i),
r{it} AS (SELECT wins.player,
               CAST(wins * {_TERM} // greatest(dn, 1) AS BIGINT) AS sr
        FROM wins JOIN d{it} USING (player)),
t{it} AS (SELECT CAST(sum(sr) AS BIGINT) AS ts FROM r{it}),
s{it} AS (SELECT player,
               CAST(sr * np.p * {_MICRO} // greatest(ts, 1) AS BIGINT) AS s
        FROM r{it}, t{it}, np)""")
    blocks.append(f"""f AS (
  SELECT wins.player, wins.wins, gm.games, s{n_iter}.s AS score_micro
  FROM wins JOIN gm USING (player) JOIN s{n_iter} USING (player))
SELECT * FROM f""")
    return "WITH " + ",\n".join(blocks[:-1]) + ",\n" + blocks[-1]
