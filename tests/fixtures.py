"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Seeded (default 42), no external data. Produces:
* transcripts rows exactly shaped per BASELINE.json input_hint
  ``(conv_id, turn_idx, role, text, tool, ts)``;
* gold mentions (conv_id, turn_idx, surface, entity) — the planted
  truth consumed by the oracle.

Properties required by FIXTURES.md: zipf-ish conversation lengths, hot
entities in a large fraction of conversations (skew), cross-conv entity
reuse, zero-mention turns, unicode/quote/newline text.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

from jena_spark.gazetteer import DEFAULT_GAZETTEER, HOT_ENTITIES, surface_to_canonical

_FILLER = [
    "let's look at the plan",
    "running the job now",
    "the shuffle stage finished",
    "reading the parquet files",
    "here is the summary",
    "can you check the output",
    "retrying with more partitions",
    "looks good to me",
    "écrit en français — d'accord",
    'he said "quote me on that"',
    "line one\nline two",
    "unicode: naïve café ⚡",
]

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "python", "sql", "browser"]

_BASE_TS = datetime(2026, 1, 1, 0, 0, 0)


def gen_transcripts(
    n_convs: int = 40,
    seed: int = 42,
    hot_fraction: float = 0.6,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (transcripts_pdf, gold_mentions_pdf)."""
    rng = random.Random(seed)
    surf2canon = surface_to_canonical(DEFAULT_GAZETTEER)
    all_surfaces = sorted(surf2canon)
    cold_surfaces = [s for s in all_surfaces if surf2canon[s] not in HOT_ENTITIES]
    hot_surfaces = [s for s in all_surfaces if surf2canon[s] in HOT_ENTITIES]

    rows: list[dict] = []
    gold: list[dict] = []
    for c in range(n_convs):
        conv_id = f"conv-{c:06d}"
        # zipf-ish lengths: many short, few long
        n_turns = max(2, int(rng.paretovariate(1.2)))
        n_turns = min(n_turns, 40)
        ts = _BASE_TS + timedelta(hours=c)
        conv_is_hot = rng.random() < hot_fraction
        for t in range(n_turns):
            role = _ROLES[t % 3] if rng.random() < 0.8 else rng.choice(_ROLES)
            tool = rng.choice(_TOOLS) if role == "tool" else None
            parts = [rng.choice(_FILLER)]
            # plant 0-3 mentions; hot conversations prefer hot entities
            n_mentions = rng.choice([0, 0, 1, 1, 2, 3])
            planted: list[str] = []
            for _ in range(n_mentions):
                pool = hot_surfaces if (conv_is_hot and rng.random() < 0.7) else cold_surfaces
                planted.append(rng.choice(pool))
            for s in planted:
                parts.insert(rng.randrange(1, len(parts) + 1), f"we discussed {s} earlier")
            text = ". ".join(parts)
            for s in planted:
                gold.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": t,
                        "surface": s,
                        "entity": surf2canon[s],
                    }
                )
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": ts + timedelta(seconds=37 * t),
                }
            )
    tdf = pd.DataFrame(rows)
    tdf["turn_idx"] = tdf["turn_idx"].astype("int32")
    gdf = pd.DataFrame(gold, columns=["conv_id", "turn_idx", "surface", "entity"])
    if len(gdf):
        gdf["turn_idx"] = gdf["turn_idx"].astype("int32")
        gdf = gdf.drop_duplicates().reset_index(drop=True)
    return tdf, gdf
