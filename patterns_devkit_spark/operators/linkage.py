"""Blocked record linkage / entity resolution primitives.

Beyond-reference extension (SURVEY.md §2.10 family): a training-data
pipeline at 100 TB constantly reconciles entity records across feeds —
product catalogs vs vendor feeds, author records vs crawl metadata —
where keys don't carry over and attributes arrive dirty. The classic
(Fellegi-Sunter) shape is:

    blocking -> candidate pairs -> attribute scoring -> best match

Scale contract (every helper below keeps it):

- Candidate generation is ALWAYS an equi-join on blocking keys — a
  shuffle bounded by block sizes, NEVER a cross join. Multi-pass
  blocking (union of several cheap keys) buys recall without widening
  any single block; pair-keys are deduplicated BEFORE scoring so a
  pair found by two passes is scored once.
- Scoring is codegen'd JVM expressions (built-in ``levenshtein``,
  CASE arithmetic) — no Python in the pair loop.
- Best-match selection is a per-left-id window (rank by score with a
  deterministic tiebreak), so the output is one row per dirty record.
- Skew caveat (same family as the PPJoin prefix index, SCALE.md §65):
  on bounded-vocabulary attributes a prefix block grows linearly with
  the corpus, making candidates quadratic. Production mitigations:
  longer prefixes, composite blocking keys, or df-capped blocks —
  the multi-pass union keeps recall while each pass stays narrow.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def candidate_pairs(
    left: DataFrame,
    right: DataFrame,
    block_on: list[tuple[str, str]],
) -> DataFrame:
    """Equi-join candidate generation on blocking keys.

    ``block_on`` is a list of (left_col, right_col) pairs; the join is
    the conjunction of their equalities. Both inputs should already be
    projected to the columns scoring needs — column pruning then
    reaches the parquet scan.
    """
    cond = reduce(
        lambda a, b: a & b,
        [left[lc] == right[rc] for lc, rc in block_on],
    )
    return left.join(right, cond, "inner")


def union_pair_keys(pair_dfs: list[DataFrame]) -> DataFrame:
    """Multi-pass blocking: union candidate PAIR KEYS from several
    blocking passes and deduplicate, so downstream scoring sees each
    pair exactly once regardless of how many passes surfaced it."""
    return reduce(lambda a, b: a.unionByName(b), pair_dfs).distinct()


def best_match(
    scored: DataFrame,
    left_id: str | list[str],
    score_col: str = "score",
    tiebreak: str | None = None,
    threshold: int | None = None,
) -> DataFrame:
    """One row per ``left_id`` (a column or composite key list): the
    highest-scoring candidate, with a deterministic tiebreak column
    (ascending) so replays are exact. Rows under ``threshold`` are
    dropped AFTER ranking (standard linkage semantics: a weak best
    match is a non-match, not a fall-through to the second-best)."""
    ids = [left_id] if isinstance(left_id, str) else list(left_id)
    numeric_tiebreak = tiebreak is not None and isinstance(
        scored.schema[tiebreak].dataType, NumericType
    )
    if numeric_tiebreak:
        # argmax as a HASH AGGREGATE (max_by with (score, -tiebreak)
        # ordering), not a window: a row_number window shuffles AND
        # sorts every candidate row (measured 12s of a 21s linkage at
        # sf0.1 on 8.4M candidates); max_by partial-aggregates map-side
        # so only one surviving row per left id crosses the wire.
        payload = F.struct(*scored.columns)
        ordk = F.struct(F.col(score_col), (-F.col(tiebreak)).alias("__tb"))
        out = (
            scored.groupBy(*ids)
            .agg(F.max_by(payload, ordk).alias("__best"))
            .select("__best.*")
        )
    else:
        order = [F.col(score_col).desc()]
        if tiebreak is not None:
            order.append(F.col(tiebreak).asc())
        w = Window.partitionBy(*ids).orderBy(*order)
        out = scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    if threshold is not None:
        out = out.filter(F.col(score_col) >= threshold)
    return out


def agreement_score(components: list[tuple[Column, int, int]]) -> Column:
    """Fellegi-Sunter-style additive log-odds score: for each
    (predicate, agree_weight, disagree_weight) component, add
    agree_weight when the predicate holds else disagree_weight.
    Integer weights keep the score exact across engines."""
    total = F.lit(0)
    for pred, agree, disagree in components:
        total = total + F.when(pred, F.lit(agree)).otherwise(F.lit(disagree))
    return total.cast("long")
