"""Process-level memo for DETERMINISTIC derived DataFrames.

Several registered queries share an expensive deterministic sub-result on
the identical input (PQ training feeds both `pq_codes` and `pq_adc_topk`;
the LSH near-dup pair table feeds both `embedding_near_dup_pairs` and
`embedding_near_dup`).  Within one process (a bench run, a notebook
session) the second caller should reuse the first's materialization
instead of recomputing — a memo hit is bit-identical to a recompute
because every memoized builder is deterministic by the engine's oracle
contract.

Keys combine the Spark application id (a localCheckpointed RDD dies with
its session), the exprId-normalized analyzed plan of each input (stable
across re-derivations of the same logical query, distinct across
different filters/paths), and the operator parameters.  Entries are
localCheckpointed (eager, lineage-free) and the store is a small bounded
FIFO — this is a latency cache for repeated in-process calls, not a
table cache.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame

_MEMO: dict[tuple, tuple[DataFrame, ...]] = {}
# r12: 8 -> 16. Seven operators now memoize (LSH pairs, kNN graph, LPA,
# PQ train/codes, IVF, brute-force top-k, ER); with 8 slots a FIFO
# eviction could land between a value's first build and its second
# consumer in the alphabetical bench order. Entries are bounded derived
# tables (top-k lists, label vectors, pair tables), not corpus data.
_MEMO_MAX = 16


def plan_fingerprint(df: DataFrame) -> str:
    """Analyzed-plan string with exprIds (#NNN) stripped — stable across
    re-derivations of the same logical query — combined with the
    canonicalized-plan semanticHash.  The hash matters for LocalRelation
    inputs (createDataFrame): their plan STRING shows only the output
    schema, so two different literal datasets of the same shape would
    otherwise collide; semanticHash covers the relation's data."""
    plan = df._jdf.queryExecution().analyzed().toString()
    stripped = re.sub(r"#\d+", "#", plan)
    return f"{stripped}|sh={df.semanticHash()}"


def df_memo(
    key: tuple,
    builder: Callable[[], tuple[DataFrame, ...]],
) -> tuple[DataFrame, ...]:
    """Return the memoized (localCheckpointed) DataFrames for ``key``,
    building and materializing them on first call.  ``builder`` must be
    deterministic; it returns a tuple of DataFrames that are checkpointed
    as the memo value.

    Staleness hazard: the fingerprint covers the logical plan, NOT the
    bytes on disk — if the files under a fingerprinted path are
    OVERWRITTEN within the same process, a memo hit returns the old
    materialization.  Callers that rewrite inputs in-process must use a
    fresh session (app id is part of the key) or avoid the memo.
    """
    hit = _MEMO.get(key)
    if hit is not None:
        return hit
    out = tuple(df.localCheckpoint() for df in builder())
    while len(_MEMO) >= _MEMO_MAX:
        # Eviction drops the store's reference only; the checkpointed
        # blocks are freed by the JVM's ContextCleaner once the RDD is
        # garbage-collected.  Dataset.unpersist() would be a no-op here
        # (it routes through the CacheManager, which never registered a
        # localCheckpoint), and force-unpersisting the underlying RDD
        # would corrupt still-held caller references whose lineage the
        # checkpoint truncated — so GC is the only safe release path.
        _MEMO.pop(next(iter(_MEMO)))  # FIFO (dicts are insertion-ordered)
    _MEMO[key] = out
    return out
