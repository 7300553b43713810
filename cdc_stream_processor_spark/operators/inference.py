"""Batch model-inference plumbing for data pipelines.

Large-scale corpus construction interleaves *model* stages — embedding
generation, quality classifiers, reward scoring — between the relational
stages. On Spark the right shape is Arrow-batched ``mapInPandas``: the
model sees fixed-size dense batches (bounded GPU/host memory per task),
partitions stream batch-by-batch (no per-partition materialization), and
the operator is a plain map — no shuffle, embarrassingly parallel across
executors.

This module provides the harness plus a DETERMINISTIC STUB scorer (the
real encoder is a model checkpoint this environment doesn't ship — same
stub pattern as operators.multimodal's decode stage): ``pseudo_embed``
derives a unit-scale feature vector from the text's polynomial hash via
an affine LCG per dimension — pure integer arithmetic, so the DuckDB
oracle replays the "model" bit-for-bit and the PLUMBING (batching,
schema, determinism, scale shape) is what the gate verifies. Swap
``scorer=`` with a real model callable for production use.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_stream_processor_spark.functions.texthash import P_MOD
from cdc_stream_processor_spark.plans.layout import ensure_parallelism

EMBED_DIM = 16
INFER_BATCH = 256  # rows per model batch — bounds per-task peak memory

# per-dimension affine mix of the doc hash (LCG constants; products stay
# exact: h < P < 2^30, a < 2^31 → a*h < 2^61)
EMBED_A = 1_103_515_245
EMBED_B = 12_345


def pseudo_embed_batch(texts: list[str]) -> list[list[float]]:
    """Stub encoder: dim-j component = ((h·A + j·B + j²) mod P)/P − 0.5
    where h is the text's char polyhash. Deterministic, replayable in SQL."""
    from cdc_stream_processor_spark.functions.fasthash import polyhash_batch

    hs = polyhash_batch([t if t is not None else "" for t in texts])
    out = []
    for h in hs:
        vec = []
        for j in range(EMBED_DIM):
            v = (int(h) * EMBED_A + j * EMBED_B + j * j) % P_MOD
            vec.append(v / float(P_MOD) - 0.5)
        out.append(vec)
    return out


def batch_inference(
    docs: DataFrame,
    scorer: Callable[[list[str]], list[list[float]]] = pseudo_embed_batch,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = INFER_BATCH,
) -> DataFrame:
    """Run ``scorer`` over the corpus in bounded batches. The scorer maps a
    list of texts to one vector per text (an embedding / per-class score
    row). Arrow streams partitions in; the harness re-chunks to
    ``batch_size`` so the model's peak batch is controlled independently
    of ``spark.sql.execution.arrow.maxRecordsPerBatch``. Map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for s in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[s : s + batch_size]
                vecs = scorer(list(chunk[text_col]))
                yield pd.DataFrame(
                    {"doc_id": chunk[id_col].values, "embedding": vecs}
                )

    return ensure_parallelism(
        docs.select(F.col(id_col).alias(id_col), F.col(text_col))
    ).mapInPandas(run, schema="doc_id long, embedding array<double>")
