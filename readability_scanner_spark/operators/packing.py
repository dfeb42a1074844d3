"""Sequence packing for LLM training-data preparation.

Tokenized documents rarely fill a model's context window, so training
pipelines PACK several short documents into each fixed-length sequence
(with separators) before batching — otherwise most of every batch is
padding. This module implements deterministic **next-fit** packing:
within a shard, documents are visited in ascending id order and appended
to the current bin; a document that would overflow ``seq_len`` closes
the bin and starts the next one, and a bin that reaches ``seq_len``
exactly is closed too. A document longer than ``seq_len`` gets a bin of
its own (real pipelines then split it into ``ceil(t/seq_len)`` windows —
a trivial downstream ``explode`` of this operator's output).

Graft extension — no reference analog (pixelmixer/readability-scanner
stops at article extraction; this is the step that turns its output
into model-ready sequences).

Scale design: packing is inherently sequential WITHIN a bin stream but
embarrassingly parallel ACROSS shards, so the shard column is the unit
of parallelism — pick something content-deterministic like
``hash(doc_id) % N`` with N a few times the executor count.
``applyInPandas`` hands each shard to one python task as Arrow batches;
the per-document work is a handful of int64 ops, orders of magnitude
cheaper than the tokenization that produced ``n_tokens``, so the python
loop is nowhere near the bottleneck. Assignment depends only on the
shard's own (id, n_tokens) sequence — NOT on partitioning or
parallelism — which keeps the output reproducible across cluster
layouts (the same auditability contract as operators/sampling.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    ntok_col: str,
    shard_col: str,
    seq_len: int,
) -> DataFrame:
    """Next-fit packing of ``(shard, id, n_tokens)`` rows into
    fixed-capacity bins. Output one row per input document:
    ``shard, doc_id, n_tokens, bin_id, bin_offset`` (all long) —
    ``bin_id`` counts from 0 within each shard, ``bin_offset`` is the
    token position of the document inside its bin. NULL token counts
    pack as 0 (the document still gets a slot; callers that want NULLs
    dropped filter first)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        toks = pdf[ntok_col].fillna(0).to_numpy("int64")
        bins = []
        offs = []
        b = 0
        f = 0
        for t in toks:
            if f > 0 and f + t > seq_len:
                b += 1
                f = 0
            bins.append(b)
            offs.append(f)
            f += int(t)
            if f >= seq_len:
                b += 1
                f = 0
        return pd.DataFrame(
            {
                "shard": pdf[shard_col].to_numpy("int64"),
                "doc_id": pdf[id_col].to_numpy("int64"),
                "n_tokens": toks,
                "bin_id": bins,
                "bin_offset": offs,
            }
        )

    return (
        df.select(shard_col, id_col, ntok_col)
        .groupBy(shard_col)
        .applyInPandas(
            pack,
            schema="shard long, doc_id long, n_tokens long, "
            "bin_id long, bin_offset long",
        )
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Audit table over :func:`pack_sequences` output: per shard, the
    bin count, document count, token total, and utilization (token
    total over bin capacity, the padding-waste complement). Oversize
    documents push utilization above 1 for their bins; the per-shard
    figure stays an honest ratio."""
    return (
        packed.groupBy("shard")
        .agg(
            (F.max("bin_id") + 1).alias("n_bins"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "shard",
            "n_bins",
            "n_docs",
            "total_tokens",
            F.round(
                F.col("total_tokens") / (F.col("n_bins") * F.lit(seq_len)), 4
            ).alias("utilization"),
        )
        .orderBy("shard")
    )
