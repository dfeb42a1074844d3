"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's upsert-by-url dedup (S4,
news-scanner/database/articles.py:89-200 → here: keep-first by key),
these are the standard corpus-dedup family: exact hash, MinHash+LSH,
SimHash, n-gram Jaccard verification. Scale notes inline.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WORD_RE = re.compile(r"\b\w+\b")

# --- exact dedup -----------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, keep_col: str) -> DataFrame:
    """Exact duplicate removal: hash-groupBy on content, keep min(key).
    One shuffle on the content hash (not the full text — xxhash64 first
    so the shuffle key is 8 bytes, the standard 100 TB trick)."""
    return (
        df.withColumn("_h", F.xxhash64(F.col(text_col)))
        .groupBy("_h")
        .agg(F.min(keep_col).alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    )


def dedup_by_key(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """S4 upsert-by-unique-key semantics as a batch operator: newest row
    per key wins (articles.py:128-132 replace_one analog) — the window
    form of Iceberg MERGE INTO."""
    w = Window.partitionBy(key).orderBy(F.desc(order_col))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


# --- shingling helpers (shared by minhash / jaccard) --------------------------------

def _shingles(text: str, n: int = 3) -> set[str]:
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


# --- MinHash + LSH -------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 64, shingle_n: int = 3, seed: int = 42
) -> DataFrame:
    """MinHash signature per document, vectorized per Arrow batch.
    Universal hashing: h_i(x) = (a_i * crc32(x) + b_i) mod p."""
    rng = np.random.RandomState(seed)
    p = (1 << 61) - 1
    a = rng.randint(1, p, size=n_hashes, dtype=np.int64)
    b = rng.randint(0, p, size=n_hashes, dtype=np.int64)

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                sh = _shingles(text, shingle_n)
                if not sh:
                    sigs.append([0] * n_hashes)
                    continue
                base = np.array(
                    [zlib.crc32(s.encode()) for s in sh], dtype=np.int64
                )  # (m,)
                # (m, k) mod-p universal hashes, min over shingles
                hashed = (base[:, None] * a[None, :] + b[None, :]) % p
                sigs.append(hashed.min(axis=0).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "signature": sigs})

    return df.select(id_col, text_col).mapInPandas(
        sign, schema=f"{id_col} long, signature array<long>"
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs via banding: split the signature into
    `bands` bands of n_hashes/bands rows; docs sharing any full band
    bucket are candidates. Shuffle is by (band, bucket-hash) — each
    bucket is tiny, so the pair join never goes quadratic globally."""
    rows = n_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n, seed)
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("signature"), i * rows + 1, rows).cast("string")
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .orderBy("id_a", "id_b")
    )


# --- SimHash ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash per document (token-hash sign voting)."""

    shifts = np.arange(bits, dtype=np.uint64)

    def sim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks = _WORD_RE.findall((text or "").lower())
                if not toks:
                    out.append(np.int64(-(1 << 63)))
                    continue
                hashes = np.fromiter(
                    (
                        zlib.crc32(t.encode()) | (zlib.crc32(t[::-1].encode()) << 32)
                        for t in toks
                    ),
                    dtype=np.uint64,
                    count=len(toks),
                )
                # vectorized sign voting: (n_tok, bits) bit matrix
                bitmat = (hashes[:, None] >> shifts[None, :]) & np.uint64(1)
                votes = (2 * bitmat.astype(np.int64) - 1).sum(axis=0)
                positive = votes > 0
                val = int((positive.astype(np.uint64) << shifts).sum(dtype=np.uint64))
                if val >= 1 << 63:  # wrap to signed 64-bit for Spark LongType
                    val -= 1 << 64
                out.append(val)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return df.select(id_col, text_col).mapInPandas(sim, schema=f"{id_col} long, simhash long")


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on the four
    16-bit slices (pigeonhole: any pair with hamming < 4 must agree on
    at least one slice, so the bucket join finds every such pair while
    staying bucket-local at scale; exact hamming verified inside
    buckets, duplicate bucket hits deduped)."""
    hashed = simhash(df, id_col, text_col)
    blocked = hashed.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        (F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))).alias(
                            "block_val"
                        ),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.block_idx", "b.block_val")
    a = blocked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("ha"), "block_idx", "block_val"
    )
    b = blocked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("hb"), "block_idx", "block_val"
    )
    return (
        a.join(b, ["block_idx", "block_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
        .orderBy("id_a", "id_b")
    )


# --- n-gram Jaccard (verification stage) ---------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float, shingle_n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs. Shingle sets are built
    JVM-side (split + transform + array_distinct), intersection via
    array_intersect — no Python. Quadratic: use after LSH candidate cut
    at scale; standalone form here for small inputs/oracle checks."""
    toks = F.split(F.lower(F.regexp_replace(F.col(text_col), r"[^\w\s]", " ")), r"\s+")
    toks = F.filter(toks, lambda x: x != "")
    n_tok = F.size(toks)
    grams = F.when(
        n_tok >= shingle_n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n_tok - shingle_n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_n)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    docs = df.select(F.col(id_col).alias("doc_id"), grams.alias("grams"))
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    union = F.size(F.array_union(F.col("ga"), F.col("gb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


# --- content-defined chunking ------------------------------------------------------------

def cdc_chunks(
    df: DataFrame, id_col: str, text_col: str, window: int = 16, mask_bits: int = 6, min_chunk: int = 64
) -> DataFrame:
    """Content-defined chunking: split each document at rolling-hash
    boundary points (hash of the trailing `window` bytes ≡ 0 mod
    2^mask_bits). Boundaries move WITH the content, so an insertion
    early in a document only changes the chunks it touches — the
    property exact/whole-doc hashing lacks. Output: (id, chunk_idx,
    chunk_hash, chunk_len); partial-overlap dedup joins on chunk_hash."""

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mask = (1 << mask_bits) - 1
        for pdf in batches:
            ids, idxs, hashes, lens = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                data = (text or "").encode("utf-8", "ignore")
                start = 0
                chunk_idx = 0
                # polynomial rolling hash over a sliding window
                h = 0
                pow_w = pow(31, window - 1, 1 << 32)
                for i, byte in enumerate(data):
                    if i >= window:
                        h = (h - data[i - window] * pow_w) & 0xFFFFFFFF
                    h = (h * 31 + byte) & 0xFFFFFFFF
                    if i - start + 1 >= min_chunk and (h & mask) == 0:
                        piece = data[start : i + 1]
                        ids.append(doc_id)
                        idxs.append(chunk_idx)
                        hashes.append(zlib.crc32(piece))
                        lens.append(len(piece))
                        start, chunk_idx = i + 1, chunk_idx + 1
                if start < len(data) or chunk_idx == 0:
                    piece = data[start:]
                    ids.append(doc_id)
                    idxs.append(chunk_idx)
                    hashes.append(zlib.crc32(piece))
                    lens.append(len(piece))
            yield pd.DataFrame(
                {id_col: ids, "chunk_idx": idxs, "chunk_hash": hashes, "chunk_len": lens}
            )

    return df.select(id_col, text_col).mapInPandas(
        chunk, schema=f"{id_col} long, chunk_idx int, chunk_hash long, chunk_len long"
    )


def cdc_overlap_pairs(
    df: DataFrame, id_col: str, text_col: str, min_shared_chunks: int = 2
) -> DataFrame:
    """Partial-overlap candidate pairs: documents sharing >=
    min_shared_chunks content-defined chunks. Join is on chunk_hash —
    bucket-local, never quadratic globally."""
    chunks = cdc_chunks(df, id_col, text_col)
    a = chunks.select(F.col(id_col).alias("id_a"), "chunk_hash")
    b = chunks.select(F.col(id_col).alias("id_b"), "chunk_hash")
    return (
        a.join(b, "chunk_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_chunks"))
        .where(F.col("shared_chunks") >= min_shared_chunks)
        .orderBy("id_a", "id_b")
    )


# --- embedding near-dup ----------------------------------------------------------------------

def embedding_near_dups(
    vectors: DataFrame, id_col: str, vec_col: str, threshold: float = 0.98
) -> DataFrame:
    """Embedding-cosine near-dup: thin wrapper over the similarity
    self-join with a high threshold."""
    from readability_scanner_spark.operators.similarity import similarity_pairs

    return similarity_pairs(vectors, id_col, vec_col, threshold)
