"""Streaming NEAR-duplicate detection (training-data-pipeline
extension; the streaming twin of operators/dedup.py ``simhash_pairs``).

Batch near-dup sees the whole corpus; a 100 TB ingest stream cannot.
This operator keeps per-BUCKET state: each document's 64-bit SimHash
is split into 4×16-bit bands (pigeonhole: hamming ≤ 3 ⇒ at least one
band equal, same banding as the batch operator), the stream is
exploded to one row per band, and ``applyInPandasWithState`` keyed by
(band, bucket) holds the (signature, doc_id) pairs previously routed
to that bucket. A new document is verified against its bucket's
signatures with a full-width hamming check, so verdict quality equals
the batch operator's — only docs whose true match was evicted (see
below) can be missed.

Scale properties:
  * State shards by the groupBy key — 4×65536 possible buckets spread
    across executors; each entry is two long arrays.
  * Per-bucket state is CAPPED (FIFO eviction, ``max_sigs_per_bucket``)
    so unbounded streams hold bounded state. Eviction makes the
    operator approximate for duplicates that arrive further apart than
    the cap's horizon — the honest tradeoff at unbounded scale,
    documented not hidden (the exact-dedup stateful operator makes the
    same call with NoTimeout instead).
  * A doc judged duplicate in one band may still have been added to
    another band's bucket in the same trigger (bands vote
    independently; no cross-band coordination inside a micro-batch).
    That costs a little state, never a wrong verdict.

The operator emits one VERDICT row per (doc, band); ``reduce_verdicts``
is the tiny batch reduction (any band's match ⇒ duplicate) callers run
downstream — in ``foreachBatch``, or on the memory-sink output — kept
separate because chaining a second stateful aggregate behind
``applyInPandasWithState`` in one streaming query is not supported.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

BANDS = 4
BITS_PER_BAND = 16

VERDICT_OUTPUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", IntegerType()),
        StructField("dup_of", LongType()),  # NULL = new in this band
    ]
)
VERDICT_STATE = StructType(
    [
        StructField("sigs", ArrayType(LongType())),
        StructField("ids", ArrayType(LongType())),
    ]
)

_U64 = (1 << 64) - 1


def _hamming_ok(sig: int, seen: np.ndarray, max_hamming: int) -> np.ndarray:
    """Boolean mask over ``seen``: full-width hamming(sig, seen) ≤ k."""
    if len(seen) == 0:
        return np.zeros(0, dtype=bool)
    x = np.bitwise_xor(seen, np.int64(np.uint64(sig & _U64).astype(np.int64)))
    bits = np.unpackbits(x.view(np.uint8).reshape(len(seen), 8), axis=1)
    return bits.sum(axis=1) <= max_hamming


def _make_band_fn(max_hamming: int, max_sigs_per_bucket: int):
    def _band_verdicts(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band = int(key[0])
        if state.exists:
            sigs_l, ids_l = state.get
            sigs, ids = list(sigs_l), list(ids_l)
        else:
            sigs, ids = [], []
        out_doc, out_dup = [], []
        # Deterministic WITHIN-trigger processing order: concat the
        # group's micro-batch rows and sort by doc id, so which doc of
        # a same-trigger duplicate pair becomes the "original" no
        # longer depends on shuffle arrival order — the min-id
        # canonicalization the batch twin uses, and what makes the
        # single-trigger e2e replay (streaming_neardup_e2e) carry a
        # pinned value oracle. Buffering costs one copy of the group's
        # rows for THIS trigger only — the same unit the shuffle
        # already materialized; the FIFO state cap is unchanged.
        # Cross-trigger order remains arrival order, inherent to
        # streaming.
        parts = list(pdfs)
        if parts:
            batch = pd.concat(parts, ignore_index=True).sort_values(
                "id", kind="stable"
            )
            for doc_id, sig in zip(
                batch["id"].to_numpy(), batch["simhash"].to_numpy()
            ):
                mask = _hamming_ok(
                    int(sig), np.asarray(sigs, dtype=np.int64), max_hamming
                )
                hit = int(np.argmax(mask)) if mask.any() else -1
                out_doc.append(int(doc_id))
                if hit >= 0:
                    out_dup.append(ids[hit])
                else:
                    out_dup.append(None)
                    sigs.append(int(sig))
                    ids.append(int(doc_id))
                    if len(sigs) > max_sigs_per_bucket:  # FIFO horizon
                        sigs.pop(0)
                        ids.pop(0)
        state.update((sigs, ids))
        yield pd.DataFrame(
            {
                "doc_id": pd.array(out_doc, dtype="int64"),
                "band": pd.array([band] * len(out_doc), dtype="int32"),
                "dup_of": pd.array(out_dup, dtype="Int64"),
            }
        )

    return _band_verdicts


def streaming_neardup_verdicts(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_sigs_per_bucket: int = 128,
) -> DataFrame:
    """Per-(doc, band) near-dup verdicts over a streaming source.

    SimHash runs as the same Arrow kernel as the batch operator
    (operators/dedup.py simhash); banding is pure expressions; state
    lives only in the keyed store. Append output mode."""
    from crawler_spark.operators.dedup import simhash

    sig = simhash(docs_stream, text_col, id_col)
    banded = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).cast("int").alias("band"),
                    F.shiftrightunsigned("simhash", b * BITS_PER_BAND)
                    .bitwiseAND(F.lit((1 << BITS_PER_BAND) - 1))
                    .alias("bucket"),
                )
                for b in range(BANDS)
            ])
        ).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.bucket")
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _make_band_fn(max_hamming, max_sigs_per_bucket),
        outputStructType=VERDICT_OUTPUT,
        stateStructType=VERDICT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def reduce_verdicts(verdicts: DataFrame) -> DataFrame:
    """Batch reduction of band verdicts → one row per doc:
    ``is_duplicate`` if ANY band matched, ``dup_of`` = the smallest
    matched doc id (deterministic pick)."""
    return verdicts.groupBy("doc_id").agg(
        F.max(F.col("dup_of").isNotNull()).alias("is_duplicate"),
        F.min("dup_of").alias("dup_of"),
    )
