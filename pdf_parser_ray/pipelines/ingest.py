"""Training-ingest consumer surface: the epoch-shuffled, split-filtered
corpus delivered through Ray Data's TRAINER-side consumption shapes —
``iter_batches`` (single ordered consumer) and ``streaming_split``
(N concurrent trainer shards) — the one Dataset consumer family the
query surface itself never exercises (VERDICT r3 item 5).

Composition, all registered operators: ``split_labels`` (the 90/5/5
content-free hash split — a document's split never depends on the rest
of the corpus) filters the corpus; ``epoch_shuffle_ds`` assigns each
surviving document its deterministic ``epoch_rank`` (position in
``md5(epoch_salt:doc_id)`` order — re-dealt every epoch by the salt,
never by RNG state); a rank sort makes the stream ordered. Determinism
contract: the same (epoch, split) always yields the same batch
sequence — resumable training without checkpointing the loader.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def training_stream(
    sf_dir: str, epoch: int = 0, split: str = "train", n_buckets: int = 64
):
    """Ordered Dataset of ``(doc_id, text, epoch_rank)`` for one
    (epoch, split): split-filter (pure map) → epoch-rank exchange →
    rank sort. The sort's input ranks were CONSTRUCTED range-
    partitioned (hash-prefix buckets), so at scale this is a range
    exchange of already-ordered runs, not a comparison sort of the
    corpus."""
    from ..stages.corpus import _documents, epoch_shuffle_ds, split_labels

    def keep_split(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(split_labels(ids) == split))

    docs = _documents(sf_dir).map_batches(
        keep_split, batch_format="pyarrow", batch_size=None
    )
    ranked = epoch_shuffle_ds(docs, salt=f"epoch{epoch}", n_buckets=n_buckets)
    return ranked.drop_columns(["shuffle_key"]).sort("epoch_rank")


def iter_epoch_batches(
    sf_dir: str,
    epoch: int = 0,
    split: str = "train",
    batch_size: int = 64,
):
    """The single-trainer loader: yields pyarrow batches of the epoch
    stream in deterministic ``epoch_rank`` order. ``preserve_order``
    is forced for the duration of the iteration (Ray Data's streaming
    executor may otherwise deliver completed blocks out of order) and
    restored after."""
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        yield from training_stream(sf_dir, epoch, split).iter_batches(
            batch_size=batch_size, batch_format="pyarrow"
        )
    finally:
        ctx.execution_options.preserve_order = prev


def streaming_shards(
    sf_dir: str, n_shards: int, epoch: int = 0, split: str = "train"
):
    """The N-trainer loader: ``streaming_split`` iterators, one per
    trainer (each pulls its share of blocks with backpressure; in a
    real job each DataIterator is passed to one training worker).
    Shard ASSIGNMENT is scheduler-driven — the cross-shard contract is
    exact coverage (union of shards == the epoch stream, no loss, no
    duplication), pinned by ``TestTrainingIngest``."""
    return training_stream(sf_dir, epoch, split).streaming_split(
        n_shards, equal=False
    )


def q_training_stream(sf_dir: str):
    """Driver-surface registration of the loader's Dataset stage
    (epoch 0, train split) — hash-oracled; the iterator paths over it
    are pinned by the determinism tests."""
    return training_stream(sf_dir)


# The oracle replays split-filter + rank-over-filtered-set: ranks are
# dense 0..N_train-1 WITHIN the split (the loader contract), not the
# whole-corpus ranks of q_epoch_shuffle.
_SQL_TRAINING_STREAM = """
WITH s AS (
    SELECT doc_id, text,
           CAST('0x' || right(md5('split:' || CAST(doc_id AS VARCHAR)), 2) AS BIGINT)
               * 100 // 256 AS frac
    FROM documents
),
t AS (SELECT doc_id, text FROM s WHERE frac < 90)
SELECT doc_id, text,
       CAST(row_number() OVER (
            ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
            AS BIGINT) AS epoch_rank
FROM t
"""

QUERIES = {
    "training_stream": q_training_stream,
}

ORACLE_SQL = {
    "training_stream": _SQL_TRAINING_STREAM,
}
