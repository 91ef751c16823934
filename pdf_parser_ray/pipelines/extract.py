"""Flagship extraction pipeline: span corpus → parse actors → output
span table.

The production shape (north star) is::

    read_lance(corpus)                      # one row per document
      → repartition by size class          # skew: giant docs
      → map_batches(DocumentExtractor, …)  # actor pool, Arrow in/out
      → write_parquet(partitioned)         # resumable sink

In this sandbox the corpus is synthesized deterministically from the
driver's ``documents.parquet`` (ids + text → seeded span documents),
*inside* ``map_batches`` — no driver-side loop, no materialization; the
synthesis stage stands in for the Lance read of a real interleaved
corpus and scales the same way (generation is per-row pure).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from ..core.config import FormConfig
from ..stages.parse import DocumentExtractor


def corpus_from_documents(sf_dir: str, seed: int = 42, columns: list[str] | None = None):
    """Synthesize the span corpus from the driver's documents table.

    Reads only ``doc_id`` and ``text`` (prune at the read); each row
    becomes one deterministic form document whose answer vocabulary is
    drawn from the row's text — output depends on input content.
    """
    import ray.data as rd

    from ..io.synth import build_corpus_table, gen_document
    from ..core.schema import DOCUMENT_SCHEMA

    def synth_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        doc_ids = [f"doc-{int(i):08d}" for i in ids]
        spans = []
        for did, text in zip(doc_ids, texts):
            vocab = [w for w in (text or "").split() if w][:48] or None
            spans.append(gen_document(did, seed, vocab=vocab))
        return pa.Table.from_pydict(
            {"doc_id": doc_ids, "spans": spans}, schema=DOCUMENT_SCHEMA
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(synth_batch, batch_format="pyarrow", batch_size=64)


def extract_pipeline(
    ds,
    config: FormConfig | None = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 32,
    num_cpus: float = 1,
):
    """Attach the parse stage to a span-corpus Dataset.

    ``concurrency=None`` uses stateless tasks (fully elastic — right
    when the config is cheap to construct, as here); set an int for a
    fixed actor pool (right when per-worker setup is expensive, e.g.
    real OCR engines)."""
    kwargs: dict[str, Any] = dict(
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
        kwargs["num_cpus"] = num_cpus
        return ds.map_batches(
            DocumentExtractor,
            fn_constructor_kwargs={"config": config},
            **kwargs,
        )
    extractor = DocumentExtractor(config=config)
    return ds.map_batches(extractor, **kwargs)


def flagship(sf_dir: str, seed: int = 42, concurrency=None, batch_size: int = 32):
    """documents.parquet → synthesized span corpus → extraction →
    exploded output span table (doc_id, kind, text, media_ref, offset).
    """
    corpus = corpus_from_documents(sf_dir, seed)
    return extract_pipeline(corpus, concurrency=concurrency, batch_size=batch_size)
