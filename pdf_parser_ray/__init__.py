"""pdf_parser_ray — a Ray-Data-native document extraction engine.

A brand-new engine (not a port) reproducing the computation of the
reference intake-form parser (``kraghunadhareddy/pdf-parser``) as
idiomatic ``ray.data.Dataset`` pipelines over Arrow span tables:

* input: one row per document, ``(doc_id: string,
  spans: list<struct<kind, text, media_ref, offset>>)``
* per-document extraction semantics (section anchors, label matching,
  checkbox assignment, question/answer geometry, yes/no inference)
  implemented as pure kernels in :mod:`pdf_parser_ray.kernels`, invoked
  per-row inside ``map_batches`` (documents are independent — the page
  fold never crosses workers);
* stateful stages (config/templates loaded once per worker) as actor
  pools; wide steps (dedup, groupby, repartition) explicit.

Nothing here calls ``ray.init()``; callers own the Ray session.
"""

__version__ = "0.1.0"
