"""A/B the three per-document Python-loop text kernels against
vectorized Arrow/pandas formulations (VERDICT r3 item 6).

Runs IN-PROCESS over the real sf corpus (no Ray): each kernel is a
pure batch fn, so timing it directly isolates kernel cost from
executor noise. Asserts output equality (sorted rows) before timing.
Results go to BASELINE.md.

Usage::

    python tools/ab_text_kernels.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def load_corpus(sf_dir: str, augment: bool) -> pa.Table:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    if not augment:
        return t
    from pdf_parser_ray.stages.dedup import _EXACT_BASE, _EXACT_EVERY, _NEAR_BASE, _NEAR_EVERY

    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    texts = t["text"].to_pylist()
    out_ids, out_texts = list(ids), list(texts)
    for i, txt in zip(ids, texts):
        if i % _EXACT_EVERY == 0:
            out_ids.append(i + _EXACT_BASE)
            out_texts.append(txt)
        if i % _NEAR_EVERY == 0:
            parts = (txt or "").split(" ", 1)
            out_texts.append("MUTATED" + (" " + parts[1] if len(parts) > 1 else ""))
            out_ids.append(i + _NEAR_BASE)
    return pa.table(
        {"doc_id": pa.array(out_ids, pa.int64()), "text": pa.array(out_texts)}
    )


def timeit(fn, batch, reps):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(batch)
        best = min(best, time.perf_counter() - t0)
    return best, out


def canon(t: pa.Table, drop=()) -> pd.DataFrame:
    df = t.to_pandas()
    df = df[[c for c in sorted(df.columns) if c not in drop]]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import zlib

    from pdf_parser_ray.stages import corpus as corpus_mod
    from pdf_parser_ray.stages import dedup as dedup_mod
    from pdf_parser_ray.stages import textstats as text_mod

    plain = load_corpus(sf_dir, augment=False)
    aug = load_corpus(sf_dir, augment=True)
    print(f"corpus: {plain.num_rows} docs (augmented {aug.num_rows})")

    results = {}

    # ---- tf_rows (tfidf term counts) -------------------------------
    loop_tf = text_mod.tf_rows_loop(32)
    vec_tf = text_mod.tf_rows_vec(32)
    a = canon(loop_tf(plain))
    b = canon(vec_tf(plain))
    pd.testing.assert_frame_equal(a, b)
    t_loop, _ = timeit(loop_tf, plain, reps)
    t_vec, _ = timeit(vec_tf, plain, reps)
    results["tf_rows"] = (t_loop, t_vec)

    # ---- gram_rows (substring dedup 8-gram rows) -------------------
    loop_g = corpus_mod.gram_rows_loop(64)
    vec_g = corpus_mod.gram_rows_vec(64)
    a = canon(loop_g(aug))
    b = canon(vec_g(aug))
    pd.testing.assert_frame_equal(a, b)
    t_loop, _ = timeit(loop_g, aug, reps)
    t_vec, _ = timeit(vec_g, aug, reps)
    results["gram_rows"] = (t_loop, t_vec)

    # ---- prefix_gram_rows (PPJoin prefix index) --------------------
    loop_p = dedup_mod.prefix_gram_rows_loop(0.8, 32)
    vec_p = dedup_mod.prefix_gram_rows_vec(0.8, 32)
    a = canon(loop_p(aug))
    b = canon(vec_p(aug))
    pd.testing.assert_frame_equal(a, b)
    t_loop, _ = timeit(loop_p, aug, reps)
    t_vec, _ = timeit(vec_p, aug, reps)
    results["prefix_gram_rows"] = (t_loop, t_vec)

    print(f"{'kernel':20s} {'loop_s':>8s} {'vec_s':>8s} {'speedup':>8s}")
    for k, (tl, tv) in results.items():
        print(f"{k:20s} {tl:8.3f} {tv:8.3f} {tl / tv:7.2f}x")


if __name__ == "__main__":
    main()
