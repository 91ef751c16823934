"""Unit pins for the data-selection operators (stages/dsir.py).

Beyond the oracle harness (which pins hash-exactness at 3 sfs), these
assert the operators MEAN something:

* DSIR premise — target-language documents score higher on average
  than the rest (that is the entire point of importance resampling);
  the weight distribution is non-degenerate (both signs occur) and
  the OOV bucket carries real mass on this corpus (V < distinct
  terms, asserted so a vocab bump can't silently kill the OOV path).
* CCNet buckets are exact thirds per language (±1 document), ordered
  (every head-bucket NLL ≤ every tail-bucket NLL within a language),
  and total to the scored-document count.
* Crafted boundaries: a single-document language lands in bucket 0;
  NLL ties split deterministically by doc_id.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_parser_ray.stages import dsir

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    yield


def _langs(sf: str) -> pd.DataFrame:
    return (
        duckdb.connect()
        .execute(f"SELECT doc_id, lang FROM read_parquet('{sf}/documents.parquet')")
        .df()
    )


class TestDsirWeights:
    def test_target_slice_scores_higher(self):
        got = dsir.q_dsir_weights(SF).to_pandas().merge(_langs(SF), on="doc_id")
        en = got[got["lang"] == "en"]["dsir_micro"]
        rest = got[got["lang"] != "en"]["dsir_micro"]
        assert len(en) and len(rest)
        assert en.mean() > rest.mean()

    def test_weight_distribution_nondegenerate(self):
        got = dsir.q_dsir_weights(SF).to_pandas()
        assert (got["dsir_micro"] > 0).any()
        assert (got["dsir_micro"] < 0).any()

    def test_oov_bucket_is_live_on_this_corpus(self):
        n_terms = (
            duckdb.connect()
            .execute(
                "SELECT COUNT(DISTINCT term) FROM (SELECT UNNEST("
                f"regexp_extract_all(text, '\\S+')) AS term FROM "
                f"read_parquet('{SF}/documents.parquet'))"
            )
            .fetchone()[0]
        )
        assert n_terms > dsir._DSIR_V, (
            "corpus vocabulary no longer exceeds the DSIR top-V: the OOV "
            "bucket would be dead code in every test run"
        )


class TestCcnetBuckets:
    def test_exact_thirds_and_ordering(self):
        got = dsir.q_ccnet_buckets(SF).to_pandas()
        assert set(got["ppl_bucket"].unique()) <= {0, 1, 2}
        for lang, sub in got.groupby("lang"):
            n = len(sub)
            counts = sub["ppl_bucket"].value_counts()
            for b in (0, 1, 2):
                assert abs(int(counts.get(b, 0)) - n / 3) <= 1
            head = sub[sub["ppl_bucket"] == 0]["nll_micro"]
            tail = sub[sub["ppl_bucket"] == 2]["nll_micro"]
            if len(head) and len(tail):
                assert head.max() <= tail.min()

    def test_totals_match_scored_docs(self):
        got = dsir.q_ccnet_buckets(SF).to_pandas()
        langs = _langs(SF)
        assert len(got) == len(langs)
        assert got.groupby("lang").size().to_dict() == langs.groupby(
            "lang"
        ).size().to_dict()


class TestCraftedBoundaries:
    @pytest.fixture()
    def tiny(self, tmp_path):
        # lang 'xx' has ONE doc (must land in bucket 0); 'yy' has six
        # docs with identical text (NLL ties → bucket order = doc_id
        # order); 'en' provides the DSIR target mass
        rows = [
            (1, "alpha beta gamma", "en"),
            (2, "alpha alpha beta", "en"),
            (3, "solo doc here", "xx"),
            *[(10 + i, "tie tie tie", "yy") for i in range(6)],
        ]
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array(["s"] * len(rows), pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_singleton_lang_is_head(self, tiny):
        got = dsir.q_ccnet_buckets(tiny).to_pandas()
        assert int(got[got["lang"] == "xx"]["ppl_bucket"].iloc[0]) == 0

    def test_ties_split_by_doc_id(self, tiny):
        got = dsir.q_ccnet_buckets(tiny).to_pandas()
        yy = got[got["lang"] == "yy"].sort_values("doc_id")
        assert yy["ppl_bucket"].tolist() == [0, 0, 1, 1, 2, 2]

    def test_crafted_matches_oracle(self, tiny):
        import hashlib

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{tiny}/documents.parquet'"
        )
        for name in ("dsir_weights", "ccnet_buckets"):
            got = dsir.QUERIES[name](tiny).to_pandas()
            want = con.execute(dsir.ORACLE_SQL[name]).df()
            assert sorted(got.columns) == sorted(want.columns)

            def canon(df):
                df = df[sorted(df.columns)]
                rows = sorted(
                    tuple(str(v) for v in row)
                    for row in df.itertuples(index=False)
                )
                return hashlib.md5(str(rows).encode()).hexdigest()

            assert canon(got) == canon(want), name
        con.close()
