"""Unit tests for relational/analytics3.py (interval coverage +
burstiness).

Pins beyond the oracle harness: a crafted events corpus with the
algebraic edges (touching intervals, duplicate timestamps, gap exactly
at / just past the ttl, single-day users) on which each query must
hash-match DuckDB running its registered oracle SQL verbatim, plus
direct value pins for the closed-form cases.
"""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_parser_ray.relational import analytics3 as a3


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    yield


def _canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    rows = sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.md5(str(rows).encode()).hexdigest()


def _pd(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()


TTL = 300_000_000  # 300 s in µs


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Crafted events: user 1 = touching + overlapping + far intervals,
    user 2 = duplicate timestamps, user 3 = single event, user 4 =
    multi-day with varying daily counts."""
    base = np.datetime64("1995-06-01T00:00:00", "us").astype(np.int64)
    rows = [
        # user 1: t=0 (opens 300s), t=300s (touching: merges), t=650s
        # (gap 350s > ttl: new stretch), t=700s (gap 50s: merges)
        (1, 0),
        (1, 300_000_000),
        (1, 650_000_000),
        (1, 700_000_000),
        # user 2: duplicate timestamps collapse to one interval
        (2, 0),
        (2, 0),
        # user 3: singleton
        (3, 86_400_000_000 * 3),
        # user 4: day counts [3, 1] across two days
        (4, 0),
        (4, 1_000_000),
        (4, 2_000_000),
        (4, 86_400_000_000 + 5_000_000),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "ts": pa.array(
                np.array([base + off for _, off in rows], dtype="datetime64[us]")
            ),
            "event_type": pa.array(["view"] * len(rows)),
        }
    )
    d = tmp_path_factory.mktemp("a3corpus")
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


class TestActiveTime:
    def test_closed_form(self, corpus):
        got = (
            _pd(a3.q_user_active_time(corpus))
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        # user 1: ttl + min(ttl,300s) + min(ttl,350s) + min(ttl,50s)
        #       = 300 + 300 + 300 + 50 s; stretches: gap 350 > 300 → 2
        assert got.loc[0, "active_us"] == (300 + 300 + 300 + 50) * 1_000_000
        assert got.loc[0, "n_stretches"] == 2
        # user 2: duplicate ts adds 0
        assert got.loc[1, "active_us"] == TTL
        assert got.loc[1, "n_stretches"] == 1
        # user 3: singleton
        assert got.loc[2, "active_us"] == TTL
        # user 4: gaps 1s, 1s, then cross-day 86403s → 2 stretches
        assert got.loc[3, "n_stretches"] == 2
        assert got.loc[3, "active_us"] == (300 + 1 + 1 + 300) * 1_000_000

    def test_matches_duckdb(self, corpus):
        got = _pd(a3.q_user_active_time(corpus))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{corpus}/events.parquet'"
        )
        want = con.execute(a3._SQL_USER_ACTIVE_TIME).df()
        assert _canon(got) == _canon(want)


class TestBurstiness:
    def test_closed_form(self, corpus):
        got = (
            _pd(a3.q_user_burstiness(corpus))
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        # user 4: daily counts [3, 1] → n=2, S=4, s2=10,
        # F = (2·10 − 16) / (2·4) = 0.5 → 500000 ppm
        u4 = got[got["user_id"] == 4].iloc[0]
        assert u4["n_days"] == 2 and u4["n_events"] == 4
        assert u4["fano_ppm"] == 500_000
        # constant daily counts (users 1-3 have one active day) → F = 0
        assert (got[got["user_id"] != 4]["fano_ppm"] == 0).all()

    def test_matches_duckdb(self, corpus):
        got = _pd(a3.q_user_burstiness(corpus))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{corpus}/events.parquet'"
        )
        want = con.execute(a3._SQL_USER_BURSTINESS).df()
        assert _canon(got) == _canon(want)


class TestGeoMean:
    def test_constant_prices_and_differential(self, tmp_path):
        from pdf_parser_ray.stages.textstats import lnm_micro

        t = pa.table(
            {
                "p_brand": pa.array(["A", "A", "B", "B", "B"]),
                "p_retailprice": pa.array([10.0, 10.0, 1.0, 100.0, 10.0]),
            }
        )
        pq.write_table(t, str(tmp_path / "part.parquet"))
        got = (
            _pd(a3.q_geo_mean_price(str(tmp_path)))
            .sort_values("p_brand")
            .reset_index(drop=True)
        )
        # constant 10.00 → gm_ln = lnm(1000); brand B is symmetric in
        # log space around 10.00 → same location, rounding aside
        assert got.loc[0, "gm_ln_micro"] == lnm_micro(1000)
        ln_b = (lnm_micro(100) + lnm_micro(10000) + lnm_micro(1000)) / 3
        assert abs(got.loc[1, "gm_ln_micro"] - ln_b) <= 1
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW part AS SELECT * FROM '{tmp_path}/part.parquet'"
        )
        want = con.execute(a3.ORACLE_SQL["geo_mean_price"]).df()
        assert _canon(got) == _canon(want)


class TestTheilSen:
    def test_outlier_year_is_ignored(self, tmp_path):
        # revenue 100, 200, 300, 400 in 1992-95 plus a whale 1996
        # (10000): pairwise-slope median stays at the 100/yr trend.
        years = [1992, 1993, 1994, 1995, 1996]
        revs = [100.0, 200.0, 300.0, 400.0, 10000.0]
        t = pa.table(
            {
                "o_orderdate": pa.array(
                    np.array(
                        [np.datetime64(f"{y}-06-01", "us") for y in years]
                    )
                ),
                "o_totalprice": pa.array(revs),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = _pd(a3.q_theilsen_trend(str(tmp_path)))
        assert got.loc[0, "n_years"] == 5 and got.loc[0, "n_pairs"] == 10
        # 100 $/yr = 10000 cents/yr = 1e10 micro-cents/yr
        assert got.loc[0, "theilsen_slope_micro"] == 10**10
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'"
        )
        want = con.execute(a3._SQL_THEILSEN).df()
        assert _canon(got) == _canon(want)


class TestTimeToConvert:
    def test_crafted_latencies(self, tmp_path):
        base = np.datetime64("1995-06-01T00:00:00", "us")
        rows = [
            # user 1: view at t=0, purchase at t=100s → latency 100s
            (1, 0, "view"),
            (1, 100, "purchase"),
            # user 2: purchase BEFORE first view is excluded; the
            # later one counts (view t=50, purchases t=10 and t=80)
            (2, 10, "purchase"),
            (2, 50, "view"),
            (2, 80, "purchase"),
            # user 3: view only → not a converter
            (3, 0, "view"),
            # user 4: purchase only → not a converter
            (4, 0, "purchase"),
            # user 5: purchase AT the first view instant → latency 0
            (5, 7, "view"),
            (5, 7, "purchase"),
        ]
        t = pa.table(
            {
                "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
                "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
                "ts": pa.array(
                    np.array(
                        [base + np.timedelta64(s, "s") for _, s, _ in rows]
                    )
                ),
                "event_type": pa.array([e for _, _, e in rows]),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = _pd(a3.q_time_to_convert(str(tmp_path)))
        # converters: u1 (100s), u2 (30s), u5 (0s) → median 30s
        assert got.loc[0, "n_converters"] == 3
        assert got.loc[0, "median_latency_us"] == 30_000_000
        assert got.loc[0, "max_latency_us"] == 100_000_000
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
        )
        want = con.execute(a3._SQL_TIME_TO_CONVERT).df()
        assert _canon(got) == _canon(want)


class TestDocNoveltyPhrase:
    @pytest.fixture()
    def docs(self, tmp_path):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    [
                        "a b c d",      # 1: grams {abc, bcd} — all novel
                        "a b c d",      # 2: exact copy — zero novel
                        "a b c x",      # 3: {abc, bcx} — half novel
                        "q r",          # 4: <3 words — excluded
                        "a a a a",      # 5: gram {aaa} ×2 distinct→1, novel
                    ]
                ),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_novelty(self, docs):
        from pdf_parser_ray.stages.textstats import (
            _SQL_DOC_NOVELTY,
            q_doc_novelty,
        )

        got = _pd(q_doc_novelty(docs)).sort_values("doc_id").reset_index(drop=True)
        assert got["doc_id"].tolist() == [1, 2, 3, 5]
        assert got["n_novel"].tolist() == [2, 0, 1, 1]
        assert got["novelty_ppm"].tolist() == [1_000_000, 0, 500_000, 1_000_000]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{docs}/documents.parquet'"
        )
        want = con.execute(_SQL_DOC_NOVELTY).df()
        assert _canon(got) == _canon(want)

    def test_phrase_overlap_counting(self, tmp_path):
        from pdf_parser_ray.stages.textstats import _sql_phrase, q_phrase_search

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "a a a",        # overlapping "a a" → 2 hits
                        "a b a a b",    # one hit at position 3
                        "b b",          # no hit
                    ]
                ),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = (
            _pd(q_phrase_search(str(tmp_path), phrase="a a"))
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == [1, 2]
        assert got["n_hits"].tolist() == [2, 1]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
        )
        want = con.execute(_sql_phrase("a a")).df()
        assert _canon(got) == _canon(want)


class TestTopDecileShare:
    def test_tie_straddle_and_differential(self, tmp_path):
        # 12 customers → k = 1; the top VALUE (500.00) is shared by two
        # customers, so the cut takes it partially (1 of 2) — the
        # order-statistics arithmetic that makes tie-breaks irrelevant.
        cust = list(range(1, 13))
        totals = [500.0, 500.0] + [100.0] * 10
        t = pa.table(
            {
                "o_custkey": pa.array(cust, pa.int64()),
                "o_totalprice": pa.array(totals),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = _pd(a3.q_top_decile_share(str(tmp_path)))
        assert got.loc[0, "n_customers"] == 12 and got.loc[0, "k_top"] == 1
        assert got.loc[0, "top_cents"] == 50_000
        assert got.loc[0, "total_cents"] == 200_000
        assert got.loc[0, "share_ppm"] == 250_000
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'"
        )
        want = con.execute(a3._SQL_TOP_DECILE).df()
        assert _canon(got) == _canon(want)


class TestRevenueAutocorr:
    def test_alternating_series_is_perfect_negative(self, tmp_path):
        # monthly revenue alternating 1000/2000 dollars → lag-1 pairs
        # are perfectly anticorrelated: sign −1 and num² = dx·dy.
        months = [f"1995-{m:02d}-15" for m in range(1, 9)]
        revs = [1000.0, 2000.0] * 4
        t = pa.table(
            {
                "o_orderdate": pa.array(
                    np.array([np.datetime64(d, "us") for d in months])
                ),
                "o_totalprice": pa.array(revs),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = _pd(a3.q_revenue_autocorr(str(tmp_path)))
        assert got.loc[0, "n_months"] == 8 and got.loc[0, "n_pairs"] == 7
        assert got.loc[0, "corr_sign"] == -1
        num, dx, dy = (
            int(got.loc[0, "r2_num"]),
            int(got.loc[0, "r2_dx"]),
            int(got.loc[0, "r2_dy"]),
        )
        assert num * num == dx * dy  # r² = 1 exactly
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'"
        )
        want = con.execute(a3._SQL_REVENUE_AUTOCORR).df()
        assert _canon(got) == _canon(want)


class TestWeekdaySeasonality:
    def test_known_dates_and_differential(self, tmp_path):
        # 1995-06-04 was a Sunday (dow 0), 1995-06-05 a Monday (dow 1)
        t = pa.table(
            {
                "o_orderdate": pa.array(
                    np.array(
                        [
                            np.datetime64("1995-06-04", "us"),
                            np.datetime64("1995-06-05", "us"),
                            np.datetime64("1995-06-05", "us"),
                        ]
                    )
                ),
                "o_totalprice": pa.array([100.0, 100.0, 100.0]),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = (
            _pd(a3.q_weekday_seasonality(str(tmp_path)))
            .sort_values("dow")
            .reset_index(drop=True)
        )
        assert got["dow"].tolist() == [0, 1]
        assert got["n_orders"].tolist() == [1, 2]
        assert got["rev_share_ppm"].tolist() == [333333, 666667]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'"
        )
        want = con.execute(a3._SQL_WEEKDAY).df()
        assert _canon(got) == _canon(want)


class TestHllOverlap:
    def test_inclusion_exclusion_accuracy(self, tmp_path):
        # types a and b share exactly 600 of 1000 users each; the HLL
        # overlap estimate must land within 3σ-ish of 600 (σ ≈
        # 1.04/√m per sketch; inclusion–exclusion compounds to a few
        # percent of the union at p=12).
        rng = range
        rows_t, rows_u = [], []
        for u in rng(1000):
            rows_t.append("a")
            rows_u.append(u)
        for u in rng(400, 1400):
            rows_t.append("b")
            rows_u.append(u)
        n = len(rows_t)
        base = np.datetime64("1995-06-01T00:00:00", "us")
        t = pa.table(
            {
                "event_id": pa.array(range(1, n + 1), pa.int64()),
                "user_id": pa.array(rows_u, pa.int64()),
                "ts": pa.array(
                    np.array([base + np.timedelta64(i, "s") for i in range(n)])
                ),
                "event_type": pa.array(rows_t),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        from pdf_parser_ray.relational.ops import (
            _hll_overlap_sql,
            q_type_user_overlap_hll,
        )

        got = _pd(q_type_user_overlap_hll(str(tmp_path)))
        assert len(got) == 1
        ov = int(got.loc[0, "n_overlap_approx"])
        assert abs(ov - 600) < 150  # sketch tolerance at p=12
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
        )
        want = con.execute(_hll_overlap_sql()).df()
        assert _canon(got) == _canon(want)


class TestMarkovStationary:
    def test_two_state_chain_and_differential(self, tmp_path):
        # user 1 path: a b b a b b  → counts a→b 2, b→b 2, b→a 1
        seq = ["a", "b", "b", "a", "b", "b"]
        base = np.datetime64("1995-06-01T00:00:00", "us")
        t = pa.table(
            {
                "event_id": pa.array(range(1, len(seq) + 1), pa.int64()),
                "user_id": pa.array([1] * len(seq), pa.int64()),
                "ts": pa.array(
                    np.array(
                        [base + np.timedelta64(i, "s") for i in range(len(seq))]
                    )
                ),
                "event_type": pa.array(seq),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = _pd(a3.q_event_markov_stationary(str(tmp_path)))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
        )
        want = con.execute(a3._SQL_MARKOV).df()
        assert _canon(got) == _canon(want)
        # chain drifts toward b (2/3 of b's mass self-loops)
        pi = dict(zip(got["event_type"], got["pi_micro"]))
        assert pi["b"] > pi["a"]


class TestOffsetAudit:
    def test_sparse_detection(self):
        import ray.data as rd

        from pdf_parser_ray.pipelines.extract import extract_offset_audit

        rows = (
            # doc a: dense 0..2
            [{"doc_id": "a", "offset": i} for i in range(3)]
            # doc b: gap (0, 2) → sparse
            + [{"doc_id": "b", "offset": 0}, {"doc_id": "b", "offset": 2}]
            # doc c: does not start at 0 → sparse
            + [{"doc_id": "c", "offset": 1}, {"doc_id": "c", "offset": 2}]
        )
        ds = rd.from_items(rows)
        got = extract_offset_audit("unused", _spans=ds)
        assert got.loc[0, "n_docs"] == 3
        assert got.loc[0, "n_spans"] == 7
        assert got.loc[0, "n_dense_docs"] == 1
        assert got.loc[0, "n_sparse_docs"] == 2
