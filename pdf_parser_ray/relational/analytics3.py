"""Round-5 session-2 analytics: interval coverage, burstiness, and
robust-trend operators — each an exact-integer Ray Data plan with a
DuckDB hash-equality oracle, following the house conventions of
:mod:`analytics2` (partial-aggregate before the one exchange, micro /
ppm integer units, ``_rhalf`` rounding shared verbatim with the SQL).

Reference parity note: the reference engine (``/root/reference``, a
single-machine PDF-form parser) has no cross-document analytics; this
module extends the engine-addition surface mandated by the task
(training-data curation / monitoring operators), not a reference op.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .ops import _cents, _read, _rhalf
from .analytics2 import _ts_us, _year_of


# ---------------------------------------------------------------------------
# user_active_time — exact interval-union coverage per user
# ---------------------------------------------------------------------------

def q_user_active_time(sf_dir: str, ttl_s: int = 300, n_buckets: int = 32):
    """Per-user total ACTIVE time: each event opens a ``[ts, ts+ttl)``
    activity interval and the metric is the exact length of the UNION
    of those intervals (plus how many disjoint activity stretches the
    union merges into) — the engagement denominator behind DAU-minutes
    and ad-exposure billing, and the cross-document analog of the
    reference's window-overlap trims (J4, ``response_extractor.py``
    interval logic) lifted to event streams.

    Exactness: with equal-length intervals sorted by start, interval
    ends are monotone, so the union gains ``min(ttl, ts_i − ts_{i−1})``
    per successive event and splits a new stretch exactly when the gap
    exceeds ``ttl`` — pure int64 µs arithmetic, hash-exact against a
    LAG window twin. (Touching intervals, gap == ttl, merge on both
    sides by the same ``>`` test.)

    Shape: ONE coarse user-bucket exchange (``user % B``, each event
    row crosses the wire once); inside a bucket one stable sort plus a
    vectorized same-user delta pass resolves every user's union with
    no per-user Python loop. At 10¹² events the bucket count scales
    with the cluster while per-bucket work stays sort-bound; hot users
    are bounded by their own event counts, not the bucket's.
    """
    import pandas as pd

    ttl_us = int(ttl_s) * 1_000_000
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(uid % n_buckets, pa.int64()),
                "user_id": batch["user_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
            }
        )

    def fold_bucket(g: "pd.DataFrame") -> pa.Table:
        g = g.sort_values(["user_id", "ts_us"], kind="stable")
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts_us"].to_numpy(dtype=np.int64)
        same = np.concatenate([[False], uid[1:] == uid[:-1]])
        delta = np.concatenate([[0], ts[1:] - ts[:-1]])
        # first event of a user opens ttl of coverage; each successive
        # event adds min(ttl, delta); a gap strictly beyond ttl starts
        # a new disjoint stretch.
        gained = np.where(same, np.minimum(delta, ttl_us), ttl_us)
        starts = (~same) | (delta > ttl_us)
        out = (
            pd.DataFrame(
                {
                    "user_id": uid,
                    "active_us": gained,
                    "n_stretches": starts.astype(np.int64),
                    "n_events": np.ones(len(uid), dtype=np.int64),
                }
            )
            .groupby("user_id", sort=False)
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(np.int64), pa.int64()),
                "n_events": pa.array(out["n_events"].to_numpy(np.int64), pa.int64()),
                "n_stretches": pa.array(
                    out["n_stretches"].to_numpy(np.int64), pa.int64()
                ),
                "active_us": pa.array(out["active_us"].to_numpy(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(fold_bucket, batch_format="pandas")
    )


_SQL_USER_ACTIVE_TIME = """
WITH d AS (
    SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts) AS delta
    FROM events)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(1 + SUM(CASE WHEN delta > 300000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_stretches,
       CAST(300000000
            + SUM(CASE WHEN delta IS NULL THEN 0
                       ELSE LEAST(delta, 300000000) END)
            AS BIGINT) AS active_us
FROM d GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# user_burstiness — Fano factor of daily event counts, exact ppm
# ---------------------------------------------------------------------------

def q_user_burstiness(sf_dir: str, n_buckets: int = 32):
    """Per-user burstiness of activity: the Fano factor (index of
    dispersion, Var/Mean) of the user's DAILY event counts over their
    active days, in exact ppm — ≈10⁶ means Poisson-like arrivals,
    ≫10⁶ means bursty sessions, the dispersion diagnostic bot/abuse
    monitors track next to the inter-arrival profile
    (:func:`~pdf_parser_ray.relational.ops.q_user_interarrival`).

    Exactness: over active-day counts ``c`` with ``n`` days and
    ``S = Σc``, ``F = Var/Mean = (n·Σc² − S²) / (n·S)`` — population
    variance, integer numerator (≥ 0 by Cauchy–Schwarz), one
    ``_rhalf`` per user, hash-exact vs the SQL twin.

    Shape: per-batch partial (user, day, cnt) combine → ONE coarse
    user-bucket exchange carrying pre-aggregated fixed-width partials
    (a (user, day) cell split across blocks re-sums inside the
    bucket); moments fold vectorized per bucket. Day counts per user
    are bounded by the calendar, so no skew salt is needed.
    """
    import pandas as pd

    day_us = 86_400_000_000
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        day = pc.cast(batch["ts"], pa.int64()).to_numpy() // day_us
        agg = (
            pd.DataFrame({"user_id": uid, "day": day})
            .groupby(["user_id", "day"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "bucket": pa.array(
                    agg["user_id"].to_numpy(np.int64) % n_buckets, pa.int64()
                ),
                "user_id": pa.array(agg["user_id"].to_numpy(np.int64), pa.int64()),
                "day": pa.array(agg["day"].to_numpy(np.int64), pa.int64()),
                "cnt": pa.array(agg["cnt"].to_numpy(np.int64), pa.int64()),
            }
        )

    def fold_bucket(g: "pd.DataFrame") -> pa.Table:
        cell = (
            g.groupby(["user_id", "day"], sort=False)["cnt"].sum().reset_index()
        )
        c = cell["cnt"].to_numpy(dtype=np.int64)
        mom = pd.DataFrame(
            {
                "user_id": cell["user_id"].to_numpy(np.int64),
                "n_days": np.ones(len(cell), dtype=np.int64),
                "s1": c,
                "s2": c * c,
            }
        ).groupby("user_id", sort=False).sum().reset_index()
        n = mom["n_days"].to_numpy(dtype=np.int64)
        s1 = mom["s1"].to_numpy(dtype=np.int64)
        s2 = mom["s2"].to_numpy(dtype=np.int64)
        fano = np.array(
            [
                _rhalf(10**6 * (int(nn) * int(q) - int(s) * int(s)), int(nn) * int(s))
                for nn, s, q in zip(n, s1, s2)
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "user_id": pa.array(mom["user_id"].to_numpy(np.int64), pa.int64()),
                "n_days": pa.array(n, pa.int64()),
                "n_events": pa.array(s1, pa.int64()),
                "fano_ppm": pa.array(fano, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(fold_bucket, batch_format="pandas")
    )


_SQL_USER_BURSTINESS = """
WITH c AS (
    SELECT user_id, epoch_us(ts) // 86400000000 AS day,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2),
m AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(cnt) AS BIGINT) AS n_events,
           CAST(SUM(cnt*cnt) AS HUGEINT) AS s2
    FROM c GROUP BY user_id)
SELECT user_id, n_days, n_events,
       CAST((2*1000000*(n_days*s2 - CAST(n_events AS HUGEINT)*n_events)
             + n_days*n_events) // (2*n_days*n_events) AS BIGINT) AS fano_ppm
FROM m
"""


# ---------------------------------------------------------------------------
# geo_mean_price — grouped geometric mean on the shared-ln spec
# ---------------------------------------------------------------------------

def q_geo_mean_price(sf_dir: str):
    """Per-brand geometric mean of the part retail price, carried as
    the exact mean of integer micro-nat logs (``lnm_micro``) — the
    multiplicative-scale location estimate price indexes use (one
    10× outlier moves the arithmetic mean, the log-mean absorbs it),
    completing the location family next to the trimmed mean, weighted
    median, and MAD.

    Exactness: each price snaps to ``floor(ln(cents)·10⁶ + ½)`` BEFORE
    any reduction (the :func:`~pdf_parser_ray.stages.textstats.lnm_micro`
    spec shared with entropy/NLL/JSD), so the per-brand sum is an
    order-free integer and the mean one ``_rhalf`` — hash-exact vs the
    ``_shared_ln_cte`` SQL replay. The geometric mean itself is
    ``exp(gm_ln_micro / 10⁶)`` driver-side; the engine never computes
    a float exp.

    Shape: per-batch partial (brand, n, Σlnm) — ln args repeat
    heavily, so the batch fn maps distinct cents through one LUT —
    then ONE ``groupby(brand)`` exchange carrying ≤ brands × blocks
    fixed-width rows.
    """
    from ray.data.aggregate import Sum

    from ..stages.textstats import _lnm_vec

    parts = _read(sf_dir, "part", ["p_brand", "p_retailprice"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cents = _cents(batch["p_retailprice"]).to_numpy(zero_copy_only=False)
        lnm = _lnm_vec(cents)
        agg = (
            pd.DataFrame(
                {"p_brand": batch["p_brand"].to_pylist(), "lnm": lnm}
            )
            .groupby("p_brand", sort=False)
            .agg(n_parts=("lnm", "size"), sum_ln_micro=("lnm", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "p_brand": pa.array(agg["p_brand"].tolist(), pa.string()),
                "n_parts": pa.array(agg["n_parts"].to_numpy(np.int64), pa.int64()),
                "sum_ln_micro": pa.array(
                    agg["sum_ln_micro"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_parts"].to_numpy(zero_copy_only=False)
        s = batch["sum_ln_micro"].to_numpy(zero_copy_only=False)
        gm = np.array(
            [_rhalf(int(sv), int(nv)) for sv, nv in zip(s, n)], dtype=np.int64
        )
        return batch.append_column("gm_ln_micro", pa.array(gm, pa.int64()))

    return (
        parts.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("p_brand")
        .aggregate(
            Sum("n_parts", alias_name="n_parts"),
            Sum("sum_ln_micro", alias_name="sum_ln_micro"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def _sql_geo_mean() -> str:
    from ..stages.textstats import _shared_ln_cte

    cte = _shared_ln_cte(
        "(SELECT p_brand, CAST(ROUND(p_retailprice*100) AS BIGINT) AS k FROM part)",
        "k",
    )
    return f"""
WITH lns AS (
    SELECT p_brand,
           CAST(FLOOR(lnk * CAST(1000000.0 AS DOUBLE)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS lnm
    FROM {cte} t),
m AS (
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(lnm) AS BIGINT) AS sum_ln_micro
    FROM lns GROUP BY p_brand)
SELECT p_brand, n_parts, sum_ln_micro,
       CAST(CASE WHEN sum_ln_micro >= 0
                 THEN (2*sum_ln_micro + n_parts) // (2*n_parts)
                 ELSE -((-2*sum_ln_micro + n_parts) // (2*n_parts)) END
            AS BIGINT) AS gm_ln_micro
FROM m
"""


# ---------------------------------------------------------------------------
# theilsen_trend — robust yearly-revenue slope (median of pair slopes)
# ---------------------------------------------------------------------------

def q_theilsen_trend(sf_dir: str):
    """Theil–Sen estimator of the yearly order-revenue trend: the
    lower median of all pairwise slopes between per-year revenue
    totals, in exact micro-cents/year — the robust complement of the
    grouped OLS slope (``REGR_SLOPE`` family): one anomalous year
    moves OLS, while Theil–Sen tolerates ⌊n/2⌋ outlier years.

    Exactness: per-year cent totals are exact integer sums; each of
    the ``C(years, 2)`` pair slopes snaps to ``_rhalf(10⁶·Δrev, Δyear)``
    (sign-split so DuckDB's truncating ``//`` agrees); the lower
    median is ``sorted[(n_pairs−1)//2]`` = ``quantile_disc(0.5)``.

    Shape: per-batch (year, cents) partials → ONE ``groupby(year)``
    Sum exchange (≤ calendar-years rows); the pairwise median is a
    bounded driver fold over O(years²) ints — 21 pairs for TPC-H's 7
    years, independent of corpus size.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        y = _year_of(_ts_us(batch["o_orderdate"]))
        cents = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
        agg = (
            pd.DataFrame({"o_year": y, "cents": cents})
            .groupby("o_year", sort=False)["cents"]
            .sum()
            .reset_index(name="rev_cents")
        )
        return pa.table(
            {
                "o_year": pa.array(agg["o_year"].to_numpy(np.int64), pa.int64()),
                "rev_cents": pa.array(
                    agg["rev_cents"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    yearly = (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("o_year")
        .aggregate(Sum("rev_cents", alias_name="rev_cents"))
        .to_pandas()  # bounded: one row per calendar year
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    yrs = yearly["o_year"].to_numpy(dtype=np.int64)
    rev = yearly["rev_cents"].to_numpy(dtype=np.int64)
    slopes = [
        _rhalf(10**6 * (int(rev[j]) - int(rev[i])), int(yrs[j]) - int(yrs[i]))
        for i in range(len(yrs))
        for j in range(i + 1, len(yrs))
    ]
    slopes.sort()
    n_pairs = len(slopes)
    med = slopes[(n_pairs - 1) // 2] if n_pairs else 0
    return pd.DataFrame(
        {
            "n_years": [len(yrs)],
            "n_pairs": [n_pairs],
            "theilsen_slope_micro": [med],
        }
    ).astype(np.int64)


_SQL_THEILSEN = """
WITH y AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM orders GROUP BY 1),
p AS (
    SELECT 1000000*(b.rev_cents - a.rev_cents) AS num,
           b.o_year - a.o_year AS den
    FROM y a JOIN y b ON b.o_year > a.o_year),
s AS (
    SELECT CAST(CASE WHEN num >= 0 THEN (2*num + den) // (2*den)
                     ELSE -((-2*num + den) // (2*den)) END AS BIGINT) AS slope
    FROM p)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM y) AS n_years,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COALESCE(quantile_disc(slope, 0.5), 0) AS BIGINT)
           AS theilsen_slope_micro
FROM s
"""


# ---------------------------------------------------------------------------
# event_markov_stationary — power iteration over the transition chain
# ---------------------------------------------------------------------------

_MARKOV_ITERS = 5


def q_event_markov_stationary(sf_dir: str):
    """Stationary distribution of the first-order event-type Markov
    chain (:func:`~pdf_parser_ray.relational.ops.q_event_transitions`'s
    matrix) by synchronous power iteration — where does user attention
    settle if sessions ran forever? The chain-level complement of the
    per-step transition matrix, and the same fixed-point-iteration
    shape as PageRank applied to a COLLAPSED state space.

    Exactness: starts uniform at ``10⁶ // K`` and iterates
    ``π'(t) = Σ_f (π(f)·n(f→t)) // tot(f)`` five times in pure integer
    arithmetic — the SQL twin unrolls the same five steps as CTEs, so
    the floors agree bit-for-bit (small floor mass loss per step is
    part of the spec on both sides). Null-typed events are excluded;
    precondition: every observed state has at least one outgoing
    transition (holds at any realistic volume — documented, not
    guarded).

    Shape: all the distribution happens inside the transition-count
    build (ONE coarse user-bucket exchange; each event crosses the
    wire once, then O(types²) count partials); the five iterations run
    driver-side over the K×K integer matrix — K = event-type
    cardinality, a few dozen at most, so the iteration state is
    O(types²) ints regardless of corpus size (contrast PageRank, whose
    per-iteration state is O(nodes) and stays distributed).
    """
    import pandas as pd

    from .ops import q_event_transitions

    m = q_event_transitions(sf_dir)
    m = m[m["from_type"].notna() & m["to_type"].notna()]
    counts = {
        (f, t): int(n)
        for f, t, n in zip(m["from_type"], m["to_type"], m["n_steps"])
    }
    tot: dict[str, int] = {}
    for (f, _), n in counts.items():
        tot[f] = tot.get(f, 0) + n
    states = sorted(set(m["from_type"]) | set(m["to_type"]))
    pi = {s: 1_000_000 // len(states) for s in states}
    for _ in range(_MARKOV_ITERS):
        nxt = {s: 0 for s in states}
        for (f, t), n in counts.items():
            nxt[t] += (pi[f] * n) // tot[f]
        pi = nxt
    out = pd.DataFrame(
        {"event_type": states, "pi_micro": [pi[s] for s in states]}
    )
    out = out[out["pi_micro"] != 0].reset_index(drop=True)
    out["pi_micro"] = out["pi_micro"].astype(np.int64)
    return out


def _render_markov_sql() -> str:
    head = """
WITH p AS (
    SELECT user_id, event_type AS t,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS f
    FROM events),
c AS (
    SELECT f, t, CAST(COUNT(*) AS BIGINT) AS n
    FROM p WHERE f IS NOT NULL AND t IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT f, CAST(SUM(n) AS BIGINT) AS tf FROM c GROUP BY f),
states AS (
    SELECT f AS s FROM c UNION SELECT t AS s FROM c),
pi0 AS (
    SELECT s, CAST(1000000 // (SELECT COUNT(*) FROM states) AS BIGINT) AS r
    FROM states)"""
    steps = []
    for i in range(1, _MARKOV_ITERS + 1):
        steps.append(
            f""",
pi{i} AS (
    SELECT c.t AS s, CAST(SUM((p.r * c.n) // tot.tf) AS BIGINT) AS r
    FROM c JOIN pi{i - 1} p ON c.f = p.s JOIN tot ON tot.f = c.f
    GROUP BY c.t
)"""
        )
    return (
        head
        + "".join(steps)
        + f"""
SELECT s AS event_type, r AS pi_micro FROM pi{_MARKOV_ITERS} WHERE r != 0
"""
    )


_SQL_MARKOV = _render_markov_sql()


# ---------------------------------------------------------------------------
# time_to_convert — first-view → first-purchase latency distribution
# ---------------------------------------------------------------------------

def q_time_to_convert(sf_dir: str, n_buckets: int = 32):
    """Per-user conversion latency — µs from the user's FIRST view to
    their first purchase AT OR AFTER that view — folded to the
    three-number summary growth teams track (converter count, exact
    lower-median latency, max latency). The time-dimension complement
    of :func:`~pdf_parser_ray.relational.ops.q_conversion_funnel`'s
    unordered counts.

    Exactness: per-user µs deltas are int64; the lower median over the
    per-user latency list is ``sorted[(n−1)//2]`` = ``quantile_disc(0.5)``
    (house median convention). Users with no view or no qualifying
    purchase drop out on both sides.

    Shape: ONE coarse user-bucket exchange (events cross the wire
    once); per bucket, a vectorized groupby takes first-view /
    first-qualifying-purchase and emits ONE latency row per converter;
    the final fold is a bounded three-number read-off (at 10¹² events
    the median read-off moves to the value-count summary exactly like
    the grouped-percentile family)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"]
        keep = pc.is_in(et, value_set=pa.array(["view", "purchase"]))
        t = pa.table(
            {
                "bucket": pa.array(uid % n_buckets, pa.int64()),
                "user_id": batch["user_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "is_view": pc.equal(et, "view"),
            }
        )
        return t.filter(keep)

    def fold_bucket(g: "pd.DataFrame") -> pa.Table:
        views = (
            g[g["is_view"]]
            .groupby("user_id", sort=False)["ts_us"]
            .min()
            .rename("v0")
            .reset_index()
        )
        p = g[~g["is_view"]][["user_id", "ts_us"]].merge(views, on="user_id")
        p = p[p["ts_us"] >= p["v0"]]
        first_p = p.groupby("user_id", sort=False)["ts_us"].min().reset_index()
        lat = first_p.merge(views, on="user_id")
        vals = (lat["ts_us"] - lat["v0"]).to_numpy(dtype=np.int64)
        return pa.table({"latency_us": pa.array(vals, pa.int64())})

    lats = (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(fold_bucket, batch_format="pandas")
        .to_pandas()  # bounded: one row per CONVERTER (≤ users)
    )
    v = np.sort(lats["latency_us"].to_numpy(dtype=np.int64))
    n = len(v)
    return pd.DataFrame(
        {
            "n_converters": [n],
            "median_latency_us": [int(v[(n - 1) // 2]) if n else 0],
            "max_latency_us": [int(v[-1]) if n else 0],
        }
    ).astype(np.int64)


_SQL_TIME_TO_CONVERT = """
WITH v AS (
    SELECT user_id, MIN(epoch_us(ts)) AS v0
    FROM events WHERE event_type = 'view' GROUP BY user_id),
p AS (
    SELECT e.user_id, MIN(epoch_us(e.ts)) - MAX(v.v0) AS latency_us
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.v0
    GROUP BY e.user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converters,
       CAST(COALESCE(quantile_disc(latency_us, 0.5), 0) AS BIGINT)
           AS median_latency_us,
       CAST(COALESCE(MAX(latency_us), 0) AS BIGINT) AS max_latency_us
FROM p
"""


# ---------------------------------------------------------------------------
# top_decile_share — revenue concentration (top 10% of customers)
# ---------------------------------------------------------------------------

def q_top_decile_share(sf_dir: str):
    """Revenue concentration: the exact share of total order revenue
    captured by the top 10% of ordering customers — the read-off form
    of the concentration story ``spend_gini`` summarizes as one index
    (a Gini says "unequal"; this says "the top decile is N% of
    revenue", the number the business conversation actually uses).

    Exactness: the decile cut runs on the per-customer-total
    VALUE-COUNT summary — equal totals contribute equally, so the
    straddling value is taken partially and no tie-break key is needed
    (same order-statistics arithmetic as the trimmed mean);
    ``share_ppm = _rhalf(10⁶·top_cents, total_cents)``.

    Shape: per-batch (custkey, cents) partials → ONE coarse
    custkey-bucket exchange (the tiny-group-trap-free pattern: per-key
    totals resolve vectorized INSIDE each bucket, then collapse to
    per-bucket value counts) → bounded driver fold over (value, cnt)
    rows (one per distinct spend total; at 10⁹+ customers the same
    cut runs on the log-histogram sketch bins, the rule unchanged).
    k = n_customers // 10 (floor; customers with no orders don't
    participate)."""
    import pandas as pd

    n_buckets = 32
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
        agg = (
            pd.DataFrame(
                {
                    "o_custkey": batch["o_custkey"].to_numpy(
                        zero_copy_only=False
                    ),
                    "cents": cents,
                }
            )
            .groupby("o_custkey", sort=False)["cents"]
            .sum()
            .reset_index()
        )
        keys = agg["o_custkey"].to_numpy(np.int64)
        return pa.table(
            {
                "bucket": pa.array(keys % n_buckets, pa.int64()),
                "o_custkey": pa.array(keys, pa.int64()),
                "cents": pa.array(agg["cents"].to_numpy(np.int64), pa.int64()),
            }
        )

    def bucket_value_counts(g: "pd.DataFrame") -> pa.Table:
        totals = g.groupby("o_custkey", sort=False)["cents"].sum()
        vals, cnt = np.unique(totals.to_numpy(dtype=np.int64), return_counts=True)
        return pa.table(
            {
                "total_cents_v": pa.array(vals.astype(np.int64), pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    vc = (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(bucket_value_counts, batch_format="pandas")
        .to_pandas()  # bounded: ≤ one row per DISTINCT spend total per bucket
        .groupby("total_cents_v", sort=False)["cnt"]
        .sum()
        .reset_index()
        .sort_values("total_cents_v", ascending=False)
        .reset_index(drop=True)
    )
    vals = vc["total_cents_v"].to_numpy(dtype=np.int64)
    cnt = vc["cnt"].to_numpy(dtype=np.int64)
    n = int(cnt.sum())
    k = n // 10
    cum = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    take = np.clip(k - cum, 0, cnt)
    top = int((vals * take).sum())
    tot = int((vals * cnt).sum())
    return pd.DataFrame(
        {
            "n_customers": [n],
            "k_top": [k],
            "top_cents": [top],
            "total_cents": [tot],
            "share_ppm": [_rhalf(10**6 * top, tot) if tot else 0],
        }
    ).astype(np.int64)


_SQL_TOP_DECILE = """
WITH s AS (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders GROUP BY 1),
k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) // 10 AS BIGINT) AS k FROM s),
r AS (SELECT cents, row_number() OVER (ORDER BY cents DESC) AS rn FROM s)
SELECT (SELECT n FROM k) AS n_customers,
       (SELECT k FROM k) AS k_top,
       CAST(SUM(CASE WHEN rn <= (SELECT k FROM k) THEN cents ELSE 0 END)
            AS BIGINT) AS top_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST((2*1000000*SUM(CASE WHEN rn <= (SELECT k FROM k)
                                THEN cents ELSE 0 END)
             + SUM(cents)) // (2*SUM(cents)) AS BIGINT) AS share_ppm
FROM r
"""


# ---------------------------------------------------------------------------
# revenue_autocorr — lag-1 autocorrelation of the monthly revenue series
# ---------------------------------------------------------------------------

def q_revenue_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of monthly order revenue — is this
    month's revenue predictive of next month's? The first number a
    forecasting effort computes (high positive → trend/momentum, near
    zero → white noise around seasonality, negative → mean
    reversion). Output is DIVISION-FREE (the ``tier_kappa``/PSI house
    pattern): ``corr_sign`` plus the exact integer moments
    ``r2_num = n·Σxy − Σx·Σy``, ``r2_dx``, ``r2_dy`` with
    ``r² = num²/(dx·dy)`` — a ratio column would need num²·10⁶,
    which exceeds HUGEINT on real monthly magnitudes (measured at
    sf0.01; the first formulation overflowed DuckDB INT128). Pairs
    are CONSECUTIVE entries of the sorted month list.

    Exactness: monthly totals fold to whole THOUSANDS of dollars and
    are centered by the series minimum before the moment sums —
    translation leaves Pearson invariant and the k$ unit keeps every
    moment inside BIGINT (envelope: centered monthly k$ ≲ 3·10⁸,
    ≈ sf400; beyond that rescale the unit, the rule unchanged); the
    driver side uses Python bigints so the spec is shared.

    Shape: per-batch (month, cents) partials → ONE ``groupby(month)``
    exchange (≤ calendar-months rows) → bounded driver fold over the
    ≤ dozens-entry series. Same bounded-read-off contract as
    ``theilsen_trend``."""
    import pandas as pd
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch["o_orderdate"])
        month = (
            us.astype("datetime64[us]").astype("datetime64[M]").astype(np.int64)
        )
        cents = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
        agg = (
            pd.DataFrame({"month": month, "cents": cents})
            .groupby("month", sort=False)["cents"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "month": pa.array(agg["month"].to_numpy(np.int64), pa.int64()),
                "cents": pa.array(agg["cents"].to_numpy(np.int64), pa.int64()),
            }
        )

    m = (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("month")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()  # bounded: one row per calendar month
        .sort_values("month")
        .reset_index(drop=True)
    )
    rev = (m["cents"].to_numpy(dtype=np.int64) // 100_000).astype(object)
    n_months = len(rev)
    if n_months >= 2:
        c = int(rev.min())
        x = [int(v) - c for v in rev[:-1]]
        y = [int(v) - c for v in rev[1:]]
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        syy = sum(b * b for b in y)
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        sign = 0 if num == 0 else (1 if num > 0 else -1)
    else:
        n, sign, num, dx, dy = 0, 0, 0, 0, 0
    return pd.DataFrame(
        {
            "n_months": [n_months],
            "n_pairs": [n],
            "corr_sign": [sign],
            "r2_num": [num],
            "r2_dx": [dx],
            "r2_dy": [dy],
        }
    ).astype(np.int64)


_SQL_REVENUE_AUTOCORR = """
WITH m AS (
    SELECT date_trunc('month', o_orderdate) AS mo,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) // 100000
                AS BIGINT) AS rev
    FROM orders GROUP BY 1),
c AS (SELECT MIN(rev) AS c0 FROM m),
p AS (
    SELECT CAST(rev - (SELECT c0 FROM c) AS HUGEINT) AS x,
           CAST(lead(rev) OVER (ORDER BY mo) - (SELECT c0 FROM c)
                AS HUGEINT) AS y
    FROM m),
s AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n,
           SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
           SUM(x*x) AS sxx, SUM(y*y) AS syy
    FROM p WHERE y IS NOT NULL)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_months,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_pairs,
       CAST(CASE WHEN n IS NULL OR n*sxy - sx*sy = 0 THEN 0
                 WHEN n*sxy - sx*sy > 0 THEN 1 ELSE -1 END
            AS BIGINT) AS corr_sign,
       CAST(COALESCE(n*sxy - sx*sy, 0) AS BIGINT) AS r2_num,
       CAST(COALESCE(n*sxx - sx*sx, 0) AS BIGINT) AS r2_dx,
       CAST(COALESCE(n*syy - sy*sy, 0) AS BIGINT) AS r2_dy
FROM s
"""


# ---------------------------------------------------------------------------
# weekday_seasonality — revenue mix by day of week
# ---------------------------------------------------------------------------

def q_weekday_seasonality(sf_dir: str):
    """Order count and exact revenue share per day of week — the
    seasonality fingerprint batch schedulers and anomaly baselines key
    on (a Tuesday that looks like a Sunday is an incident). Weekday is
    derived arithmetically from epoch days (``(days + 4) % 7``,
    Sunday = 0 — the DuckDB ``dayofweek`` convention, pinned by the
    oracle) so no timezone or locale library is involved.

    Shape: per-batch (dow, n, cents) partials → ONE 7-key exchange;
    ``rev_share_ppm = _rhalf(10⁶·dow_cents, total_cents)`` read off
    the ≤7-row fold."""
    import pandas as pd
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch["o_orderdate"])
        dow = (us // 86_400_000_000 + 4) % 7
        cents = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
        agg = (
            pd.DataFrame({"dow": dow, "cents": cents})
            .groupby("dow", sort=False)
            .agg(n_orders=("cents", "size"), rev_cents=("cents", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "dow": pa.array(agg["dow"].to_numpy(np.int64), pa.int64()),
                "n_orders": pa.array(
                    agg["n_orders"].to_numpy(np.int64), pa.int64()
                ),
                "rev_cents": pa.array(
                    agg["rev_cents"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    df = (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("dow")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("rev_cents", alias_name="rev_cents"),
        )
        .to_pandas()  # bounded: ≤ 7 rows
        .sort_values("dow")
        .reset_index(drop=True)
    )
    tot = int(df["rev_cents"].sum())
    df["rev_share_ppm"] = [
        _rhalf(10**6 * int(v), tot) if tot else 0 for v in df["rev_cents"]
    ]
    for c in df.columns:
        df[c] = df[c].astype(np.int64)
    return df


_SQL_WEEKDAY = """
WITH d AS (
    SELECT dayofweek(o_orderdate) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM orders GROUP BY 1)
SELECT CAST(dow AS BIGINT) AS dow, n_orders, rev_cents,
       CAST((2*1000000*rev_cents + SUM(rev_cents) OVER ())
            // (2*SUM(rev_cents) OVER ()) AS BIGINT) AS rev_share_ppm
FROM d
"""


QUERIES = {
    "event_markov_stationary": q_event_markov_stationary,
    "time_to_convert": q_time_to_convert,
    "top_decile_share": q_top_decile_share,
    "revenue_autocorr": q_revenue_autocorr,
    "weekday_seasonality": q_weekday_seasonality,
    "user_active_time": q_user_active_time,
    "user_burstiness": q_user_burstiness,
    "geo_mean_price": q_geo_mean_price,
    "theilsen_trend": q_theilsen_trend,
}

ORACLE_SQL = {
    "event_markov_stationary": _SQL_MARKOV,
    "time_to_convert": _SQL_TIME_TO_CONVERT,
    "top_decile_share": _SQL_TOP_DECILE,
    "revenue_autocorr": _SQL_REVENUE_AUTOCORR,
    "weekday_seasonality": _SQL_WEEKDAY,
    "user_active_time": _SQL_USER_ACTIVE_TIME,
    "user_burstiness": _SQL_USER_BURSTINESS,
    "geo_mean_price": _sql_geo_mean(),
    "theilsen_trend": _SQL_THEILSEN,
}
