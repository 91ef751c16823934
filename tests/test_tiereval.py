"""tier_eval invariants: the gold mask is tier-independent (tp + fn
must agree across tiers per document), the metrics live in [0, 1e6],
and the corpus exercises both perfect and imperfect extraction — a
degenerate evaluation (all tiers always perfect, or never) would
measure nothing."""

SF = "/root/testdata/sf0.001"


def test_tier_eval_invariants(ray_session):
    from pdf_parser_ray.stages.tiereval import q_tier_eval

    df = q_tier_eval(SF).to_pandas()
    assert len(df) == 5 * 500
    assert set(df.tier) == {"justext", "cetr", "bte", "vote", "boilerpipe"}

    # gold is the same for every tier: tp + fn is per-doc constant
    gold = df.assign(g=df.tp + df.fn).groupby("doc_id")["g"].nunique()
    assert (gold == 1).all()

    for c in ("precision_micro", "recall_micro", "f1_micro"):
        assert (df[c] >= 0).all() and (df[c] <= 1_000_000).all()

    # non-vacuous: every tier makes SOME mistake somewhere, and every
    # tier gets close to perfect somewhere (CETR reaches exactly 1e6;
    # BTE structurally cannot — the cookie banner scores positive, so
    # an interval ending past it always carries that one fp)
    by_tier = df.groupby("tier")
    assert (by_tier["f1_micro"].min() < 1_000_000).all()
    assert (by_tier["f1_micro"].max() >= 900_000).all()
    assert df.loc[df.tier == "cetr", "f1_micro"].max() == 1_000_000
    # and every tier recovers most of the content on average
    assert (by_tier["recall_micro"].mean() > 500_000).all()

    # the majority vote must dominate its WEAKEST constituent (it can
    # lose to the best single tier — measured fact on this corpus)
    means = by_tier["f1_micro"].mean()
    singles = means[["justext", "cetr", "bte"]]
    assert means["vote"] > singles.min()


def test_tier_kappa_consistent_with_block_signals(ray_session):
    """kappa's 2×2 sums must be recomputable from the published
    per-block signal matrix — the two operators share one synthesis,
    so any drift between them is a bug in one of the folds. Also pins
    the bound |kappa| ≤ 1 (num within ±den) and chance-correction
    being LOWER than raw agreement on this chrome-heavy corpus."""
    from pdf_parser_ray.stages.tiereval import (
        _KAPPA_PAIRS,
        q_block_signals,
        q_tier_kappa,
    )

    kappa = q_tier_kappa(SF).set_index("pair")
    sig = q_block_signals(SF).to_pandas()
    cols = {"justext": "jt", "cetr": "ce", "bte": "bt", "boilerpipe": "bp"}
    assert len(kappa) == len(_KAPPA_PAIRS)
    for a, b in _KAPPA_PAIRS:
        sa = sig[cols[a]].to_numpy()
        sb = sig[cols[b]].to_numpy()
        n = len(sig)
        n11 = int((sa & sb).sum())
        n00 = int(((1 - sa) & (1 - sb)).sum())
        a1, b1 = int(sa.sum()), int(sb.sum())
        chance = a1 * b1 + (n - a1) * (n - b1)
        row = kappa.loc[f"{a}|{b}"]
        assert int(row["n_blocks"]) == n
        assert int(row["agree_ppm"]) == (n11 + n00) * 1_000_000 // n
        assert int(row["kappa_num"]) == n * (n11 + n00) - chance
        assert int(row["kappa_den"]) == n * n - chance
        assert abs(int(row["kappa_num"])) <= int(row["kappa_den"])
        # chance correction bites: kappa < raw agreement
        assert (
            int(row["kappa_num"]) * 1_000_000
            < int(row["agree_ppm"]) * int(row["kappa_den"])
        )
