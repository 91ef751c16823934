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
