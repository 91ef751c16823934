"""tier_agreement invariants: set algebra must hold between the three
tier signals, and on the real corpus the tiers must actually DISAGREE
somewhere — unanimous agreement everywhere would mean the operator
measures nothing and the cascade's tier choice is vacuous."""

SF = "/root/testdata/sf0.001"


def test_tier_agreement_invariants(ray_session):
    from pdf_parser_ray.stages.tieragree import q_tier_agreement

    df = q_tier_agreement(SF).to_pandas()
    assert len(df) == 500

    # set algebra: intersection of all three is bounded by every tier
    assert (df.all3_keep <= df[["jt_keep", "ce_keep", "bte_keep"]].min(axis=1)).all()
    # each tier keeps at most all blocks
    for c in ("jt_keep", "ce_keep", "bte_keep"):
        assert (df[c] <= df.n_blocks).all()
        assert (df[c] >= 0).all()
    # Jaccard lives in [0, 1e6]
    for c in ("jac_jt_ce_micro", "jac_jt_bte_micro", "jac_ce_bte_micro"):
        assert (df[c] >= 0).all() and (df[c] <= 1_000_000).all()
        # identical kept sets of equal size ⇒ jaccard 1e6; mixed corpus
        # must show BOTH perfect and imperfect agreement somewhere
        assert (df[c] == 1_000_000).any() or (df[c] < 1_000_000).any()

    # the measurement is non-vacuous: some document disagrees on some pair
    disagree = (
        (df.jac_jt_ce_micro < 1_000_000)
        | (df.jac_jt_bte_micro < 1_000_000)
        | (df.jac_ce_bte_micro < 1_000_000)
    )
    assert disagree.any()
    # and some pair agrees perfectly somewhere (tiers aren't orthogonal)
    agree = (
        (df.jac_jt_ce_micro == 1_000_000)
        | (df.jac_jt_bte_micro == 1_000_000)
        | (df.jac_ce_bte_micro == 1_000_000)
    )
    assert agree.any()
