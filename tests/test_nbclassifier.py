"""Naive Bayes content classifier: the trained model's class counts
must tally the corpus, the confusion matrix must cover every block
exactly once, and the learned classifier must actually be GOOD — it
trains on the gold labels the heuristics never see, so anything near
coin-flip accuracy would mean the train→broadcast→apply plumbing is
broken, not that the problem is hard."""

SF = "/root/testdata/sf0.001"


def test_nb_model_counts_tally(ray_session):
    from pdf_parser_ray.stages.nbclassifier import train_nb

    counts, n_class = train_nb(SF)
    total = n_class[0] + n_class[1]
    assert total > 0
    # every feature's per-class counts tally the same corpus
    for fid in (0, 1, 2):
        for g in (0, 1):
            s = sum(v for k, v in counts.items()
                    if k // 100 == fid and k % 10 == g)
            assert s == n_class[g], (fid, g)


def test_nb_confusion_and_accuracy(ray_session):
    from pdf_parser_ray.stages.nbclassifier import q_nb_content_eval, train_nb

    df = q_nb_content_eval(SF).to_pandas()
    _, n_class = train_nb(SF)
    assert df.n.sum() == n_class[0] + n_class[1]
    assert set(zip(df.pred, df.gold)) <= {(0, 0), (0, 1), (1, 0), (1, 1)}
    acc = df.loc[df.pred == df.gold, "n"].sum() / df.n.sum()
    assert acc > 0.9  # measured 0.974 at sf0.001; coin-flip means broken plumbing
