"""Fixture generator invariants (FIXTURES.md §A)."""

from fixtures.gen_repo_files import generate


def test_deterministic():
    a = generate(200)
    b = generate(200)
    assert a.records.equals(b.records)
    assert a.golden.equals(b.golden)
    assert a.labeled_pairs.equals(b.labeled_pairs)


def test_shape_and_uniqueness():
    fx = generate(200)
    assert list(fx.records.columns) == ["repo", "path", "commit", "lang", "content"]
    assert len(fx.records) == 200
    assert fx.golden["rid"].is_unique
    assert fx.records["content"].str.len().min() > 0


def test_labeled_pairs_composition():
    fx = generate(200)
    lp = fx.labeled_pairs
    n_pos = int(lp["is_match"].sum())
    n_neg = int((~lp["is_match"]).sum())
    assert n_pos > 0
    assert n_neg >= 10 * n_pos  # FIXTURES.md §A2 ratio
    assert (lp["rid1"] < lp["rid2"]).all()  # canonical order
    assert lp["block_key"].notna().all()


def test_planted_cluster_sizes():
    fx = generate(500)
    sizes = fx.golden.groupby("entity_id").size()
    assert sizes.max() <= 6
    assert sizes.min() >= 1
    assert (sizes > 1).sum() > 0  # some real clusters exist
