"""Kernel vs DuckDB oracles: jaro_winkler_similarity and levenshtein."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from codingchallenge_spark.functions.similarity import (
    jaro_winkler_batch,
    levenshtein_batch,
)

words = st.text(alphabet="abcdefgh_0123", min_size=0, max_size=24)


@given(st.lists(st.tuples(words, words), min_size=1, max_size=30))
@settings(max_examples=40, deadline=None)
def test_jw_matches_duckdb(pairs):
    con = duckdb.connect()
    want = np.array(
        [
            con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
            for a, b in pairs
        ]
    )
    got = jaro_winkler_batch([a for a, _ in pairs], [b for _, b in pairs])
    assert np.allclose(got, want, atol=1e-9)


@given(st.lists(st.tuples(words, words), min_size=1, max_size=30))
@settings(max_examples=40, deadline=None)
def test_levenshtein_matches_duckdb(pairs):
    con = duckdb.connect()
    want = [
        con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
        for a, b in pairs
    ]
    got = levenshtein_batch([a for a, _ in pairs], [b for _, b in pairs]).tolist()
    assert got == want
