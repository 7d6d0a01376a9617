"""Edge-case tests for the corpus-cleaning / retrieval / planning operators
added late in round 3: remove_boilerplate_lines, bm25_topk, skew_profile,
snapshot_diff. Driver-oracle parity is covered by check_oracle; these pin
the semantics the oracle fixture can't reach (NULL text, all-boilerplate
documents, NULL keys, NULL-safe compares, hand-computed BM25 scores)."""

import math

from doc_quality_check_spark.operators.aggregates import skew_profile
from doc_quality_check_spark.operators.dedup import remove_boilerplate_lines
from doc_quality_check_spark.operators.joins import snapshot_diff
from doc_quality_check_spark.operators.similarity import bm25_topk


def test_remove_boilerplate_lines_semantics(spark):
    rows = [
        (1, "keep one\nCOMMON FOOTER\nkeep two"),
        (2, "COMMON FOOTER\nunique a"),
        (3, "  COMMON FOOTER  \nunique b"),   # trim-matched variant
        (4, "COMMON FOOTER"),                 # every line is boilerplate
        (5, ""),                              # empty text survives
        (6, None),                            # NULL text survives as ''
        (7, "a\n\nb"),                        # blank lines are kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            df, "doc_id", "text", max_line_df=2
        ).collect()
    }
    # the footer appears in 4 distinct docs > 2 -> dropped everywhere
    assert out[1]["clean_text"] == "keep one\nkeep two"
    assert out[1]["n_lines_removed"] == 1
    assert out[2]["clean_text"] == "unique a"
    assert out[3]["clean_text"] == "unique b"     # trim match removes it
    # all-boilerplate doc survives as '' (removal never shrinks the corpus)
    assert out[4]["clean_text"] == "" and out[4]["n_lines_removed"] == 1
    assert out[5]["clean_text"] == "" and out[5]["n_lines_removed"] == 0
    assert out[6]["clean_text"] == "" and out[6]["n_lines_removed"] == 0
    assert out[7]["clean_text"] == "a\n\nb"       # blank line preserved
    assert len(out) == 7

    # below-threshold duplication is untouched
    loose = remove_boilerplate_lines(df, "doc_id", "text", max_line_df=4)
    kept = {r["doc_id"]: r["clean_text"] for r in loose.collect()}
    assert kept[4] == "COMMON FOOTER"


def test_bm25_topk_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "x x y"), (2, "x z"), (3, "z z z z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bm25"] for r in
           bm25_topk(df, "doc_id", "text", ["x", "y"], k=10).collect()}
    # N=3, avgdl=3; df_x=2, df_y=1
    idf_x = math.log(1 + (3 - 2 + 0.5) / 2.5)
    idf_y = math.log(1 + (3 - 1 + 0.5) / 1.5)

    def term(tf, dl, idf):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))

    exp1 = round(round(term(2, 3, idf_x), 6) + round(term(1, 3, idf_y), 6), 4)
    exp2 = round(round(term(1, 2, idf_x), 6), 4)
    assert out[1] == exp1 and out[2] == exp2
    assert 3 not in out                     # no query term -> no row
    assert out[1] > out[2]                  # rare term + higher tf wins


def test_skew_profile_null_keys_and_factor(spark):
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] + [(None,)]
    df = spark.createDataFrame(rows, "k string")
    out = skew_profile(df, "k", top_n=3).collect()
    assert [r["k"] for r in out] == ["a", "b", "c"]  # NULL sorts after ties
    top = out[0]
    assert top["n"] == 6 and top["frac"] == 0.6
    assert top["skew_factor"] == 3          # ceil(6 * 4 keys / 10 rows)
    assert out[1]["skew_factor"] == 1
    # NULL is profiled as a key like any other
    all_rows = skew_profile(df, "k", top_n=10).collect()
    assert any(r["k"] is None and r["n"] == 1 for r in all_rows)


def test_snapshot_diff_change_types(spark):
    schema = "k long, price double, status string"
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, None, "B"), (3, 5.0, "C"), (4, 1.0, "D"),
         (6, None, "F")],
        schema,
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, None, "B"), (3, 6.0, "C"), (5, 2.0, "E"),
         (6, 3.0, "F")],
        schema,
    )
    out = {(r["k"], r["change_type"]) for r in
           snapshot_diff(old, new, ["k"], ["price", "status"]).collect()}
    # 1 unchanged, 2 unchanged (NULL = NULL is NOT a change)
    assert out == {(3, "changed"), (4, "removed"), (5, "added"),
                   (6, "changed")}


def test_weighted_sample_determinism_and_bias(spark):
    from doc_quality_check_spark.operators.sampling import weighted_sample

    rows = [(i, 1000.0 if i < 10 else 1.0) for i in range(200)]
    rows += [(900, 0.0), (901, None), (902, -5.0)]   # no sampling mass
    df = spark.createDataFrame(rows, "doc_id long, w double")
    picked = [r["doc_id"] for r in weighted_sample(df, "doc_id", "w", k=20).collect()]
    assert len(picked) == 20
    # 1000x-weight rows must dominate the sample
    assert sum(1 for i in picked if i < 10) >= 8
    assert not {900, 901, 902} & set(picked)
    # deterministic under repartitioning
    again = [r["doc_id"] for r in
             weighted_sample(df.repartition(13), "doc_id", "w", k=20).collect()]
    assert picked == again
    # k beyond the positive-weight population returns exactly that population
    allr = weighted_sample(df, "doc_id", "w", k=10_000).collect()
    assert len(allr) == 200


def test_group_zscore_outliers_semantics(spark):
    from doc_quality_check_spark.operators.aggregates import (
        group_zscore_outliers,
    )

    rows = (
        [("a", i, 10.0) for i in range(20)] + [("a", 99, 500.0)]   # planted
        + [("b", i, 7.0) for i in range(5)]                        # zero var
        + [("c", 0, 1.0)]                                          # single
        + [("a", 100, None)]                                       # NULL
    )
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = group_zscore_outliers(df, "g", "id", "v", z_threshold=3.0).collect()
    assert [(r["g"], r["id"]) for r in out] == [("a", 99)]
    assert out[0]["z"] > 4                 # far out in its own group
    assert out[0]["value"] == 500.0
