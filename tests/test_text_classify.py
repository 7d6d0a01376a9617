"""Text-function + classification expression semantics (unit level — the
oracle gate covers cross-engine parity; these pin the intended behaviors)."""

import pytest
from pyspark.sql import functions as F

from doc_quality_check_spark.functions.classify import (
    argmax_type,
    catalog_hits,
    clamp,
    margin_classify,
    type_scores,
)
from doc_quality_check_spark.functions.text import (
    clean_text,
    fingerprint,
    language_argmax,
    language_scores,
    marker_count,
    quality_features,
    quality_score,
    token_count,
)
from doc_quality_check_spark.operators.repair import pair_repair


def test_clean_text_chain(spark):
    df = spark.createDataFrame(
        [("a\x00b   c ???????? d\n\n\n\ne  ",)], ["text"]
    )
    out = df.select(clean_text("text").alias("c")).first()["c"]
    assert "\x00" not in out
    assert "????" not in out
    assert "   " not in out
    assert out == out.strip()


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["fp"] for r in df.select("doc_id", fingerprint("text").alias("fp")).collect()}
    assert rows[1] == rows[3]
    assert rows[1] != rows[2]


def test_quality_score_bounds_and_cases(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over a lazy dog again and again today"),
         (2, "x"),
         (3, ",,,,, ;;;; !!!! ....")],
        ["doc_id", "text"],
    )
    out = df.select("doc_id", *quality_features("text"))
    rows = {r["doc_id"]: r["q"] for r in out.select("doc_id", quality_score().alias("q")).collect()}
    assert all(0.0 <= v <= 100.0 for v in rows.values())
    assert rows[1] > rows[2]
    assert rows[1] > rows[3]


def test_language_argmax_tiebreak_and_default(spark):
    cats = {"aa": ["foo"], "bb": ["bar"]}
    df = spark.createDataFrame(
        [(1, "foo bar"), (2, "bar"), (3, "baz")], ["i", "text"]
    )
    out = df.select("i", *language_scores("text", cats)).select(
        "i", language_argmax(cats).alias("lang")
    )
    got = {r["i"]: r["lang"] for r in out.collect()}
    assert got[1] == "aa"      # tie → sorted-first
    assert got[2] == "bb"
    assert got[3] == "unknown"


def test_marker_count(spark):
    df = spark.createDataFrame([("x<<<<<y<<z",)], ["t"])
    assert df.select(marker_count("t", "<").alias("n")).first()["n"] == 7


def test_margin_classify(spark):
    df = spark.createDataFrame(
        [(10.0, 1.0), (1.0, 10.0), (5.0, 5.0), (0.0, 0.0), (10.0, 9.5)],
        ["sa", "sb"],
    )
    out = df.select(
        margin_classify(F.col("sa"), F.col("sb"), "A", "B").alias("lab")
    ).collect()
    labs = [r["lab"] for r in out]
    assert labs == ["A", "B", "ambiguous", "ambiguous", "ambiguous"]


def test_clamp(spark):
    df = spark.createDataFrame([(150.0,), (-20.0,), (55.0,)], ["v"])
    got = [r["c"] for r in df.select(clamp(F.col("v")).alias("c")).collect()]
    assert got == [100.0, 0.0, 55.0]


def test_pair_repair_rules(spark):
    df = spark.createDataFrame(
        [
            (1, 0, "en", 100), (2, 0, "de", 10),     # short adopts 'en'
            (3, 1, "fr", 50), (4, 1, "es", 45),      # comparable → unchanged
            (5, 2, "zh", 9),                          # singleton → unchanged
        ],
        ["doc_id", "grp", "lang", "w"],
    )
    out = {r["doc_id"]: r["repaired_label"] for r in
           pair_repair(df, "grp", "lang", "w", "doc_id").collect()}
    assert out == {1: "en", 2: "en", 3: "fr", 4: "es", 5: "zh"}


def test_kv_entries_and_map(spark):
    """F16 parity: colon-first, dash fallback per line, line_N fallback when
    nothing matches, duplicate keys last-win — semantics of the reference
    extract_json_keys (utils/content_extraction.py:150-189)."""
    from doc_quality_check_spark.functions.text import extract_kv_map

    cases = [
        (0, "Name: John\nAge - 30\nName: Jane",
         {"Name": "Jane", "Age": "30"}),                 # last-wins
        (1, "plain text\n\n  spaced line  ",
         {"line_1": "plain text", "line_3": "spaced line"}),  # original indices
        (2, "", {}),
        (3, "   \n\t", {}),                               # whitespace-only
        (4, "a: b: c", {"a": "b: c"}),                    # greedy key stop at first ':'
        (5, "x - y\nno pattern", {"x": "y"}),             # partial match → NO fallback
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in cases], "id int, txt string")
    got = {r["id"]: dict(r["m"]) for r in
           df.select("id", extract_kv_map("txt").alias("m")).collect()}
    for i, _, exp in cases:
        assert got[i] == exp, (i, got[i], exp)


def test_priority_reclassify_chain(spark):
    """C7: ordered rule chain + recorded detection_method
    (identity_detection.py:162-187)."""
    from doc_quality_check_spark.functions.classify import priority_reclassify

    cases = [
        (0, "x <<<<< y scan table", "back", "mrz_pattern"),     # marker wins over all
        (1, "signature expiry nome", "back", "back_keywords"),  # back >= front
        (2, "nome cognome photo signature", "front", "front_keywords"),
        (3, "nothing relevant", None, None),
        (4, None, None, None),                                   # null text
    ]
    back = ["signature", "expiry", "mrz"]
    front = ["nome", "cognome", "photo"]
    df = spark.createDataFrame([(i, t) for i, t, _, _ in cases], "id int, txt string")
    s = priority_reclassify("txt", back, front, marker="<", marker_min=5, short_len=200)
    got = {r["id"]: (r["s"]["label"], r["s"]["detection_method"])
           for r in df.select("id", s.alias("s")).collect()}
    for i, _, lab, meth in cases:
        assert got[i] == (lab, meth), (i, got[i])


# ---------------------------------------------------------------------------
# Property-based parity: Catalyst expressions vs faithful Python ports of the
# reference semantics, over generated inputs (not just hand-picked cases).
# One Spark job per property run (batched examples), not one per example.
# ---------------------------------------------------------------------------

def _ref_extract_json_keys(text):
    """Line-for-line port of reference extract_json_keys
    (utils/content_extraction.py:150-189)."""
    import re

    lines = text.split("\n")
    out = {}
    for line in lines:
        m = re.match(r"^\s*([^:]+):\s*(.+)$", line)
        if m:
            out[m.group(1).strip()] = m.group(2).strip()
            continue
        m = re.match(r"^\s*([^-\n]+)-\s*(.+)$", line)
        if m:
            out[m.group(1).strip()] = m.group(2).strip()
    if not out and text.strip():
        for i, line in enumerate(lines):
            if line.strip():
                out[f"line_{i+1}"] = line.strip()
    return out


def test_kv_extract_property_parity(spark):
    from hypothesis import given, settings, strategies as st

    from doc_quality_check_spark.functions.text import extract_kv_map

    # words, separators, and structure chosen to hit colon/dash/fallback/
    # duplicate paths; ASCII to keep regex semantics identical
    word = st.text(alphabet="abcXY 123:-.", min_size=0, max_size=12)
    line = st.one_of(
        st.tuples(word, word).map(lambda t: f"{t[0]}: {t[1]}"),
        st.tuples(word, word).map(lambda t: f"{t[0]} - {t[1]}"),
        word,
        st.just(""),
        st.just("   "),
    )
    texts = st.lists(st.lists(line, min_size=0, max_size=6).map("\n".join),
                     min_size=1, max_size=24)

    @settings(max_examples=12, deadline=None)
    @given(batch=texts)
    def run(batch):
        df = spark.createDataFrame(list(enumerate(batch)), "id int, txt string")
        got = {r["id"]: (dict(r["m"]) if r["m"] else {}) for r in
               df.select("id", extract_kv_map("txt").alias("m")).collect()}
        for i, text in enumerate(batch):
            assert got[i] == _ref_extract_json_keys(text), (text, got[i])

    run()


def test_priority_reclassify_property_parity(spark):
    from hypothesis import given, settings, strategies as st

    from doc_quality_check_spark.functions.classify import priority_reclassify

    back = ["signature", "expiry", "mrz"]
    front = ["nome", "cognome", "photo"]

    def ref(text):
        if text is None:
            text = ""
        low = text.lower()
        mrz = text.count("<")
        bs = sum(1 for k in back if k in low)
        fs = sum(1 for k in front if k in low)
        if mrz >= 5:
            return "back", "mrz_pattern"
        if bs > 0 and bs >= fs:
            return "back", "back_keywords"
        if fs > 0 and fs > bs:
            return "front", "front_keywords"
        if fs > 0 and len(text) < 200:
            return "front", "front_keywords_priority"
        if fs > 0:
            return "back", "back_keywords_priority"
        return None, None

    token = st.sampled_from(back + front + ["<<<<<", "<<", "plain", "words", ""])
    texts = st.lists(
        st.lists(token, min_size=0, max_size=12).map(" ".join),
        min_size=1, max_size=32,
    )

    @settings(max_examples=12, deadline=None)
    @given(batch=texts)
    def run(batch):
        df = spark.createDataFrame(list(enumerate(batch)), "id int, txt string")
        s = priority_reclassify("txt", back, front, marker="<", marker_min=5,
                                short_len=200)
        got = {r["id"]: (r["s"]["label"], r["s"]["detection_method"])
               for r in df.select("id", s.alias("s")).collect()}
        for i, text in enumerate(batch):
            assert got[i] == ref(text), (text, got[i])

    run()


def test_pii_flags_and_scrub(spark):
    from doc_quality_check_spark.functions.text import pii_flags, scrub_pii

    rows = [
        (1, "write to jane.doe+x@corp.example.org or call 555-123-4567"),
        (2, "server at 10.0.0.1 and 192.168.100.200 responded"),
        (3, "no personal data here"),
    ]
    df = spark.createDataFrame(rows, "id int, txt string")
    out = {r["id"]: r for r in
           df.select("id", *pii_flags("txt"), scrub_pii("txt").alias("s")).collect()}
    assert out[1]["has_email"] and out[1]["has_phone"] and not out[1]["has_ipv4"]
    assert out[2]["has_ipv4"] and not out[2]["has_email"]
    assert not any([out[3]["has_email"], out[3]["has_phone"], out[3]["has_ipv4"]])
    assert out[1]["s"] == "write to [EMAIL] or call [PHONE]"
    assert out[2]["s"] == "server at [IP] and [IP] responded"
    assert out[3]["s"] == rows[2][1]


def test_kv_extraction_on_natural_fixture_transcripts(spark, clips_dir):
    """F16 over the fixture's bucket-17 session-log transcripts (natural
    multi-line Key/Value data, VERDICT r2 #9): both separator forms parse,
    the duplicate 'Lang' key resolves last-wins to the uppercase value, and
    no line_N fallback fires."""
    from doc_quality_check_spark.functions.text import extract_kv_map
    from doc_quality_check_spark.sources.clips import load_clips

    clips = load_clips(spark, clips_dir).drop("bytes")
    kv_rows = clips.filter(F.col("transcript").startswith("Name: speaker "))
    rows = kv_rows.select(
        "clip_id", "transcript", extract_kv_map("transcript").alias("m")
    ).collect()
    assert len(rows) == 2400 // 200  # one bucket-17 row per 200-block
    for r in rows:
        m = r["m"]
        assert set(m) == {"Name", "Lang", "Session"}  # no line_N fallback
        n = r["transcript"].splitlines()[0].split()[-1]
        assert m["Name"] == f"speaker {n}"
        assert m["Session"] == n
        assert m["Lang"] in ("EN", "DE", "FR")  # last-wins → uppercase line
