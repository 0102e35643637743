"""Luhn-validated PAN redaction (relational.redact_pans).

Oracle parity pins the registered query against DuckDB on the corpus
(which contains no PANs — the no-false-positive half); these tests
inject true positives: valid card numbers in several formats must
redact, Luhn-failing or wrong-length digit runs must survive.
"""

from credit_ocr_system_spark.operators import relational as R


def _luhn(num: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(num)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


VALID_16 = "4111111111111111"      # classic Visa test PAN
VALID_15 = "378282246310005"       # Amex test PAN
INVALID_16 = "4111111111111112"    # last digit off by one


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint")
    return R.redact_pans(df).toPandas().set_index("doc_id")


def test_reference_luhn_agrees():
    assert _luhn(VALID_16) and _luhn(VALID_15)
    assert not _luhn(INVALID_16)


def test_valid_pans_redacted_in_all_formats(spark):
    spaced = "4111 1111 1111 1111"
    dashed = "4111-1111-1111-1111"
    out = _run(spark, [
        f"pay with {VALID_16} today",
        f"card: {spaced} exp 12/28",
        f"card: {dashed}",
        f"amex {VALID_15} works",
    ])
    assert out.n_pans.tolist() == [1, 1, 1, 1]
    assert out.loc[0, "text_redacted"] == "pay with <PAN> today"
    assert out.loc[1, "text_redacted"] == "card: <PAN> exp 12/28"
    assert "<PAN>" in out.loc[2, "text_redacted"]
    assert VALID_15 not in out.loc[3, "text_redacted"]


def test_non_pans_survive(spark):
    out = _run(spark, [
        f"checksum fails: {INVALID_16}",
        "short run 123456789012 stays",          # 12 digits: too short
        "order 8, invoice 12.99, year 2024",     # ordinary numbers
        "ref 12345678901234567890123456",        # 26 digits: too long
    ])
    assert out.n_pans.tolist() == [0, 0, 0, 0]
    assert (out.text_redacted.str.contains("<PAN>") == False).all()  # noqa: E712


def test_repeated_pan_redacts_every_occurrence(spark):
    out = _run(spark, [f"{VALID_16} and again {VALID_16}"])
    assert out.loc[0, "text_redacted"] == "<PAN> and again <PAN>"


def test_pan_adjacent_to_other_digit_groups_still_redacts(spark):
    """The round-4 review leak: a valid PAN next to a year/quantity
    merged into one too-long candidate and escaped. The group-
    subsequence scan must catch all three repros (the whole run is
    redacted — over-redaction of the neighbour digits is the
    documented privacy-first trade)."""
    out = _run(spark, [
        f"{VALID_16} 2024 annual fee",
        f"total 12 {VALID_16}",
        "4111 1111 1111 1111 12",
    ])
    assert (out.n_pans >= 1).all()
    for t in out.text_redacted:
        assert "4111" not in t and VALID_16 not in t
    assert out.loc[0, "text_redacted"] == "<PAN> annual fee"
    assert out.loc[1, "text_redacted"] == "total <PAN>"
    assert out.loc[2, "text_redacted"] == "<PAN>"


def test_long_contiguous_reference_numbers_still_survive(spark):
    """The group cap's no-false-positive half: contiguous long runs
    are ONE group, never window-scanned, so order ids keep surviving
    even when some interior 13-19 window happens to be Luhn-valid."""
    out = _run(spark, [
        "ref 12345678901234567890123456 ok",
        f"id 9{VALID_16}7 stays",  # PAN embedded in a longer run
    ])
    assert out.n_pans.tolist() == [0, 0]
    assert (out.text_redacted.str.contains("<PAN>") == False).all()  # noqa: E712


def test_single_regexp_scan_in_plan(spark):
    """The candidate array must be computed once: CollapseProject
    refuses to merge the two projections because the expression is
    non-cheap, so the physical plan carries exactly one
    regexp_extract_all. Guards the double-evaluation regression."""
    import contextlib
    import io

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        R.redact_pans(df).explain("formatted")
    assert buf.getvalue().count("regexp_extract_all") == 1


def test_flagged_run_does_not_corrupt_longer_runs(spark):
    """Boundary-guarded replace: a flagged PAN appearing as a
    substring of a longer (unflagged) digit run must leave that run
    intact, and runs delimited by spaces/punctuation must still
    redact — including two runs separated by one char."""
    out = _run(spark, [
        "card 4111 1111 1111 1111 ref 94111 1111 1111 11113",
        f"{VALID_16}.{VALID_16}",
        f"end with {VALID_16}",
    ])
    assert out.loc[0, "text_redacted"] == \
        "card <PAN> ref 94111 1111 1111 11113"
    assert out.loc[1, "text_redacted"] == "<PAN>.<PAN>"
    assert out.loc[2, "text_redacted"] == "end with <PAN>"
