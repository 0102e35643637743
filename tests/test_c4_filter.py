"""C4 line-level filter (textops.c4_line_filter).

The oracled query (`x_c4_filter`) exercises the structural rules on
the extraction corpus; these tests pin the rules the corpus never
triggers (blocked phrase, curly brace, javascript lines) and the
zero-shuffle plan claim.
"""

import contextlib
import io

from credit_ocr_system_spark.operators.textops import c4_line_filter


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["url", "extracted_text"])


def _run(spark, text):
    out = c4_line_filter(_docs(spark, [("u", text)])).collect()[0]
    return out


def test_line_rules(spark):
    text = ("keep me now please.\n"          # kept
            "too short.\n"                    # < 3 words
            "no terminal punctuation here\n"  # bad terminal
            "three words okay?\n"             # kept ('?' terminal)
            "enable javascript to view this page.\n"  # javascript
            "  padded line survives trimming.  \n"    # kept, trimmed
            "quoted line stays in too.\"")            # kept ('"')
    r = _run(spark, text)
    assert r.n_lines == 7
    assert r.n_kept == 4
    assert r.clean_text.split("\n") == [
        "keep me now please.",
        "three words okay?",
        "padded line survives trimming.",
        'quoted line stays in too."',
    ]
    assert r.n_sentences == 4  # '.', '?', '.', and the '.' in 'too."'
    assert bool(r.keep)  # 3 sentences, no blockers


def test_crlf_and_tab_padded_lines_survive(spark):
    """The round-4 review bug: space-only trim left the trailing '\\r'
    of CRLF corpora (and trailing tabs) on every line, so no line
    ended in terminal punctuation and whole pages were silently
    rejected. The char-set trim must keep them."""
    crlf = ("Good sentence one is here.\r\n"
            "Good sentence two is here.\r\n"
            "Good sentence three is here.\r\n")
    r = _run(spark, crlf)
    assert r.n_kept == 3 and bool(r.keep)
    assert r.clean_text.split("\n") == [
        "Good sentence one is here.",
        "Good sentence two is here.",
        "Good sentence three is here.",
    ]
    tabbed = ("First tabbed line stays here.\t\n"
              "Second tabbed line stays here.\t\n"
              "\tThird tabbed line stays here.\t")
    r2 = _run(spark, tabbed)
    assert r2.n_kept == 3 and bool(r2.keep)
    assert "\t" not in r2.clean_text


def test_min_sentences_drops_page(spark):
    r = _run(spark, "one good sentence here.\nanother good one here?")
    assert r.n_kept == 2 and r.n_sentences == 2
    assert not bool(r.keep)


def test_blocked_phrase_drops_page(spark):
    base = "good first sentence here.\ngood second sentence here.\n" \
           "good third sentence here."
    assert bool(_run(spark, base).keep)
    r = _run(spark, base + "\nLorem Ipsum dolor sit amet.")
    assert not bool(r.keep)  # case-insensitive phrase block


def test_brace_drops_page(spark):
    base = "good first sentence here.\ngood second sentence here.\n" \
           "good third sentence here."
    r = _run(spark, base + "\nfunction f() { return 1; }")
    assert not bool(r.keep)
    # the brace line itself was already dropped (no terminal '.')
    assert "function" not in r.clean_text


def test_zero_shuffle_plan(spark):
    df = c4_line_filter(_docs(spark, [("u", "a b c.")]))
    plan = plan_of(df)
    assert "Exchange" not in plan  # pure map-side projection
    assert "Join" not in plan
