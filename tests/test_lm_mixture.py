"""Semantic properties of the corpus-LM score and temperature mixture.

Oracle parity (test_oracle_parity.py) proves engine agreement; these
tests prove the operators compute the *right thing*: the LM score
orders boilerplate below rare-token noise, and the mixture flattens
source shares exactly to quota.
"""

import math

import pytest

from credit_ocr_system_spark.operators.textops import (
    MIXTURE_TARGET_FRAC,
    temperature_mixture,
    unigram_lm_score,
)


@pytest.fixture(scope="module")
def lm_docs(spark):
    # "common common ..." boilerplate vs docs of unique rare tokens
    rows = [(0, "common " * 20, "a")]
    rows += [(i, f"common word{i}a word{i}b word{i}c", "a")
             for i in range(1, 9)]
    rows.append((9, "rare0 rare1 rare2 rare3", "a"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


def test_unigram_lm_orders_boilerplate_below_rare(lm_docs):
    out = {r["doc_id"]: r for r in unigram_lm_score(lm_docs).collect()}
    # the all-"common" doc sits at the corpus mode -> lowest H
    assert out[0]["cross_entropy"] == min(
        r["cross_entropy"] for r in out.values())
    # the all-rare doc is the most surprising -> highest H
    assert out[9]["cross_entropy"] == max(
        r["cross_entropy"] for r in out.values())
    assert out[0]["n_tokens"] == 20 and out[0]["n_distinct"] == 1
    # H of a single-token doc is exactly -ln p(common)
    n_common, total = 28, 20 + 8 * 4 + 4
    expected = -math.log(n_common / total)
    assert abs(out[0]["cross_entropy"] - expected) < 1e-6


@pytest.fixture(scope="module")
def mix_docs(spark):
    # hot source (80 docs) vs small sources (16 / 4)
    rows = ([(i, "t", "hot") for i in range(80)]
            + [(100 + i, "t", "mid") for i in range(16)]
            + [(200 + i, "t", "cold") for i in range(4)])
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


def test_temperature_mixture_flattens_to_exact_quota(mix_docs):
    out = temperature_mixture(mix_docs).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    n = {s: len(v) for s, v in by_src.items()}
    kept = {s: sum(r["kept"] for r in v) for s, v in by_src.items()}
    cap = {s: v[0]["cap"] for s, v in by_src.items()}
    # kept count per source == min(cap, n_src), exactly
    for s in by_src:
        assert kept[s] == min(cap[s], n[s]), s
    # quotas follow sqrt weights: sum(q) == 1, shares flattened
    z = math.sqrt(80) + math.sqrt(16) + math.sqrt(4)
    for s, n_s in (("hot", 80), ("mid", 16), ("cold", 4)):
        assert abs(by_src[s][0]["q"] - math.sqrt(n_s) / z) < 1e-8
    # flattening: kept fraction grows as source size shrinks
    fr = {s: kept[s] / n[s] for s in by_src}
    assert fr["hot"] < fr["mid"] <= fr["cold"]
    # overall budget ~= target_frac * N (exact up to per-source
    # rounding and small-source saturation)
    assert sum(cap.values()) == pytest.approx(
        MIXTURE_TARGET_FRAC * 100, abs=len(by_src))
    # determinism: same input -> identical sample
    again = {(r["doc_id"], r["kept"])
             for r in temperature_mixture(mix_docs).collect()}
    assert again == {(r["doc_id"], r["kept"]) for r in out}


def test_remove_duplicate_spans_keeps_first_copy(spark):
    from credit_ocr_system_spark.operators.textops import (
        remove_duplicate_spans,
    )

    boiler = "subscribe to our newsletter for updates every single day"
    rows = [
        (0, boiler + " alpha beta gamma"),
        (1, "delta " + boiler + " epsilon"),   # later copy -> removed
        (2, "zeta eta theta iota kappa lam mu nu xi"),  # unique
        (3, boiler),                            # fully duplicated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in remove_duplicate_spans(docs, width=8).collect()}
    # first occurrence survives verbatim
    assert out[0]["n_removed"] == 0
    assert out[0]["clean_text"] == boiler + " alpha beta gamma"
    # later copy loses exactly the boilerplate span (9 tokens)
    assert out[1]["n_removed"] == 9
    assert out[1]["clean_text"] == "delta epsilon"
    # unique doc untouched; fully-duplicated doc is emptied
    assert out[2]["n_removed"] == 0
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 9


def test_quality_filter_verdict_composes_components(spark, sf_dir):
    from credit_ocr_system_spark.operators import relational as R
    from credit_ocr_system_spark.operators.textops import quality_filter

    docs = R.load(spark, sf_dir, "documents")
    out = quality_filter(docs).collect()
    assert len(out) == docs.count()  # verdict for every document
    for r in out:
        expect = (r["lang_ok"] and r["quality_ok"] and r["lm_ok"]
                  and not r["is_repetitive"] and not r["is_dup_span"]
                  and not r["is_contaminated"])
        assert r["kept"] == expect, r
    # the chain must not be degenerate: both verdicts occur
    kept = sum(r["kept"] for r in out)
    assert 0 < kept < len(out)


@pytest.fixture(scope="module")
def ppl_docs(spark):
    # two languages; within each, an all-mode boilerplate doc, a block
    # of ordinary docs, and an all-rare doc — the tertile structure is
    # known by construction
    rows = []
    for lang, base in (("de", 0), ("en", 100)):
        rows.append((base + 0, "common " * 20, lang))
        # a gradient of rarity: doc i mixes (8 - i) mode tokens with i
        # unique ones, so every score is distinct and the tertiles are
        # populated (ties at a cutoff all go to the lower bucket —
        # that collapse is tested implicitly by using distinct scores)
        rows += [(base + i,
                  " ".join(["common"] * (8 - i)
                           + [f"w{lang}{i}{j}" for j in range(i)]),
                  lang)
                 for i in range(1, 8)]
        rows.append((base + 8, f"r{lang}0 r{lang}1 r{lang}2", lang))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string")


def test_perplexity_buckets_tertiles_per_language(ppl_docs):
    from credit_ocr_system_spark.operators.textops import (
        perplexity_buckets,
    )

    out = perplexity_buckets(ppl_docs).collect()
    assert len(out) == ppl_docs.count()
    by_doc = {r["doc_id"]: r for r in out}
    # boilerplate = head, all-rare = tail, in BOTH languages
    for base in (0, 100):
        assert by_doc[base + 0]["ppl_bucket"] == "head"
        assert by_doc[base + 8]["ppl_bucket"] == "tail"
    # buckets are score-monotone within a language: every head score
    # <= every middle score <= every tail score
    for lang in ("de", "en"):
        rows = [r for r in out if r["lang"] == lang]
        ce = {b: [r["cross_entropy"] for r in rows
                  if r["ppl_bucket"] == b]
              for b in ("head", "middle", "tail")}
        assert ce["head"] and ce["middle"] and ce["tail"]
        assert max(ce["head"]) <= min(ce["middle"])
        assert max(ce["middle"]) <= min(ce["tail"])
