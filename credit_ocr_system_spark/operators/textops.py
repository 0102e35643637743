"""Text-analysis and deduplication operators for the documents table.

Large-scale training-data pipeline operators, each expressed as native
DataFrame ops (JVM-side, whole-stage codegen — no Python in the data
path) with semantics deliberately chosen to be portable to ANSI SQL so
every operator has a DuckDB oracle:

* exact dedup           — hash groupBy (md5 of normalized text)
* word-set Jaccard      — exact near-dup pairs via explode + self-join
* MinHash LSH           — banded min-hash buckets; candidates by bucket
                          equality (the 100TB-scale near-dup path)
* SimHash               — 32-bit sign-vote fingerprint + banded LSH
* language ID           — stopword-hit heuristic
* quality scoring       — length/punctuation/stopword/diversity ratios
* token counting        — whitespace + BPE-ish regex tokenization
* fingerprinting        — sha256 over whitespace-normalized text

Portability notes (kept identical in the SQL oracles): hashes are
``md5``/``sha2`` hex strings (never engine-specific ``xxhash64``),
min-hash minima are lexicographic string minima, SimHash bit votes are
parities of md5 hex digits (``ascii(char) % 2``), and all double
aggregates are rounded at the emit boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Shared tokenization: lowercase, split on whitespace runs, drop empties.


def _tokens(col):
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


EN_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for")
DE_STOPWORDS = ("der", "die", "das", "und", "ist", "von", "mit", "für")


# --- exact dedup --------------------------------------------------------

def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5 of whitespace-normalized text.

    Keeps the lowest doc_id as the canonical representative; one
    shuffle (the groupBy), map-side partial aggregation for free.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (
        documents
        .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                F.md5(norm).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("canonical_doc_id"),
             F.count("*").alias("n_copies"))
        .where(F.col("n_copies") >= 1)
    )


# --- exact word-set Jaccard pairs ---------------------------------------

def jaccard_pairs(documents: DataFrame, threshold: float = 0.55,
                  max_doc_id: int = 200) -> DataFrame:
    """Exact 1-gram-set Jaccard near-dup pairs (a < b), via
    explode → equi-join on token → count intersections.

    The O(n²) candidate space is bounded (``max_doc_id``) — this is
    the *verifier*; at scale MinHash-LSH prunes candidates first and
    this join runs only inside buckets.
    """
    toks = (
        documents
        .where(F.col("doc_id") < max_doc_id)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                F.explode(F.array_distinct(_tokens(F.col("text"))))
                 .alias("tok"))
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_tok", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
                   .withColumnRenamed("n_tok", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- MinHash LSH ---------------------------------------------------------

N_BANDS = 4
SHINGLE_W = 3


def _shingles(tokens_col):
    """Word 3-gram shingles; empty array when fewer than 3 tokens.

    Built from three shifted slices zipped together. Deliberately NOT
    ``transform(sequence(...), i -> element_at(tokens, i))``: a lambda
    that references the outer tokens *expression* makes interpreted
    higher-order functions re-evaluate it per element — O(n²) splits
    per row (measured 30×+ slowdown at 5k docs). Here every lambda
    touches only its own arguments.
    """
    n = F.size(tokens_col)
    m = F.greatest(n - (SHINGLE_W - 1), F.lit(0))
    t1 = F.slice(tokens_col, 1, m)
    t2 = F.slice(tokens_col, 2, m)
    t3 = F.slice(tokens_col, 3, m)
    pair = F.zip_with(t1, t2, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.zip_with(pair, t3,
                      lambda ab, c: F.concat(ab, F.lit(" "), c))


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """Banded min-hash: per (doc, band), the lexicographic min of
    ``md5(band || ':' || shingle)``. Each band is one hash family
    member; band-equal minima = LSH bucket collision.

    Output: (doc_id, band, minhash) — long format so the bucket join
    is a plain equi-join on (band, minhash).
    """
    def band_hash(band: int):
        # NB: a single-parameter lambda is required — pyspark's
        # transform() treats two-parameter callables as (element,
        # index), so a `b=band` default would silently receive the
        # array index instead of the band id.
        prefix = f"{band}:"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    bands = [
        F.struct(
            F.lit(band).alias("band"),
            F.array_min(F.transform(F.col("sh"), band_hash(band)))
             .alias("minhash"),
        )
        for band in range(N_BANDS)
    ]
    return (
        documents
        .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                _shingles(_tokens(F.col("text"))).alias("sh"))
        .select("doc_id", F.explode(F.array(*bands)).alias("bm"))
        .select("doc_id", F.col("bm.band").alias("band"),
                F.col("bm.minhash").alias("minhash"))
        .where(F.col("minhash").isNotNull())
    )


def minhash_candidates(documents: DataFrame) -> DataFrame:
    """Near-dup candidate pairs: docs sharing any band bucket.

    This is the scale path: shuffle is on (band, minhash) — bucket
    sizes, not n² — and the exact Jaccard verifier then runs only on
    these pairs.
    """
    sigs = minhash_signatures(documents)
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.minhash") == F.col("b.minhash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def dedup_clusters(documents: DataFrame,
                   max_iterations: int = 15) -> DataFrame:
    """Near-duplicate clusters: connected components over the MinHash
    candidate graph; cluster id = min doc_id of the component.

    Iterative Hash-to-Min-style label propagation with pointer
    jumping: each round a doc's label becomes the min of (its label,
    its neighbors' labels, its label's label). The pointer-jump term
    gives O(log n) convergence instead of O(diameter) — the property
    that matters when a hot template chains millions of near-dup pages
    at 10^12 scale. Lineage is cut per round (localCheckpoint) so the
    plan doesn't grow with iterations.
    """
    edges = minhash_candidates(documents)
    und = (
        edges.select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst"))
        .unionByName(edges.select(F.col("doc_b").alias("src"),
                                  F.col("doc_a").alias("dst")))
    )
    und = und.localCheckpoint(eager=True)
    labels = documents.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("doc_id").cast("bigint").alias("root"),
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        nbr = (
            und.join(labels, und.dst == labels.doc_id)
            .groupBy("src").agg(F.min("root").alias("nbr_root"))
            .withColumnRenamed("src", "doc_id")
        )
        jump = labels.select(F.col("doc_id").alias("jump_key"),
                             F.col("root").alias("jump_root"))
        new_labels = (
            labels
            .join(nbr, "doc_id", "left")
            .join(jump, labels.root == jump.jump_key, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("root"),
                    F.coalesce("nbr_root", F.col("root")),
                    F.coalesce("jump_root", F.col("root")),
                ).alias("root"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.root") != F.col("o.root"))
        )
        labels = new_labels
        if changed.isEmpty():
            break
    return labels.select("doc_id", F.col("root").alias("cluster_root"))


# --- SimHash -------------------------------------------------------------

# 32 bits = one parity vote per md5 hex digit. 16 bits was too small:
# at 5k docs a 16-bit space already saturates (hamming<=3 matches
# unrelated documents, and 4-bit LSH bands give only 16 buckets), and
# at 10^12 it would be pure noise. 32 bits with 8-bit bands keeps the
# banded join selective while staying oracle-expressible.
SIMHASH_BITS = 32


def simhash(documents: DataFrame) -> DataFrame:
    """SimHash (SIMHASH_BITS wide): each distinct token votes ±1 per bit position,
    bit i taken from the parity of hex digit i of ``md5(token)``;
    positive vote sum ⇒ bit set.
    """
    toks = (
        documents
        .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                F.explode(F.array_distinct(_tokens(F.col("text"))))
                 .alias("tok"))
        .withColumn("h", F.md5(F.col("tok")))
    )
    votes = [
        F.sum(
            F.when(F.ascii(F.substring("h", i + 1, 1)) % 2 == 1, 1)
             .otherwise(-1)
        ).alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{i}") > 0,
                      F.lit(2 ** i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("bigint").alias("simhash"))


SIMHASH_BANDS = 4                      # SIMHASH_BITS/4 bits per band
SIMHASH_MAX_HAMMING = 3


def simhash_candidates(documents: DataFrame) -> DataFrame:
    """Near-duplicate candidate pairs via banded SimHash LSH.

    The simhash splits into 4 bands (8 bits each at the current
    width); documents
    sharing any band value become candidates (equi-join on
    (band, key) — the classic LSH trick that replaces the O(n²)
    all-pairs comparison with bucket-local joins at 10^12 scale),
    then candidates are verified with an exact Hamming-distance
    filter (``bit_count(a XOR b) <= 3``). Output:
    (doc_a, doc_b, hamming), doc_a < doc_b, distinct.
    """
    sims = simhash(documents)
    band_w = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << band_w) - 1
    bands = sims.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * band_w)
                 .bitwiseAND(F.lit(mask)).alias("key"))
            for b in range(SIMHASH_BANDS)])).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("a.simhash").alias("sim_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("b.simhash").alias("sim_b"))
        .distinct()  # a pair may collide in several bands
    )
    hamming = F.bit_count(
        F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


# --- language ID ----------------------------------------------------------

def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-hit language guess (n-gram-heuristic family).

    Emits per-language hit counts and the argmax guess; 'unknown' on
    ties/zero hits, deterministically.
    """
    toks = _tokens(F.col("text"))
    en = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    de = F.size(F.filter(toks, lambda t: t.isin(*DE_STOPWORDS)))
    return documents.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        en.alias("en_hits"),
        de.alias("de_hits"),
        F.when(en > de, "en").when(de > en, "de")
         .otherwise("unknown").alias("lang_guess"),
    )


# --- quality scoring -------------------------------------------------------

def quality_score(documents: DataFrame) -> DataFrame:
    """Deterministic quality features + a composite score.

    Features follow the published web-text quality heuristics
    (C4/Gopher-style): length, mean token length, stopword ratio,
    digit/punctuation density, token diversity.
    """
    text = F.col("text")
    toks = _tokens(text)
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))).cast("double")
    n_digits = (n_chars - F.length(
        F.regexp_replace(text, r"[0-9]", ""))).cast("double")
    n_punct = (n_chars - F.length(
        F.regexp_replace(text, r"[^\w\s]", ""))).cast("double")

    safe_tokens = F.greatest(n_tokens, F.lit(1.0))
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    # raw (unrounded) ratios feed the composite; rounding happens once
    # per emitted column. Composing *rounded* 1e-6 multiples would park
    # the composite exactly on round-half boundaries, where Spark and
    # other engines legitimately disagree on double rounding.
    stop_raw = stop_hits / safe_tokens
    digit_raw = n_digits / safe_chars
    punct_raw = n_punct / safe_chars
    div_raw = n_distinct / safe_tokens
    score = F.round(
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * 0.3
        + stop_raw * 0.2
        + div_raw * 0.3
        + (F.lit(1.0) - punct_raw) * 0.1
        + (F.lit(1.0) - digit_raw) * 0.1, 3)
    mean_tok_len = F.round(
        (n_chars - (n_tokens - 1)) / safe_tokens, 6)
    stop_ratio = F.round(stop_raw, 6)
    digit_ratio = F.round(digit_raw, 6)
    punct_ratio = F.round(punct_raw, 6)
    diversity = F.round(div_raw, 6)
    return documents.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        mean_tok_len.alias("mean_tok_len"),
        stop_ratio.alias("stop_ratio"),
        digit_ratio.alias("digit_ratio"),
        punct_ratio.alias("punct_ratio"),
        diversity.alias("diversity"),
        score.alias("quality"),
    )


# --- token counting ---------------------------------------------------------

BPE_ISH_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens vs BPE-ish regex tokens per document."""
    text = F.lower(F.col("text"))
    return documents.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(_tokens(F.col("text"))).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), F.lit(0)))
         .cast("bigint").alias("re_tokens"),
    )


# --- fingerprinting ----------------------------------------------------------

ROLL_BASE = 131
ROLL_MOD = 1_000_000_007  # keeps h*131+255 < 2^63: identical in any engine
CHAR_SHINGLE_W = 8


def fingerprints(documents: DataFrame) -> DataFrame:
    """Document fingerprints over whitespace-normalized lowered text:

    * ``fp_sha256`` — exact content fingerprint;
    * ``fp_prefix64`` — md5 of the 64-char prefix (cheap blocking key);
    * ``fp_roll`` — Karp-Rabin polynomial rolling hash over the char
      stream (fold ``h = (h*131 + code) mod 1e9+7`` — overflow-free in
      64-bit, so every engine computes the identical value);
    * ``fp_shingle_min`` — winnowing-style minimum md5 over 8-char
      shingles (robust to local edits, the near-dup blocking key).
    """
    norm_expr = F.trim(
        F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    df = documents.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        norm_expr.alias("norm"))
    norm = F.col("norm")
    chars = F.filter(F.split(norm, ""), lambda ch: ch != "")
    codes = F.transform(chars, lambda ch: F.ascii(ch).cast("bigint"))
    fp_roll = F.aggregate(
        codes, F.lit(0).cast("bigint"),
        lambda h, c: (h * ROLL_BASE + c) % ROLL_MOD)
    n_sh = F.greatest(F.length(norm) - (CHAR_SHINGLE_W - 1), F.lit(0))
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.md5(norm.substr(i, F.lit(CHAR_SHINGLE_W))))
    return df.select(
        "doc_id",
        F.sha2(norm, 256).alias("fp_sha256"),
        F.md5(F.substring(norm, 1, 64)).alias("fp_prefix64"),
        fp_roll.alias("fp_roll"),
        F.when(n_sh > 0, F.array_min(shingle_hashes))
         .alias("fp_shingle_min"),
    )


# --- shingle (n-gram) Jaccard ------------------------------------------------

def shingle_jaccard_pairs(documents: DataFrame, threshold: float = 0.10,
                          max_doc_id: int = 150) -> DataFrame:
    """Exact word-3-gram-shingle Jaccard pairs (a < b) — the n-gram
    variant of ``jaccard_pairs``; the verifier MinHash-LSH candidates
    are checked against."""
    sh = (
        documents
        .where(F.col("doc_id") < max_doc_id)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                F.explode(F.array_distinct(
                    _shingles(_tokens(F.col("text"))))).alias("sh"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
                   .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
