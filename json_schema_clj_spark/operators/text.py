"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions (regex + HOFs) — designed so an external SQL
engine can replicate every measure exactly (the DuckDB oracle contract):
md5 where hashing must match, regexp dialects kept to the common subset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _with_deps, normalized, raw_word_ngrams

# tiny per-language stopword lists for the n-gram/stopword-hit heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "que", "los", "las"],
    "de": ["der", "die", "und", "das", "ein"],
}


def tokens(text: Column) -> Column:
    return F.split(normalized(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: words + digits + punctuation split by a
    BPE-style regex — a cheap, deterministic proxy for tokenizer cost."""
    return F.size(
        F.filter(
            F.split(text, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda t: F.trim(t) != "",
        )
    )


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or LANG_STOPWORDS["en"]
    sw_arr = F.array(*[F.lit(w) for w in sw])
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length in a sane band, moderate
    punctuation, some stopwords, sane mean word length — the standard cheap
    pre-filter battery for web-scale corpora."""
    n_tok = token_count(text)
    len_ok = (n_tok >= 5) & (n_tok <= 100000)
    punct_ok = punct_ratio(text) <= 0.2
    mwl = mean_word_length(text)
    mwl_ok = (mwl >= 2) & (mwl <= 12)
    sw_ok = stopword_ratio(text) >= 0.0
    score = (
        len_ok.cast("int") + punct_ok.cast("int") + mwl_ok.cast("int") + sw_ok.cast("int")
    ) / F.lit(4.0)
    return score


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit count per language."""
    toks = tokens(text)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def detect_lang(text: Column) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when no list
    scores > 0.  Deterministic tiebreak by language code order."""
    scores = lang_scores(text)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores):  # de < en < es < fr; later wins only if strictly greater
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized text (oracle-
    replicable)."""
    return F.md5(normalized(text))


def winnow_sketch(text: Column, k: int = 3, top: int = 5) -> Column:
    """Order-insensitive near-dup sketch: the `top` lexicographically
    smallest k-word-shingle md5s, comma-joined (a deterministic min-k
    sketch in the winnowing family)."""
    from .dedup import word_shingles

    sh = F.array_sort(word_shingles(text, k))
    return F.concat_ws(",", F.slice(sh, 1, top))


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subtokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(mean_word_length(t), 6).alias("mean_word_len"),
        F.round(quality_score(t), 6).alias("quality"),
        detect_lang(t).alias("lang_detected"),
        fingerprint(t).alias("fingerprint"),
    )


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5,),
    line_sep: str = "\n",
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Table A1) — the standard battery for cutting
    machine-generated / boilerplate text from a training corpus:

    - ``dup_word_frac``      1 − distinct words / words
    - ``dup_line_frac``      occurrences of repeated lines / lines
    - ``dup_line_char_frac`` chars inside repeated lines / chars (raw text)
    - ``top{n}gram_char_frac`` for n in ``top_ns``: max over n-grams of
      occurrences·len(gram) / len(normalized text)
    - ``dup{n}gram_char_frac`` for n in ``dup_ns``: Σ over n-grams seen >1×
      of occurrences·len(gram) / len(normalized text) (overlapping grams
      over-count — the standard cheap approximation; a fraction >1 simply
      means "saturated repetition")

    Scale shape: ONE scan, ONE explode of the tagged gram arrays — lines
    (tag 0), words/1-grams (tag 1, which double as the word- and
    char-count carriers: n_words = Σcnt, distinct words = row count,
    normalized length = Σ(len+1)·cnt − 1, and raw length/line count
    reconstruct from the line rows the same way), plus the requested
    n-grams — then one partial-agg'd shuffle keyed (id, n, gram) and one
    rollup shuffle on id.  No join back, no second pass over the text.
    Never quadratic in document length (the all-HOF alternative is
    O(len²) per doc, which dies on 100k-token documents).

    ``line_sep`` must be a regex matching exactly one character (the raw
    length reconstruction counts one separator char between lines)."""
    t = F.col(text_col)
    all_ns = (*top_ns, *dup_ns)
    if len(set(all_ns)) != len(all_ns) or any(n < 2 for n in all_ns):
        raise ValueError(
            f"top_ns and dup_ns must be disjoint ints >= 2 (0 is the line "
            f"tag, 1 the word tag), got top_ns={top_ns} dup_ns={dup_ns}"
        )
    # tag each gram with its n (lines tagged 0, words 1 — no collision
    # with word n-grams possible) and explode once
    # NB: the tag lambda must stay SINGLE-ARG — `lambda g, n=n:` would have
    # arity 2 and PySpark would bind the second parameter to the element
    # INDEX, silently replacing the intended constant
    def _tag(n: int):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.flatten(
        F.array(
            F.transform(F.split(t, line_sep), _tag(0)),
            F.transform(tokens(t), _tag(1)),
            *[F.transform(raw_word_ngrams(t, n), _tag(n)) for n in all_ns],
        )
    )
    grams = df.select(F.col(id_col), F.explode(tagged).alias("g")).select(
        id_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
    )
    counts = grams.groupBy(id_col, "n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    n_col, cnt = F.col("n"), F.col("cnt")
    gram_chars = cnt * F.length("gram")
    rolled = counts.groupBy(id_col).agg(
        F.sum(F.when(n_col == 1, cnt)).alias("n_words"),
        F.count(F.when(n_col == 1, True)).alias("_dw"),
        (F.sum(F.when(n_col == 1, (F.length("gram") + 1) * cnt)) - 1).alias("_nlen"),
        F.sum(F.when(n_col == 0, cnt)).alias("_nlines"),
        F.sum(F.when(n_col == 0, gram_chars)).alias("_linechars"),
        F.sum(F.when((n_col == 0) & (cnt > 1), cnt)).alias("_dl"),
        F.sum(F.when((n_col == 0) & (cnt > 1), gram_chars)).alias("_dlc"),
        *[F.max(F.when(n_col == n, gram_chars)).alias(f"_top{n}") for n in top_ns],
        *[
            F.sum(F.when((n_col == n) & (cnt > 1), gram_chars)).alias(f"_dup{n}")
            for n in dup_ns
        ],
    )

    def frac(num: Column, den: Column) -> Column:
        return F.round(F.coalesce(num, F.lit(0)) / F.greatest(den, F.lit(1)).cast("double"), 6)

    rlen = F.col("_linechars") + F.col("_nlines") - 1
    return rolled.select(
        F.col(id_col),
        F.col("n_words"),
        F.round(
            F.lit(1) - F.col("_dw") / F.greatest(F.col("n_words"), F.lit(1)).cast("double"),
            6,
        ).alias("dup_word_frac"),
        frac(F.col("_dl"), F.col("_nlines")).alias("dup_line_frac"),
        frac(F.col("_dlc"), rlen).alias("dup_line_char_frac"),
        *[frac(F.col(f"_top{n}"), F.col("_nlen")).alias(f"top{n}gram_char_frac") for n in top_ns],
        *[frac(F.col(f"_dup{n}"), F.col("_nlen")).alias(f"dup{n}gram_char_frac") for n in dup_ns],
    )


def sample_hash_bucket(key: Column, seed: str = "s1") -> Column:
    """Deterministic per-row sampling bucket in [0, 65536): the first 4 hex
    chars of md5(seed || key), compared as an integer.  Engine-portable —
    any SQL engine with md5 reproduces the exact row set — and stable
    across runs, partitionings, and cluster sizes (no RNG state), which is
    what corpus-mixing reproducibility requires."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 4), 16, 10).cast("long")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    seed: str = "s1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling — the corpus-mixing primitive: keep
    each row iff its hash bucket falls under its stratum's rate (rates are
    quantized to 1/65536).  A pure per-row predicate over the scan: no
    shuffle, no RNG, fully pushdown-friendly, identical output at any
    parallelism (the property the two-cluster-size scaling evidence needs
    from every sampled stage)."""
    bucket = sample_hash_bucket(F.col(key_col), seed)
    thr = F.lit(int(default_rate * 65536))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum, F.lit(int(rate * 65536))).otherwise(thr)
    return df.where(bucket < thr)


def corpus_mix(
    df: DataFrame,
    budgets: dict[str, int],
    stratum_col: str,
    key_col: str,
    size_col: str,
    seed: str = "mix1",
) -> DataFrame:
    """Budget-driven corpus mixing — the step that turns "give me B tokens
    from each source" into a concrete training mix, including REPEATING
    underrepresented sources (epochs > 1, the temperature-mixing mechanic):

    one agg pass computes per-stratum size totals (|strata| rows collected
    — driver-sized at any scale, and collected ONCE so the derived rates
    are plan literals, deterministic across jobs); each row of stratum s
    then gets ``budget_s // total_s`` full copies plus one more iff its
    md5 hash bucket falls under the integer-exact remainder threshold
    ``((budget_s mod total_s) * 65536) // total_s``.  All threshold
    arithmetic is integer (no float rates), so a SQL engine reproduces the
    exact multiset of (row, copy) pairs.  Strata absent from ``budgets``
    are dropped; output gains a 0-based ``copy`` index.

    The expansion is a per-row explode of ``sequence(0, n_copies-1)`` —
    no shuffle, no RNG, bit-identical at any parallelism."""
    totals = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col).agg(F.sum(size_col)).collect()
        if r[0] in budgets and r[1]
    }
    n_full = F.lit(0)
    thr = F.lit(0)
    keep = F.lit(False)
    for s in sorted(totals):
        tot, b = int(totals[s]), int(budgets[s])
        n_full = F.when(F.col(stratum_col) == s, F.lit(b // tot)).otherwise(n_full)
        thr = F.when(
            F.col(stratum_col) == s, F.lit(((b % tot) * 65536) // tot)
        ).otherwise(thr)
        keep = F.when(F.col(stratum_col) == s, F.lit(True)).otherwise(keep)
    bucket = sample_hash_bucket(F.col(key_col), seed)
    n_copies = (n_full + (bucket < thr).cast("int")).alias("_ncopies")
    return (
        df.where(keep)
        .withColumn("_ncopies", n_copies)
        .where(F.col("_ncopies") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.col("_ncopies") - 1)))
        .drop("_ncopies")
    )


def budget_select(
    df: DataFrame,
    budgets: dict[str, int],
    stratum_col: str,
    size_col: str,
    order_col: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Quality-ranked token-budget selection — `corpus_mix`'s complement:
    instead of repeating/sampling every row to hit a budget, KEEP THE BEST
    rows of each stratum until its token budget is spent.  `order_col` is
    a globally unique NUMERIC priority (ascending = better; callers encode
    "quality desc, id asc" into it, e.g. ``-score * 2^32 + id``), and a
    row is kept iff it STARTS inside its stratum's budget — the exclusive
    prefix-sum of `size_col` in priority order is < budget.  The
    straddling row is thus kept (budgets are soft by at most one
    document), a deterministic rule both engines state identically.

    Scale shape: one `grouped_exclusive_cumsum` (quantile-bucketed
    windows, |strata|·|buckets| totals collected — never a per-stratum
    single-partition window) + a literal-threshold filter.  Output keeps
    every input row with `start_offset` and a `kept` flag so the caller
    can audit the cut line; strata without a budget are kept=false with
    offset -1.
    """
    from .packing import grouped_exclusive_cumsum

    known = sorted(budgets)
    in_budget = F.col(stratum_col).isin(known)
    cum = grouped_exclusive_cumsum(
        df.where(in_budget), size_col, order_col, stratum_col, n_parts=n_parts
    )
    thr = F.lit(None).cast("long")
    for s in known:
        thr = F.when(F.col(stratum_col) == s, F.lit(int(budgets[s]))).otherwise(thr)
    kept = cum.withColumn("kept", F.col("start_offset") < thr)
    rest = (
        df.where(~in_budget | F.col(stratum_col).isNull())
        .withColumn("start_offset", F.lit(-1).cast("long"))
        .withColumn("kept", F.lit(False))
    )
    return kept.unionByName(rest)


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
) -> DataFrame:
    """Corpus vocabulary profile: the top_k most frequent normalized
    tokens as (token, n, rank, doc_freq) plus one summary row
    (token='*', n=total token occurrences, rank=0, doc_freq=vocab size).
    The first artifact a tokenizer/quality pass reads — heads dominated
    by markup or boilerplate tokens are the classic crawl-corpus smell.

    Scale shape: ONE explode → partial-aggregated (token) count (doc_freq
    via count_distinct on the doc id rides the same shuffle); the top-k is
    sort+limit — Catalyst's TakeOrderedAndProject (per-partition heads
    merged at the driver), never a global row_number window; the summary
    row folds from the SAME persisted counted frame (a second tiny agg
    over |vocab| cached rows — the corpus is tokenized once; call
    operators.dedup.release on the result to free the cache).  Ties at the boundary break by token
    text, so the row set is deterministic in any engine."""
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).where(F.col("token") != "")
    # persisted: the top-k branch and the summary branch both read the
    # counted frame — without the cache each branch re-runs the corpus
    # explode+count (two full scans); with it the corpus is tokenized
    # once and both branches read |vocab| cached rows.  release() the
    # result (operators.dedup.release) to free the blocks.
    counted = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("_doc").alias("doc_freq"),
    ).persist()
    order = [F.desc("n"), F.asc("token")]
    top = counted.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    ranked = top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "token", "n", "rank", "doc_freq"
    )
    summary = counted.agg(
        F.sum("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
    ).select(F.lit("*").alias("token"), "n", F.lit(0).cast("long").alias("rank"), "doc_freq")
    return _with_deps(summary.unionByName(ranked), counted)
