"""Text-analysis expressions for the documents table (SURVEY.md §7 M5 /
the large-scale training-data-pipeline surface).

All pure Column expressions: language-ID by stopword-marker counts,
quality scoring, token counting (whitespace + BPE-ish regex), document
fingerprinting. At 100 TB each of these is a single projection fused
into the scan by whole-stage codegen — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker words per language for the n-gram/stopword language heuristic.
# Deterministic tie-break: earlier entry wins.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "los"],
    "fr": ["le", "et", "les"],
    "de": ["der", "und", "die"],
}


def marker_count(text: Column, word: str) -> Column:
    """Occurrences of a whole word (word-boundary regex count)."""
    return F.regexp_count(text, F.lit(rf"\b{word}\b"))


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: sum((marker_count(text, w) for w in words), F.lit(0))
        for lang, words in LANG_MARKERS.items()
    }


def detect_lang(text: Column, default: str = "und") -> Column:
    """Argmax over marker-word scores; deterministic order-priority
    tie-break; ``und`` when no marker is seen."""
    scores = lang_scores(text)
    langs = list(scores)
    best: Column = F.lit(default)
    # build from last to first so earlier langs win ties
    for lang in reversed(langs):
        others_after = [scores[o] for o in langs[langs.index(lang) + 1 :]]
        cond = scores[lang] > 0
        for o in others_after:
            cond = cond & (scores[lang] >= o)
        prior = [scores[o] for o in langs[: langs.index(lang)]]
        for o in prior:
            cond = cond & (scores[lang] > o)
        best = F.when(cond, F.lit(lang)).otherwise(best)
    return best


def word_tokens(text: Column) -> Column:
    """Whitespace tokens. CONVENTION: an empty/whitespace-only string
    yields [''] (one empty token), matching SQL string_split in the
    DuckDB oracles — every registered query's length/ratio math is
    value-checked against that shared convention, so do not "fix" it
    one-sided. NULL text yields NULL (size -1 → callers coalesce)."""
    return F.split(F.trim(text), r"\s+")


def n_words(text: Column) -> Column:
    return F.size(word_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: alpha runs, single digits, and
    punctuation each count as one token."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))


def punct_ratio(text: Column) -> Column:
    return F.round(
        F.regexp_count(text, F.lit(r"[.,!?;:]"))
        / F.greatest(F.length(text), F.lit(1)),
        4,
    )


def stopword_ratio(text: Column) -> Column:
    stop = sum((marker_count(text, w) for w in ("the", "a", "and", "of")), F.lit(0))
    return F.round(stop / F.greatest(n_words(text), F.lit(1)), 4)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, ~1]: favors texts of
    reasonable length with some stopwords and little punctuation
    noise (the usual pre-training quality gates)."""
    length_term = F.least(F.length(text) / F.lit(400.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 10.0, F.lit(1.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 20.0)
    return F.round(0.4 * length_term + 0.4 * stop_term + 0.2 * punct_term, 4)


# the 8 high-frequency words Gopher's rule 7 requires >= 2 of — the
# paper's exact list (Rae et al. 2021, A1.1 MassiveWeb filtering)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _stripped_lines(text: Column) -> Column:
    """``split('\\n')`` with each line fully whitespace-stripped
    (trim() stops at spaces; tabs would hide a bullet from the rule).
    Shared staging array for the quality bullet/ellipsis line rules,
    the repetition line/paragraph stats and the C4 line gate — project
    it ONCE per row and pass the attribute in (see gate_documents)."""
    return F.transform(
        F.split(text, r"\n"), lambda l: F.regexp_replace(l, r"^\s+|\s+$", "")
    )


def _gopher_quality_flag_exprs(
    text: Column,
    words: Column,
    lines_stripped: Column,
    norm_words: Column,
) -> dict[str, Column]:
    """The 8 Gopher quality rules as an ordered name -> raw-boolean
    dict, built over PREPARED inputs so a caller that stages
    ``words`` / ``lines_stripped`` / ``norm_words`` as real columns
    evaluates each shared array exactly once per row (r13: the inline
    form re-evaluated the word split ~30x/row in the gate's
    interpreted projection). ``words`` must be the empty-filtered
    whitespace split of ``text``; ``lines_stripped`` the
    ``_stripped_lines`` array; ``norm_words`` ``normalized_words``.
    Raw flags: NULL propagates (callers null-coalesce per the
    documented convention)."""
    n_words = F.size(words)
    nw_d = n_words.cast("double")
    safe_nw = F.when(n_words > 0, nw_d)  # NULL when 0: ratios go NULL->fail

    total_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double")
    mean_len = total_chars / safe_nw

    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    hash_ratio = n_hash.cast("double") / safe_nw
    ellipsis_ratio = n_ellipsis.cast("double") / safe_nw

    n_lines = F.size(lines_stripped).cast("double")
    bullet = lambda l: (  # noqa: E731
        l.startswith("-") | l.startswith("*") | l.startswith("•")
    )
    n_bullet = F.size(F.filter(lines_stripped, bullet))
    n_ell_end = F.size(
        F.filter(
            lines_stripped, lambda l: l.endswith("...") | l.endswith("…")
        )
    )

    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(norm_words),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )

    return {
        "n_words_ok": (n_words >= 50) & (n_words <= 100_000),
        "mean_word_len_ok": (mean_len >= 3.0) & (mean_len <= 10.0),
        "hash_ratio_ok": hash_ratio <= 0.1,
        "ellipsis_ratio_ok": ellipsis_ratio <= 0.1,
        "bullet_lines_ok": (n_bullet / n_lines) <= 0.9,
        "ellipsis_lines_ok": (n_ell_end / n_lines) <= 0.3,
        "alpha_words_ok": (n_alpha / safe_nw) >= 0.8,
        "stopwords_ok": stop_hits >= 2,
    }


def null_safe_flags(text: Column, flags: dict[str, Column]) -> dict[str, Column]:
    """The documented NULL convention applied to a raw flag dict:
    NULL text -> NULL flag; any other NULL (0-word ratios) -> FALSE
    (fail closed)."""
    return {
        k: F.when(text.isNull(), F.lit(None).cast("boolean")).otherwise(
            F.coalesce(v, F.lit(False))
        )
        for k, v in flags.items()
    }


def gopher_quality_flags(text: Column) -> Column:
    """The Gopher / MassiveWeb document-quality rules (Rae et al.
    2021, arXiv:2112.11446 §A1.1) as ONE struct column of per-rule
    booleans plus the conjunctive ``passes`` flag — pure codegen
    Column expressions, no UDF, so the gate costs a projection at any
    corpus size:

    - ``n_words_ok``: 50 <= word count <= 100_000
    - ``mean_word_len_ok``: mean word length in [3, 10]
    - ``hash_ratio_ok``: (# of '#' occurrences) / words <= 0.1
    - ``ellipsis_ratio_ok``: (# of '...' occurrences) / words <= 0.1
      (the paper thresholds each symbol's ratio SEPARATELY — a doc
      with 0.06 hash + 0.06 ellipsis passes both rules; a combined
      0.12 ratio would wrongly fail it)
    - ``bullet_lines_ok``: <= 90% of lines start with a bullet
    - ``ellipsis_lines_ok``: <= 30% of lines end with an ellipsis
    - ``alpha_words_ok``: >= 80% of words contain an alphabetic char
    - ``stopwords_ok``: >= 2 distinct of GOPHER_STOPWORDS appear as
      normalized words

    NULL text yields NULL (gate with ``passes IS TRUE`` to drop it,
    or quarantine NULLs upstream); an empty/whitespace document
    counts 0 words and fails the word-count rule rather than
    dividing by zero (ratios guard with nullif-style CASE).

    Model-pinned against a pure-Python rule walk in
    tests/test_gopher_rules.py — the thresholds are the paper's, and
    a drifted constant is a silent corpus-composition change.
    """
    # filter empty tokens rather than trim(): Spark's trim strips only
    # spaces, not \n/\t, so a whitespace-only document would otherwise
    # count phantom words and sail past the ratio rules
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    flags = _gopher_quality_flag_exprs(
        text, words, _stripped_lines(text), normalized_words(text)
    )
    # coalesce each ratio-rule to FALSE for 0-word docs (NULL ratio)
    # so `passes` stays a real boolean wherever text is non-NULL
    safe_flags = null_safe_flags(text, flags)
    passes = safe_flags["n_words_ok"]
    for k in list(safe_flags)[1:]:
        passes = passes & safe_flags[k]
    return F.struct(
        *[v.alias(k) for k, v in safe_flags.items()], passes.alias("passes")
    )


def _run_stats_raw(arr: Column) -> Column:
    """``_run_stats``'s accumulator struct as ONE aggregate expression
    — fields ``(prev, run_chars, n, dup_n, total, dup, top)``. Stage
    THIS as a column and read fields off the attribute: the renamed
    ``_run_stats`` wrapper embeds one copy of the whole aggregate per
    extracted field (5 array_sort+aggregate copies per call — the r13
    gate plan regression), so hot paths use the raw form."""
    s = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run_chars"),
        F.lit(0).cast("bigint").alias("n"),
        F.lit(0).cast("bigint").alias("dup_n"),
        F.lit(0).cast("bigint").alias("total"),
        F.lit(0).cast("bigint").alias("dup"),
        F.lit(0).cast("bigint").alias("top"),
    )

    def step(acc, x):
        same = acc.prev.eqNullSafe(x)
        ln = F.length(x).cast("bigint")
        run_chars = F.when(same, acc.run_chars + ln).otherwise(ln)
        return F.struct(
            x.alias("prev"),
            run_chars.alias("run_chars"),
            (acc.n + 1).alias("n"),
            F.when(same, acc.dup_n + 1).otherwise(acc.dup_n).alias("dup_n"),
            (acc.total + ln).alias("total"),
            F.when(same, acc.dup + ln).otherwise(acc.dup).alias("dup"),
            F.greatest(acc.top, run_chars).alias("top"),
        )

    return F.aggregate(s, init, step)


def _run_stats(arr: Column) -> Column:
    """Duplicate/top statistics of a string array in ONE row-local
    O(n log n) pass: ``struct(n, dup_n, total_chars, dup_chars,
    top_chars)`` where dup_* counts occurrences BEYOND THE FIRST of
    each distinct value and top_chars is occurrences×length of the
    most-repeated value. array_sort puts equal values adjacent, then
    a struct-accumulator aggregate walks the runs — no explode, no
    shuffle, JVM-side. NOTE each extracted field embeds its own copy
    of the aggregate; in hot paths stage ``_run_stats_raw`` as a
    column instead and read fields off the attribute."""
    st = _run_stats_raw(arr)
    return F.struct(
        st.n.alias("n"),
        st.dup_n.alias("dup_n"),
        st.total.alias("total_chars"),
        st.dup.alias("dup_chars"),
        st.top.alias("top_chars"),
    )


# (rule name, n-gram width, threshold) — the paper's Table A1 values
_GOPHER_TOP_NGRAM = [("top2gram_ok", 2, 0.20), ("top3gram_ok", 3, 0.18), ("top4gram_ok", 4, 0.16)]
_GOPHER_DUP_NGRAM = [
    ("dup5gram_ok", 5, 0.15), ("dup6gram_ok", 6, 0.14), ("dup7gram_ok", 7, 0.13),
    ("dup8gram_ok", 8, 0.12), ("dup9gram_ok", 9, 0.11), ("dup10gram_ok", 10, 0.10),
]


def _gopher_repetition_flag_exprs(
    line_stats: Column,
    para_stats: Column,
    ngram_stats: dict[int, Column],
) -> dict[str, Column]:
    """The 13 Gopher repetition rules as an ordered name -> raw-boolean
    dict over PREPARED ``_run_stats_raw`` structs (line stats,
    paragraph stats, and one per n-gram width 2..10 — RAW accumulator
    field names: total/dup/top, not total_chars/...). When the stats
    are staged attribute columns each O(n log n) array walk runs
    exactly once per row; the old inline form re-evaluated every
    struct ~4x per row (r13 gate plan: 44 array_sort copies). Raw
    flags: NULL propagates."""

    def frac_flags(stats: Column, frac_name: str, char_name: str) -> dict:
        n_d = stats.getField("n").cast("double")
        tot_d = stats.getField("total").cast("double")
        safe_n = F.when(stats.getField("n") > 0, n_d)
        safe_tot = F.when(stats.getField("total") > 0, tot_d)
        return {
            frac_name: (stats.getField("dup_n") / safe_n) <= 0.30,
            char_name: (stats.getField("dup") / safe_tot) <= 0.20,
        }

    flags: dict[str, Column] = {}
    flags.update(frac_flags(line_stats, "dup_line_frac_ok", "dup_line_char_frac_ok"))
    flags.update(frac_flags(para_stats, "dup_para_frac_ok", "dup_para_char_frac_ok"))
    # a doc too short to form any n-gram has nothing to repeat: the
    # n-gram rules pass vacuously (published implementations agree),
    # unlike the fail-closed empty-doc line rules
    for name, k, thr in _GOPHER_TOP_NGRAM:
        st = ngram_stats[k]
        tot = F.when(st.getField("total") > 0, st.getField("total").cast("double"))
        flags[name] = F.when(st.getField("n") == 0, F.lit(True)).otherwise(
            (st.getField("top") / tot) <= thr
        )
    for name, k, thr in _GOPHER_DUP_NGRAM:
        st = ngram_stats[k]
        tot = F.when(st.getField("total") > 0, st.getField("total").cast("double"))
        flags[name] = F.when(st.getField("n") == 0, F.lit(True)).otherwise(
            (st.getField("dup") / tot) <= thr
        )
    return flags


def gopher_repetition_flags(text: Column, words: Column | None = None) -> Column:
    """The repetition half of the Gopher filter (Rae et al. 2021
    Table A1) as one codegen struct column, completing
    ``gopher_quality_flags``:

    - ``dup_line_frac_ok``: <= 30% of lines are repeats (occurrences
      beyond the first of an identical line)
    - ``dup_para_frac_ok``: <= 30% of paragraphs (blank-line-split)
      are repeats
    - ``dup_line_char_frac_ok`` / ``dup_para_char_frac_ok``: <= 20%
      of line/paragraph characters sit in those repeats
    - ``top{2,3,4}gram_ok``: the most frequent word n-gram holds
      <= 20/18/16% of n-gram characters
    - ``dup{5..10}gram_ok``: characters in repeated n-grams hold
      <= 15/14/13/12/11/10%

    Denominator convention (documented because published
    implementations differ): line/paragraph fractions are over the
    doc's own lines/paragraphs and their summed characters; n-gram
    fractions are over the summed characters of the doc's n-gram
    array itself (normalized words, overlapping shingles — the
    array this engine's dedup stack already builds). All fractions
    are row-local array aggregates (``_run_stats``) — the whole
    filter is a projection, no shuffle, no Python. NULL text yields
    NULL flags; a doc with no content fails closed (FALSE), matching
    gopher_quality_flags.

    Perf note: the six shingle widths each reference the word array
    inside a lambda, and higher-order functions re-evaluate an INLINE
    argument per element (see shingles_of). For corpus-scale use,
    project the word array once and pass it in::

        docs.withColumn("__w", normalized_words(F.col("text")))
            .select(gopher_repetition_flags(F.col("text"), F.col("__w")))

    The default (``words=None``) derives it inline — correct, just
    slower on long documents.
    """
    lines = F.filter(_stripped_lines(text), lambda l: l != "")
    paras = F.filter(
        F.transform(F.split(text, r"\n{2,}"), lambda p: F.regexp_replace(p, r"^\s+|\s+$", "")),
        lambda p: p != "",
    )
    if words is None:
        words = normalized_words(text)

    flags = _gopher_repetition_flag_exprs(
        _run_stats_raw(lines),
        _run_stats_raw(paras),
        {k: _run_stats_raw(shingles_of(words, k)) for k in range(2, 11)},
    )
    safe_flags = null_safe_flags(text, flags)
    passes = None
    for v in safe_flags.values():
        passes = v if passes is None else (passes & v)
    return F.struct(
        *[v.alias(k) for k, v in safe_flags.items()], passes.alias("passes")
    )


# --- Spark-SQL twins of the staging expressions above (r13) ---------------
# Building deep higher-order-function Column trees through py4j costs
# ~0.25 ms per API call (the gate's 11 _run_stats_raw builds alone
# were ~2 s of driver time per invocation); each SQL string below
# parses in ONE JVM call into the SAME analyzed expression as its
# Column twin (value-pinned by the gate oracle + the gopher model
# pins). Change a twin pair TOGETHER — the NORMALIZED_WORDS_SQL rule.

# whitespace tokens, empty-filtered (gopher_quality_flags' words)
WS_WORDS_SQL = "filter(split({t}, '\\\\s+'), w -> w != '')"

# _stripped_lines
STRIPPED_LINES_SQL = (
    "transform(split({t}, '\\\\n'), l -> regexp_replace(l, '^\\\\s+|\\\\s+$', ''))"
)

# gopher_repetition_flags' paragraphs
STRIPPED_PARAS_SQL = (
    "filter(transform(split({t}, '\\\\n{{2,}}'),"
    " p -> regexp_replace(p, '^\\\\s+|\\\\s+$', '')), p -> p != '')"
)

# normalized_words over an arbitrary column expression (the module's
# NORMALIZED_WORDS_SQL is the DuckDB twin pinned to the literal
# ``text`` column; this is the Spark-SQL form)
SPARK_NORMALIZED_WORDS_SQL = (
    "split(trim(regexp_replace(lower({t}), '[^a-z0-9 ]', '')), ' +')"
)


def run_stats_raw_sql(arr_sql: str) -> str:
    """``_run_stats_raw`` as a Spark-SQL fragment over ``arr_sql``."""
    zero = "CAST(0 AS BIGINT)"
    return (
        f"aggregate(array_sort({arr_sql}), "
        f"named_struct('prev', CAST(NULL AS STRING), 'run_chars', {zero}, "
        f"'n', {zero}, 'dup_n', {zero}, 'total', {zero}, 'dup', {zero}, "
        f"'top', {zero}), "
        "(acc, x) -> named_struct("
        "'prev', x, "
        "'run_chars', CASE WHEN acc.prev <=> x "
        "THEN acc.run_chars + CAST(length(x) AS BIGINT) "
        "ELSE CAST(length(x) AS BIGINT) END, "
        "'n', acc.n + 1, "
        "'dup_n', CASE WHEN acc.prev <=> x THEN acc.dup_n + 1 ELSE acc.dup_n END, "
        "'total', acc.total + CAST(length(x) AS BIGINT), "
        "'dup', CASE WHEN acc.prev <=> x "
        "THEN acc.dup + CAST(length(x) AS BIGINT) ELSE acc.dup END, "
        "'top', greatest(acc.top, CASE WHEN acc.prev <=> x "
        "THEN acc.run_chars + CAST(length(x) AS BIGINT) "
        "ELSE CAST(length(x) AS BIGINT) END)))"
    )


def shingles_of_sql(words_sql: str, k: int) -> str:
    """``shingles_of`` as a Spark-SQL fragment over ``words_sql``."""
    return (
        f"CASE WHEN size({words_sql}) >= {k} "
        f"THEN transform(sequence(1, size({words_sql}) - {k - 1}), "
        f"i -> array_join(slice({words_sql}, i, {k}), ' ')) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def c4_keep_line_sql(s_sql: str, min_line_words: int = 5) -> str:
    """``c4_keep_line`` as a Spark-SQL fragment over a pre-stripped
    line expression."""
    return (
        f"((endswith({s_sql}, '.') OR endswith({s_sql}, '!') "
        f"OR endswith({s_sql}, '?') OR endswith({s_sql}, '\"')) "
        f"AND size(filter(split({s_sql}, '\\\\s+'), w -> w != '')) "
        f">= {min_line_words} "
        f"AND NOT contains(lower({s_sql}), 'javascript'))"
    )


def c4_keep_line(s: Column, min_line_words: int = 5) -> Column:
    """The C4 per-line keep rule over a PRE-STRIPPED line: terminal
    punctuation, >= ``min_line_words`` words, no "javascript".
    Running the rules on the stripped form (one regexp strip per line,
    done by the caller's ``_stripped_lines``) is equivalent to the
    strip-inside-each-rule form and evaluates the strip once — the
    r13 staging fix shared by ``c4_clean`` and ``gate_documents``."""
    terminal = (
        s.endswith(".") | s.endswith("!") | s.endswith("?") | s.endswith('"')
    )
    enough_words = (
        F.size(F.filter(F.split(s, r"\s+"), lambda w: w != ""))
        >= min_line_words
    )
    no_js = ~F.lower(s).contains("javascript")
    return terminal & enough_words & no_js


def c4_clean(text: Column, min_line_words: int = 5, min_sentences: int = 3) -> Column:
    """The C4 line/page cleaning rules (Raffel et al. 2020 §2.2) as
    one codegen struct column — the other canonical public web-text
    filter beside ``gopher_quality_flags``:

    - keep only lines that end in a terminal punctuation mark
      (``. ! ? "``, post-strip), have >= ``min_line_words`` words,
      and do not contain the word "javascript" (case-insensitive —
      the cookie/JS boilerplate rule);
    - the PAGE is dropped (``page_ok = false``) when the original
      text contains "lorem ipsum" (case-insensitive) or a ``{``
      (code), or when fewer than ``min_sentences`` kept lines remain
      (the paper counts sentences; kept terminal-punctuated lines are
      the standard DataFrame-friendly proxy, documented here so the
      approximation is explicit).

    Returns ``struct(text_clean, n_kept_lines, page_ok)``;
    ``text_clean`` is the kept lines re-joined with newlines. NULL
    text stays NULL throughout. Pure Column expressions — the whole
    filter is a projection; gate with ``WHERE c.page_ok`` and write
    ``c.text_clean``.

    Model-pinned against a pure-Python walk in
    tests/test_gopher_rules.py.
    """
    kept_stripped = F.filter(
        _stripped_lines(text), lambda s: c4_keep_line(s, min_line_words)
    )
    n_kept = F.size(kept_stripped)
    page_ok = (
        ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
        & (n_kept >= min_sentences)
    )
    return F.struct(
        F.array_join(kept_stripped, "\n").alias("text_clean"),
        n_kept.alias("n_kept_lines"),
        page_ok.alias("page_ok"),
    )


def normalized_words(text: Column) -> Column:
    """lowercase, strip non-alphanumerics, split — the canonical token
    stream used by fingerprinting and shingling.

    ``NORMALIZED_WORDS_SQL`` below is this expression's DuckDB twin;
    change them TOGETHER or every text oracle desyncs from the engine.
    """
    return F.split(
        F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9 ]", "")), r" +"
    )


# The ONE SQL normalization fragment every text oracle in the repo
# builds on (queries/extensions.py, queries/curation.py import it from
# here — a neutral home, so neither query module depends on the
# other's private names or registration side effects). Must stay the
# exact DuckDB twin of normalized_words above.
NORMALIZED_WORDS_SQL = (
    "regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +')"
)


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted,
    normalized word multiset. Robust to word reordering — the
    cheap-and-cheerful near-dup key."""
    return F.md5(F.array_join(F.array_sort(normalized_words(text)), " "))


def shingles_of(words: Column, k: int = 3) -> Column:
    """All k-word shingles (with duplicates) of a word-array column;
    empty array when fewer than k words.

    Pass a *materialized* (projected) array column, not an inline
    expression: higher-order functions are evaluated outside
    whole-stage codegen, so an inline ``words`` expression would be
    re-evaluated once per lambda element — O(n_words) regex runs per
    row instead of one."""
    return F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (k - 1)),
            lambda i: F.array_join(F.slice(words, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(text: Column, k: int = 3) -> Column:
    """Shingles straight from a text column. Convenience form; prefer
    projecting ``normalized_words`` first and using ``shingles_of``
    in hot paths (see its docstring)."""
    return shingles_of(normalized_words(text), k)


def token_entropy(text: Column, words: Column | None = None) -> Column:
    """Per-document token-distribution stats as ONE row-local struct
    ``(n_tokens, n_unique, entropy)`` — the Shannon entropy quality
    signal the public corpus pipelines publish (RedPajama/Dolma signal
    sets): low entropy = repetitive/templated text, high = diverse.

    Zero shuffles by construction: sort the normalized word array,
    then a single ``F.aggregate`` run-length walk (the _run_stats
    idiom) emits ``-(c/n)·ln(c/n)`` once per distinct-token run, in
    sorted-token order — the fixed summation order the DuckDB oracle
    replays with ``list_reduce`` over ``ORDER BY token``. An empty or
    NULL document yields (0, 0, 0.0), never NULL.

    Perf contract (the shingles_of / gopher_repetition_flags lesson,
    re-learned here the hard way): higher-order functions re-evaluate
    INLINE argument expressions per element, and this walk references
    the word array inside every step's ``_term`` — derived inline,
    the normalized-words regex re-ran O(tokens) times per row,
    measured 10x the cost of the whole 22-rule gate at sf1. For
    corpus-scale use project the filtered word array ONCE and pass it
    as ``words``::

        docs.withColumn("__w", F.filter(normalized_words(text),
                                        lambda w: w != ""))
            .select(token_entropy(F.col("text"), F.col("__w")))

    The default (``words=None``) derives it inline — correct, just
    quadratic-in-tokens slower on long documents."""
    if words is not None:
        nw = words
    else:
        nw = F.filter(
            F.coalesce(
                normalized_words(text), F.array().cast("array<string>")
            ),
            lambda w: w != "",
        )
    n = F.size(nw).cast("double")
    s = F.array_sort(nw)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("uniq"),
        F.lit(0.0).alias("h"),
    )

    def _term(run: Column) -> Column:
        p = run.cast("double") / n
        return -p * F.log(p)

    def step(acc, x):
        same = acc.prev.eqNullSafe(x)
        emitted = F.when(~same & (acc.run > 0), _term(acc.run)).otherwise(
            F.lit(0.0)
        )
        return F.struct(
            x.alias("prev"),
            F.when(same, acc.run + 1).otherwise(F.lit(1).cast("bigint")).alias("run"),
            F.when(same, acc.uniq).otherwise(acc.uniq + 1).alias("uniq"),
            (acc.h + emitted).alias("h"),
        )

    def finish(acc):
        h = acc.h + F.when(acc.run > 0, _term(acc.run)).otherwise(F.lit(0.0))
        return F.struct(
            F.size(nw).cast("bigint").alias("n_tokens"),
            acc.uniq.alias("n_unique"),
            h.alias("entropy"),
        )

    return F.aggregate(s, init, step, finish)
