"""Text-analysis column expressions for large-scale corpus processing.

All pure Column expressions (JVM-side, codegen'd) — the operations an LLM
training-data pipeline runs over billions of documents: tokenization
counts, quality scoring, language heuristics, content fingerprinting.
Nothing here touches Python per row; at 100 TB these run at scan speed.

Each function has a deliberately SQL-portable definition so the DuckDB
oracle can state the same computation independently.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(F.trim(_col(text)), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count(text: Column | str) -> Column:
    return F.length(_col(text))


def avg_token_len(text: Column | str, decimals: int = 4) -> Column:
    """Mean token length = non-space chars / token count."""
    t = _col(text)
    nonspace = F.length(F.regexp_replace(t, r"\s", ""))
    return F.round(nonspace.cast("double") / token_count(t), decimals)


def punct_ratio(text: Column | str, decimals: int = 4) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    t = _col(text)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[!-/:-@\[-`{-~]", ""))
    return F.round(punct.cast("double") / F.greatest(F.length(t), F.lit(1)), decimals)


def occurrence_count(text: Column | str, needle: str) -> Column:
    """Occurrences of a literal substring, via the length-delta trick —
    identical semantics in any SQL engine (no regex dialect involved)."""
    t = _col(text)
    return (F.length(t) - F.length(F.replace(t, F.lit(needle), F.lit("")))) / len(needle)


# Tiny per-language stopword marker sets (public common function words).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "que"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
}


def stopword_hits(text: Column | str, words: tuple[str, ...]) -> Column:
    """Total occurrences of ``words`` as whole tokens (space-padded match)."""
    padded = F.concat(F.lit(" "), F.trim(_col(text)), F.lit(" "))
    total = F.lit(0).cast("double")
    for wrd in words:
        total = total + occurrence_count(padded, f" {wrd} ")
    return total


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of stopword-marker hit rate; 'und'
    when nothing matches. The same CASE cascade is stated in the oracle."""
    t = _col(text)
    scores = {lang: stopword_hits(t, words) for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # deterministic priority order on ties: de < en < es < fr alphabetical
    for lang in sorted(scores, reverse=True):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best <= 0, F.lit("und")).otherwise(out)


def quality_score(text: Column | str, decimals: int = 4) -> Column:
    """Composite document quality in [0,1]: length band + reasonable mean
    token length + low punctuation density (the standard cheap pre-filter
    stack for corpus cleaning)."""
    t = _col(text)
    n_tok = token_count(t).cast("double")
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.3)
    atl = F.length(F.regexp_replace(t, r"\s", "")).cast("double") / F.greatest(
        n_tok, F.lit(1.0)
    )
    atl_ok = F.when((atl >= 2.0) & (atl <= 12.0), 1.0).otherwise(0.4)
    pr = punct_ratio(t, 10)
    punct_ok = F.when(pr <= 0.2, 1.0).otherwise(0.5)
    return F.round((len_ok + atl_ok + punct_ok) / 3.0, decimals)


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from md5 of the key — the
    reproducible-sampling primitive. ``df.sample()`` depends on partition
    layout and seed plumbing; hash-bucketing gives the same subset on any
    engine, any partitioning, any run — what a training-data pipeline
    needs so a 1% sample is stable across reprocessing. Buckets come from
    the first 12 hex chars (48 bits) of md5, mod ``buckets``."""
    h = F.substring(F.md5(_col(key).cast("string")), 1, 12)
    return F.conv(h, 16, 10).cast("bigint") % buckets


# GPT-2-style pre-tokenizer shape: letter runs, single digits, single
# non-alphanumeric marks. Kept to the regex subset RE2, Java, and DuckDB
# all parse identically.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def regex_tokens(text: Column | str, pattern: str = BPE_ISH_RE) -> Column:
    """BPE-ish tokenization (array<string>) — the splitter a real BPE
    tokenizer applies before merges; counting these approximates trained
    token counts far better than whitespace words."""
    return F.regexp_extract_all(_col(text), F.lit(pattern), 0)


def regex_token_count(text: Column | str, pattern: str = BPE_ISH_RE) -> Column:
    return F.size(regex_tokens(text, pattern))


def rolling_fingerprint(
    text: Column | str,
    window: int = 16,
    keep: int = 4,
    base: int = 31,
    mod: int = 1_000_000_007,
) -> Column:
    """Winnowing-style document fingerprint: polynomial rolling hash
    (``h = h*base + chr mod m``) of every ``window``-char window of the
    canonicalized text; the fingerprint is the ``keep`` smallest distinct
    window hashes joined ``-``. Robust to local edits (only windows
    overlapping the edit change, and min-selection usually survives) —
    the classic plagiarism/near-copy fingerprint, here as a pure nested
    array expression: no UDF, runs at scan speed, exact SQL oracle.

    Texts shorter than ``window`` hash as a single window.
    """
    canon_expr = F.regexp_replace(F.lower(F.trim(_col(text))), r"\s+", " ")

    # wrap canon in a 1-element array so the windowing lambda sees it as a
    # lambda VARIABLE (evaluated once per row) — substr(canon_expr, ...)
    # inside the lambda would re-run the regex canonicalization per window
    # (HOF lambdas re-evaluate embedded outer expressions per element)
    def _fp(canon: Column) -> Column:
        wins = F.when(
            F.length(canon) >= window,
            F.transform(
                F.sequence(F.lit(1), F.length(canon) - (window - 1)),
                lambda i: F.substr(canon, i, F.lit(window)),
            ),
        ).otherwise(F.array(canon))
        hashes = F.transform(
            wins,
            lambda w: F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), F.length(w)),
                    lambda i: F.ascii(F.substr(w, i, F.lit(1))).cast("bigint"),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, c: (acc * base + c) % mod,
            ),
        )
        top = F.slice(F.array_sort(F.array_distinct(hashes)), 1, keep)
        return F.concat_ws("-", F.transform(top, lambda h: h.cast("string")))

    return F.element_at(F.transform(F.array(canon_expr), _fp), 1)


def fingerprint(text: Column | str) -> Column:
    """Canonical content fingerprint: md5 of lowercased, whitespace-collapsed
    text — the exact-dedup key."""
    canon = F.regexp_replace(F.lower(F.trim(_col(text))), r"\s+", " ")
    return F.md5(canon)


# PII surface patterns, kept to the regex subset Java (Spark), RE2
# (DuckDB), and Python all parse identically: no lookarounds, no
# backreferences. Replacement order is fixed (email → ipv4 → idnum) so
# redacted text is byte-identical across engines; ipv4 runs before idnum
# so an address's octets are never half-eaten as a digit run.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("idnum", r"\b\d{9,}\b", "<NUM>"),
)


def pii_count(text: Column | str, pattern: str) -> Column:
    """Non-overlapping match count of one PII pattern (bigint — DuckDB's
    ``len(regexp_extract_all())`` is int64; Spark's ``regexp_count`` is
    int32, so the cast keeps oracle schemas aligned)."""
    return F.regexp_count(_col(text), F.lit(pattern)).cast("bigint")


def redact_pii(text: Column | str) -> Column:
    """Mask every ``PII_PATTERNS`` match with its class token, applied in
    declaration order. Pure sequential ``regexp_replace`` — scan speed,
    no UDF; the masking a corpus pipeline runs over every document before
    the text ever leaves the cluster."""
    out = _col(text)
    for _, pattern, mask in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, mask)
    return out


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams (array<string>) from a token array,
    built as ``zip_with`` folds over shifted ``slice``s.

    The trap this form exists to avoid: referencing the token-array
    EXPRESSION inside a higher-order-function lambda re-evaluates it per
    element (HOF lambdas are interpreted, with no common-subexpression
    reuse of outer expressions) — a transform whose lambda indexed into
    ``split(text)`` re-ran the regex split 3× per gram, ~9 s over 5k
    sf0.1 docs. ``zip_with``/``slice`` take the array as an INPUT, so
    ``toks`` evaluates ``n`` times per ROW and each gram is pure cheap
    per-element work (~0.7 s for the same scan).

    Documents with fewer than ``n`` tokens yield an empty array."""
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    acc = F.slice(toks, 1, cnt)
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, j + 1, cnt),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(toks) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )


def repetition_ratio(text: Column | str, n: int = 3, decimals: int = 4) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram in
    the same document (1 − distinct/total) — the standard intra-document
    repetition signal corpus-cleaning stacks threshold on (boilerplate,
    keyword stuffing, and degenerate generations all score high). 0 for
    documents with fewer than ``n`` tokens. Pure array expression: scan
    speed, exact SQL oracle."""
    grams = word_ngrams(tokens(text), n)
    total = F.size(grams)
    rep = total - F.size(F.array_distinct(grams))
    return F.round(
        rep.cast("double") / F.greatest(total, F.lit(1)).cast("double"), decimals
    )


_SOUNDEX_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_SOUNDEX_DIGITS = "01230120022455012623010202"


def soundex_code(word: Column | str) -> Column:
    """Simplified American Soundex → 4-char phonetic key (e.g. PFISTER →
    P236, JACKSON → J250), the classic record-linkage BLOCKING function:
    names that sound alike land in the same block, so fuzzy comparison
    runs within blocks instead of all-pairs. Simplification, documented:
    the H/W-elision rule (same-coded letters separated only by h/w merge)
    is dropped — vowels still separate, adjacent same-code letters still
    collapse. NULL for inputs with no letters.

    Deliberately RE2-safe: run collapsing is one ``d+`` replace per digit
    class rather than a ``(\\d)\\1+`` backreference, because the DuckDB
    oracle's regex engine (RE2) has no backreferences — the identical
    program runs on both engines. Pure column expressions end to end:
    scan speed at 100 TB, never a Python row."""
    s = F.upper(F.regexp_replace(_col(word), "[^A-Za-z]", ""))
    coded = F.translate(s, _SOUNDEX_ALPHA, _SOUNDEX_DIGITS)
    for d in "0123456":
        coded = F.regexp_replace(coded, d + "+", d)
    rest = F.regexp_replace(
        coded.substr(F.lit(2), F.length(coded)), "0", ""
    )
    out = F.concat(
        F.substring(s, 1, 1), F.rpad(F.substring(rest, 1, 3), 3, "0")
    )
    return F.when(F.length(s) > 0, out)


def pair_combinations(arr: Column, a_name: str = "id_a", b_name: str = "id_b") -> Column:
    """Every (x, y) combination with x before y from a SORTED array →
    array<struct<a_name, b_name>> — the a-priori candidate-pair device
    the dedup/graph/mining operators explode instead of a bucket
    self-join (the one shared definition for 2-field pair emissions;
    `battery_ext`'s lift entry states the device inline because its
    emission interleaves pair/item/basket KINDS in one struct schema.
    The `i + 2` offset is the 1-based slice past the current element).
    A generic array device rather than a text expression — it lives
    here beside its main consumers' other shared text helpers.

    The output array cell is O(len²) structs, so callers must bound the
    input array upstream (a df/degree cap) — the device trades the
    self-join's second exchange for a bounded quadratic cell."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
            ),
        )
    )
