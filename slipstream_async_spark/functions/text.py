"""Text-analysis functions for large-scale training-data pipelines.

All pure column expressions (JVM-side, codegen'd, zero Python in the hot
path) so they survive a 100 TB scan: language-ID, quality scoring, token
counting, document fingerprinting. Cross-engine determinism note: every
hash here is md5-based (``hash32``) because Spark's ``hash()`` (xxhash/
murmur) has no DuckDB equivalent, and the oracle must reproduce values
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-language marker words for the n-gram/stopword language heuristic.
# Deterministic tie-break: first language in this order wins.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "value", "fast", "is", "in", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "pas", "pour", "que", "dans"],
    "es": ["el", "los", "las", "es", "una", "por", "con", "para", "del", "se"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "人", "这"],
}

STOPWORDS = LANG_MARKERS["en"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def hash32(col: Column | str) -> Column:
    """Deterministic 32-bit unsigned hash as BIGINT, reproducible in any
    engine with md5: first 8 hex chars of md5, base-16 -> base-10.
    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 8))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def hash64(col: Column | str) -> Column:
    """Deterministic 60-bit hash as BIGINT for unbounded-cardinality
    identities (corpus-scale n-gram keyspaces): first 15 hex chars of
    md5, base-16 -> base-10. 15 hex chars = 60 bits, so the value is
    always positive and fits signed BIGINT in every engine — no
    sign-bit masking needed (a full 16-char/64-bit value overflows
    Spark's ``conv(...).cast('bigint')`` to NULL and DuckDB's
    ``::BIGINT`` to an error for the top half of the space).
    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    Use this — never :func:`hash32` — whenever the hashed domain can
    exceed ~1e6 distinct values: 2^32 saturates at web-corpus
    cardinalities (1e11+ grams at 100 TB), 2^60 does not.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def quality_score(
    text_col: Column | str, toks: Column | None = None
) -> Column:
    """Heuristic document quality in [0, 1]: blend of length band, mean
    word length band, stopword presence, and alpha ratio — the standard
    cheap pre-filters of web-scale corpus cleaning, as one expression.

    ``toks`` — a column that already holds ``tokens(text_col)`` — lets a
    caller that materialized the token array (a projected ``_toks``
    alias) substitute it: HOF-bearing projections run interpreted and
    re-evaluate each ``tokens()`` reference per row, so on a frame with
    the tokens already projected this removes ~6 redundant regex splits
    per document. Value-identical by construction.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens(c) if toks is None else toks
    n = F.size(toks)
    mean_wlen = F.length(F.regexp_replace(c, r"\s+", "")) / F.greatest(n, F.lit(1))
    stop_ratio = F.size(F.array_intersect(toks, F.lit(STOPWORDS))) / F.greatest(
        n, F.lit(1)
    )
    alpha_ratio = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")) / F.greatest(
        F.length(c), F.lit(1)
    )
    len_ok = (n >= 10) & (n <= 100000)
    wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    return F.round(
        len_ok.cast("double") * 0.25
        + wlen_ok.cast("double") * 0.25
        + F.least(stop_ratio * F.lit(2.0), F.lit(1.0)) * 0.25
        + alpha_ratio * 0.25,
        6,
    )


def lang_id(
    text_col: Column | str, toks: Column | None = None
) -> Column:
    """Marker-word language ID: score = |distinct tokens ∩ markers(lang)|,
    highest score wins, ties broken by LANG_MARKERS order, no marker hit
    at all -> 'und' (undetermined).

    ``toks`` — a column already holding ``tokens(text_col)`` — skips the
    ~10 per-language re-tokenizations an interpreted projection would
    otherwise pay (see quality_score).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.array_distinct(tokens(c) if toks is None else toks)
    scores = {
        lang: F.size(F.array_intersect(toks, F.lit(words)))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # Build reversed so earlier languages take precedence on ties.
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def text_fingerprint(text_col: Column | str) -> Column:
    """Normalization fingerprint: lowercase, strip non-alnum, sorted
    distinct tokens, md5 — two documents with the same bag of words get
    the same fingerprint (the classic "fingerprint clustering" key).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.lower(F.regexp_replace(c, r"[^0-9A-Za-z\s]", " "))
    toks = F.array_sort(F.array_distinct(tokens(norm)))
    return F.md5(F.concat_ws(" ", toks))


def shingles_of_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles from a token-array column.

    Implementation note (hot path at corpus scale): higher-order
    functions are interpreted, and an expression referenced inside a HOF
    lambda is re-evaluated per element — so the k shifted views of the
    token array are built ONCE via arrays_zip(slice...), and the lambda
    touches only its element. Never put the tokenizer itself inside the
    lambda.
    """
    n = F.size(toks)
    # Total slice length: the n >= k CASE branch does NOT guarantee the
    # slice is never evaluated for shorter docs — generator rewrites
    # (explode over this expression) can evaluate it on rows a guard
    # excludes, and slice raises on negative lengths. Clamp to 0.
    win = F.greatest(n - k + 1, F.lit(0))
    shifted = [F.slice(toks, i + 1, win) for i in range(k)]
    zipped = F.arrays_zip(*[s.alias(f"t{i}") for i, s in enumerate(shifted)])
    sh = F.transform(
        zipped,
        lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(k)]),
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def shingles(text_col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles of a document (dedup's unit of identity).
    Documents shorter than ``k`` words yield their full token join as a
    single shingle. Prefer pre-projecting ``tokens`` and calling
    ``shingles_of_tokens`` when the token array is reused.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return shingles_of_tokens(tokens(c), k)


_SUBWORD_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def subword_tokens(col: Column | str) -> Column:
    """BPE-ish pre-tokenization (GPT-2-style): runs of letters, runs of
    digits, and punctuation runs each become one piece — the split every
    byte-pair tokenizer applies before merges. Pure JVM regex
    (``regexp_extract_all``); reproduced in DuckDB with the same
    pattern."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_SUBWORD_RE), 0)


def est_bpe_token_count(col: Column | str, chars_per_token: int = 4) -> Column:
    """Estimated BPE token count: each pre-token piece contributes
    ceil(len / chars_per_token) (the ~4-chars-per-token heuristic) — the
    budget estimator for sequence packing when the real tokenizer is not
    on the cluster. Exact integer arithmetic, engine-reproducible."""
    pieces = subword_tokens(col)
    per = F.transform(
        pieces,
        lambda p: F.ceil(F.length(p) / F.lit(chars_per_token)).cast("bigint"),
    )
    return F.coalesce(
        F.aggregate(per, F.lit(0).cast("bigint"), lambda acc, x: acc + x),
        F.lit(0).cast("bigint"),
    )


def chunk_windows(toks: Column, size: int = 128, stride: int = 64) -> Column:
    """Overlapping token windows — context-window construction for
    training/RAG pipelines: chunk c starts at token ``1 + c*stride`` and
    spans up to ``size`` tokens, so consecutive chunks overlap by
    ``size - stride`` tokens (set ``stride == size`` for disjoint
    chunks). Returns ``array<struct<start:int, chunk:array<string>>>``;
    an empty token array yields one empty chunk.

    Pure JVM expression (``sequence`` + ``slice`` inside ``transform``) —
    chunking a 100 TB corpus is a scan-stage map with no shuffle, and the
    slices reference the one token array instead of re-tokenizing.

    CALLER CONTRACT: pass ``toks`` as a MATERIALIZED column
    (``df.select(tokens(...).alias("_toks"))`` first), never the
    tokenizer expression itself — the slice inside the lambda would
    re-evaluate that expression per window (interpreted HOF lambdas
    re-run referenced expression trees per element; measured 4x on
    dsir_importance).
    """
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    return F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"), F.slice(toks, s, size).alias("chunk")
        ),
    )


# PII patterns chosen for cross-engine regex portability: no lookarounds,
# ASCII classes and \b word boundaries only — identical semantics under
# Java regex (Spark) and RE2 (DuckDB, Go scrubbers).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts (email / ipv4 / phone) — the audit
    metric of a redaction pass; scan-stage JVM regex, no shuffle.

    Counts are SEQUENTIAL, mirroring pii_scrub's replace order: ipv4 is
    counted on email-scrubbed text, phone on email+ip-scrubbed text.
    Counting every kind on the raw text would overcount overlaps (an
    address like user.555-123-4567@x.com redacts to one [EMAIL], yet a
    raw-text phone count would also claim a [PHONE] that never appears
    in the output) — the audit line must describe what the scrub
    actually did."""
    c = F.col(col) if isinstance(col, str) else col
    out: dict[str, Column] = {}
    for kind in ("email", "ipv4", "phone"):
        pat, token = PII_PATTERNS[kind]
        out[kind] = F.regexp_count(c, F.lit(pat)).alias(f"n_{kind}")
        c = F.regexp_replace(c, pat, token)
    return out


def pii_scrub(col: Column | str) -> Column:
    """Redact PII in-place: emails, then dotted-quad IPv4s, then
    NNN-NNN-NNNN phone numbers become typed placeholder tokens — the
    C4/Dolma-style scrubbing stage of a web-corpus pipeline. Order
    matters and is fixed (email first: its local part may contain
    digit runs the later patterns could otherwise clip). One chained
    ``regexp_replace`` projection over the scan."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in ("email", "ipv4", "phone"):
        pat, token = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pat, token)
    return c
