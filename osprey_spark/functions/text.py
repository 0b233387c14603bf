"""Text-analysis UDFs: tokenize, clean, language-ID, quality, emoji.

Covers the reference's text plugins (Tokenize/CleanString/
CheckCensorized/AnalyzeSentiment/AnalyzeToxicity, ref:
example_plugins/src/udfs/) plus the training-data-pipeline text ops
(language-ID, quality scoring, token counting, fingerprinting) that a
100 TB corpus pipeline needs. Hot-path ops are built-in expressions;
the scorers are Arrow-vectorized pandas UDFs (never per-row Python).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..compiler.values import Value
from .registry import arg, const_arg, register

_TOKEN_RE = r"[^\W_]+(?:['’][^\W_]+)?"  # word-ish tokens, BPE-ish boundary


def tokenize_col(col: Column, lowercase: bool = True) -> Column:
    base = F.lower(col) if lowercase else col
    return F.filter(F.split(base, r"[\W_]+"), lambda t: t != "")


@register("Tokenize")
def tokenize(ctx, call, args):
    """ref: example_plugins/src/udfs/tokenize.py:77 — whitespace/punct
    word tokenizer, lowercased."""
    s = arg(ctx, call, args, "s")
    lowercase = const_arg(ctx, call, args, "lowercase", required=False, default=True)
    return Value(col=tokenize_col(s.col, lowercase), dtype="list:str")


@register("TokenCount")
def token_count(ctx, call, args):
    """Training-pipeline op: token count (whitespace + punct regex)."""
    s = arg(ctx, call, args, "s")
    return Value(col=F.size(tokenize_col(s.col)), dtype="int")


@register("CleanString")
def clean_string(ctx, call, args):
    """Unicode normalizer (ref: example_plugins/src/udfs/censorize.py
    :1902 ``CleanString``; stdlib variant stdlib/udfs/string.py:284-356
    ``StringClean``): NFKC fold, strip accents/zero-width/controls,
    collapse whitespace, lowercase. Pandas UDF — unicode tables."""
    s = arg(ctx, call, args, "s")
    return Value(col=_clean_string_udf(s.col), dtype="str")


# public-knowledge homoglyph foldings (stylized/confusable letters →
# ascii); deliberately a small independent table, not the reference's
_HOMOGLYPHS = str.maketrans(
    {
        "а": "a", "е": "e", "о": "o", "р": "p", "с": "c", "х": "x", "і": "i",
        "ѕ": "s", "у": "y", "ԁ": "d", "ɡ": "g", "α": "a", "β": "b", "ε": "e",
        "ι": "i", "κ": "k", "ο": "o", "ρ": "p", "τ": "t", "υ": "u", "ν": "v",
        "@": "a", "$": "s", "€": "e", "£": "l",
    }
)

_EMOJI_RE = re.compile(
    "[\U0001f300-\U0001faff\U00002600-\U000027bf\U0001f1e6-\U0001f1ff︎️]"
)
_L33T_PIPE_NUM_RE = re.compile(r"\|(\d)")
_L33T_THREES_RE = re.compile(r"([A-Za-z]?)(3+)([A-Za-z]?)")


def _string_clean_one(
    s,
    form="NFKC",
    remove_emoji=False,
    space=True,
    l33t=False,
    homoglyph=True,
    unicode_normalize=True,
    unidecode=False,
    upper=False,
    lower=False,
    remove_space=False,
    remove_punctuation=False,
):
    """The reference's normalization order (stdlib/udfs/string.py
    :306-355): emoji → space collapse → l33t → homoglyph → unicode
    form (keep first char when combining chars expand) → transliterate
    → case → space/punctuation removal. ``unidecode`` approximates the
    library (absent here) with NFKD + combining-mark strip."""
    if s is None:
        return None
    if remove_emoji:
        s = _EMOJI_RE.sub(" ", s)
    if space:
        s = _WS_RE.sub(" ", s)
    if l33t:
        s = _L33T_PIPE_NUM_RE.sub(r"1\1", s)
        s = _L33T_THREES_RE.sub(
            lambda m: f"{m[1]}{'e' * len(m[2])}{m[3]}" if m[1] or m[3] else m[2], s
        )
    if homoglyph:
        s = s.translate(_HOMOGLYPHS)
    if unicode_normalize:
        new_s = unicodedata.normalize(form, s)
        if len(s) != len(new_s):
            new_s = "".join((unicodedata.normalize(form, c) or c)[0] for c in s)
        s = new_s
    if unidecode:
        s = "".join(
            c for c in unicodedata.normalize("NFKD", s) if unicodedata.category(c) != "Mn"
        )
    if upper and not lower:
        s = s.upper()
    if lower:
        s = s.lower()
    if remove_space:
        s = _WS_RE.sub("", s)
    if remove_punctuation:
        s = "".join(c for c in s if unicodedata.category(c)[0] not in "SP")
    return s


@register("StringClean")
def string_clean(ctx, call, args):
    """String-cleaning swiss army knife with the reference's full
    option set (ref: stdlib/udfs/string.py:284-356 + argument
    defaults :129-160). Options are compile-time constants, so each
    distinct configuration compiles to one Arrow-vectorized UDF."""
    s = arg(ctx, call, args, "s")
    opts = {}
    for name, default in (
        ("form", "NFKC"),
        ("remove_emoji", False),
        ("space", True),
        ("l33t", False),
        ("homoglyph", True),
        ("unicode_normalize", True),
        ("unidecode", False),
        ("upper", False),
        ("lower", False),
        ("remove_space", False),
        ("remove_punctuation", False),
    ):
        opts[name] = const_arg(ctx, call, args, name, required=False, default=default)
    if opts["form"] not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ctx.error(
            f"invalid value for `form`: {opts['form']!r} (must be NFC/NFKC/NFD/NFKD)",
            call.span,
        )

    def _fn(series):
        return series.map(lambda x: _string_clean_one(x, **opts))

    return Value(col=F.pandas_udf(_fn, T.StringType())(s.col), dtype="str")


_ZW_RE = re.compile(r"[​‌‍⁠﻿]")
_WS_RE = re.compile(r"\s+")


def _clean_text(x):
    if x is None:
        return None
    x = unicodedata.normalize("NFKC", str(x))
    x = _ZW_RE.sub("", x)
    x = "".join(c for c in unicodedata.normalize("NFD", x) if unicodedata.category(c) != "Mn")
    x = "".join(c for c in x if unicodedata.category(c)[0] != "C" or c in "\t\n ")
    x = _WS_RE.sub(" ", x).strip().lower()
    return x


@F.pandas_udf(T.StringType())
def _clean_string_udf(s: pd.Series) -> pd.Series:
    return s.map(_clean_text)


@register("ExtractEmoji")
def extract_emoji(ctx, call, args):
    """ref: example_plugins/src/udfs/string.py:121."""
    s = arg(ctx, call, args, "s")
    return Value(
        col=F.regexp_extract_all(
            # Java regex codepoint syntax (\x{...}, not Python's \U...)
            s.col, F.lit(r"([\x{1F300}-\x{1FAFF}☀-➿])"), 1
        ),
        dtype="list:str",
    )


# --- language ID / quality (training-data ops) ------------------------------

_STOPWORDS = {
    "en": "the of and to in a is that it for on with as are was at be this by from or an".split(),
    "es": "el la de que y en los del se las por un para con no una su al es lo".split(),
    "fr": "le de la et les des en un du une que est pour dans qui sur au pas par il".split(),
    "de": "der die und in den von zu das mit sich des auf ist im dem nicht ein eine als".split(),
}


def language_id_col(text_col: Column) -> Column:
    """Heuristic language-ID: argmax of stopword hit-rate per language.

    Pure array expressions — no Python. Deterministic tie-break by
    language code order; 'und' when nothing matches.

    Shape: one struct entry (score, rank, lang) per language inside a
    single array_max — every score is evaluated exactly once. (The
    previous when-chain argmax re-embedded each score expression in
    every later CASE branch, and Spark's subexpression elimination
    does not extract from conditional branches: measured 1.8s → this
    form 0.74s warm on 5k docs at sf0.1.) The 'und' sentinel rides the
    same array with score 0 and the highest tie-rank, so empty/no-hit
    docs resolve to it without re-referencing any score."""
    toks = tokenize_col(text_col)
    entries = [
        F.struct(F.lit(0).alias("s"), F.lit(1).alias("r"), F.lit("und").alias("l"))
    ]
    for rank, lang in enumerate(sorted(_STOPWORDS)):
        sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        entries.append(
            F.struct(score.alias("s"), F.lit(-rank).alias("r"), F.lit(lang).alias("l"))
        )
    return F.array_max(F.array(*entries))["l"]


@register("LanguageId")
def language_id(ctx, call, args):
    s = arg(ctx, call, args, "s")
    return Value(col=language_id_col(s.col), dtype="str")


def quality_score_col(text_col: Column) -> Column:
    """Heuristic document-quality score in [0,1]: mean of
    length, alpha-ratio, stopword-ratio, and mean-word-length terms
    (the C4/Gopher-style cheap filters, built-in expressions only)."""
    toks = tokenize_col(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    alpha_chars = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
    sw = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    len_term = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    alpha_term = F.when(n_chars > 0, alpha_chars.cast("double") / n_chars).otherwise(F.lit(0.0))
    sw_term = F.least(
        F.when(n_tok > 0, sw_hits.cast("double") * 10.0 / n_tok).otherwise(F.lit(0.0)), F.lit(1.0)
    )
    mwl = F.when(n_tok > 0, F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double") / n_tok).otherwise(F.lit(0.0))
    mwl_term = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_term + alpha_term + sw_term + mwl_term) / F.lit(4.0), 6)


@register("QualityScore")
def quality_score(ctx, call, args):
    s = arg(ctx, call, args, "s")
    return Value(col=quality_score_col(s.col), dtype="float")


def fingerprint_col(text_col: Column) -> Column:
    """Document fingerprint: md5 of the cleaned, sorted-unique token
    set (the classic 'fingerprint' key-collision dedup method)."""
    toks = F.array_distinct(F.array_sort(tokenize_col(text_col)))
    return F.md5(F.array_join(toks, " ").cast("binary"))


@register("Fingerprint")
def fingerprint(ctx, call, args):
    s = arg(ctx, call, args, "s")
    return Value(col=fingerprint_col(s.col), dtype="str")


@register("ScrubPii")
def scrub_pii(ctx, call, args):
    """Redact emails/IPv4s/phone numbers with typed placeholders —
    the corpus-curation ``operators.curation.pii_scrub_col`` exposed
    to rulesets (rules often need to store or export text features
    with PII removed). Pure JVM regexp chain, no Python."""
    from ..operators.curation import pii_scrub_col

    s = arg(ctx, call, args, "s")
    return Value(col=pii_scrub_col(s.col), dtype="str")


@register("CountPii")
def count_pii(ctx, call, args):
    """Number of PII matches of one category ('email'|'ipv4'|'phone')
    in the string — the gating companion to ScrubPii."""
    from ..operators.curation import PII_PATTERNS, pii_count_col

    s = arg(ctx, call, args, "s")
    category = const_arg(ctx, call, args, "category")
    if category not in PII_PATTERNS:
        raise ctx.error(
            f"CountPii category= must be one of {sorted(PII_PATTERNS)}", call.span
        )
    return Value(col=pii_count_col(s.col, category), dtype="int")


@register("CheckCensorized")
def check_censorized(ctx, call, args):
    """Blocklist check on the cleaned string (ref: example_plugins/src/
    udfs/censorize.py:1848 — the 1.9k-line confusables table is
    proprietary-ish data we don't copy; normalized-substring check
    against a named list instead)."""
    from .lists import NAMED_LISTS

    s = arg(ctx, call, args, "s")
    list_name = const_arg(ctx, call, args, "list_name", required=False, default="censor")
    words = NAMED_LISTS.get(list_name, [])
    if not words:
        return Value(col=F.lit(False), dtype="bool")
    # single UDF invocation regardless of blocklist size: the cleaned
    # string appears once, against ONE substring-alternation regex, so
    # the plan has exactly one ArrowEvalPython node (an OR-fold of
    # contains() would clone the UDF expression per word and leave
    # dedup to the optimizer)
    cleaned = _clean_string_udf(s.col)
    alternation = "|".join(re.escape(w) for w in words)
    col = F.coalesce(cleaned.rlike(alternation), F.lit(False))
    return Value(col=col, dtype="bool")


# --- scorers (the "expensive per-row model" class) ---------------------------


@F.pandas_udf(T.DoubleType())
def _sentiment_udf(s: pd.Series) -> pd.Series:
    """Deterministic lexicon scorer standing in for the reference's
    CAF sentiment model (ref: example_plugins/src/udfs/sentiment.py:81
    — external model service, unavailable here). Vectorized; the
    Spark-side plumbing (Arrow batches, NULL passthrough) is real.
    """
    pos = {"good", "great", "love", "nice", "happy", "excellent", "best", "win"}
    neg = {"bad", "hate", "awful", "terrible", "worst", "sad", "angry", "lose"}

    def score(x):
        if x is None:
            return None
        toks = re.findall(r"[a-z']+", str(x).lower())
        if not toks:
            return 0.0
        p = sum(t in pos for t in toks)
        n = sum(t in neg for t in toks)
        return float(p - n) / len(toks)

    return s.map(score)


@register("AnalyzeSentiment")
def analyze_sentiment(ctx, call, args):
    """ref: example_plugins/src/udfs/sentiment.py:81."""
    s = args.get("s") or args.get("text")
    if s is None:
        raise ctx.error("AnalyzeSentiment requires text=", call.span)
    return Value(col=_sentiment_udf(s.col), dtype="float")


@F.pandas_udf(T.DoubleType())
def _toxicity_udf(s: pd.Series) -> pd.Series:
    """Stand-in for the toxicity model scorer
    (ref: example_plugins/src/udfs/toxicity.py:45)."""
    bad = {"stupid", "idiot", "dumb", "trash", "shut", "kill", "hate"}

    def score(x):
        if x is None:
            return None
        toks = re.findall(r"[a-z']+", str(x).lower())
        if not toks:
            return 0.0
        return min(1.0, sum(t in bad for t in toks) * 2.0 / len(toks))

    return s.map(score)


@register("AnalyzeToxicity")
def analyze_toxicity(ctx, call, args):
    """ref: example_plugins/src/udfs/toxicity.py:45."""
    s = args.get("s") or args.get("text")
    if s is None:
        raise ctx.error("AnalyzeToxicity requires text=", call.span)
    return Value(col=_toxicity_udf(s.col), dtype="float")
