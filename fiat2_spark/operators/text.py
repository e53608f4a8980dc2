"""Text-analysis operators for training-data pipelines (engine surface
beyond the reference — SURVEY §7 Phase 4 north-star extensions).

Everything here is pure Catalyst expressions (split/transform/aggregate/
md5): no Python UDFs, so the operators stay inside whole-stage codegen
and scale linearly with no serialization cost — the property that
matters at 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal stopword sets per language for the n-gram/stopword heuristic
# language-ID. Deterministic and tiny by design (broadcastable as
# literals into the plan, not a lookup table).
STOPWORDS = {
    # ASCII-only by contract: the shared tokenizer splits on [^a-z0-9]+,
    # so accented forms (für, más, été) never survive tokenization —
    # including them would silently never match.
    "en": [
        "the", "a", "an", "of", "and", "to", "in", "is", "on", "for",
        "with", "that", "it", "as", "was", "at", "by", "be", "this",
        "are", "from", "or", "not", "but", "have", "they", "you", "we",
        "his", "her",
    ],
    "es": [
        "el", "la", "de", "los", "las", "un", "una", "en", "y", "que",
        "es", "no", "por", "con", "para", "se", "su", "al", "lo", "como",
        "mas", "pero", "sus", "le", "ha", "si", "este", "esta", "son",
        "entre",
    ],
    "de": [
        "der", "die", "das", "und", "ein", "eine", "zu", "mit", "von",
        "ist", "den", "dem", "des", "nicht", "sich", "auf", "als",
        "auch", "es", "an", "werden", "aus", "er", "hat", "bei", "wie",
        "einer", "nach", "wird", "sind",
    ],
    "fr": [
        "le", "la", "les", "un", "une", "de", "des", "et", "en", "est",
        "que", "qui", "dans", "pour", "pas", "sur", "ne", "se", "ce",
        "il", "au", "aux", "par", "plus", "avec", "son", "ses", "mais",
        "nous", "vous",
    ],
}
LANGS = sorted(STOPWORDS)  # deterministic argmax order


def tokens(text: Column) -> Column:
    """Whitespace/punctuation tokenizer: lowercase, split on non-alnum,
    drop empties. The shared primitive for every operator below."""
    raw = F.split(F.lower(text), "[^a-z0-9]+")
    return F.filter(raw, lambda t: t != "")


def token_count(toks: Column) -> Column:
    return F.size(toks)


def bpe_ish_count(toks: Column) -> Column:
    """BPE-ish subword estimate per token:
    ``max(1, ceil(len/4), vowel_groups)`` — the chars/4 rule of thumb,
    floored by the vowel-run (syllable) count so morpheme-dense words
    cost more pieces, the way a real BPE splits them. Deterministic and
    pure regex/arith, so the DuckDB oracle recomputes it exactly."""
    def pieces(t: Column) -> Column:
        # vowel runs: replace each run with one '#', count the '#'s as
        # (len after run-collapse) - (len after run-delete)
        collapsed = F.length(F.regexp_replace(t, "[aeiou]+", "#"))
        deleted = F.length(F.regexp_replace(t, "[aeiou]+", ""))
        return F.greatest(
            F.ceil(F.length(t) / 4.0), (collapsed - deleted).cast("long"), F.lit(1)
        ).cast("long")

    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + pieces(t),
    )


def stopword_ratio(toks: Column, lang: str = "en") -> Column:
    sw = [F.lit(w) for w in STOPWORDS[lang]]
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def lang_scores(toks: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts."""
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
        for lang in LANGS
    }


def lang_id(toks: Column) -> Column:
    """Argmax of stopword hits in fixed language order; 'und'
    (undetermined) when no stopword fires. Ties go to the first language
    in sorted order — deterministic by construction."""
    scores = lang_scores(toks)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in LANGS:  # later languages must strictly beat earlier ones
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def punct_ratio(text: Column) -> Column:
    """Non-alphanumeric, non-space character ratio."""
    total = F.greatest(F.length(text), F.lit(1))
    clean = F.length(F.regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
    return (total - clean).cast("double") / total.cast("double")


def mean_token_len(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + stopword
    presence + low punctuation + sane word lengths. Weights fixed;
    deterministic arithmetic only."""
    t = tokens(text)
    len_term = F.least(F.size(t).cast("double") / 50.0, F.lit(1.0))
    sw_term = F.least(stopword_ratio(t, "en") * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    mlen = mean_token_len(t)
    len_band = F.when((mlen >= 3.0) & (mlen <= 8.0), 1.0).otherwise(0.5)
    return F.round(0.3 * len_term + 0.3 * sw_term + 0.2 * punct_term + 0.2 * len_band, 6)


def fingerprint_md5(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text — the exact-dedup key."""
    return F.md5(F.concat_ws(" ", tokens(text)))


def rolling_hash(toks: Column, mod: int = 1_000_000_007, mult: int = 31) -> Column:
    """Polynomial rolling hash over the token stream (order-sensitive
    fingerprint): h = (h*31 + len(tok)*7 + ascii(tok[0])) mod p.
    A sequential left fold — order dependence is the point."""
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda h, t: (h * mult + F.length(t) * 7 + F.ascii(t)) % mod,
    )
