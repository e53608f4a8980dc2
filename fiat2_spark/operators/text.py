"""Text-analysis operators for training-data pipelines (engine surface
beyond the reference — SURVEY §7 Phase 4 north-star extensions).

Everything here is pure Catalyst expressions (split/transform/aggregate/
md5): no Python UDFs, so the operators stay inside whole-stage codegen
and scale linearly with no serialization cost — the property that
matters at 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
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
    # round-4 widening to ~10 languages; every word below survives the
    # ASCII tokenizer (languages whose function words need diacritics —
    # e.g. Romanian și, Polish się — contribute only their genuinely
    # ASCII function words, or were passed over for ASCII-orthography
    # languages like Indonesian)
    "it": [
        "di", "che", "la", "il", "un", "una", "per", "con", "non",
        "del", "della", "sono", "come", "anche", "ma", "le", "si",
        "nel", "alla", "piu", "questo", "questa", "gli", "dei",
        "delle", "era", "essere", "ha", "hanno", "tra",
    ],
    "pt": [
        "de", "que", "nao", "uma", "para", "com", "por", "mais", "dos",
        "das", "como", "mas", "foi", "ele", "ela", "seu", "sua", "ou",
        "quando", "muito", "nos", "ja", "eu", "tambem", "pelo", "pela",
        "isso", "entre", "depois", "sem",
    ],
    "nl": [
        "de", "het", "een", "en", "van", "ik", "te", "dat", "die",
        "in", "is", "niet", "op", "aan", "met", "als", "voor", "er",
        "maar", "om", "hij", "dan", "zou", "of", "wat", "mijn", "men",
        "dit", "zo", "door",
    ],
    "sv": [
        "och", "det", "att", "i", "en", "jag", "hon", "som", "han",
        "den", "med", "var", "sig", "till", "men", "ett", "om", "hade",
        "de", "av", "mig", "du", "henne", "sin", "nu", "har", "inte",
        "hans", "honom", "skulle",
    ],
    "pl": [
        "nie", "na", "do", "to", "jest", "jak", "co", "tak", "ale",
        "po", "za", "od", "ma", "przez", "przy", "tego", "tym", "jego",
        "ich", "oraz", "dla", "czy", "gdy", "tylko", "bardzo", "ten",
        "ta", "te", "z", "w",
    ],
    "id": [
        "yang", "dan", "di", "ini", "itu", "dengan", "untuk", "tidak",
        "dari", "dalam", "akan", "pada", "juga", "saya", "ke", "karena",
        "tersebut", "bisa", "ada", "mereka", "lebih", "tahun", "sudah",
        "saat", "oleh", "menjadi", "orang", "ia", "telah", "kita",
    ],
}
LANGS = sorted(STOPWORDS)  # deterministic argmax order


def _trigram_profile(lang: str) -> list[str]:
    """Language profile = the sorted set of char trigrams of the
    language's space-padded stopwords (' the ' → ' th', 'the', 'he ').
    Deterministic, derived from the same public function-word lists as
    the stopword scorer — no external corpus, so both engines can carry
    the profile as literals. A Cavnar–Trenkle-style rank profile
    trained on real text would be more accurate; this binary-membership
    variant is the oracle-recomputable middle ground (accuracy note:
    good separation on function-word-rich prose, weak on short or
    technical strings — same contract as the stopword scorer)."""
    tris = set()
    for w in STOPWORDS[lang]:
        padded = f" {w} "
        for i in range(len(padded) - 2):
            tris.add(padded[i : i + 3])
    return sorted(tris)


TRIGRAM_PROFILES = {lang: _trigram_profile(lang) for lang in LANGS}


def tokens(text: Column) -> Column:
    """Whitespace/punctuation tokenizer: lowercase, split on non-alnum,
    drop empties. The shared primitive for every operator below."""
    raw = F.split(F.lower(text), "[^a-z0-9]+")
    return F.filter(raw, lambda t: t != "")


# Unicode-version case-mapping skew (found by the differential fuzz,
# pinned by the exhaustive BMP sweep in test_text_properties): the JVM
# and DuckDB's utf8proc implement different Unicode versions, so
# exactly these 14 BMP capitals (Latin Extended-D / Cyrillic /
# Glagolitic additions from Unicode 12-16, plus U+0130 İ) lowercase
# differently between the engines. `tokens_unicode` folds each to its
# single-codepoint lowercase BEFORE lower(), which (a) removes the
# engine divergence (after the fold no skewed capital survives to
# either engine's lower()) and (b) fixes İ, whose Java lowercase is
# 'i' + U+0307 COMBINING DOT ABOVE — a mark outside \p{L}\p{N} that
# would SPLIT the token ('İstanbul' → ['i', 'stanbul']); the fold's
# plain 'i' is what a tokenizer wants.
_CASE_SKEW = (
    (0x130, 0x69),     # İ → i (not Java's i + combining dot)
    (0x1C89, 0x1C8A),  # Cyrillic tje (Unicode 16)
    (0x2C2F, 0x2C5F),  # Glagolitic caudate chrivi (Unicode 14)
    (0xA7C0, 0xA7C1),  # Latin old polish o (Unicode 16)
    (0xA7C7, 0xA7C8),  # Latin d with short stroke overlay (Unicode 12)
    (0xA7C9, 0xA7CA),  # Latin s with short stroke overlay (Unicode 12)
    (0xA7CB, 0x264),   # Latin rams horn (Unicode 16)
    (0xA7CC, 0xA7CD),  # Latin s with diagonal stroke (Unicode 16)
    (0xA7D0, 0xA7D1),  # Latin closed insular g (Unicode 14)
    (0xA7D6, 0xA7D7),  # Latin middle scots s (Unicode 14)
    (0xA7D8, 0xA7D9),  # Latin sigmoid s (Unicode 14)
    (0xA7DA, 0xA7DB),  # Latin lambda (Unicode 16)
    (0xA7DC, 0x19B),   # Latin lambda with stroke (Unicode 16)
    (0xA7F5, 0xA7F6),  # Latin reversed half h (Unicode 13)
)
CASE_SKEW_SRC = "".join(chr(a) for a, _ in _CASE_SKEW)
CASE_SKEW_DST = "".join(chr(b) for _, b in _CASE_SKEW)


def tokens_unicode(text: Column) -> Column:
    """Unicode tokenizer: lowercase, split on any run of characters
    outside the Unicode letter/number classes (``[^\\p{L}\\p{N}]+``),
    drop empties — the multilingual twin of `tokens`, keeping accented
    and non-Latin words (für, été, привет) the ASCII contract would
    shred into fragments. Java regex and DuckDB's RE2 both implement
    the \\p{L}/\\p{N} general categories, and both engines' lower() is
    Unicode-aware, so the DuckDB oracle splits identically
    (differential-tested on crafted non-ASCII rows AND hypothesis-
    fuzzed over mixed-script text). BMP scope: BPE's per-character
    symbolize matches one UTF-16 code unit in Java, so
    supplementary-plane text (emoji) is outside the BPE contract.

    Sigma case-FOLDING: Java's toLowerCase applies the contextual
    final-sigma rule (word-final 'Σ' → 'ς') where DuckDB's utf8proc
    applies the simple mapping ('σ') — the first divergence the
    differential fuzz found. The tokenizer therefore folds
    'ς' → 'σ' after lowercasing (Unicode CASE FOLDING maps both sigma
    lowercase forms to 'σ'), which both removes the engine divergence
    and makes 'κόσμος'/'ΚΟΣΜΟΣ' tokenize identically — the behavior a
    retrieval/dedup tokenizer wants anyway.

    Unicode-VERSION skew: the fuzz's second find — 14 BMP capitals
    added in Unicode 12-16 (`CASE_SKEW_SRC`, e.g. 'Ꟈ' U+A7C7) lowercase
    under the JVM's newer table but not utf8proc's, and U+0130 İ
    lowercases to 'i'+combining-dot in Java (a token-SPLITTING mark)
    vs 'i' in DuckDB. A translate to their single-codepoint lowercase
    forms BEFORE lower() removes all 14 divergences on both engines;
    parity outside this set is verified EXHAUSTIVELY over the BMP
    (test_text_properties' sweep pins the skew set, so a JVM or DuckDB
    Unicode-table upgrade trips a test instead of an oracle).

    TOKENIZER CONTRACT (which operators accept which tokenizer):
    the ASCII ``[a-z0-9]+`` `tokens` contract is the corpus-wide
    DEFAULT; every operator that tokenizes internally accepts
    ``tokenizer=`` explicitly (threaded r11) — the BPE family
    (`bpe_word_table` / `bpe_pair_counts` / `bpe_learn` / `bpe_encode`
    / `bpe_encode_ids`), the model-based selection stack (`dsir_*`,
    `nb_*`, `lm_perplexity`/`perplexity_filter`, `doremi_*`,
    `token_transitions`) and the heuristic scorers (`quality_score`,
    `gopher_rules`). Operators that take a TOKEN COLUMN
    (`lang_scores`, `stopword_ratio`, `token_count`,
    `repetition_stats`) compose with either tokenizer unchanged.
    Two residual English/Latin specifics survive a `tokens_unicode`
    corpus: the STOPWORDS lists are ASCII function words (langid and
    the stopword quality term score 0 on non-Latin scripts), and
    `gopher_rules`' alpha rule defaults to ``[a-z]`` (pass
    ``alpha_pattern=r"\\p{L}"`` alongside the tokenizer). Mixing
    tokenizers across a fit/score pair is a contract violation — pick
    one per pipeline (fit/score pairing asserted by the unicode
    curation queries' oracles).

    NO-SPACE SCRIPTS (the contract, pinned by crafted-row tests): on
    unsegmented Han/kana text this tokenizer returns one token PER RUN
    — '世界です' is a single token, so a whole CJK sentence becomes one
    giant shingle / one LM "word". That is the documented limitation,
    not a bug: splitting on non-letters cannot segment a script that
    writes without separators. For CJK-bearing corpora use
    `tokens_unicode_cjk`, which falls back to per-codepoint tokens
    inside fixed CJK ranges (the standard character-level treatment)
    and behaves exactly like this tokenizer elsewhere."""
    skew_folded = F.translate(text, CASE_SKEW_SRC, CASE_SKEW_DST)
    folded = F.replace(F.lower(skew_folded), F.lit("ς"), F.lit("σ"))
    raw = F.split(folded, r"[^\p{L}\p{N}]+")
    return F.filter(raw, lambda t: t != "")


#: Fixed BMP code-point ranges treated as "no-space script" by
#: `tokens_unicode_cjk`: CJK Unified Ideographs, Extension A, hiragana,
#: katakana. Explicit RANGES (not \p{Script=Han}) so Java regex and
#: DuckDB's RE2 agree independently of their Unicode table versions —
#: the same version-stability discipline as `SCRIPT_CLASSES` and the
#: `_CASE_SKEW` fold.
CJK_CLASS = (
    f"[{chr(0x4E00)}-{chr(0x9FFF)}"   # CJK Unified Ideographs
    f"{chr(0x3400)}-{chr(0x4DBF)}"    # Extension A
    f"{chr(0x3040)}-{chr(0x309F)}"    # hiragana
    f"{chr(0x30A0)}-{chr(0x30FF)}]"   # katakana
)


def tokens_unicode_cjk(text: Column) -> Column:
    """`tokens_unicode` with a no-space-script fallback: every
    character in the fixed `CJK_CLASS` ranges is padded with spaces
    BEFORE tokenization, so an unsegmented Han/kana run tokenizes to
    per-codepoint tokens — the standard character-level treatment for
    scripts that write without separators (real segmenters need
    dictionaries/models; character or character-n-gram units are what
    CCNet-class web pipelines actually ship for CJK). Outside those
    ranges the behavior is IDENTICAL to `tokens_unicode` (the padding
    regex matches nothing), so the fallback composes with every
    ``tokenizer=``-threaded operator unchanged. One extra codegen'd
    regexp_replace per row — still a pure map pass."""
    return tokens_unicode(F.regexp_replace(text, f"({CJK_CLASS})", " $1 "))


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


def lang_argmax_vector(vec: Column) -> Column:
    """Deterministic argmax over a |LANGS|-length score vector: 'und'
    when every score is zero, earliest sorted language wins ties.
    ONE array_max over (score, -rank) structs — lexicographic struct
    comparison picks the max score and, among equals, the largest
    -rank = smallest rank. ``vec`` is embedded twice (array_max result
    read for both fields); crucially NOT once per language — a
    when-chain fold that threads a running best references it twice
    per language, doubling the Catalyst tree each step (~2^|LANGS|
    subtrees: at 10 languages Catalyst ground for minutes before any
    task ran)."""
    idx = F.sequence(F.lit(0), F.lit(len(LANGS) - 1))
    entries = F.zip_with(
        vec, idx, lambda s, i: F.struct(s.alias("s"), (-i).alias("r"))
    )
    m = F.array_max(entries)
    names = F.array(*[F.lit(lang) for lang in LANGS])
    return F.when(m["s"] == 0, F.lit("und")).otherwise(
        F.element_at(names, (-m["r"] + 1).cast("int"))
    )


def _lang_argmax(scores: dict[str, Column]) -> Column:
    return lang_argmax_vector(F.array(*[scores[lang] for lang in LANGS]))


def lang_id(toks: Column) -> Column:
    """Argmax of stopword hits in fixed language order; 'und'
    (undetermined) when no stopword fires. Ties go to the first language
    in sorted order — deterministic by construction."""
    return _lang_argmax(lang_scores(toks))


def char_trigrams(text: Column) -> Column:
    """Char trigrams of the whitespace-normalized, space-padded lowercase
    text (' the cat ' → [' th','the','he ','e c',' ca','cat','at ']),
    with multiplicity. Built from three shifted slices of the char
    array zipped with concat — NOT ``transform(sequence(1, n-2), i ->
    substring(norm, i, 3))``: higher-order functions evaluate outside
    whole-stage codegen and re-evaluate captured outer expressions per
    ELEMENT, so the substring form recomputes the O(len) ``norm``
    concat for every trigram — O(len²) per document (measured: the
    dominant cost of the first trigram scorer). Slices reference
    ``norm`` a constant number of times per ROW; short strings fall out
    naturally (length-0 slices → empty zip)."""
    norm = F.concat(F.lit(" "), F.concat_ws(" ", tokens(text)), F.lit(" "))
    chars = F.split(norm, "")
    n = F.greatest(F.size(chars) - 2, F.lit(0))
    pair_suffix = F.zip_with(
        F.slice(chars, 2, n), F.slice(chars, 3, n), lambda b, c: F.concat(b, c)
    )
    return F.zip_with(
        F.slice(chars, 1, n), pair_suffix, lambda a, bc: F.concat(a, bc)
    )


def trigram_score_vector(text: Column) -> Column:
    """|LANGS|-length trigram score vector in ONE pass over the
    document's trigrams: a literal map trigram → one-hot membership
    vector (an entry per trigram appearing in ANY profile), folded
    with element-wise adds. One hash lookup per trigram instead of
    |LANGS| separate set-membership passes, and the trigram extraction
    itself runs once — the naive per-language formulation re-embedded
    the whole extraction in each score (10× work per row and a
    multi-MiB codegen unit)."""
    onehot: dict[str, list[int]] = {}
    for i, lang in enumerate(LANGS):
        for t in TRIGRAM_PROFILES[lang]:
            onehot.setdefault(t, [0] * len(LANGS))[i] = 1
    keys = sorted(onehot)
    mm = F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]),
        F.array(*[F.array(*[F.lit(b) for b in onehot[k]]) for k in keys]),
    )
    zeros = F.array_repeat(F.lit(0), len(LANGS))
    return F.aggregate(
        char_trigrams(text),
        zeros,
        lambda acc, t: F.zip_with(
            acc,
            F.coalesce(F.element_at(mm, t), F.array_repeat(F.lit(0), len(LANGS))),
            lambda a, b: a + b,
        ),
    )


def lang_id_trigram(text: Column) -> Column:
    """Language ID by char-trigram profile membership: score(lang) =
    number of the document's trigrams (with multiplicity) found in the
    language's profile; argmax with the same deterministic tie rule as
    ``lang_id`` ('und' when nothing matches, earliest sorted language
    wins ties). Catches inflected forms whole-token stopword matching
    misses ('walking' scores 'ing'/'ng ').

    This is the EXPRESSION form — self-contained, composable inside any
    projection, but it carries the ~900-entry profile map in the task
    binary (measured: binary deserialization beat the actual scoring at
    50 tasks). For table-scale scoring use ``trigram_scores_table``,
    which ships the profiles once as a broadcast relation."""
    return lang_argmax_vector(trigram_score_vector(text))


def trigram_scores_table(df, text_col: str, keys: list[str]):
    """Relational trigram scorer — the table-scale path: explode the
    documents' trigrams, broadcast-join the (≈900-row) profile relation,
    and partial-aggregate per-language hit sums back to one row per
    document. Explode preserves partitioning, so the map-side partial
    aggregate collapses each document's trigrams within its partition
    and the shuffle carries |docs| × |LANGS| ints — while the profile
    ships ONCE per executor as a broadcast, not once per task inside a
    codegen'd literal (the expression form's cost). ``explode_outer``
    keeps trigram-less documents (they score all-zero → 'und').

    Returns ``keys`` + ``__sv`` (the |LANGS| score vector for
    ``lang_argmax_vector``)."""
    onehot: dict[str, list[int]] = {}
    for i, lang in enumerate(LANGS):
        for t in TRIGRAM_PROFILES[lang]:
            onehot.setdefault(t, [0] * len(LANGS))[i] = 1
    spark = df.sparkSession
    prof = spark.createDataFrame(
        [(t, *onehot[t]) for t in sorted(onehot)],
        "t string, " + ", ".join(f"b_{i} int" for i in range(len(LANGS))),
    )
    ex = df.select(
        *keys, F.explode_outer(char_trigrams(F.col(text_col))).alias("t")
    )
    agg = ex.join(F.broadcast(prof), "t", "left").groupBy(*keys).agg(
        *[
            F.coalesce(F.sum(f"b_{i}"), F.lit(0)).cast("int").alias(f"__s_{i}")
            for i in range(len(LANGS))
        ]
    )
    return agg.select(
        *keys, F.array(*[F.col(f"__s_{i}") for i in range(len(LANGS))]).alias("__sv")
    )


def argmax_label(vec: Column, labels: list[str], none_label: str = "und") -> Column:
    """Deterministic argmax over an arbitrary score vector:
    ``none_label`` when every score is zero, the EARLIEST label in
    ``labels`` order wins ties — `lang_argmax_vector` generalized to a
    caller-supplied label set (that function stays pinned to the
    module-global LANGS for the registered ASCII langid queries). Same
    single-array_max construction: one (score, -rank) struct max, the
    vector referenced a constant number of times (a when-chain fold
    doubles the Catalyst tree per label)."""
    idx = F.sequence(F.lit(0), F.lit(len(labels) - 1))
    entries = F.zip_with(
        vec, idx, lambda s, i: F.struct(s.alias("s"), (-i).alias("r"))
    )
    m = F.array_max(entries)
    names = F.array(*[F.lit(lab) for lab in labels])
    return F.when(m["s"] == 0, F.lit(none_label)).otherwise(
        F.element_at(names, (-m["r"] + 1).cast("int"))
    )


#: Script classes for `script_id`, as (label, regex char class) in
#: PRIORITY order (ties go to the earlier entry). Fixed BMP code-point
#: RANGES, not \p{Script=...} properties: explicit ranges are identical
#: across Java regex and DuckDB's RE2 and across Unicode table versions
#: (the \p{Script} assignments gained codepoints in recent Unicode
#: releases — the same version-skew family the tokenizer's _CASE_SKEW
#: fold pins). latin covers unaccented ASCII letters; latin_ext the
#: accented Latin-1/Extended-A/B letters. Symbol/punctuation codepoints
#: inside a letter block are carved out consistently: U+00D7/U+00F7
#: (multiplication/division signs) from latin_ext, and from the Greek
#: block U+0374/U+0375 (numeral signs), U+037E (Greek question mark),
#: U+0384/U+0385 (tonos marks), U+0387 (ano teleia) — so a document
#: quoting Greek PUNCTUATION is not voted toward 'greek' on characters
#: that are not letters.
SCRIPT_CLASSES: tuple[tuple[str, str], ...] = (
    ("latin", "[a-zA-Z]"),
    ("cyrillic", f"[{chr(0x0400)}-{chr(0x04FF)}]"),
    (
        "greek",
        f"[{chr(0x0370)}-{chr(0x0373)}{chr(0x0376)}-{chr(0x037D)}"
        f"{chr(0x037F)}-{chr(0x0383)}{chr(0x0386)}{chr(0x0388)}-{chr(0x03FF)}]",
    ),
    (
        "latin_ext",
        f"[{chr(0xC0)}-{chr(0xD6)}{chr(0xD8)}-{chr(0xF6)}{chr(0xF8)}-{chr(0x24F)}]",
    ),
)


def script_counts(text: Column) -> Column:
    """Per-script character counts over `SCRIPT_CLASSES`, as a vector
    aligned with its order: count = len(text) − len(text with the class
    deleted) — the `punct_ratio` counting trick, one codegen'd
    regexp_replace per class, no explode. BMP scope (both engines count
    BMP chars identically); supplementary-plane text lands in no class."""
    n = F.length(text)
    return F.array(
        *[
            (n - F.length(F.regexp_replace(text, cls, ""))).cast("int")
            for _, cls in SCRIPT_CLASSES
        ]
    )


def script_id(text: Column) -> Column:
    """Writing-script ID by character-class majority — the first stage
    of any real multilingual pipeline (CLD/fastText-style cascades
    gate language models per script before touching content): argmax
    of `script_counts` with `argmax_label`'s deterministic tie rule,
    'und' when no classified letter occurs. A pure map pass (a few
    regexp_replace + length per row), so it scales as a scan."""
    return argmax_label(script_counts(text), [lab for lab, _ in SCRIPT_CLASSES])


def table_scores(toks: Column, table: dict[str, list[str]]) -> dict[str, Column]:
    """Per-key stopword-hit counts (with multiplicity) over an
    arbitrary {label: [words]} table — `lang_scores` generalized from
    the module-global STOPWORDS."""
    return {
        key: F.size(F.filter(toks, lambda t: t.isin(*table[key])))
        for key in table
    }


def lang_id_table(toks: Column, table: dict[str, list[str]]) -> Column:
    """Language ID over an arbitrary stopword table: argmax of per-key
    hit counts in sorted-key order ('und' when nothing fires, earliest
    sorted key wins ties — `lang_id`'s exact tie rule). With a
    transliterated or non-Latin stopword table this identifies
    languages the ASCII STOPWORDS lists cannot see; the caller pairs it
    with `tokens_unicode` (the ASCII tokenizer would shred non-Latin
    entries before they could match).

    This is the EXPRESSION form — composable in any projection, right
    for SMALL tables (a few dozen words per key), but each token pays
    |table| interpreted isin compares inside the HOF filters. For a
    large table (the 4-script × 10-language transliterated table is
    1,200 entries — measured 6.9 s at sf0.1 with this form, and a
    literal-map variant is no better: Catalyst map literals are
    linear-scan lookups) use `stopword_scores_table`, the relational
    twin that ships the word table once as a broadcast relation — the
    exact `lang_id_trigram` / `trigram_scores_table` split."""
    keys = sorted(table)
    scores = table_scores(toks, table)
    return argmax_label(F.array(*[scores[k] for k in keys]), keys)


def stopword_scores_table(df, toks: Column, keys: list[str], table: dict[str, list[str]]):
    """Relational stopword scorer over an arbitrary {label: [words]}
    table — the table-scale path (`trigram_scores_table`'s design one
    level up): explode the documents' tokens, broadcast-join the
    word → membership-vector relation (|distinct words| rows, shipped
    once per executor — never a per-task codegen literal), and
    partial-aggregate per-label hit sums back to one row per document.
    Explode preserves partitioning, so the map-side combine collapses
    each document's tokens within its partition and the one exchange
    carries |docs| × |labels| ints. ``explode_outer`` keeps token-less
    documents (they score all-zero → 'und' downstream). Returns
    ``keys`` + ``__sv`` (the sorted-label score vector for
    `argmax_label(…, sorted(table))`), bit-equal to `lang_id_table`'s
    expression form (agreement-tested)."""
    labels = sorted(table)
    member: dict[str, list[int]] = {}
    for i, k in enumerate(labels):
        for w in table[k]:
            member.setdefault(w, [0] * len(labels))[i] = 1
    spark = df.sparkSession
    prof = spark.createDataFrame(
        [(w, *member[w]) for w in sorted(member)],
        "w string, " + ", ".join(f"b_{i} int" for i in range(len(labels))),
    )
    ex = df.select(*keys, F.explode_outer(toks).alias("w"))
    agg = ex.join(F.broadcast(prof), "w", "left").groupBy(*keys).agg(
        *[
            F.coalesce(F.sum(f"b_{i}"), F.lit(0)).cast("int").alias(f"__s_{i}")
            for i in range(len(labels))
        ]
    )
    return agg.select(
        *keys,
        F.array(*[F.col(f"__s_{i}") for i in range(len(labels))]).alias("__sv"),
    )


def translit_words(words: list[str], src: str, dst: str) -> list[str]:
    """Per-character transliteration of a word list (src[i] → dst[i]),
    the driver-side mirror of a `translate`-derived corpus: the image
    of a stopword list under the same map the corpus text went through,
    so stopword matching survives transliteration exactly."""
    m = str.maketrans(src, dst)
    return [w.translate(m) for w in words]


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (empty array when the
    document has fewer than ``n`` tokens). Pure expression — stays in
    whole-stage codegen."""
    if n == 1:
        return toks
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + k) for k in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(df, toks_col: str, id_col: str):
    """Gopher-style repetition/diversity signals per document (Rae et
    al. 2021, "Scaling Language Models", App. A quality filters —
    adapted to single-line documents: token-level, not line-level):

    * ``ttr`` — type-token ratio (distinct/total tokens),
    * ``top_bigram_frac`` — occurrences of the most frequent bigram
      over all bigram occurrences,
    * ``dup_trigram_frac`` — fraction of trigram occurrences whose
      trigram appears more than once,
    * ``unigram_entropy`` — Shannon entropy of the unigram
      distribution, via H = ln N − (Σ c·ln c)/N.

    Plan: ONE tagged explode (n ∈ {1,2,3} unioned in-row before the
    generator) → two-level partial aggregation keyed by (doc, n, gram)
    then (doc, n) → conditional-aggregation pivot back to one row per
    document. Two shuffles total, both keyed by document — n-gram
    counting never materializes a per-document map in one row, so a
    pathological 10M-token document costs O(tokens) across its
    partition, not O(tokens²) in a higher-order-function scan. At 100
    TB this is the same embarrassingly-parallel explode→partial-agg
    shape as ``trigram_scores_table``; map-side combine collapses each
    document's grams before the exchange. All-double outputs rounded to
    6dp on both engines for the str-render gate."""
    toks = F.col(toks_col)

    def _tag(n):
        # NB: a 2-arg transform lambda would make the 2nd arg the element
        # INDEX — close over the gram size with a factory instead.
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    tagged = F.concat(
        *[F.transform(word_ngrams(toks, n), _tag(n)) for n in (1, 2, 3)]
    )
    ttr = df.select(
        id_col,
        F.round(
            F.size(F.array_distinct(toks)).cast("double")
            / F.greatest(F.size(toks), F.lit(1)).cast("double"),
            6,
        ).alias("ttr"),
    )
    grams = df.select(id_col, F.explode(tagged).alias("ng")).select(
        id_col, F.col("ng.n").alias("n"), F.col("ng.g").alias("g")
    )
    cnt = grams.groupBy(id_col, "n", "g").count()
    per = cnt.groupBy(id_col, "n").agg(
        (F.max("count").cast("double") / F.sum("count")).alias("top_frac"),
        (
            F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0)).cast(
                "double"
            )
            / F.sum("count")
        ).alias("dup_frac"),
        (
            F.log(F.sum("count").cast("double"))
            - F.sum(F.col("count").cast("double") * F.log(F.col("count").cast("double")))
            / F.sum("count")
        ).alias("ent"),
    )
    pivoted = per.groupBy(id_col).agg(
        F.round(
            F.coalesce(F.max(F.when(F.col("n") == 2, F.col("top_frac"))), F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
        F.round(
            F.coalesce(F.max(F.when(F.col("n") == 3, F.col("dup_frac"))), F.lit(0.0)), 6
        ).alias("dup_trigram_frac"),
        F.round(
            F.coalesce(F.max(F.when(F.col("n") == 1, F.col("ent"))), F.lit(0.0)), 6
        ).alias("unigram_entropy"),
    )
    return ttr.join(pivoted, id_col, "left").select(
        id_col,
        "ttr",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        F.coalesce("dup_trigram_frac", F.lit(0.0)).alias("dup_trigram_frac"),
        F.coalesce("unigram_entropy", F.lit(0.0)).alias("unigram_entropy"),
    )


def punct_ratio(text: Column) -> Column:
    """Non-alphanumeric, non-space character ratio."""
    total = F.greatest(F.length(text), F.lit(1))
    clean = F.length(F.regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
    return (total - clean).cast("double") / total.cast("double")


def mean_token_len(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column, tokenizer=None) -> Column:
    """Composite quality heuristic in [0,1]: length band + stopword
    presence + low punctuation + sane word lengths. Weights fixed;
    deterministic arithmetic only. ``tokenizer`` defaults to the ASCII
    `tokens`; under `tokens_unicode` the length/band terms see whole
    multilingual words while the stopword term remains English by
    construction (see the `tokens_unicode` contract)."""
    t = (tokenizer or tokens)(text)
    len_term = F.least(F.size(t).cast("double") / 50.0, F.lit(1.0))
    sw_term = F.least(stopword_ratio(t, "en") * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    mlen = mean_token_len(t)
    len_band = F.when((mlen >= 3.0) & (mlen <= 8.0), 1.0).otherwise(0.5)
    return F.round(0.3 * len_term + 0.3 * sw_term + 0.2 * punct_term + 0.2 * len_band, 6)


def fingerprint_md5(text: Column, tokenizer=None) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text — the exact-dedup key. ``tokenizer`` (text → token array)
    defaults to the ASCII `tokens`; under `tokens_unicode` two
    documents differing only in non-Latin content get distinct
    fingerprints instead of colliding on the empty token stream."""
    return F.md5(F.concat_ws(" ", (tokenizer or tokens)(text)))


def rolling_hash(toks: Column, mod: int = 1_000_000_007, mult: int = 31) -> Column:
    """Polynomial rolling hash over the token stream (order-sensitive
    fingerprint): h = (h*31 + len(tok)*7 + ascii(tok[0])) mod p.
    A sequential left fold — order dependence is the point."""
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda h, t: (h * mult + F.length(t) * 7 + F.ascii(t)) % mod,
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# (kind, pattern, replacement) applied IN ORDER — emails first so their
# digit/dot substrings can never be re-matched by the looser ip/number
# rules. Patterns restrict to constructs whose semantics are identical
# in Java regex (Spark) and RE2 (DuckDB): character classes, bounded
# repetition, and \b word boundaries — no backrefs or lookaround.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("number", r"\b\d{7,}\b", "<NUM>"),
)


def redact_pii(text: Column) -> tuple[Column, dict[str, Column]]:
    """Rule-based PII scrubbing — the pre-training redaction pass every
    public pipeline runs (emails, IPv4 addresses, long digit runs such
    as phone/account numbers). Returns ``(redacted_text, counts)`` where
    ``counts[kind]`` is the number of spans masked by that rule.

    Each rule's count is taken from the text AS ALREADY REDACTED by the
    preceding rules, so overlapping spans are attributed to exactly one
    rule and the counts sum to the number of masked spans. Pure
    ``regexp_extract_all`` / ``regexp_replace`` — JVM-side, codegen'd,
    no UDF; at 100 TB this is a map-only pass that pushes nothing to a
    shuffle."""
    counts: dict[str, Column] = {}
    cur = text
    for kind, pat, rep in PII_RULES:
        counts[kind] = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, rep)
    return cur, counts


def token_segments(toks: Column, seg_len: int) -> Column:
    """Split a token array into consecutive fixed-width segments
    (the last may be shorter): returns array<struct<seg_idx int,
    seg array<string>>>. Guarded so empty docs yield an empty array
    (``sequence(0, -1)`` would count DOWN, not produce an empty list).

    Pass ``toks`` as a projected COLUMN, not an embedded tokens(...)
    expression: the slice runs inside a transform lambda, where an
    embedded expression re-evaluates per SEGMENT (interpreted HOFs get
    no subexpression caching) — with tokens() that is a quadratic
    re-tokenize, measured 4.6× on the segment stage (see
    dedup.doc_segments / dedup.boilerplate_remove)."""
    n_segs = F.ceil(F.size(toks) / float(seg_len)).cast("int")
    idxs = F.when(n_segs > 0, F.sequence(F.lit(0), n_segs - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idxs,
        lambda i: F.struct(
            i.alias("seg_idx"),
            F.slice(toks, i * seg_len + 1, seg_len).alias("seg"),
        ),
    )


def sliding_chunks(toks: Column, width: int, stride: int) -> Column:
    """Overlapping sliding windows over the token stream — the RAG /
    context-window chunker: starts at 0, stride, 2·stride, … while the
    start is inside the document, each chunk covering ``width`` tokens
    (the final chunks are truncated at the document end). Returns
    array<struct<chunk_idx int, chunk array<string>>>; empty docs yield
    no chunks."""
    n = F.size(toks)
    n_chunks = F.ceil(n / float(stride)).cast("int")
    idxs = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idxs,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.slice(toks, i * stride + 1, width).alias("chunk"),
        ),
    )


def ngram_strings(toks: Column) -> Column:
    """DSIR's n-gram feature STRINGS (Xie et al. 2023,
    arXiv:2302.03169 §3): unigrams ∪ bigrams, one entry per feature
    OCCURRENCE (DSIR's bag-of-ngrams counts). Returns array<string>.
    Deliberately does NOT hash here: Spark executes lambda-HOF bodies
    interpreted per element, so the md5 belongs AFTER the explode as a
    top-level projected expression (`feature_bucket`) where Tungsten
    codegen runs it — the HOF is left with only cheap string concats."""
    # zip_with over two shifted slices: the slice arguments evaluate
    # ONCE per row, so the lambda body is a cheap per-element concat.
    # The previous form (transform + element_at(toks, i)) re-evaluated
    # the embedded toks EXPRESSION per element_at — when callers pass
    # tokens(col), that re-ran the regex split per element (quadratic
    # in doc length, and interpreted): the lm_perplexity transitions
    # rewrite measured the identical pattern at 7.3 s → 0.68 s sf0.1.
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def feature_bucket(feat: Column, buckets: int) -> Column:
    """md5-bucket a feature string into [0, buckets): the first 8 hex
    chars of md5 parsed as an integer — the construction every
    md5-derived signature in this repo uses, so a DuckDB oracle
    recomputes identical buckets. Applied as a top-level projection
    (post-explode) this is whole-stage-codegen'd; the identical math
    inside a `transform` HOF executes interpreted per element."""
    return F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("long") % buckets


def dsir_scores(
    raw, target, id_col: str, text_col: str,
    buckets: int = 256, quant: int = 10_000, tokenizer=tokens,
):
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): score each raw-pool document by how much its hashed n-gram
    distribution looks like the TARGET corpus, and keep the top k.
    Per-bucket importance log-ratio (add-1 smoothed):

        lr[b] = round(ln((n_t[b]+1)·(N_r+B) / ((n_r[b]+1)·(N_t+B)))·quant)

    quantized to an exact BIGINT so the per-doc score Σ_features lr[b]
    is pure integer arithmetic (the repo's engine-parity discipline —
    the single ln per bucket is the only float op, immediately
    quantized; its argument is an exact-integer ratio both engines
    compute bit-identically). Returns (id, score) for EVERY raw-pool
    document; top-k selection lives in `dsir_importance`.

    Scale: the feature explode is ONE pass per corpus — materialized
    eagerly via localCheckpoint (the minhash-shingle discipline:
    blocks, not a CacheManager pin, reclaimable by the session owner's
    sweep) because the counts, totals, and scoring legs would otherwise
    each re-run the featurize pass. The md5 bucketing runs AFTER the
    explode as a codegen'd top-level projection (`feature_bucket`) —
    the HOF emits only the n-gram strings, so the hot hash loop is
    Tungsten, not interpreted (the r8 profile's one flagged constant
    factor). The lr table is ≤B rows (broadcast); the totals are 1-row
    aggregates (broadcast); scoring is a broadcast join + per-doc sum;
    top-k is TakeOrderedAndProject — no global sort, no all-pairs
    anything.

    ``tokenizer``: `tokens` (ASCII default) or `tokens_unicode` — the
    fit/score pairing contract (see `tokens_unicode`): BOTH corpora
    featurize through the one tokenizer passed here."""
    def bucketed(df):
        # the featurize pass is CPU-bound: spread the (often
        # single-row-group) scan across right-sized partitions first —
        # the minhash-signature discipline (dedup.cpu_partitions)
        from fiat2_spark.operators.dedup import cpu_partitions

        return df.repartition(cpu_partitions(df)).select(
            F.col(id_col).alias("doc"),
            F.explode(ngram_strings(tokenizer(F.col(text_col)))).alias("feat"),
        ).select(
            "doc", feature_bucket(F.col("feat"), buckets).alias("bucket")
        ).localCheckpoint()

    tb, rb = bucketed(target), bucketed(raw)
    tc = tb.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_t"))
    rc = rb.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_r"))
    tot = tb.agg(F.count(F.lit(1)).alias("tot_t")).crossJoin(
        rb.agg(F.count(F.lit(1)).alias("tot_r"))
    )
    lr = (
        tc.join(rc, "bucket", "full_outer")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log(
                    (
                        (F.coalesce("n_t", F.lit(0)) + 1)
                        * (F.col("tot_r") + buckets)
                    ).cast("double")
                    / (
                        (F.coalesce("n_r", F.lit(0)) + 1)
                        * (F.col("tot_t") + buckets)
                    ).cast("double")
                )
                * quant
            )
            .cast("long")
            .alias("lr"),
        )
    )
    scored = (
        rb.join(F.broadcast(lr), "bucket")
        .groupBy("doc")
        .agg(F.sum("lr").alias("score"))
    )
    return scored.select(F.col("doc").alias(id_col), "score")


def dsir_importance(
    raw, target, id_col: str, text_col: str,
    buckets: int = 256, quant: int = 10_000, k: int = 100, tokenizer=tokens,
):
    """Top-k selection by raw DSIR importance score (`dsir_scores`) —
    ties on doc id; TakeOrderedAndProject, no global sort."""
    return (
        dsir_scores(raw, target, id_col, text_col, buckets, quant, tokenizer)
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def dsir_resample(
    raw, target, id_col: str, text_col: str,
    buckets: int = 256, quant: int = 10_000, k: int = 64, temp: float = 1.0,
    tokenizer=tokens,
):
    """DSIR's actual RESAMPLING step (Xie et al. 2023 §3): draw k
    documents with probability ∝ exp(score/T) WITHOUT replacement via
    the Gumbel top-k trick — key = score/T + Gumbel(0,1), keep the k
    largest keys. The Gumbel noise is deterministic and
    engine-portable: u = (52 salted-md5 bits + 1)/(2⁵²+1), g =
    −ln(−ln u) (no RNG state — the Efraimidis–Spirakis discipline
    `sample_weighted` established). The +1 denominator keeps u in the
    OPEN interval (0,1): an all-f 52-bit prefix would otherwise make
    u exactly 1.0 and −ln(−ln 1) a NULL-vs-error engine divergence.
    Keys round to 6 decimals so a last-ulp libm-ln difference cannot
    reorder near-equal keys; doc id breaks ties. Top-k is
    TakeOrderedAndProject — the exchange never carries the pool."""
    scores = dsir_scores(raw, target, id_col, text_col, buckets, quant, tokenizer)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dsir#"), F.col(id_col).cast("string"))), 1, 13
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float((1 << 52) + 1))
    key = F.round(
        F.col("score").cast("double") / F.lit(float(quant) * temp) - F.log(-F.log(u)),
        6,
    )
    return (
        scores.withColumn("gkey", key)
        .orderBy(F.desc("gkey"), id_col)
        .limit(k)
    )


def _vocab_mapped(df, col: str, vocab, unk: str):
    """Replace ``col`` with its vocab-mapped value: itself if in the
    broadcast vocab relation, else the ``unk`` token — CCNet's
    closed-vocabulary step that bounds every LM table by the vocab, not
    the corpus."""
    probe = vocab.select(F.col("w").alias(f"__v_{col}"))
    return (
        df.join(F.broadcast(probe), df[col] == F.col(f"__v_{col}"), "left")
        .withColumn(col, F.coalesce(F.col(f"__v_{col}"), F.lit(unk)))
        .drop(f"__v_{col}")
    )


def lm_perplexity(
    raw, ref, id_col: str, text_col: str,
    vocab_size: int = 1024, quant: int = 10_000,
    alpha_num: int = 2, alpha_den: int = 5, unk: str = "<unk>",
    tokenizer=tokens,
):
    """CCNet-style n-gram LM scoring (Wenzek et al. 2019,
    arXiv:1911.00359 §4.3 "LM filtering"): score every RAW document by
    its total negative log-likelihood under a bigram LM with stupid
    backoff (Brants et al. 2007) fit on the REF corpus — the
    literature's quality-selection axis next to DSIR's
    importance-vs-target (`dsir_scores`): DSIR asks "does this look
    like the target?", perplexity asks "is this fluent under a
    reference LM?" (CCNet, LLaMA, and RedPajama all gate on it).

    Model (everything integer until a single ln per TABLE row, the
    `dsir_scores` lr discipline — never a float op per token):
      vocab  = top ``vocab_size`` ref unigrams by (count desc, word);
               every other token maps to ``unk``
      seen   (prev,w) in ref:  p = c2(prev,w) / c1(prev)
      unseen (backoff):        p = α · (c1(w)+1) / (N + V + 1),
               α = alpha_num/alpha_den (stupid backoff's fixed penalty;
               add-1 on the vocab-closed unigram so p > 0 always)
      per-transition cost q = round(-ln p · quant)  (exact BIGINT; the
               ln argument is an exact-integer ratio both engines form
               bit-identically)

    Returns (id, n_trans, nll_q) for EVERY raw document: n_trans =
    max(len(toks)-1, 0) scored transitions, nll_q = Σ q as BIGINT
    (mean NLL in nats = nll_q / (quant·n_trans)). Docs with < 2 tokens
    score (0, 0).

    Scale: the LM tables are MODEL-sized, not corpus-sized — vocab ≤ V
    rows, unigram table ≤ V+1, bigram table ≤ observed (vocab-closed)
    bigrams — all broadcast; fitting is one explode+count pass over the
    ref corpus and scoring is one explode + two broadcast probes + a
    per-doc partial-aggregated sum over the raw corpus. No window, no
    global sort, no corpus-keyed shuffle except the final per-doc agg
    (r12: the every-doc contract rides the scoring explode itself via
    ``explode_outer`` — short docs keep a placeholder row excluded from
    the sums by a pre-vocab-mapping flag — instead of the former
    ``raw.select(doc).distinct()`` + left-join-back, which cost a second
    corpus-keyed shuffle plus a corpus-sized sort-merge join).

    ``tokenizer``: `tokens` (ASCII default) or `tokens_unicode` — the
    fit/score pairing contract (see `tokens_unicode`): the ref LM is
    FIT and the raw corpus SCORED through the one tokenizer passed
    here (OOV→unk keeps the vocab closed under either)."""
    spark = raw.sparkSession

    def transitions(df, outer: bool = False):
        # (prev, w) pairs via arrays_zip over two shifted slices — ALL
        # native expressions. The lambda-HOF form (transform + 2×
        # element_at) evaluated interpreted per element AND re-ran the
        # embedded tokens() regex split per element_at (no
        # common-subexpression elimination inside HOF lambdas):
        # measured 7.3 s → 0.68 s at sf0.1 on the raw corpus, same rows.
        # ``outer``: keep docs with < 2 tokens as one (doc, NULL, NULL)
        # placeholder row (explode_outer of the NULL pair array), so
        # every raw doc reaches the per-doc aggregate without a
        # join-back.
        t = tokenizer(F.col(text_col))
        n = F.size(t)
        pairs = F.when(n >= 2, F.arrays_zip(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1)))
        ex = F.explode_outer(pairs) if outer else F.explode(pairs)
        return df.select(
            F.col(id_col).alias("doc"), ex.alias("p")
        ).select(
            "doc",
            F.col("p")["0"].alias("prev"),
            F.col("p")["1"].alias("w"),
        )

    # fit: one unigram pass over ref feeds vocab, c1, and N (blocks,
    # not a CacheManager pin — the minhash-shingle discipline)
    ref_uni = ref.select(
        F.col(id_col).alias("doc"), F.explode(tokenizer(F.col(text_col))).alias("w")
    ).localCheckpoint()
    vocab = (
        ref_uni.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w").limit(vocab_size)
        .select("w").localCheckpoint()
    )
    tot = ref_uni.agg(F.count(F.lit(1)).alias("n_tot"))
    c1 = (
        _vocab_mapped(ref_uni.select("w"), "w", vocab, unk)
        .groupBy("w").agg(F.count(F.lit(1)).alias("n1"))
    )
    c2 = (
        _vocab_mapped(
            _vocab_mapped(transitions(ref), "prev", vocab, unk), "w", vocab, unk
        )
        .groupBy("prev", "w").agg(F.count(F.lit(1)).alias("n2"))
    )
    q2 = c2.join(c1.select(F.col("w").alias("prev"), "n1"), "prev").select(
        "prev", "w",
        F.round(-F.log(F.col("n2").cast("double") / F.col("n1")) * quant)
        .cast("long").alias("q"),
    )
    dom = vocab.unionByName(spark.createDataFrame([(unk,)], "w string"))
    q1 = (
        dom.join(c1, "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            F.round(
                -F.log(
                    ((F.coalesce("n1", F.lit(0)) + 1) * alpha_num).cast("double")
                    / ((F.col("n_tot") + vocab_size + 1) * alpha_den).cast("double")
                )
                * quant
            ).cast("long").alias("q"),
        )
    )
    # score: transitions probe the seen-bigram table, fall back to the
    # per-word backoff (both broadcast), then one per-doc integer sum.
    # The "(0, 0) for every short/empty doc" contract rides the same
    # explode (outer) — the __real flag is captured BEFORE vocab
    # mapping, which would otherwise rewrite the placeholder's NULLs to
    # unk and score them.
    rt = _vocab_mapped(
        _vocab_mapped(
            transitions(raw, outer=True).withColumn(
                "__real", F.col("w").isNotNull()
            ),
            "prev", vocab, unk,
        ),
        "w", vocab, unk,
    )
    real = F.col("__real")
    return (
        rt.join(F.broadcast(q2.withColumnRenamed("q", "q_bi")), ["prev", "w"], "left")
        .join(F.broadcast(q1.withColumnRenamed("q", "q_uni")), "w", "left")
        .groupBy("doc")
        .agg(
            F.sum(F.when(real, 1).otherwise(0)).cast("long").alias("n_trans"),
            F.sum(F.when(real, F.coalesce("q_bi", "q_uni")).otherwise(0))
            .cast("long").alias("nll_q"),
        )
        .select(F.col("doc").alias(id_col), "n_trans", "nll_q")
    )


def lm_perplexity3(
    raw, ref, id_col: str, text_col: str,
    vocab_size: int = 1024, quant: int = 10_000,
    alpha_num: int = 2, alpha_den: int = 5, unk: str = "<unk>",
    tokenizer=tokens,
):
    """Trigram LM scoring with FULL multi-order stupid backoff (Brants
    et al. 2007, "Large Language Models in Machine Translation" §4 —
    the distributed web-scale LM recipe: relative frequencies, no
    normalization, a fixed backoff penalty α per level). `lm_perplexity`
    is the bigram→unigram two-level instance; this is the paper's
    three-level chain:

      seen trigram:   S(w|a,b) = c3(a,b,w) / c2(a,b)
      else bigram:    S(w|b)   = α · c2(b,w) / c1(b)
      else unigram:   S(w)     = α² · (c1(w)+1) / (N + V + 1)

    (α = alpha_num/alpha_den; add-1 on the vocab-closed unigram keeps
    S > 0; context counts are the plain (k−1)-gram counts — stupid
    backoff scores are deliberately unnormalized, so the document-edge
    count mismatch the paper accepts is accepted here too.)
    Per-transition cost q = round(−ln S · quant) exact BIGINT; every ln
    argument is an exact-integer ratio both engines form bit-identically
    (the `lm_perplexity`/`dsir_scores` discipline).

    Returns (id, n_trans, nll_q) for EVERY raw document: n_trans =
    max(len(toks)−2, 0) scored trigram transitions; docs with < 3
    tokens score (0, 0).

    Scale: identical shape to `lm_perplexity` one order up — the LM
    tables stay MODEL-sized (vocab-closed: ≤ observed vocab-mapped
    trigrams/bigrams, ≤ V+1 unigrams), all broadcast; fitting is three
    explode+count passes over the ref corpus (each map-side partial),
    scoring one explode + three broadcast probes + a per-doc partial
    agg. At Brants-scale corpora where the trigram table outgrows a
    broadcast, the paper's answer is sharding the probe by n-gram hash
    — here that is the same equi-join without the broadcast hint, which
    AQE picks automatically when the build side stops fitting.

    ``tokenizer``: fit/score pairing contract as in `lm_perplexity`."""
    spark = raw.sparkSession

    def grams(df, n: int, cols: list[str], outer: bool = False):
        # n consecutive tokens via arrays_zip over n shifted slices —
        # native expressions only (see lm_perplexity.transitions).
        # ``outer``: keep docs with < n tokens as one all-NULL
        # placeholder row (the lm_perplexity every-doc contract).
        t = tokenizer(F.col(text_col))
        sz = F.size(t)
        width = sz - (n - 1)
        zipped = F.when(
            sz >= n, F.arrays_zip(*[F.slice(t, i + 1, width) for i in range(n)])
        )
        ex = F.explode_outer(zipped) if outer else F.explode(zipped)
        return df.select(
            F.col(id_col).alias("doc"), ex.alias("g")
        ).select(
            "doc", *[F.col("g")[str(i)].alias(c) for i, c in enumerate(cols)]
        )

    # fit — one unigram pass feeds vocab / c1 / N (blocks, not a
    # CacheManager pin)
    ref_uni = ref.select(
        F.col(id_col).alias("doc"), F.explode(tokenizer(F.col(text_col))).alias("w")
    ).localCheckpoint()
    vocab = (
        ref_uni.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w").limit(vocab_size)
        .select("w").localCheckpoint()
    )
    tot = ref_uni.agg(F.count(F.lit(1)).alias("n_tot"))
    c1 = (
        _vocab_mapped(ref_uni.select("w"), "w", vocab, unk)
        .groupBy("w").agg(F.count(F.lit(1)).alias("n1"))
    )
    c2 = (
        _vocab_mapped(
            _vocab_mapped(grams(ref, 2, ["prev", "w"]), "prev", vocab, unk),
            "w", vocab, unk,
        )
        .groupBy("prev", "w").agg(F.count(F.lit(1)).alias("n2"))
        .localCheckpoint()  # feeds both q3's context join and q2
    )
    c3 = _vocab_mapped(
        _vocab_mapped(
            _vocab_mapped(grams(ref, 3, ["p2", "p1", "w"]), "p2", vocab, unk),
            "p1", vocab, unk,
        ),
        "w", vocab, unk,
    ).groupBy("p2", "p1", "w").agg(F.count(F.lit(1)).alias("n3"))
    q3 = c3.join(
        c2.select(F.col("prev").alias("p2"), F.col("w").alias("p1"), "n2"),
        ["p2", "p1"],
    ).select(
        "p2", "p1", "w",
        F.round(-F.log(F.col("n3").cast("double") / F.col("n2")) * quant)
        .cast("long").alias("q"),
    )
    q2 = c2.join(c1.select(F.col("w").alias("prev"), "n1"), "prev").select(
        F.col("prev").alias("p1"), "w",
        F.round(
            -F.log(
                (F.col("n2") * alpha_num).cast("double")
                / (F.col("n1") * alpha_den).cast("double")
            )
            * quant
        ).cast("long").alias("q"),
    )
    dom = vocab.unionByName(spark.createDataFrame([(unk,)], "w string"))
    q1 = (
        dom.join(c1, "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            F.round(
                -F.log(
                    ((F.coalesce("n1", F.lit(0)) + 1) * alpha_num * alpha_num).cast(
                        "double"
                    )
                    / (
                        (F.col("n_tot") + vocab_size + 1) * alpha_den * alpha_den
                    ).cast("double")
                )
                * quant
            ).cast("long").alias("q"),
        )
    )
    # score: trigram transitions probe the three broadcast tables,
    # deepest available level wins, then one per-doc integer sum. The
    # every-doc contract rides the scoring explode itself (outer, with
    # the pre-mapping __real flag) — no distinct + join-back shuffle
    # (the lm_perplexity r12 rewrite, one order up).
    rt = _vocab_mapped(
        _vocab_mapped(
            _vocab_mapped(
                grams(raw, 3, ["p2", "p1", "w"], outer=True).withColumn(
                    "__real", F.col("w").isNotNull()
                ),
                "p2", vocab, unk,
            ),
            "p1", vocab, unk,
        ),
        "w", vocab, unk,
    )
    real = F.col("__real")
    return (
        rt.join(F.broadcast(q3.withColumnRenamed("q", "q_tri")), ["p2", "p1", "w"], "left")
        .join(F.broadcast(q2.withColumnRenamed("q", "q_bi")), ["p1", "w"], "left")
        .join(F.broadcast(q1.withColumnRenamed("q", "q_uni")), "w", "left")
        .groupBy("doc")
        .agg(
            F.sum(F.when(real, 1).otherwise(0)).cast("long").alias("n_trans"),
            F.sum(F.when(real, F.coalesce("q_tri", "q_bi", "q_uni")).otherwise(0))
            .cast("long").alias("nll_q"),
        )
        .select(F.col("doc").alias(id_col), "n_trans", "nll_q")
    )


def perplexity_filter(
    raw, ref, id_col: str, text_col: str, threshold_q: int,
    vocab_size: int = 1024, quant: int = 10_000,
    alpha_num: int = 2, alpha_den: int = 5, tokenizer=tokens,
):
    """CCNet's LM quality gate: keep a document iff its MEAN per-token
    NLL under the ref-fit bigram LM is at most threshold_q/quant nats —
    evaluated as the exact integer comparison
    ``nll_q ≤ threshold_q · n_trans`` (no float division, so the
    decision is engine-bitwise). Docs with no transitions keep
    trivially (0 ≤ 0 — nothing to judge them on; CCNet routes such
    fragments to its "middle" bucket, a threshold policy knob).
    Returns (id, n_trans, nll_q, keep)."""
    s = lm_perplexity(
        raw, ref, id_col, text_col, vocab_size, quant, alpha_num, alpha_den,
        tokenizer=tokenizer,
    )
    return s.withColumn(
        "keep", F.col("nll_q") <= F.lit(threshold_q) * F.col("n_trans")
    )


def ccnet_buckets(
    raw, ref, id_col: str, text_col: str, lang_col: str,
    vocab_size: int = 1024, quant: int = 10_000,
    alpha_num: int = 2, alpha_den: int = 5, tokenizer=tokens,
    mq_scale: int = 1_000_000,
):
    """CCNet's head/middle/tail perplexity bucketing (Wenzek et al.
    2019, arXiv:1911.00359 §4.3): rank every document by its mean
    per-transition NLL under the ref-fit LM (`lm_perplexity`) WITHIN
    its language, and cut each language's ranking into thirds — head =
    the most-fluent third (CCNet keeps it outright), middle, tail.
    This is what the paper actually ships: per-language terciles, not
    a global threshold, so low-resource languages aren't judged by the
    high-resource languages' perplexity range.

    Exactness discipline: the ranking key is the integer
    mq = (nll_q · mq_scale) div n_trans (BIGINT division — never a
    float mean whose last ulp could reorder near-ties), ties break on
    doc id, and the tercile cuts are integer cross-multiplications
    (3·rn ≤ n, 3·rn ≤ 2n) — rank-based, so both engines agree bitwise
    even when a language's scores bunch. Documents with no scorable
    transition (< 2 tokens) are excluded — nothing to judge them on
    (the `perplexity_filter` policy knob, mirrored by the oracle).

    Scale: `lm_perplexity`'s plan (model-sized broadcasts, one corpus
    explode, per-doc partial agg) + a per-language ranking through
    `grouped_row_number`'s quantile-bucket scheme — languages are
    LOW-cardinality, exactly the regime where the plain
    lang-partitioned window would plan |langs| tasks on a
    1000-executor cluster. Returns (id, lang, mq, bucket)."""
    from fiat2_spark.operators.relational import grouped_row_number

    s = lm_perplexity(
        raw, ref, id_col, text_col, vocab_size, quant,
        alpha_num, alpha_den, tokenizer=tokenizer,
    ).filter(F.col("n_trans") > 0)
    # checkpoint the scored relation (batch block contract): three
    # consumers read it — the ranking's quantile sketch (an ACTION),
    # the ranking itself, and the per-language totals — and each would
    # otherwise re-run the whole corpus scoring pass (measured 4.5 s →
    # 3.0 s at sf0.1)
    scored = (
        s.join(raw.select(id_col, lang_col), id_col)
        .withColumn(
            "mq",
            F.expr(f"(nll_q * CAST({mq_scale} AS BIGINT)) div n_trans"),
        )
        .localCheckpoint()
    )
    rn = grouped_row_number(
        scored, [lang_col], "mq", id_name="__rn",
        tiebreak=[F.col(id_col)],
    )
    # language totals come from the PRE-ranking relation — identical
    # counts, and the ranking window is never evaluated twice for them
    n_lang = scored.groupBy(lang_col).agg(F.count(F.lit(1)).alias("__n"))
    return (
        rn.join(F.broadcast(n_lang), lang_col)
        .select(
            F.col(id_col),
            F.col(lang_col),
            "mq",
            F.when(3 * F.col("__rn") <= F.col("__n"), F.lit("head"))
            .when(3 * F.col("__rn") <= 2 * F.col("__n"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


# The 8 "must contain 2 of" stop words from Gopher's quality table
# (Rae et al. 2021, arXiv:2112.11446 Table A1).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    tokenizer=tokens,
    alpha_pattern: str = "[a-z]",
):
    """Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 Table
    A1) — the literature's named heuristic rule set (reused verbatim by
    RedPajama/FineWeb), distinct from the composite `quality_score`:
    each rule is a separate boolean column so a pipeline can bucket or
    ablate per rule, and `keep` is their conjunction.

      r_word_count : min_words ≤ #words ≤ max_words
      r_mean_len   : mean word length in [3, 10]
      r_symbol     : (#'#' + #'...') / #words < 0.1
      r_bullet     : < 90% of lines start with a bullet
      r_ellipsis   : < 30% of lines end with '...'
      r_alpha      : > 80% of words contain an alphabetic char
      r_stopword   : ≥ 2 distinct Gopher stop words present

    Every ratio is evaluated as an exact integer cross-multiplication
    (10·sym < n, 10·bullets < 9·lines, …) so the decision is
    engine-bitwise — the repo's no-float-compare discipline. All
    expressions are top-level or linear per-token/per-line lambdas over
    PRE-PROJECTED arrays (the r9 HOF rule: never re-evaluate the
    tokenizer inside a lambda). One scan, no shuffle, no UDF.
    Returns (id, n_words, the 7 rule booleans, keep).

    ``tokenizer``/``alpha_pattern``: the multilingual pairing is
    ``tokenizer=tokens_unicode, alpha_pattern=r"\\p{L}"`` (the alpha
    rule must recognize letters in the tokenizer's alphabet); the
    stopword rule stays Gopher's English list by construction."""
    toks = tokenizer(F.col(text_col))
    lines = F.split(F.col(text_col), "\n", -1)
    d = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        lines.alias("__lines"),
        (
            F.length(F.col(text_col))
            - F.length(F.regexp_replace(F.col(text_col), "#", ""))
        ).alias("__hash_cnt"),
        (
            (
                F.length(F.col(text_col))
                - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
            )
            / 3
        ).cast("long").alias("__ell_cnt"),
    )
    n = F.size(F.col("__toks"))
    total_chars = F.length(F.array_join(F.col("__toks"), ""))
    alpha_words = F.size(F.filter(F.col("__toks"), lambda t: t.rlike(alpha_pattern)))
    n_lines = F.size(F.col("__lines"))
    bullet_lines = F.size(
        F.filter(
            F.col("__lines"),
            lambda l: F.ltrim(l).startswith("- ")
            | F.ltrim(l).startswith("* ")
            | F.ltrim(l).startswith("• "),
        )
    )
    ell_lines = F.size(
        F.filter(F.col("__lines"), lambda l: F.rtrim(l).endswith("..."))
    )
    stop_hits = sum(
        F.array_contains(F.col("__toks"), w).cast("int")
        for w in GOPHER_STOPWORDS
    )
    sym = F.col("__hash_cnt") + F.col("__ell_cnt")
    rules = {
        "r_word_count": (n >= min_words) & (n <= max_words),
        "r_mean_len": (F.lit(3) * n <= total_chars)
        & (total_chars <= F.lit(10) * n),
        "r_symbol": F.lit(10) * sym < n,
        "r_bullet": F.lit(10) * bullet_lines < F.lit(9) * n_lines,
        "r_ellipsis": F.lit(10) * ell_lines < F.lit(3) * n_lines,
        "r_alpha": F.lit(10) * alpha_words > F.lit(8) * n,
        "r_stopword": stop_hits >= 2,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return d.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        *[c.alias(name) for name, c in rules.items()],
        keep.alias("keep"),
    )


def _nb_bucketed(df, id_col: str, text_col: str, buckets: int, extra=(),
                 checkpoint=True, track=None, tokenizer=tokens,
                 outer=False):
    """One featurize pass: hashed unigram+bigram buckets per doc
    (post-explode codegen'd md5 bucketing, localCheckpointed —
    `dsir_scores`' discipline). Shared by the one-shot classifier and
    the streaming `NBClassifierCorpus` so both realize the identical
    feature map.

    Block-lifetime contract (ADVICE r9): with ``checkpoint=True,
    track=None`` (the batch default) the checkpoint blocks belong to
    the returned result and are reclaimed by the session owner's
    global sweep. A long-lived caller for whom the global sweep is
    unsafe passes ``track`` (a list) to receive the new block ids for
    targeted ``release_blocks`` retirement, or ``checkpoint=False``
    to skip materialization entirely (right when the featurize pass
    appears exactly once in the consuming plan).

    ``outer`` (r12, scoring side only): keep zero-feature docs as one
    (doc, NULL-bucket) placeholder row via ``explode_outer``, so the
    every-doc bias contract rides the featurize pass itself instead of
    a corpus-keyed join-back (the `lm_perplexity` rewrite). NEVER set
    it on a TRAINING corpus — a placeholder row would enter the
    per-bucket counts as a NULL bucket and change the model."""
    from fiat2_spark.operators.dedup import cpu_partitions

    ex = F.explode_outer if outer else F.explode
    out = (
        df.repartition(cpu_partitions(df))
        .select(
            F.col(id_col).alias("doc"),
            *[F.col(c) for c in extra],
            ex(ngram_strings(tokenizer(F.col(text_col)))).alias("feat"),
        )
        .select(
            "doc",
            *extra,
            feature_bucket(F.col("feat"), buckets).alias("bucket"),
        )
    )
    if not checkpoint:
        return out
    if track is None:
        return out.localCheckpoint()
    from fiat2_spark.session import local_checkpoint_tracked

    out, blocks = local_checkpoint_tracked(out)
    track.extend(blocks)
    return out


def nb_counts(train, id_col: str, text_col: str, label_col: str, buckets: int,
              track=None, tokenizer=tokens):
    """The naive-Bayes sufficient statistics of a labeled corpus:
    (bucket, n_p, n_n) per observed feature bucket, the 1-row feature
    totals (tot_p, tot_n), and the 1-row doc totals (docs_p, docs_n).
    All ADDITIVE — summing two corpora's statistics equals the union's
    — which is exactly what makes the classifier incrementally
    trainable (`NBClassifierCorpus`). Feature and doc totals stay
    SEPARATE relations so each score-side broadcast subtree computes
    only its own aggregate (the weight table reads the feature pass,
    the bias reads one train scan — fusing them into one crossJoined
    row made BOTH broadcast subtrees pay BOTH aggregations, serially,
    measured ~1.5x on the classifier queries).

    ``track``: optional list receiving the featurize pass's checkpoint
    block ids for targeted retirement (the `NBClassifierCorpus` path —
    see `_nb_bucketed`'s block-lifetime contract)."""
    tb = _nb_bucketed(train, id_col, text_col, buckets, extra=(label_col,),
                      track=track, tokenizer=tokenizer)
    counts = tb.groupBy("bucket").agg(
        F.sum(F.col(label_col).cast("long")).alias("n_p"),
        F.sum((~F.col(label_col)).cast("long")).alias("n_n"),
    )
    # Spark's SUM over zero rows is NULL, not 0 — uncoalesced, an empty
    # training corpus (or an empty batch folded into a live
    # NBClassifierCorpus) would poison the totals state / the bias to
    # NULL. The per-bucket counts need no guard: an empty corpus has no
    # bucket rows at all.
    z = F.lit(0).cast("long")
    ftot = tb.agg(
        F.coalesce(F.sum(F.col(label_col).cast("long")), z).alias("tot_p"),
        F.coalesce(F.sum((~F.col(label_col)).cast("long")), z).alias("tot_n"),
    )
    dtot = train.agg(
        F.coalesce(F.sum(F.col(label_col).cast("long")), z).alias("docs_p"),
        F.coalesce(F.sum((~F.col(label_col)).cast("long")), z).alias("docs_n"),
    )
    return counts, ftot, dtot


def nb_score_from_counts(
    score, counts, ftot, dtot, id_col: str, text_col: str,
    buckets: int = 256, quant: int = 10_000, checkpoint: bool = True,
    tokenizer=tokens,
):
    """Classify with a model given as sufficient statistics: per-bucket
    weight w[b] = round(ln((n_p+1)·(tot_n+B) / ((n_n+1)·(tot_p+B)))·quant)
    and bias = round(ln((docs_p+1)/(docs_n+1))·quant) — the single ln
    per TABLE row immediately quantized to BIGINT, so per-doc scoring
    is pure integer sums and both engines agree bitwise. Buckets never
    observed in training contribute nothing (inner probe — the oracle
    mirrors). Returns (id, logit_q, pred) — ONE row per DISTINCT id
    (the `lm_perplexity` contract, r12: duplicate ids' features
    aggregate into a single score row; callers needing per-input-row
    scores must key by a unique id).

    ``checkpoint=False`` skips the score-side featurize checkpoint —
    it appears exactly once in the returned plan, so a long-lived
    caller (`NBClassifierCorpus.score`) avoids leaving an untracked
    block behind at the cost of the usual lazy-plan recompute if the
    result is evaluated more than once (ADVICE r9)."""
    w = counts.crossJoin(F.broadcast(ftot)).select(
        "bucket",
        F.round(
            F.log(
                (
                    (F.coalesce("n_p", F.lit(0)) + 1)
                    * (F.col("tot_n") + buckets)
                ).cast("double")
                / (
                    (F.coalesce("n_n", F.lit(0)) + 1)
                    * (F.col("tot_p") + buckets)
                ).cast("double")
            )
            * quant
        )
        .cast("long")
        .alias("w"),
    )
    bias = dtot.select(
        F.round(
            F.log(
                (F.col("docs_p") + 1).cast("double")
                / (F.col("docs_n") + 1).cast("double")
            )
            * quant
        )
        .cast("long")
        .alias("bias")
    )
    # the every-doc bias contract rides the featurize pass itself
    # (r12): explode_outer keeps zero-feature docs as one NULL-bucket
    # placeholder row, the weight probe goes LEFT (a bucket unseen in
    # training contributes 0 — same as the former inner probe), and
    # the per-doc aggregate covers every doc — no corpus-keyed
    # join-back against the score relation (the `lm_perplexity`
    # rewrite, one corpus join fewer per scoring query)
    sb = _nb_bucketed(score, id_col, text_col, buckets, checkpoint=checkpoint,
                      tokenizer=tokenizer, outer=True)
    doc_sums = (
        sb.join(F.broadcast(w), "bucket", "left")
        .groupBy("doc")
        .agg(F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("fsum"))
    )
    return (
        doc_sums.crossJoin(F.broadcast(bias))
        .select(
            F.col("doc").alias(id_col),
            (F.col("fsum") + F.col("bias")).cast("long").alias("logit_q"),
        )
        .withColumn("pred", F.col("logit_q") > 0)
    )


def nb_classifier_scores(
    train,
    score,
    id_col: str,
    text_col: str,
    label_col: str = "label",
    buckets: int = 256,
    quant: int = 10_000,
    tokenizer=tokens,
):
    """fastText-style linear text classifier (Joulin et al. 2016,
    arXiv:1607.01759) over hashed unigram+bigram features, with
    multinomial-naive-Bayes log-odds as the weight vector — the shape
    CCNet (Wenzek et al. 2019) uses to keep "Wikipedia-like" pages.
    DSIR (`dsir_scores`) answers "reweight toward a target
    distribution"; this answers "binary keep/drop with a decision
    boundary". Composed as `nb_counts` (the additive sufficient
    statistics) feeding `nb_score_from_counts` (weights + bias +
    integer scoring) — the streaming `NBClassifierCorpus` reuses BOTH,
    so batch/stream agreement is structural, not coincidental.

    Plan: one featurize pass per corpus; the model is a ≤B-row
    broadcast + a 1-row bias; scoring is a broadcast join + per-doc
    partial-agg sum; docs with zero features score the bare bias via
    the final left join. Returns (id, logit_q, pred).

    ``tokenizer``: `tokens` (ASCII default) or `tokens_unicode` — the
    fit/score pairing contract (see `tokens_unicode`): train and score
    corpora featurize through the one tokenizer passed here."""
    counts, ftot, dtot = nb_counts(train, id_col, text_col, label_col, buckets,
                                   tokenizer=tokenizer)
    return nb_score_from_counts(
        score, counts, ftot, dtot, id_col, text_col, buckets, quant,
        tokenizer=tokenizer,
    )


def token_budget_select(
    scored,
    id_col: str,
    ntok_col: str,
    priority_col: str,
    budget: int,
    n_buckets: int | None = None,
):
    """Budget-constrained selection: keep documents in descending
    ``priority_col`` order (ties on id) while the INCLUSIVE running
    token total stays ≤ ``budget`` — the greedy fill every
    curated-corpus build runs once per source ("take the best N tokens
    of this pool", the knapsack relaxation under a token budget).

    The running total uses `grouped_running_sum`'s quantile-bucket
    prefix sum with an EMPTY group — never ``SUM() OVER (ORDER BY …)``,
    whose single-partition global window is the one shape that cannot
    scale: rows bucket by priority value, per-bucket sums prefix-sum on
    a bucket-count-sized relation, and the heavy cumulative window runs
    per bucket in parallel. Integer token counts and (typically
    integer-quantized) priorities keep the cut engine-bitwise.
    Returns the kept rows + ``cum_tokens``."""
    from fiat2_spark.operators.relational import grouped_running_sum

    # constant group, not group_cols=[]: keeps the bucket-offset
    # window declared-partitioned (grouped_running_sum's offset pass
    # would otherwise run "No Partition Defined" over the tiny offsets
    # relation) at the cost of one constant byte per row
    cum = grouped_running_sum(
        scored.withColumn("__g", F.lit(0)),
        ["__g"],
        priority_col,
        F.col(ntok_col).cast("long"),
        out_name="cum_tokens",
        descending=True,
        tiebreak=(F.col(id_col),),
        n_buckets=n_buckets,
    )
    return cum.filter(F.col("cum_tokens") <= budget).drop("__g")


def length_bucket_batches(
    df, id_col: str, ntok_col: str,
    band_width: int = 64, batch_size: int = 16,
):
    """Length-bucketed batch construction — the padding-efficiency step
    of a padded-batch training pipeline (the bucket-by-length batching
    fairseq/T5-style loaders use; `pack_sequences` is the
    concat-and-cut alternative for decoder-only training): documents
    land in fixed-width length BANDS (band = ⌊(n_tok−1)/band_width⌋ —
    pure integer arithmetic, no float-log band edges to disagree on),
    are ordered within a band by (n_tok desc, id), and cut into
    ``batch_size``-document batches — so each batch pads to its own
    max length, which band-local ordering keeps close to every
    member's length. Documents with zero tokens are excluded (nothing
    to batch; mirrored by the oracle).

    Plan: the per-band numbering runs through `grouped_row_number`'s
    quantile-bucket scheme — bands are LOW-cardinality (corpus length
    range / band_width), exactly the regime where a plain
    band-partitioned window would plan |bands| tasks on a
    1000-executor cluster; value-pure bucketing + the id tiebreak keep
    ranks deterministic. Everything else is codegen'd arithmetic.
    Returns (id, n_tok, band, batch_id) per kept document."""
    from fiat2_spark.operators.relational import grouped_row_number

    d = (
        df.filter(F.col(ntok_col) > 0)
        .select(F.col(id_col), F.col(ntok_col).cast("long").alias("__nt"))
        .withColumn(
            "band",
            F.floor((F.col("__nt") - 1) / F.lit(float(band_width))).cast("long"),
        )
    )
    rn = grouped_row_number(
        d, ["band"], "__nt", id_name="__rn",
        descending=True, tiebreak=[F.col(id_col)],
    )
    return rn.select(
        F.col(id_col),
        F.col("__nt").alias(ntok_col),
        "band",
        F.floor((F.col("__rn") - 1) / F.lit(float(batch_size)))
        .cast("long")
        .alias("batch_id"),
    )


# --- DoReMi domain reweighting (Xie et al. 2023, arXiv:2305.10429) ---


def token_transitions(df, id_col: str, text_col: str, tokenizer=tokens):
    """(doc, prev, w) adjacent-token pairs via arrays_zip over two
    shifted slices — the all-native form `lm_perplexity` uses (HOF
    lambdas would run interpreted per element)."""
    t = tokenizer(F.col(text_col))
    n = F.size(t)
    pairs = F.when(n >= 2, F.arrays_zip(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1)))
    return df.select(
        F.col(id_col).alias("doc"), F.explode(pairs).alias("p")
    ).select("doc", F.col("p")["0"].alias("prev"), F.col("p")["1"].alias("w"))


def doremi_weights(
    pool, ref, id_col: str, text_col: str, domain_col: str,
    vocab_size: int = 1024, quant: int = 10_000,
    alpha_num: int = 2, alpha_den: int = 5,
    eta_num: int = 1, eta_den: int = 1,
    smooth_num: int = 1, smooth_den: int = 100,
    escale: int = 10**9, tokenizer=tokens,
):
    """DoReMi domain reweighting (Xie et al. 2023, arXiv:2305.10429):
    one Group-DRO multiplicative-weights step over the pool's domains.
    Per-domain EXCESS LOSS is what the stronger reference-fit model
    still improves over a context-free baseline — here instantiated
    with the repo's LM pair: proxy = add-1 unigram, reference = bigram
    with stupid backoff (both fit on ``ref``, `lm_perplexity`'s exact
    construction and constants):

        exc(prev,w) = max(0, q_uni(w) − q_bi(prev,w))      [exact BIGINT]
        λq_k = round(Σ_k exc / Σ_k 1)        [quant-units/transition]
        e_k  = round(exp(η·(λq_k − max λq)/quant) · escale) [≤ escale]
        α_k  = (1−c) · e_k / Σ e  +  c / K,   rounded to 6 dp

    The max-shift before the exp is softmax stabilization: it cancels
    in the normalization but bounds e_k ≤ escale, so the exact-integer
    normalizing sum can never overflow BIGINT however large the excess
    loss grows (un-shifted, λ > ~22.9 nats would).

    Engine-parity discipline: every per-token quantity is an integer
    (q_uni/q_bi are the usual round(-ln(exact-int ratio)·quant)); the
    per-domain exp runs ONCE per domain on an exact-integer-ratio
    argument and is immediately quantized to e_k, so the normalizing
    sum Σ e is exact integer arithmetic — no float summation-order
    hazard between engines. Domains with no scorable transition get
    λ = 0 (so e = round(exp(-λ_max/quant)·escale), the minimum of the
    softmax; e = escale only when λ_max = 0), never NULL.

    Scale: LM tables are MODEL-sized broadcasts (≤V+1 unigrams,
    vocab-closed bigrams); the pool is touched by ONE transition
    explode + two broadcast probes + a per-domain partial agg (K rows,
    K = #domains); everything after is K-row arithmetic. No corpus
    shuffle, no window. Returns
    (domain, n_docs, n_trans, excess_q, weight).

    NOTE (ADVICE r12): the K-row stats checkpoint below makes this
    function EAGER — the full pool pass runs at call time, not at the
    first action — and its blocks are untracked (batch contract: the
    session owner's `release_checkpoint_blocks` sweep reclaims them).
    A live-index caller, for whom the global sweep is unsafe, should
    use `doremi_weights_trajectory(rounds=1, track=...)`, whose hook
    exposes every loop block."""
    # materialize the K-row domain stats ONCE (r12): three consumers
    # read `per` — the λ_max aggregate, the normalizing-sum aggregate,
    # and the final select — and each un-materialized reference re-ran
    # the ENTIRE corpus pass (pool transition explode + broadcast
    # probes + per-domain agg; only the ref-side fit inside
    # _doremi_domain_stats was checkpointed). Blocks, not a
    # CacheManager pin — the batch block contract.
    per = _doremi_domain_stats(
        pool, ref, id_col, text_col, domain_col,
        vocab_size, quant, alpha_num, alpha_den, tokenizer=tokenizer,
    ).localCheckpoint()
    # λ quantized to integer quant-units per transition, then softmax-
    # stabilized by the max BEFORE the exp: e_k = round(exp(η·(λ_k −
    # λ_max))·escale) ≤ escale, so e never overflows BIGINT no matter
    # how large the excess loss grows (un-shifted, λ > ~22.9 nats
    # would); the shift cancels in the normalization, and both the
    # oracle and the Python model mirror the identical quantize+shift.
    # K-row arithmetic over the checkpointed stats: the 1-row λ_max and
    # normalizing aggregates ride a constant-partition window instead
    # of separate agg+crossJoin(broadcast) subtrees (r12) — one stage,
    # no per-aggregate broadcast job; the constant partition key keeps
    # the window declared-partitioned (the token_budget_select idiom),
    # and every sum/max/count is exact integer arithmetic, so the
    # weight formula is bit-identical.
    wk = Window.partitionBy(F.lit(0))
    per = per.withColumn("lam_max", F.max("lamq").over(wk)).withColumn(
        "e",
        F.round(
            F.exp(
                ((F.col("lamq") - F.col("lam_max")) * eta_num).cast("double")
                / F.lit(float(quant * eta_den))
            )
            * escale
        ).cast("long"),
    )
    return (
        per.withColumn("e_sum", F.sum("e").over(wk))
        .withColumn("k_dom", F.count(F.lit(1)).over(wk))
        .select(
            "domain", "n_docs", "n_trans", "excess_q",
            F.round(
                (F.col("e") * (smooth_den - smooth_num)).cast("double")
                / (F.col("e_sum") * smooth_den).cast("double")
                + F.lit(smooth_num).cast("double")
                / (F.col("k_dom") * smooth_den).cast("double"),
                6,
            ).alias("weight"),
        )
    )


def _doremi_domain_stats(
    pool, ref, id_col: str, text_col: str, domain_col: str,
    vocab_size: int = 1024, quant: int = 10_000,
    alpha_num: int = 2, alpha_den: int = 5, tokenizer=tokens,
):
    """The shared DoReMi corpus pass: per-domain excess-loss statistics
    (domain, n_docs, n_trans, excess_q, lamq) with lamq the quantized
    integer mean excess per transition (0 for domains with no scorable
    transition, never NULL). The LM pair is `lm_perplexity`'s exact
    construction (add-1 unigram baseline vs vocab-closed bigram with
    stupid backoff, both fit on ``ref``); the pool contributes ONE
    transition explode with the domain riding the explode itself —
    no corpus-keyed join back. `doremi_weights` (one step) and
    `doremi_weights_trajectory` (Algorithm 1's T rounds) both start
    here, so the expensive pass is defined once."""
    spark = pool.sparkSession

    # fit on ref — lm_perplexity's construction (one unigram pass
    # feeds vocab/c1/N; bigrams vocab-closed)
    ref_uni = ref.select(
        F.col(id_col).alias("doc"), F.explode(tokenizer(F.col(text_col))).alias("w")
    ).localCheckpoint()
    vocab = (
        ref_uni.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w").limit(vocab_size)
        .select("w").localCheckpoint()
    )
    tot = ref_uni.agg(F.count(F.lit(1)).alias("n_tot"))
    unk = "<unk>"
    c1 = (
        _vocab_mapped(ref_uni.select("w"), "w", vocab, unk)
        .groupBy("w").agg(F.count(F.lit(1)).alias("n1"))
    )
    c2 = (
        _vocab_mapped(
            _vocab_mapped(
                token_transitions(ref, id_col, text_col, tokenizer),
                "prev", vocab, unk,
            ),
            "w", vocab, unk,
        )
        .groupBy("prev", "w").agg(F.count(F.lit(1)).alias("n2"))
    )
    q2 = c2.join(c1.select(F.col("w").alias("prev"), "n1"), "prev").select(
        "prev", "w",
        F.round(-F.log(F.col("n2").cast("double") / F.col("n1")) * quant)
        .cast("long").alias("q_bi"),
    )
    # per-word table carrying BOTH the context-free baseline q_uni
    # (add-1, no backoff penalty) and the unseen-bigram backoff cost
    dom = vocab.unionByName(spark.createDataFrame([(unk,)], "w string"))
    add1 = (F.coalesce("n1", F.lit(0)) + 1).cast("double")
    denom = (F.col("n_tot") + vocab_size + 1).cast("double")
    qw = (
        dom.join(c1, "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            F.round(-F.log(add1 / denom) * quant).cast("long").alias("q_uni"),
            F.round(-F.log(add1 * alpha_num / (denom * alpha_den)) * quant)
            .cast("long").alias("q_bo"),
        )
    )
    # score pool transitions: excess = max(0, baseline − reference).
    # The domain rides the explode itself — no corpus-keyed join back
    # to the pool (the one shuffle a doc-keyed formulation would add).
    t = tokenizer(F.col(text_col))
    n = F.size(t)
    pairs = F.when(n >= 2, F.arrays_zip(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1)))
    pt = _vocab_mapped(
        _vocab_mapped(
            pool.select(
                F.col(domain_col).alias("domain"), F.explode(pairs).alias("p")
            ).select("domain", F.col("p")["0"].alias("prev"), F.col("p")["1"].alias("w")),
            "prev", vocab, unk,
        ),
        "w", vocab, unk,
    )
    exc = (
        pt.join(F.broadcast(q2), ["prev", "w"], "left")
        .join(F.broadcast(qw), "w")
        .select(
            "domain",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("q_uni") - F.coalesce("q_bi", "q_bo"),
            ).alias("exc"),
        )
        .groupBy("domain")
        .agg(F.sum("exc").alias("excess_q"), F.count(F.lit(1)).alias("n_trans"))
    )
    # every pool domain appears even with zero scorable transitions
    domains = pool.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    per = domains.join(exc, "domain", "left").select(
        "domain", "n_docs",
        F.coalesce("n_trans", F.lit(0)).cast("long").alias("n_trans"),
        F.coalesce("excess_q", F.lit(0)).cast("long").alias("excess_q"),
    )
    # λ quantized to integer quant-units per transition — 0, never
    # NULL, for domains with no scorable transition
    lamq = F.when(
        F.col("n_trans") > 0,
        F.round(F.col("excess_q") / F.col("n_trans").cast("double")).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return per.withColumn("lamq", lamq)


def doremi_weights_trajectory(
    pool, ref, id_col: str, text_col: str, domain_col: str,
    rounds: int = 5,
    vocab_size: int = 1024, quant: int = 10_000,
    alpha_num: int = 2, alpha_den: int = 5,
    eta_num: int = 1, eta_den: int = 1,
    smooth_num: int = 1, smooth_den: int = 100,
    escale: int = 10**6, ascale: int = 10**9,
    tokenizer=tokens, track=None,
):
    """Multi-round DoReMi (Xie et al. 2023 Algorithm 1): iterate the
    Group-DRO multiplicative-weights update T times and return the
    TRAJECTORY-AVERAGED mixture ᾱ = (1/T)·Σ_t α_t — the paper's actual
    output (a single step is `doremi_weights`; averaging over the
    trajectory is what damps the oscillation of exponentiated-gradient
    updates). With this instantiation's STATIC per-domain excess loss
    (the proxy/reference LM pair is fixed, not retrained per round),
    round t's pre-smoothing mass compounds as α_{t-1}·exp(η·λ) — but
    the per-round smoothing re-mixes toward uniform, so the trajectory
    is a genuine iteration, not a closed form.

    Integer discipline (the engine/oracle parity contract): α is
    fixed-point in units of 1/ascale (a_k ≤ ascale always, since the
    update is a convex combination scaled by ascale), the
    multiplicative factor e_k = round(exp(η·(λ_k−λ_max)/quant)·escale)
    ≤ escale = 10⁶ is quantized ONCE (λ static → e static), so the
    per-round mass m_k = a_k·e_k ≤ 10¹⁵ and Σm ≤ K·10¹⁵ stay exact
    BIGINTs; the only floats are one division pair per round with a
    pinned evaluation order ((m·w1)/Σm + w2/(K·sd)) that Spark and
    DuckDB both execute as written, immediately re-quantized to a_k.
    smooth_den must divide ascale·(smooth_den−smooth_num) and
    ascale·smooth_num so w1/w2 are exact integer literals (asserted;
    the defaults give w1 = 99·10⁷, w2 = 10⁹).

    Scale: the corpus pass (`_doremi_domain_stats`) is shared and runs
    ONCE; each round is a K-row job (sum + crossJoin + arithmetic),
    localCheckpoint-truncated so the T-round lineage stays flat.
    Returns (domain, n_docs, n_trans, excess_q, weight), Σ weight ≈ 1.

    ``track``: optional list receiving the loop checkpoints' block ids
    (domain-stats + initial state + stride-4 interior + final, so
    3 + ⌊(rounds−1)/4⌋ checkpoints) for targeted release — the
    live-index contract
    `bpe_learn_from_words`/`_nb_bucketed` follow (ADVICE r10); None is
    the batch contract (blocks belong to the returned result, session
    owner's sweep reclaims them)."""
    w1, r1 = divmod(ascale * (smooth_den - smooth_num), smooth_den)
    w2 = ascale * smooth_num
    assert r1 == 0, "smooth_den must divide ascale*(smooth_den-smooth_num)"

    def ckpt(df):
        if track is None:
            return df.localCheckpoint()
        from fiat2_spark.session import local_checkpoint_tracked

        out, blocks = local_checkpoint_tracked(df)
        track.extend(blocks)
        return out

    # materialize the K-row domain stats ONCE (r12, as in
    # doremi_weights): λ_max, k_dom, and the round-0 state would
    # otherwise each re-run the corpus pass. Tracked blocks when a
    # live-index caller asks (the ckpt helper), batch contract
    # otherwise.
    per = ckpt(_doremi_domain_stats(
        pool, ref, id_col, text_col, domain_col,
        vocab_size, quant, alpha_num, alpha_den, tokenizer=tokenizer,
    ))
    # constant-partition window over the K-row checkpoint, as in
    # doremi_weights (r12): λ_max and k_dom in the same stage as the
    # state projection, no per-aggregate broadcast jobs
    wk = Window.partitionBy(F.lit(0))
    cur = (
        per.withColumn("lam_max", F.max("lamq").over(wk))
        .withColumn("k_dom", F.count(F.lit(1)).over(wk))
        .withColumn(
            "e",
            F.round(
                F.exp(
                    ((F.col("lamq") - F.col("lam_max")) * eta_num).cast("double")
                    / F.lit(float(quant * eta_den))
                )
                * escale
            ).cast("long"),
        )
        .withColumn(
            "a",
            F.round(F.lit(float(ascale)) / F.col("k_dom")).cast("long"),
        )
        .withColumn("asum", F.lit(0).cast("long"))
    )
    cur = ckpt(cur)
    for _t in range(rounds):
        # per-round Σm as the same constant-partition window (r12):
        # each round's checkpoint is ONE K-row stage instead of an
        # agg job + broadcast + crossJoin per round; the exact-BIGINT
        # sum and the pinned float evaluation order are unchanged
        cur = cur.withColumn("m", F.col("a") * F.col("e")).withColumn(
            "m_sum", F.sum("m").over(wk)
        )
        a_new = F.round(
            F.col("m").cast("double")
            * F.lit(float(w1))
            / F.col("m_sum").cast("double")
            + F.lit(float(w2))
            / (F.col("k_dom") * F.lit(smooth_den)).cast("double")
        ).cast("long")
        cur = (
            cur.withColumn("a", a_new)
            .withColumn("asum", F.col("asum") + F.col("a"))
            .drop("m", "m_sum")
        )
        # checkpoint-stride 4 (the bpe_learn checkpoint_every idiom,
        # r12): each deferred round is one K-row window projection —
        # re-planning ≤ 3 of them is cheaper than a materialization JOB
        # per round, while lineage stays bounded for any T
        if (_t + 1) % 4 == 0 and _t + 1 < rounds:
            cur = ckpt(cur)
    cur = ckpt(cur)
    return cur.select(
        "domain", "n_docs", "n_trans", "excess_q",
        F.round(
            F.col("asum").cast("double") / F.lit(float(rounds * ascale)), 6
        ).alias("weight"),
    )


# --- BPE merge learning (Sennrich et al. 2016, arXiv:1508.07909) ---

# Per-symbol wrappers: every symbol is stored as \x01<sym>\x02 inside a
# word's symbol string, so a merge is ONE non-regex string replace of
# \x01l\x02\x01r\x02 with \x01lr\x02 — left-to-right non-overlapping in
# Spark (java.lang.String.replace), DuckDB (replace), and Python
# (str.replace) alike, which is exactly BPE's within-word merge rule.
# Tokens are [a-z0-9]+ (or \p{L}\p{N}+ under `tokens_unicode`) by the
# tokenizer contract — never control chars or '<'/'/'/'>' — so the
# wrappers and the '</w>' end marker can never collide with symbol text.
BPE_LB = "\x01"
BPE_RB = "\x02"
BPE_EOW = "</w>"


def bpe_symbolize(word: Column) -> Column:
    """Initial BPE symbol string for a word: each character wrapped as
    an individual symbol, plus the end-of-word marker symbol."""
    return F.concat(
        F.regexp_replace(word, "(.)", BPE_LB + "$1" + BPE_RB),
        F.lit(BPE_LB + BPE_EOW + BPE_RB),
    )


def bpe_symbols(wrapped: Column) -> Column:
    """Symbol array from a wrapped symbol string (inverse of the
    wrapping, native split/filter/substring — no UDF)."""
    return F.transform(
        F.filter(F.split(wrapped, BPE_RB), lambda x: x != ""),
        lambda x: F.substring(x, F.lit(2), F.length(x)),
    )


def bpe_word_table(df, text_col: str, tokenizer=tokens):
    """(word, wrapped, freq): the word-frequency relation BPE learning
    runs on. One tokenize+explode pass over the corpus, then a
    vocab-sized groupBy — every subsequent merge iteration touches ONLY
    this model-sized relation, never the corpus again (the property
    that makes distributed BPE tractable at 100 TB: the corpus
    contributes one aggregation pass, the merge loop is
    vocabulary-work). The raw ``word`` rides along (r12) so a
    same-corpus encode can reuse the learner's fully-merged vocabulary
    directly (`bpe_encode`/`bpe_encode_ids` ``words=``) instead of
    re-deriving it with a second corpus-distinct pass + merge replay.
    ``tokenizer``: `tokens` (ASCII default) or `tokens_unicode`."""
    return (
        df.select(F.explode(tokenizer(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("word", bpe_symbolize(F.col("word")).alias("wrapped"), "freq")
    )


def bpe_pair_stats(words):
    """(lhs, rhs, freq): adjacent-symbol pair counts over a
    (wrapped, freq) word table, weighted by word frequency — one
    explode + partial agg over the vocab-sized relation."""
    syms = bpe_symbols(F.col("wrapped"))
    n = F.size(syms)
    pairs = F.when(
        n >= 2, F.arrays_zip(F.slice(syms, 1, n - 1), F.slice(syms, 2, n - 1))
    )
    return (
        words.select("freq", F.explode(pairs).alias("p"))
        .select(
            F.col("p")["0"].alias("lhs"), F.col("p")["1"].alias("rhs"), "freq"
        )
        .groupBy("lhs", "rhs")
        .agg(F.sum("freq").alias("freq"))
    )


def bpe_pair_counts(df, text_col: str, top_k: int = 32, tokenizer=tokens):
    """Top-k first-iteration BPE pair counts over a corpus (count
    desc, then lexicographic — the deterministic tie-break
    `bpe_learn` merges by). TakeOrderedAndProject over the vocab-sized
    pair relation."""
    return (
        bpe_pair_stats(bpe_word_table(df, text_col, tokenizer))
        .orderBy(F.desc("freq"), "lhs", "rhs")
        .limit(top_k)
    )


#: Driver-side merge-loop threshold (r13): when the materialized word
#: table holds at most this many rows, `bpe_learn_from_words` collects
#: it once and runs the merge loop in plain Python — zero Spark jobs
#: per merge instead of one vocab-relation argmax job each (the
#: sub-`FOLD_COLLECT_LIMIT` driver-materialization idiom of
#: plans/compile.py, sized far smaller because the loop re-walks every
#: row per merge). 65,536 rows × ~100 B ≈ 7 MB on the driver; a real
#: heavy-tailed corpus vocabulary (~1e8 rows at 100 TB under Heaps'
#: law) stays on the distributed loop below. The Python loop mirrors
#: the distributed one operation for operation (same wrapped-symbol
#: strings, same left-to-right non-overlapping `str.replace`, same
#: (freq desc, lhs, rhs) argmax — Python code-point string order ==
#: UTF8String byte order), so the two paths are bit-identical;
#: `test_bpe_learn_driver_matches_distributed` pins it.
BPE_DRIVER_VOCAB_LIMIT = 65_536


def _bpe_learn_driver(spark, schema, rows, n_merges: int):
    """The Sennrich merge loop on a DRIVER-COLLECTED word table (rows
    of `schema`, which must carry `wrapped` and `freq`): pair counts,
    (freq desc, lhs, rhs) argmax, left-to-right non-overlapping
    replace — the exact operations the distributed loop runs, on the
    same wrapped-symbol strings. Returns (words_df, merges_df) with
    the final vocabulary as a LocalRelation (driver-local rows need no
    checkpoint: re-planning them re-scans nothing)."""
    names = schema.fieldNames()
    wi, fi = names.index("wrapped"), names.index("freq")
    wrapped = [r[wi] for r in rows]
    freqs = [r[fi] for r in rows]
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, f in zip(wrapped, freqs):
            syms = [p[1:] for p in w.split(BPE_RB) if p]
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + f
        if not pc:
            break
        (lhs, rhs), freq = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, lhs, rhs, freq))
        pattern = BPE_LB + lhs + BPE_RB + BPE_LB + rhs + BPE_RB
        repl = BPE_LB + lhs + rhs + BPE_RB
        wrapped = [w.replace(pattern, repl) for w in wrapped]
    out = [
        tuple(r)[:wi] + (w,) + tuple(r)[wi + 1:]
        for r, w in zip(rows, wrapped)
    ]
    wdf = spark.createDataFrame(out, schema)
    mdf = spark.createDataFrame(
        merges, "step int, lhs string, rhs string, freq bigint"
    )
    return wdf, mdf


def bpe_learn_from_words(words, n_merges: int, checkpoint_every: int = 8,
                         track=None):
    """The BPE merge loop over an EXISTING (wrapped, freq) word table
    (Sennrich et al. 2016 `learn_bpe`): repeatedly take the highest-
    frequency adjacent symbol pair (ties: lexicographic on (lhs, rhs))
    and merge it everywhere, left-to-right non-overlapping within each
    word. Shared by `bpe_learn` (one corpus aggregation feeds it) and
    the streaming `BpeVocabCorpus.learn` (the maintained word-count
    state feeds it), so batch/stream merge lists agree structurally.

    Iterative by nature (each argmax depends on the previous rewrite),
    so the loop runs on the driver — and when the materialized word
    table is at most `BPE_DRIVER_VOCAB_LIMIT` rows the DATA does too:
    one bounded collect of the checkpointed vocabulary, then the whole
    loop in Python with zero Spark jobs per merge (r13; bit-identical
    by construction, see `_bpe_learn_driver`). Above the limit every
    iteration's job touches only the VOCAB-sized relation: a pair
    count + a 1-row TakeOrdered + a string replace. Lineage is
    truncated with a localCheckpoint
    every ``checkpoint_every`` merges rather than every merge: each
    deferred step is ONE codegen'd string replace on a vocab-sized
    relation (re-running ≤ checkpoint_every−1 of them inside the next
    argmax job is cheap), while an eager checkpoint is a full
    materialization JOB per merge — at a real tokenizer's ~30k merges
    the per-merge checkpoint dominates the loop, and lineage must
    still be bounded, hence the stride.

    ``track``: optional list receiving every loop checkpoint's block
    ids — a live-index caller (`BpeVocabCorpus`), for whom the global
    sweep is unsafe, releases them once the merge list is extracted;
    None is the batch contract (session owner's sweep). Returns
    (words, merges) where merges is [(step, lhs, rhs, freq)] and words
    is the final symbolized vocab (always checkpoint-materialized)."""
    spark = words.sparkSession

    def ckpt(df):
        if track is None:
            return df.localCheckpoint()
        from fiat2_spark.session import local_checkpoint_tracked

        out, blocks = local_checkpoint_tracked(df)
        track.extend(blocks)
        return out

    words = ckpt(words)
    if BPE_DRIVER_VOCAB_LIMIT > 0:
        # bounded size-probe-and-fetch in ONE job on the checkpoint
        # blocks: coalesce(1) keeps executeTake from its adaptive
        # multi-job partition scan, and the limit caps what the driver
        # can ever pull; ≤ limit rows returned ⇒ we hold the whole
        # vocabulary and the loop needs no further Spark jobs
        probe = words.coalesce(1).limit(BPE_DRIVER_VOCAB_LIMIT + 1).collect()
        if len(probe) <= BPE_DRIVER_VOCAB_LIMIT:
            return _bpe_learn_driver(spark, words.schema, probe, n_merges)
    merges: list[tuple[int, str, str, int]] = []
    pending = 0
    for step in range(1, n_merges + 1):
        top = (
            bpe_pair_stats(words)
            .orderBy(F.desc("freq"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, freq = top[0]["lhs"], top[0]["rhs"], top[0]["freq"]
        merges.append((step, lhs, rhs, freq))
        pattern = BPE_LB + lhs + BPE_RB + BPE_LB + rhs + BPE_RB
        repl = BPE_LB + lhs + rhs + BPE_RB
        words = words.withColumn(
            "wrapped", F.replace(F.col("wrapped"), F.lit(pattern), F.lit(repl))
        )
        pending += 1
        if pending >= checkpoint_every:
            words = ckpt(words)
            pending = 0
    if pending:
        words = ckpt(words)
    mdf = spark.createDataFrame(
        merges, "step int, lhs string, rhs string, freq bigint"
    )
    return words, mdf


def bpe_learn(df, text_col: str, n_merges: int, checkpoint_every: int = 8,
              tokenizer=tokens):
    """Learn ``n_merges`` BPE merges over a corpus: ONE corpus
    aggregation (`bpe_word_table`) feeding the vocab-sized merge loop
    (`bpe_learn_from_words` — see it for the iteration/checkpoint
    discipline). Returns (words, merges)."""
    return bpe_learn_from_words(
        bpe_word_table(df, text_col, tokenizer), n_merges, checkpoint_every
    )


def bpe_encode(df, id_col: str, text_col: str, merges: list[tuple[str, str]],
               tokenizer=tokens, words=None):
    """Apply learned BPE merges to a corpus (Sennrich et al. 2016
    `apply_bpe`): each word's symbol string gets every merge's replace
    IN LEARNED ORDER — one chained codegen'd projection of
    ``len(merges)`` non-regex replaces, the same left-to-right
    non-overlapping semantics the learner used. Returns
    (id, n_words, n_bpe_tokens) per document; documents with zero
    tokens are absent (nothing to encode — the inner join against the
    token stream is the contract, mirrored by the oracle).

    Scale: the merge chain runs on the DISTINCT word relation
    (vocab-sized), never per corpus token; the corpus contributes one
    tokenize+explode pass that probes the encoded vocab and
    partial-aggregates per document. The vocab probe is deliberately
    UN-hinted: a natural-language vocab is heavy-tailed (can reach
    1e8 rows on a 100 TB corpus — past any broadcast budget), so AQE
    sizes the join at runtime — broadcast when the vocab is small,
    word-co-partitioned hash join when it isn't. Encoding cost is
    O(corpus tokens) joins + O(vocab · merges) string work.

    ``words``: the learner's final (word, wrapped, …) vocabulary
    relation (`bpe_learn`'s first return — fully merged AND
    checkpoint-materialized). Pass it when encoding the SAME corpus
    (same tokenizer) the merges were learned on: the encoded vocab is
    then a pure projection of those blocks, and the second corpus-wide
    distinct pass + merge-chain replay disappear (r12). With a
    different corpus (or tokenizer) leave it None — the vocab probe is
    an INNER join on word, so a ``words`` table that does not cover
    the corpus silently drops every unseen word's tokens from the
    counts (ADVICE r12) rather than failing; only the replay path can
    encode unseen words."""
    if words is not None:
        toks_per_word = words.select(
            "word", F.size(bpe_symbols(F.col("wrapped"))).alias("n_sym")
        )
    else:
        wrapped = bpe_symbolize(F.col("word"))
        for lhs, rhs in merges:
            wrapped = F.replace(
                wrapped,
                F.lit(BPE_LB + lhs + BPE_RB + BPE_LB + rhs + BPE_RB),
                F.lit(BPE_LB + lhs + rhs + BPE_RB),
            )
        toks_per_word = (
            df.select(F.explode(tokenizer(F.col(text_col))).alias("word"))
            .distinct()
            .select("word", F.size(bpe_symbols(wrapped)).alias("n_sym"))
        )
    return (
        df.select(F.col(id_col), F.explode(tokenizer(F.col(text_col))).alias("word"))
        .join(toks_per_word, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
    )


def bpe_encode_ids(df, id_col: str, text_col: str, merges: list[tuple[str, str]],
                   tokenizer=tokens, words=None):
    """ORDER-PRESERVING BPE encode — the real tokenize endpoint
    (Sennrich et al. 2016 `apply_bpe` emitting input_ids, not counts):
    every document becomes its token-ID SEQUENCE (id, pos, token_id)
    with pos the 1-based position in the document's BPE token stream,
    ready to feed `pack_sequences`-style context packing. Reference
    analog: the §2.2/§2.7 ordered proj surface (Interpret.v:467-490).

    Construction (everything model-sized except two corpus explodes):

    1. the merge chain — one codegen'd projection of ``len(merges)``
       non-regex replaces — runs on the DISTINCT word relation, giving
       each word its encoded symbol ARRAY (`bpe_symbols`); the relation
       is localCheckpointed because it feeds both the vocab and the
       probe (batch block contract);
    2. token ids are dense ranks over the DISTINCT encoded symbols in
       lexicographic order — a row_number over the MODEL-sized symbol
       set (single-partition by construction and intent: a tokenizer
       vocab is ≤ ~1e5 rows at any corpus scale), broadcast to the
       stream;
    3. the corpus contributes one posexplode to (doc, word_idx, word),
       an AQE-sized join against the word→symbols relation (broadcast
       when the vocab fits, word-co-partitioned hash join when a
       100 TB heavy-tail vocab doesn't — deliberately un-hinted, same
       rationale as `bpe_encode`), then a second posexplode to symbol
       granularity;
    4. positions are ARITHMETIC, not a symbol-level ranking: a
       doc-partitioned running sum of per-word symbol counts over the
       WORD stream gives each word its exclusive in-doc prefix, and
       pos = prefix + sym_idx + 1 — the only window runs on the
       ~5×-smaller word relation, and nothing ever ranks the full
       symbol stream (millions of tiny doc partitions either way; no
       global window touches the corpus).

    Documents with zero tokens are absent (nothing to encode — the
    `bpe_encode` contract, mirrored by the oracle).

    ``words``: same-corpus vocabulary reuse as in `bpe_encode` — the
    learner's checkpoint-materialized final vocab replaces the
    distinct pass + merge replay + the extra checkpoint job (r12)."""
    from pyspark.sql import Window as W

    if words is not None:
        # pure projection of the learner's checkpoint blocks — no
        # corpus pass, no replay, and no second materialization job
        enc = words.select("word", bpe_symbols(F.col("wrapped")).alias("syms"))
    else:
        wrapped = bpe_symbolize(F.col("word"))
        for lhs, rhs in merges:
            wrapped = F.replace(
                wrapped,
                F.lit(BPE_LB + lhs + BPE_RB + BPE_LB + rhs + BPE_RB),
                F.lit(BPE_LB + lhs + rhs + BPE_RB),
            )
        enc = (
            df.select(F.explode(tokenizer(F.col(text_col))).alias("word"))
            .distinct()
            .select("word", bpe_symbols(wrapped).alias("syms"))
            .localCheckpoint()
        )
    vocab_ids = (
        enc.select(F.explode("syms").alias("sym"))
        .distinct()
        .withColumn(
            "token_id",
            F.row_number().over(W.orderBy("sym")).cast("long"),
        )
    )
    dt = df.select(
        F.col(id_col),
        F.posexplode(tokenizer(F.col(text_col))).alias("word_idx", "word"),
    )
    w = W.partitionBy(id_col).orderBy("word_idx")
    dw = (
        dt.join(enc, "word")
        .withColumn("__nsym", F.size("syms").cast("long"))
        .withColumn("__wpre", F.sum("__nsym").over(w) - F.col("__nsym"))
    )
    ds = dw.select(
        id_col, "__wpre", F.posexplode("syms").alias("sym_idx", "sym")
    )
    return (
        ds.join(F.broadcast(vocab_ids), "sym")
        .select(
            F.col(id_col),
            (F.col("__wpre") + F.col("sym_idx") + 1).cast("long").alias("pos"),
            "token_id",
        )
    )
