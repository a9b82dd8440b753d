"""Text-analysis functions for training-data pipelines (task brief:
language-ID, quality scoring, token counting, document fingerprinting).

All pure Spark built-ins (JVM codegen) with DuckDB-SQL parity renderings
so each ships with a driver oracle. Reference precedent for this layer:
the reference's license classifier / length predicates / section maps
(/root/reference/src/utility_scripts/calc_stats.py:56-87,
ml_tasks_prep_data.py:226-276).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Tiny per-language stopword marker sets — an n-gram/stopword heuristic.
# Deliberately deterministic + portable: language = argmax stopword hits.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "und", "die", "ist"],
    "fr": ["le", "et", "les", "est"],
    "es": ["el", "y", "los", "es"],
    "zh": ["的", "是", "了", "在"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (empty strings dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def token_count_sql(expr: str) -> str:
    return (
        f"len(list_filter(string_split_regex(trim({expr}), '\\s+'), "
        "t -> t != ''))"
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish subword proxy: count of word/number/punct chunks.

    A real tokenizer isn't in this container; this regex chunking
    (letters runs, digit runs, single punctuation) is the standard cheap
    proxy and is fully JVM-side.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0)
    )


def quality_score(col: Column | str) -> Column:
    """Heuristic quality score in [0,1]: mean of
    - length score: min(1, chars/200)    (length predicate analog,
      /root/reference/src/utility_scripts/ml_tasks_prep_data.py:274-276)
    - alpha ratio: letters / chars
    - non-punct ratio: 1 - punct/chars
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    letters = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(
        F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", "")
    ).cast("double")
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (
            F.least(F.lit(1.0), n / F.lit(200.0))
            + letters / n
            + (F.lit(1.0) - punct / n)
        )
        / F.lit(3.0)
    )


def quality_score_sql(expr: str) -> str:
    n = f"CAST(length({expr}) AS DOUBLE)"
    letters = f"CAST(length(regexp_replace({expr}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
    punct = (
        f"CAST(length(regexp_replace({expr}, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)"
    )
    return (
        f"CASE WHEN {n} = 0 THEN 0.0 ELSE "
        f"(least(1.0, {n}/200.0) + {letters}/{n} + (1.0 - {punct}/{n})) / 3.0 END"
    )


def lang_id(col: Column | str) -> Column:
    """Stopword-marker language ID: argmax hit count, tie → 'und'→first
    alphabetically among winners; zero hits → 'und'."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.lower(c))

    # factory keeps HOF lambdas single-parameter (a default-arg closure
    # would make PySpark pass the array index as the second argument)
    def lang_score(lang: str, markers: list[str]):
        hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
        return F.struct(
            (-hits).alias("neg"), F.lit(lang).alias("lang"), hits.alias("hits")
        )

    # argmin over (-hits, lang) structs — deterministic tie-break
    struct_scores = F.array(
        *[lang_score(lang, markers) for lang, markers in LANG_MARKERS.items()]
    )
    best = F.array_min(struct_scores)
    return F.when(best["hits"] <= 0, F.lit("und")).otherwise(best["lang"])


def lang_id_sql(expr: str) -> str:
    """DuckDB rendering of :func:`lang_id` (argmin over (-hits, lang))."""
    toks = f"list_filter(string_split_regex(trim(lower({expr})), '\\s+'), t -> t != '')"
    structs = []
    for lang, markers in LANG_MARKERS.items():
        inlist = ", ".join(f"'{m}'" for m in markers)
        hits = f"len(list_filter({toks}, t -> t IN ({inlist})))"
        structs.append(
            f"{{'neg': -{hits}, 'lang': '{lang}', 'hits': {hits}}}"
        )
    arr = "[" + ", ".join(structs) + "]"
    return (
        f"CASE WHEN list_min({arr}).hits <= 0 THEN 'und' "
        f"ELSE list_min({arr}).lang END"
    )


def fingerprint(col: Column | str, k: int = 8) -> Column:
    """Document fingerprint: md5-derived 60-bit hash of the k-gram set's
    min-hash — a cheap rolling-hash-style signature (winnowing-lite).

    Implemented as min over word 3-gram hashes — deterministic, portable.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.lower(c))
    n = F.size(toks)
    grams = F.when(n < 3, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ", toks[i], toks[i + 1], toks[i + 2]
            ),
        )
    )
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
    )
    return F.array_min(hashes)


def fingerprint_sql(expr: str) -> str:
    toks = f"list_filter(string_split_regex(trim(lower({expr})), '\\s+'), t -> t != '')"
    grams = (
        f"CASE WHEN len({toks}) < 3 THEN [array_to_string({toks}, ' ')] "
        f"ELSE [array_to_string({toks}[i:i+2], ' ') FOR i IN range(1, len({toks}) - 1)] END"
    )
    return (
        f"list_min(list_transform({grams}, "
        f"g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)))"
    )


# Built-in transliteration table for the common non-decomposable cases
# the reference's unidecode handles (Latin-extended letters with no NFD
# decomposition, Greek, Cyrillic) — applied AFTER the NFD strip, so
# accented Cyrillic/Greek (й → и → i) also lands on ASCII.
_TRANSLIT = {
    # Latin extended (no combining-mark decomposition)
    "ß": "ss", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "Th", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
    "ı": "i", "ŋ": "ng", "Ŋ": "NG", "ĸ": "k", "ƒ": "f",
    # Greek
    "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
    "η": "e", "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m",
    "ν": "n", "ξ": "x", "ο": "o", "π": "p", "ρ": "r", "σ": "s",
    "ς": "s", "τ": "t", "υ": "u", "φ": "ph", "χ": "kh", "ψ": "ps",
    "ω": "o",
    "Α": "A", "Β": "B", "Γ": "G", "Δ": "D", "Ε": "E", "Ζ": "Z",
    "Η": "E", "Θ": "Th", "Ι": "I", "Κ": "K", "Λ": "L", "Μ": "M",
    "Ν": "N", "Ξ": "X", "Ο": "O", "Π": "P", "Ρ": "R", "Σ": "S",
    "Τ": "T", "Υ": "U", "Φ": "Ph", "Χ": "Kh", "Ψ": "Ps", "Ω": "O",
    # Cyrillic
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ё": "e", "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k",
    "л": "l", "м": "m", "н": "n", "о": "o", "п": "p", "р": "r",
    "с": "s", "т": "t", "у": "u", "ф": "f", "х": "kh", "ц": "ts",
    "ч": "ch", "ш": "sh", "щ": "shch", "ъ": "", "ы": "y", "ь": "",
    "э": "e", "ю": "iu", "я": "ia",
    "А": "A", "Б": "B", "В": "V", "Г": "G", "Д": "D", "Е": "E",
    "Ё": "E", "Ж": "Zh", "З": "Z", "И": "I", "Й": "I", "К": "K",
    "Л": "L", "М": "M", "Н": "N", "О": "O", "П": "P", "Р": "R",
    "С": "S", "Т": "T", "У": "U", "Ф": "F", "Х": "Kh", "Ц": "Ts",
    "Ч": "Ch", "Ш": "Sh", "Щ": "Shch", "Ъ": "", "Ы": "Y", "Ь": "",
    "Э": "E", "Ю": "Iu", "Я": "Ia",
    # Arabic (isolated forms; hamza/ain → apostrophe like unidecode —
    # the resolve normalizer scrubs quotes from join keys anyway)
    "ا": "a", "ب": "b", "ت": "t", "ث": "th", "ج": "j", "ح": "h",
    "خ": "kh", "د": "d", "ذ": "dh", "ر": "r", "ز": "z", "س": "s",
    "ش": "sh", "ص": "s", "ض": "d", "ط": "t", "ظ": "z", "ع": "'",
    "غ": "gh", "ف": "f", "ق": "q", "ك": "k", "ل": "l", "م": "m",
    "ن": "n", "ه": "h", "و": "w", "ي": "y", "ء": "'", "آ": "a",
    "أ": "a", "إ": "i", "ؤ": "w", "ئ": "y", "ة": "h", "ى": "a",
    # Hebrew
    "א": "'", "ב": "b", "ג": "g", "ד": "d", "ה": "h", "ו": "v",
    "ז": "z", "ח": "kh", "ט": "t", "י": "y", "כ": "k", "ך": "k",
    "ל": "l", "מ": "m", "ם": "m", "נ": "n", "ן": "n", "ס": "s",
    "ע": "'", "פ": "p", "ף": "p", "צ": "ts", "ץ": "ts", "ק": "q",
    "ר": "r", "ש": "sh", "ת": "t",
    # Japanese long-vowel mark (per-char romaji below)
    "ー": "",
}

# Hiragana → romaji, per character (katakana maps onto hiragana by the
# fixed 0x60 code-point offset before lookup).  Per-char readings like
# unidecode's — context digraphs (きゃ → kya) come out as "kiya", which
# is what unidecode produces too.
_KANA = dict(
    zip(
        "あいうえおかきくけこさしすせそたちつてとなにぬねの"
        "はひふへほまみむめもやゆよらりるれろわをん"
        "がぎぐげござじずぜぞだぢづでどばびぶべぼぱぴぷぺぽ"
        "ゃゅょっぁぃぅぇぉ",
        (
            "a i u e o ka ki ku ke ko sa shi su se so ta chi tsu te to "
            "na ni nu ne no ha hi fu he ho ma mi mu me mo ya yu yo "
            "ra ri ru re ro wa wo n "
            "ga gi gu ge go za ji zu ze zo da ji zu de do "
            "ba bi bu be bo pa pi pu pe po "
            "ya yu yo tsu a i u e o"
        ).split(),
    )
)
_TRANSLIT.update(_KANA)
_TRANSLIT_TABLE = str.maketrans(_TRANSLIT)

# Hangul is ALGORITHMIC: every syllable U+AC00..U+D7A3 decomposes
# arithmetically into (lead, vowel, tail) jamo — no data table needed
# (the same revised-romanization decomposition unidecode ships).
_HANGUL_L = ("g kk n d tt r m b pp s ss - j jj ch k t p h").split()
_HANGUL_L[11] = ""  # ieung: silent lead
_HANGUL_V = (
    "a ae ya yae eo e yeo ye o wa wae oe yo u wo we wi yu eu ui i"
).split()
_HANGUL_T = (
    "- g kk gs n nj nh d l lg lm lb ls lt lp lh m b bs s ss ng j ch "
    "k t p h"
).split()
_HANGUL_T[0] = ""


@pandas_udf(StringType())
def transliterate(s: pd.Series) -> pd.Series:
    """Transliteration (P16 unidecode analog,
    /root/reference/src/match_references_openalex.py:214-227): NFD
    decompose, drop combining marks, then map
    Latin-extended/Greek/Cyrillic/Arabic/Hebrew/kana letters to ASCII
    via a built-in table, and Hangul syllables via the arithmetic jamo
    decomposition (the reference uses the unidecode package; this
    covers its behavior for the scripts that appear in bibliographic
    join keys — Han/CJK ideographs need unidecode's per-character
    reading database and pass through unchanged, documented as out of
    scope in COVERAGE.md). Arrow-batched pandas UDF — the one transform
    with no JVM built-in equivalent."""
    import unicodedata

    def strip(x):
        if x is None:
            return None
        # NFC FIRST: a blanket NFD would tear voiced kana (が → か +
        # U+3099) and Hangul syllables (김 → conjoining jamo) apart
        # before the table/arithmetic paths can see them; accents on
        # Latin/Greek/Cyrillic are instead decomposed PER CHARACTER
        # below, only for characters the table doesn't already map.
        out = []
        for ch in unicodedata.normalize("NFC", x):
            o = ord(ch)
            if 0x30A1 <= o <= 0x30F6:  # katakana → hiragana row
                ch = chr(o - 0x60)
            elif 0xAC00 <= o <= 0xD7A3:  # Hangul syllable → jamo romaja
                i = o - 0xAC00
                out.append(
                    _HANGUL_L[i // 588]
                    + _HANGUL_V[(i % 588) // 28]
                    + _HANGUL_T[i % 28]
                )
                continue
            if ch in _TRANSLIT:
                out.append(_TRANSLIT[ch])
                continue
            for sub in unicodedata.normalize("NFD", ch):
                if not unicodedata.combining(sub):
                    out.append(_TRANSLIT.get(sub, sub))
        return "".join(out)

    return s.map(strip)


@pandas_udf(StringType())
def decode_text(b: pd.Series) -> pd.Series:
    """Charset-sniffing decode (S3 analog,
    /root/reference/src/normalize_arxiv_dump.py:59-92): UTF-8 first,
    latin-1 fallback — binary → string, Arrow-batched."""

    def dec(x):
        if x is None:
            return None
        try:
            return bytes(x).decode("utf-8")
        except UnicodeDecodeError:
            return bytes(x).decode("latin-1", errors="replace")

    return b.map(dec)


def canonicalize_markers(col: Column | str) -> Column:
    """Normalize marker syntax variants to canonical ``conv:<id>`` —
    the natbib/bibitem rewrite analog (P3/P4,
    /root/reference/src/normalize_arxiv_dump.py:33-40): chained
    ``regexp_replace``, JVM-side.

    Variants: ``conv://<id>``, ``[[conv:<id>]]``, ``CONV:<id>``.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(
        c, r"\[\[conv:([A-Za-z0-9_-]+)\]\]", r"conv:$1"
    )
    out = F.regexp_replace(out, r"conv://([A-Za-z0-9_-]+)", r"conv:$1")
    out = F.regexp_replace(out, r"CONV:([A-Za-z0-9_-]+)", r"conv:$1")
    return out


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles (for MinHash / Jaccard dedup)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.lower(c))
    n = F.size(toks)
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(
                    " ", *[toks[i + j] for j in range(k)]
                ),
            )
        )
    )


# ---------------------------------------------------------------------
# PII scrubbing (training-data pipeline stage; pattern parity with the
# reference's regex-normalization idiom, normalize_arxiv_dump.py:33-40)
# ---------------------------------------------------------------------

# Deliberately RE2-safe (no backrefs/lookarounds) so the Java and DuckDB
# engines match the exact same spans.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9][0-9\-]{6,}[0-9]"


def pii_counts(col: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    n_mail = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0))
    n_phone = F.size(
        F.regexp_extract_all(
            F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>"),
            F.lit(PII_PHONE_RE),
            0,
        )
    )
    return n_mail, n_phone


def redact_pii(col: Column | str) -> Column:
    """Replace emails then phones with typed placeholders (email pass
    first so address digits can't be re-matched as phones)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def redact_pii_sql(expr: str) -> str:
    """DuckDB rendering of :func:`redact_pii` (global flag needed —
    DuckDB replaces only the first match by default)."""
    mail = f"regexp_replace({expr}, '{PII_EMAIL_RE}', '<EMAIL>', 'g')"
    return f"regexp_replace({mail}, '{PII_PHONE_RE}', '<PHONE>', 'g')"


def pii_counts_sql(expr: str) -> tuple[str, str]:
    mail_scrubbed = f"regexp_replace({expr}, '{PII_EMAIL_RE}', '<EMAIL>', 'g')"
    return (
        f"len(regexp_extract_all({expr}, '{PII_EMAIL_RE}'))",
        f"len(regexp_extract_all({mail_scrubbed}, '{PII_PHONE_RE}'))",
    )


def shingles_multi(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles WITH multiplicity (for weighted Jaccard — the
    multiset variant of :func:`shingles`)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.lower(c))
    n = F.size(toks)
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", *[toks[i + j] for j in range(k)]),
        )
    )
