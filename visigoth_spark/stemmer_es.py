"""Snowball Spanish stemmer — pure-Python implementation of the official
published algorithm (https://snowballstem.org/algorithms/spanish/stemmer.html).

The reference stems every token with the Snowball Spanish algorithm via
``github.com/kljensen/snowball`` (``analyze_stem_filter.go:9-15``), built with
``removeStopWords=true`` (``index_memory_index_test.go:15``) which bypasses
that library's stopword short-circuit — so the effective semantics are
"Snowball-Spanish-stem every token". This module re-implements the same
official algorithm from its public specification (NOT translated from the
reference; the reference's own scaffold ``stemmer_spanish_snowball.go`` is a
dead stub returning nil, ``stemmer_spanish_snowball.go:116-124``).

Snowball semantics pinned here:
- region marks R1/R2/RV are computed ONCE on the input word; suffix removal
  never re-derives them (deletions are suffix-only, so prefix offsets stay
  valid — matching the Snowball runtime's fixed cursor marks);
- ``among`` picks the longest matching suffix within the region limit and
  does NOT backtrack to shorter alternatives when a post-match condition
  fails.

Vectorization contract: callers stem only the *distinct* vocabulary per Arrow
batch (`stem_vocab`) — web text repeats tokens heavily, so per-distinct-token
Python cost amortizes to near-zero per row.
"""

from __future__ import annotations

VOWELS = frozenset("aeiouáéíóúü")

_ACCENT_MAP = str.maketrans("áéíóú", "aeiou")

# Step 0: attached pronouns, longest-first.
_PRONOUNS = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
# Step 0 preceders, case (a): accented forms — after pronoun deletion the
# acute accent is removed (haciéndola -> haciendo).
_STEP0_A = ("iéndo", "ándo", "ár", "ér", "ír")
# case (b): plain forms.
_STEP0_B = ("iendo", "ando", "ar", "er", "ir")

# Step 1 suffix groups (each longest-first internally).
_STEP1_DELETE_R2 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos", "ables",
    "ibles", "istas", "anza", "icos", "icas", "ismo", "able", "ible", "ista",
    "osos", "osas", "ico", "ica", "oso", "osa",
)
_STEP1_ADOR = (
    "aciones", "adoras", "adores", "ancias", "adora", "ación", "antes",
    "ancia", "ador", "ante",
)
_STEP1_LOGIA = ("logías", "logía")
_STEP1_UCION = ("uciones", "ución")
_STEP1_ENCIA = ("encias", "encia")
_STEP1_IDAD = ("idades", "idad")
_STEP1_IVA = ("ivas", "ivos", "iva", "ivo")

# Step 2a: verb suffixes beginning with y (delete if preceded by u);
# longest-first.
_STEP2A = (
    "yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
    "ya", "ye", "yo", "yó",
)

# Step 2b: en/es/éis/emos additionally strip a preceding "gu" down to "g".
_STEP2B_GU = ("emos", "éis", "en", "es")
_STEP2B = tuple(sorted({
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis", "aríamos",
    "aremos", "ará", "aré", "erían", "erías", "erán", "erás", "eríais",
    "ería", "eréis", "eríamos", "eremos", "erá", "eré", "irían", "irías",
    "irán", "irás", "iríais", "iría", "iréis", "iríamos", "iremos", "irá",
    "iré", "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed", "id",
    "ase", "iese", "aste", "iste", "an", "aban", "ían", "aran", "ieran",
    "asen", "iesen", "aron", "ieron", "ado", "ido", "ando", "iendo", "ió",
    "ar", "er", "ir", "as", "abas", "adas", "idas", "ías", "aras", "ieras",
    "ases", "ieses", "ís", "áis", "abais", "íais", "arais", "ierais",
    "aseis", "ieseis", "asteis", "isteis", "ados", "idos", "amos",
    "ábamos", "íamos", "imos", "áramos", "iéramos", "iésemos", "ásemos",
}, key=len, reverse=True))


def _regions(word: str) -> tuple[int, int, int]:
    """Return (r1, r2, rv) start offsets per the Snowball definitions."""
    n = len(word)
    r1 = n
    r2 = n
    # R1: region after the first non-vowel following a vowel.
    for i in range(n - 1):
        if word[i] in VOWELS and word[i + 1] not in VOWELS:
            r1 = i + 2
            break
    # R2: same rule applied within R1.
    for i in range(r1, n - 1):
        if word[i] in VOWELS and word[i + 1] not in VOWELS:
            r2 = i + 2
            break
    # RV (Spanish-specific).
    rv = n
    if n >= 3:
        if word[1] not in VOWELS:
            for i in range(2, n):
                if word[i] in VOWELS:
                    rv = i + 1
                    break
        elif word[0] in VOWELS and word[1] in VOWELS:
            for i in range(2, n):
                if word[i] not in VOWELS:
                    rv = i + 1
                    break
        else:
            rv = 3
    return r1, r2, rv


def stem(word: str) -> str:
    """Stem one (already-lowercased) token with Snowball Spanish."""
    if len(word) < 2:
        return word.translate(_ACCENT_MAP)

    # Marks are fixed for the whole run (suffix-only edits keep them valid).
    r1, r2, rv = _regions(word)

    # ---- Step 0: attached pronoun -----------------------------------------
    for pron in _PRONOUNS:
        if not word.endswith(pron):
            continue
        base = word[: len(word) - len(pron)]
        for suf in _STEP0_A:
            if base.endswith(suf) and len(base) - len(suf) >= rv:
                word = base[: len(base) - len(suf)] + suf.translate(_ACCENT_MAP)
                break
        else:
            for suf in _STEP0_B:
                if base.endswith(suf) and len(base) - len(suf) >= rv:
                    word = base
                    break
            else:
                if (
                    base.endswith("yendo")
                    and len(base) - 5 >= rv
                    and base[: len(base) - 5].endswith("u")
                ):
                    word = base
        break  # longest pronoun only; no backtracking on condition failure

    # ---- Step 1: standard suffix removal ----------------------------------
    n = len(word)
    step1_removed = False

    # global longest-match across all step-1 groups
    best: tuple[int, str] | None = None  # (suffix_len, group)
    for group, sufs in (
        ("plain", _STEP1_DELETE_R2),
        ("ador", _STEP1_ADOR),
        ("logia", _STEP1_LOGIA),
        ("ucion", _STEP1_UCION),
        ("encia", _STEP1_ENCIA),
        ("amente", ("amente",)),
        ("mente", ("mente",)),
        ("idad", _STEP1_IDAD),
        ("iva", _STEP1_IVA),
    ):
        for suf in sufs:
            if word.endswith(suf):
                if best is None or len(suf) > best[0]:
                    best = (len(suf), group)
                break

    if best is not None:
        slen, group = best
        if group == "plain":
            if n - slen >= r2:
                word = word[:-slen]
                step1_removed = True
        elif group == "ador":
            if n - slen >= r2:
                word = word[:-slen]
                step1_removed = True
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif group == "logia":
            if n - slen >= r2:
                word = word[:-slen] + "log"
                step1_removed = True
        elif group == "ucion":
            if n - slen >= r2:
                word = word[:-slen] + "u"
                step1_removed = True
        elif group == "encia":
            if n - slen >= r2:
                word = word[:-slen] + "ente"
                step1_removed = True
        elif group == "amente":
            if n - slen >= r1:
                word = word[:-slen]
                step1_removed = True
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
        elif group == "mente":
            if n - slen >= r2:
                word = word[:-slen]
                step1_removed = True
                for pre in ("ante", "able", "ible"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
        elif group == "idad":
            if n - slen >= r2:
                word = word[:-slen]
                step1_removed = True
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
        elif group == "iva":
            if n - slen >= r2:
                word = word[:-slen]
                step1_removed = True
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]

    # ---- Step 2a / 2b: verb suffixes ---------------------------------------
    if not step1_removed:
        n = len(word)
        step2a_removed = False
        for suf in _STEP2A:
            # region-limited match: a suffix extending beyond RV does not
            # match, so shorter in-RV alternatives are still tried.
            if word.endswith(suf) and n - len(suf) >= rv:
                if word[: n - len(suf)].endswith("u"):
                    word = word[: n - len(suf)]
                    step2a_removed = True
                break

        if not step2a_removed:
            n = len(word)
            best2: tuple[int, bool] | None = None  # (len, is_gu_group)
            for suf in _STEP2B_GU:
                if word.endswith(suf) and n - len(suf) >= rv:
                    best2 = (len(suf), True)
                    break
            for suf in _STEP2B:
                if word.endswith(suf) and n - len(suf) >= rv:
                    if best2 is None or len(suf) > best2[0]:
                        best2 = (len(suf), False)
                    break
            if best2 is not None:
                slen, is_gu = best2
                word = word[:-slen]
                if is_gu and word.endswith("gu"):
                    word = word[:-1]

    # ---- Step 3: residual suffix --------------------------------------------
    n = len(word)
    matched3: str | None = None
    for suf in ("os", "e", "é", "a", "o", "á", "í", "ó"):
        if word.endswith(suf):
            matched3 = suf
            break
    if matched3 == "os":
        if n - 2 >= rv:
            word = word[:-2]
    elif matched3 in ("e", "é"):
        if n - 1 >= rv:
            word = word[:-1]
            if word.endswith("gu") and len(word) - 1 >= rv:
                word = word[:-1]
    elif matched3 is not None:
        if n - 1 >= rv:
            word = word[:-1]

    return word.translate(_ACCENT_MAP)


_CACHE: dict[str, str] = {}


def stem_cached(word: str) -> str:
    s = _CACHE.get(word)
    if s is None:
        s = stem(word)
        if len(_CACHE) < 2_000_000:  # bound executor memory
            _CACHE[word] = s
    return s


def stem_vocab(vocab) -> dict[str, str]:
    """Stem each distinct token once; returns token -> stem mapping."""
    return {w: stem_cached(w) for w in vocab}
