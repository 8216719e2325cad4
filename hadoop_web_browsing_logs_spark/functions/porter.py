"""Porter stemmer (Porter 1980, "An algorithm for suffix stripping") — a fresh
pure-Python implementation of the classic public algorithm.

Reference parity: the reference embeds Martin Porter's classic Java
implementation as ``static class Stemmer`` (ProcessData.java:45-361) and calls
it per token (ProcessData.java:407-412). This module re-implements the
*algorithm* (all five steps, including the two published departures bli→ble
and logi→log present in the reference's step tables) — not the Java code.

The stemmer is the engine's single mandatory Python kernel; everything else
stays JVM-side. It is exposed as an Arrow-batched pandas UDF
(:func:`stem_udf`) with an LRU cache — corpora repeat tokens heavily, so the
cache turns the per-token cost into a dict lookup. Golden vectors from the
reference's own comment examples (ProcessData.java:207-227) pin behavior in
tests; DuckDB's ``stem()`` is Snowball/Porter2 and intentionally NOT used as
the oracle (SURVEY §7 risk register).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOWELS = frozenset("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the [C](VC)^m[V] decomposition."""
    pattern = []
    for i in range(len(stem)):
        c = "c" if _is_consonant(stem, i) else "v"
        if not pattern or pattern[-1] != c:
            pattern.append(c)
    s = "".join(pattern)
    if s.startswith("c"):
        s = s[1:]
    if s.endswith("v"):
        s = s[:-1]
    return len(s) // 2


def _has_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return len(word) >= 2 and word[-1] == word[-2] and _is_consonant(word, len(word) - 1)


def _ends_cvc(word: str) -> bool:
    """*o: consonant-vowel-consonant ending where the final consonant is not
    w, x, or y."""
    if len(word) < 3:
        return False
    return (
        _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


# Step 2/3 suffix maps, in match order (longer forms before their tails).
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


@lru_cache(maxsize=1 << 20)
def porter_stem(word: str) -> str:
    """Stem one lowercase word with the classic Porter algorithm."""
    w = word
    if len(w) <= 2:
        return w

    # Step 1a — plurals
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b — -ed / -ing
    fired = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        fired = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_consonant(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # Step 1c — y → i
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suffix, repl in _STEP2:
        if w.endswith(suffix):
            stem = w[: -len(suffix)]
            if _measure(stem) > 0:
                w = stem + repl
            break

    # Step 3
    for suffix, repl in _STEP3:
        if w.endswith(suffix):
            stem = w[: -len(suffix)]
            if _measure(stem) > 0:
                w = stem + repl
            break

    # Step 4 — drop suffix when m > 1
    for suffix in _STEP4:
        if w.endswith(suffix):
            stem = w[: -len(suffix)]
            if _measure(stem) > 1 and (suffix != "ion" or (stem and stem[-1] in "st")):
                w = stem
            break

    # Step 5a — final -e
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b — -ll → -l when m > 1
    if _measure(w) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        w = w[:-1]

    return w


#: Golden stem vectors: vocabulary drawn from the reference's own step-table
#: comments (ProcessData.java:207-227) plus Martin Porter's published 1980
#: examples. Shared by the pytest golden test AND q_text_porter_gate — the
#: driver-hashable boolean that stands in for a SQL oracle (DuckDB's fts
#: stemmer is Porter2; classic Porter1 has no SQL twin).
PORTER_GOLDENS: dict[str, str] = {
    "caresses": "caress", "flies": "fli", "dies": "di", "mules": "mule",
    "denied": "deni", "died": "di", "agreed": "agre", "owned": "own",
    "humbled": "humbl", "sized": "size", "meetings": "meet", "stating": "state",
    "itemization": "item", "sensational": "sensat", "traditional": "tradit",
    "reference": "refer", "colonizer": "colon", "plotted": "plot",
    "ponies": "poni", "ties": "ti", "cats": "cat", "feed": "feed",
    "motoring": "motor", "sing": "sing", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky", "play": "plai", "milling": "mill",
    "controlling": "control", "generalization": "gener", "oscillators": "oscil",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "probate": "probat", "rate": "rate", "cease": "ceas",
}


@F.pandas_udf(T.StringType())
def stem_udf(tokens: pd.Series) -> pd.Series:
    """Arrow-batched Porter stemmer — the engine's only Python hot-path kernel
    (SURVEY §4.2: the single codegen break in the flagship plan).
    ``porter_stem``'s lru_cache persists across Arrow batches in each worker,
    so repeated tokens cost a dict lookup; callers should still prefer
    feeding DISTINCT tokens (see operators.text) so the Arrow transfer
    itself is vocab-sized."""
    return tokens.map(lambda tok: porter_stem(tok) if tok else tok)
