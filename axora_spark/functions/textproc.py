"""Text processing core: Snowball/Porter2 English stemmer (X6) + topic
relevance predicate (F6) — pure Python, shared by the Spark pandas UDFs and
the oracle so both sides agree exactly.

Reference: crawler/dom_handler.go:130-177 uses kljensen/snowball English
with stemNonAlphaNumeric... the predicate compares only the first
min(4, len) characters of stems, so the gate is robust to minor stemmer
divergence; what MUST hold is that engine and oracle call this exact
function (SEMANTICS.md, content-pipeline closure).

The stemmer below is a self-contained implementation of the published
Porter2 (Snowball English) algorithm — no third-party package (none is
installed in this sandbox).
"""

from __future__ import annotations

import re

_VOWELS = "aeiouy"
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = "cdeghkmnrt"

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "howe": "howe", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes",
}
_EXCEPTIONS2 = {"inning", "outing", "canning", "herring", "earring",
                "proceed", "exceed", "succeed"}


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def _regions(word: str) -> tuple[int, int]:
    """R1/R2 start indices per the Porter2 definition."""
    if word.startswith(("gener", "commun", "arsen")):
        r1 = 5 if word.startswith("gener") else (6 if word.startswith("commun") else 5)
    else:
        r1 = len(word)
        for i in range(1, len(word)):
            if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
                r1 = i + 1
                break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    if len(word) == 2:
        return _is_vowel(word[0]) and not _is_vowel(word[1])
    if len(word) >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (not _is_vowel(a) and _is_vowel(b) and not _is_vowel(c)
                and c not in "wxY")
    return False


def porter2_stem(word: str) -> str:
    word = word.lower()
    if len(word) <= 2:
        return word
    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word]
    word = re.sub(r"^'", "", word)
    if word.startswith("y"):
        word = "Y" + word[1:]
    word = re.sub(r"([aeiouy])y", r"\1Y", word)
    r1, r2 = _regions(word)

    # step 0
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break
    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s") and any(_is_vowel(c) for c in word[:-2]):
        word = word[:-1]
    if word in _EXCEPTIONS2:
        return word.lower().replace("Y", "y")
    # step 1b
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + "ee"
            break
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if any(_is_vowel(c) for c in stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif len(word) < 3 or (_ends_short_syllable(word) and r1 >= len(word)):
                        word += "e"
                break
    # step 1c
    if len(word) > 2 and word[-1] in "yY" and not _is_vowel(word[-2]):
        word = word[:-1] + "i"
    # step 2
    _STEP2 = [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", "og"), ("li", ""),
    ]
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break
    # step 3
    _STEP3 = [("ational", "ate"), ("tional", "tion"), ("alize", "al"),
              ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
              ("ical", "ic"), ("ness", ""), ("ful", "")]
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + rep
            break
    # step 4
    _STEP4 = ("ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
              "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break
    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (len(word) - 1 >= r1
                                   and not _ends_short_syllable(word[:-1])):
            word = word[:-1]
    elif word.endswith("l") and len(word) - 1 >= r2 and len(word) >= 2 \
            and word[-2] == "l":
        word = word[:-1]
    return word.replace("Y", "y")


# ---------------- F6 — topic relevance (dom_handler.go:138-177) ----------------

_FIELD_SEP = re.compile(r"[ ,.;:!?\n]+")


def stem_word(word: str) -> str:
    """stemWord: snowball stem; on failure return input (go:130-136)."""
    try:
        return porter2_stem(word)
    except Exception:
        return word


def is_topic_relevant(text: str, topic: str) -> bool:
    """Exact port of the predicate's logic (not its implementation):
    lowercase text; stem topic; early-exit if text lacks topic[:3]; split on
    ` ,.;:!?\\n`; for each word containing topic[:3], compare first
    min(4, len) chars of stems."""
    text = text.lower()
    topic_stem = stem_word(topic)
    min_prefix = min(4, len(topic_stem))
    if len(topic) >= 3 and topic[:3] not in text:
        return False
    for w in _FIELD_SEP.split(text):
        if not w:
            continue
        if len(topic) >= 3 and topic[:3] not in w:
            continue
        stem = stem_word(w)
        compare = min(min_prefix, len(stem), len(topic_stem))
        if compare > 0 and compare >= min_prefix \
                and stem[:compare] == topic_stem[:compare]:
            return True
    return False


def is_meta_relevant(title: str, metas: list[dict] | None, topic: str) -> bool:
    """F5 — page gate: any meta row where title+name+property+content is
    topic-relevant (dom_handler.go:179-199). Note the reference includes the
    <title> text in EVERY meta concatenation; a page with no <meta> tags is
    never relevant (loop body never runs) — quirk reproduced."""
    if metas is None:
        metas = []
    for m in metas:  # no truthiness test: Arrow may hand a numpy array
        blob = (title or "") + (m.get("name") or "") \
            + (m.get("property") or "") + (m.get("content") or "")
        if is_topic_relevant(blob, topic):
            return True
    return False
