"""Deterministic lookup assets (FIXTURES.md F3).

Stand-ins for the reference's packaged lookup data: the name vocabulary
(`fnames_male` / `fnames_female` / `lnames_all`,
/root/reference/R/6_file_based_errors.R:20-22,138-141), the nickname
lookups (`names_lookup` / `nick_real_lookup`,
R/3_nicknames_errors.R:15-17,122-127) and the keyboard / OCR / phonetic
confusion tables the north_star adds on top of `repl`'s uniform charset
(R/2_edit_distance_errors.R:165-180).

Everything is generated from a seed (default 42) — no external data.
These objects are small (≤ a few thousand entries) and are loaded ONCE
PER ACTOR in the injector's ``__init__`` (SURVEY.md §7.4), never
re-shipped per batch.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from . import rng

_CONSONANTS = list("bcdfghjklmnprstvwz")
_VOWELS = list("aeiou")

VOCAB_SIZE = 2000
NICK_KEYS = 500


@lru_cache(maxsize=4)
def vocab(seed: int = 42) -> tuple[list[str], list[str]]:
    """~2000 unique lowercase name-like tokens + a sex label per token.

    Tokens are syllabic (CV pairs, 2-4 syllables) so same-length /
    same-initial groups exist — required by the twins lookup
    (R/6_file_based_errors.R:144-150).
    """
    ids = np.arange(VOCAB_SIZE * 3, dtype=np.int64)
    n_syll = 2 + rng.randint(ids, 3, seed, rng.tag_for("vocab.syll"))
    out: list[str] = []
    seen: set[str] = set()
    sexes: list[str] = []
    for i in ids:
        parts = []
        for s in range(int(n_syll[i])):
            c = _CONSONANTS[int(rng.randint(np.array([i]), len(_CONSONANTS), seed, rng.tag_for(f"vocab.c{s}"))[0])]
            v = _VOWELS[int(rng.randint(np.array([i]), len(_VOWELS), seed, rng.tag_for(f"vocab.v{s}"))[0])]
            parts.append(c + v)
        tok = "".join(parts)
        if tok in seen:
            continue
        seen.add(tok)
        out.append(tok)
        sexes.append("f" if rng.uniform(np.array([i]), seed, rng.tag_for("vocab.sex"))[0] < 0.5 else "m")
        if len(out) >= VOCAB_SIZE:
            break
    return out, sexes


@lru_cache(maxsize=4)
def nicknames(seed: int = 42) -> dict[str, list[str]]:
    """Symmetric name↔nickname lookup (~500 keys, some multi-alternate)
    over the vocabulary — analogue of ``nick_real_lookup``
    (exta/name_lookup.csv header key,lookup)."""
    toks, _ = vocab(seed)
    table: dict[str, list[str]] = {}
    ids = np.arange(NICK_KEYS, dtype=np.int64)
    n_alts = 1 + rng.randint(ids, 3, seed, rng.tag_for("nick.nalts"))
    key_ix = rng.randint(ids, len(toks), seed, rng.tag_for("nick.key"))
    for i in range(NICK_KEYS):
        key = toks[int(key_ix[i])]
        alts = []
        for a in range(int(n_alts[i])):
            j = int(rng.randint(np.array([i]), len(toks), seed, rng.tag_for(f"nick.alt{a}"))[0])
            alt = toks[j]
            if alt != key and alt not in alts:
                alts.append(alt)
        if alts:
            table.setdefault(key, []).extend(a for a in alts if a not in table.get(key, []))
    # make it symmetric like nick_real_lookup (R/3_nicknames_errors.R:122-127)
    for key, alts in list(table.items()):
        for alt in alts:
            if key not in table.setdefault(alt, []):
                table[alt].append(key)
    return table


# -- confusion tables (north_star extension of repl's uniform charset) --

KEYBOARD_ADJ: dict[str, str] = {
    "q": "wa", "w": "qes", "e": "wrd", "r": "etf", "t": "ryg", "y": "tuh",
    "u": "yij", "i": "uok", "o": "ipl", "p": "ol", "a": "qsz", "s": "adwx",
    "d": "sfec", "f": "dgrv", "g": "fhtb", "h": "gjyn", "j": "hkum",
    "k": "jli", "l": "ko", "z": "asx", "x": "zsdc", "c": "xdfv",
    "v": "cfgb", "b": "vghn", "n": "bhjm", "m": "njk",
    "0": "19", "1": "02", "2": "13", "3": "24", "4": "35", "5": "46",
    "6": "57", "7": "68", "8": "79", "9": "80",
}

OCR_CONFUSION: dict[str, str] = {
    "0": "o", "o": "0c", "1": "li", "l": "1i", "i": "1l", "5": "s",
    "s": "5", "8": "b", "b": "8", "2": "z", "z": "2", "6": "b",
    "9": "g", "g": "9q", "q": "g", "c": "eo", "e": "c", "rn": "m",
    "m": "rn", "u": "v", "v": "u", "t": "f", "f": "t",
}

PHONETIC_SUB: dict[str, str] = {
    "c": "ks", "k": "cq", "q": "k", "s": "cz", "z": "s", "f": "pv",
    "v": "f", "p": "b", "b": "p", "d": "t", "t": "d", "g": "j",
    "j": "g", "m": "n", "n": "m", "i": "y", "y": "i", "a": "e",
    "e": "a", "o": "u", "u": "o",
}

CHARSETS: dict[str, dict[str, str]] = {
    "keyboard": KEYBOARD_ADJ,
    "ocr": OCR_CONFUSION,
    "phonetic": PHONETIC_SUB,
}

LETTERS = "abcdefghijklmnopqrstuvwxyz"
DIGITS = "0123456789"

# add_name_suffix weighted suffixes (R/3_nicknames_errors.R:225-226,241-244)
SUFFIXES = ["jr", "iii", "ii", "sr", "iv", "i", "v"]
SUFFIX_WEIGHTS = np.array([300, 40, 40, 40, 10, 10, 10], dtype=np.float64)
SUFFIX_CUM = np.cumsum(SUFFIX_WEIGHTS / SUFFIX_WEIGHTS.sum())


@lru_cache(maxsize=4)
def twins_index(seed: int = 42) -> dict[tuple[int, str], list[str]]:
    """(length, initial) → candidate tokens, for twins_generate
    (R/6_file_based_errors.R:138-150)."""
    toks, _ = vocab(seed)
    index: dict[tuple[int, str], list[str]] = {}
    for t in toks:
        index.setdefault((len(t), t[0]), []).append(t)
    return index


@lru_cache(maxsize=4)
def sex_of(seed: int = 42) -> dict[str, str]:
    toks, sexes = vocab(seed)
    return dict(zip(toks, sexes))
