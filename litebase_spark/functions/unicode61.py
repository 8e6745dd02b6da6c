"""FTS5 ``unicode61`` tokenizer with its full option surface —
``remove_diacritics 0|1|2``, ``tokenchars``, ``separators`` — as a
pure Catalyst expression (no UDF), matching the real SQLite FTS5
tokenizer the reference enables wholesale (reference:
pkg/sqlite3/sqlite3.go:20; option docs:
www.sqlite.org/fts5.html#unicode61_tokenizer).

Fidelity strategy: the fold (case folding + diacritic removal +
combining-mark deletion per mode) and the token/separator
classification deltas are PROBED from Python stdlib sqlite3's actual
FTS5 tokenizer per codepoint (tools/gen_unicode61_tables.py — the
porter-work methodology) and shipped as static tables
(unicode61_tables.py). The Spark expression is then:

    split(sep_regex) -> join on U+001F -> ONE translate -> re-split

one split classifying ORIGINAL codepoints, then one whole-row
translate folding the surviving token text (the probed fold —
strictly 1:1 or deletion, so translate expresses it exactly; Java
lower() is deliberately NOT used because it maps U+0130 to two chars
and folds codepoints sqlite's older-Unicode tables leave alone),
against a separator character class
built from \\p{L}\\p{N}\\p{M} plus the probed classification deltas
plus the user's tokenchars/separators. Everything stays JVM-side in
whole-stage codegen — at 100 TB this is a narrow scan-stage map, the
same shape as the default tokenizer.

Documented deviations: codepoints beyond the probed ranges (uncased
scripts — CJK, Hangul, Indic) classify by Unicode category and pass
through unfolded, which matches sqlite for every case the
differential fuzz exercises; user tokenchars/separators are matched
against the FOLDED text, so listing a diacritic-bearing char as a
tokenchar under remove_diacritics 1/2 won't match (SQLite matches the
original codepoint) — list the folded form instead.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

from litebase_spark.functions.unicode61_tables import (
    FOLD,
    SEP_EXTRA,
    TOK_EXTRA,
)

_SEP_EXTRA_SET = {m: frozenset(v) for m, v in SEP_EXTRA.items()}
_TOK_EXTRA_SET = {m: frozenset(v) for m, v in TOK_EXTRA.items()}

_SEP = "\x1f"

__all__ = [
    "parse_unicode61_options",
    "unicode61_tokens",
    "unicode61_tokens_py",
]


def parse_unicode61_options(spec: str) -> dict:
    """Parse an FTS5 tokenize= option string after the tokenizer name
    — e.g. ``remove_diacritics 2 tokenchars '-_' separators 'x'`` —
    into {remove_diacritics, tokenchars, separators}. Values may be
    bare words or FTS5 ''-quoted strings (with '' escaping a quote).
    Unknown option names raise (same as sqlite)."""
    out = {"remove_diacritics": 1, "tokenchars": "", "separators": ""}
    toks = re.findall(r"'(?:[^']|'')*'|\S+", spec)
    if len(toks) % 2:
        raise ValueError(f"unicode61 options must be name/value pairs: {spec!r}")
    for name, val in zip(toks[::2], toks[1::2]):
        if val.startswith("'") and val.endswith("'"):
            val = val[1:-1].replace("''", "'")
        if name == "remove_diacritics":
            if val not in ("0", "1", "2"):
                raise ValueError(
                    f"remove_diacritics must be 0, 1 or 2, got {val!r}"
                )
            out["remove_diacritics"] = int(val)
        elif name in ("tokenchars", "separators"):
            out[name] = val
        else:
            raise ValueError(f"unknown unicode61 option {name!r}")
    return out


def _fold_src_dst(mode: int) -> tuple[str, str]:
    fold = FOLD[mode]
    # translate(): chars in src beyond len(dst) are DELETED — sort the
    # deletions last so one call covers both mappings and deletions
    mapped = [(cp, v) for cp, v in fold.items() if v]
    deleted = [cp for cp, v in fold.items() if not v]
    src = "".join(chr(cp) for cp, _ in mapped) + "".join(
        chr(cp) for cp in deleted
    )
    dst = "".join(v for _, v in mapped)
    return src, dst


def _char_class(cps) -> str:
    """Codepoint set -> regex class body with consecutive runs
    compressed to x-y ranges. This is a per-ROW cost, not cosmetics:
    Spark's StringSplit recompiles its pattern on EVERY evaluation
    (UTF8String.split -> Pattern.compile), and the uncompressed
    1260-literal class made a ~5 KB pattern whose per-row compile
    dominated the x100 corpus scan (~300 s for 500k docs; ~50 ranges
    compile in microseconds)."""
    cps = sorted(set(cps))
    out = []
    i = 0
    while i < len(cps):
        j = i
        while j + 1 < len(cps) and cps[j + 1] == cps[j] + 1:
            j += 1
        if j - i >= 2:
            out.append(
                re.escape(chr(cps[i])) + "-" + re.escape(chr(cps[j]))
            )
        else:
            out.extend(re.escape(chr(cps[p])) for p in range(i, j + 1))
        i = j + 1
    return "".join(out)


def _sep_regex(mode: int, tokenchars: str, separators: str) -> str:
    tok_cls = (
        "\\p{L}\\p{N}\\p{M}"
        + _char_class(TOK_EXTRA[mode])
        + "".join(re.escape(c) for c in tokenchars)
    )
    sep_cls = _char_class(SEP_EXTRA[mode]) + "".join(
        re.escape(c) for c in separators if c not in tokenchars
    )
    if sep_cls:
        return f"(?:[^{tok_cls}]|[{sep_cls}])+"
    return f"[^{tok_cls}]+"


def unicode61_tokens(
    col,
    remove_diacritics: int = 1,
    tokenchars: str = "",
    separators: str = "",
) -> Column:
    """Token array under unicode61 with options — drop-in anywhere
    text.tokens() is used. One split + one whole-row translate, pure
    codegen. Order matters and mirrors sqlite's scanner: characters
    are CLASSIFIED (token vs separator, including the user's
    tokenchars/separators) by their ORIGINAL codepoint, and only the
    surviving token characters are folded — so separators 'o' does
    not swallow an 'O' (sqlite folds it to a token 'o'), and listing
    a diacritic-bearing char in tokenchars matches before the fold
    rewrites it."""
    if _SEP in tokenchars:
        raise ValueError("U+001F cannot be a tokenchar (fold sentinel)")
    c = col if not isinstance(col, str) else F.col(col)
    src, dst = _fold_src_dst(remove_diacritics)
    pat = _sep_regex(remove_diacritics, tokenchars, separators)
    # fold ONCE PER ROW, not once per token: the first cut ran
    # translate (a ~1100-entry fold) inside the interpreted transform
    # lambda, which re-evaluated it per token — >120 s on the x100
    # corpus. Joining the already-classified tokens on a sentinel
    # (U+001F, a control char the first split can never let through),
    # translating the joined string, and re-splitting keeps the
    # classify-then-fold order bit-identical at one fold pass per
    # document. The anchored \p{M} strip (a mark cannot BEGIN a
    # token) runs on the same joined string; in modes 1/2 token-class
    # marks are deleted by the fold anyway, so it only bites mode 0.
    toks = F.split(c, pat)
    folded = F.translate(F.array_join(toks, _SEP), src, dst)
    cleaned = F.regexp_replace(folded, "(^|\\x{1F})\\p{M}+", "$1")
    # drop empty tokens (fold deletions, leading/trailing separators)
    # with sentinel collapse + trim instead of a filter() lambda: a
    # higher-order function ANYWHERE in the expression knocks the
    # consuming explode out of whole-stage codegen, and the
    # interpreted Generate re-evaluates this whole chain per OUTPUT
    # token (~90 s over the x100 corpus vs ~1 s all-codegen)
    compact = F.regexp_replace(cleaned, "\\x{1F}{2,}", _SEP)
    trimmed = F.regexp_replace(compact, "^\\x{1F}|\\x{1F}$", "")
    return F.when(
        trimmed == "", F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, "\\x{1F}"))


def _is_token_py(
    ch: str, mode: int, tokenchars: str, separators: str
) -> bool:
    if ch in separators and ch not in tokenchars:
        return False
    cp = ord(ch)
    if cp in _SEP_EXTRA_SET[mode] and ch not in tokenchars:
        return False
    if ch in tokenchars or cp in _TOK_EXTRA_SET[mode]:
        return True
    return unicodedata.category(ch)[0] in "LNM"


def unicode61_tokens_py(
    text: str,
    remove_diacritics: int = 1,
    tokenchars: str = "",
    separators: str = "",
) -> list[str]:
    """Python twin of unicode61_tokens — the SAME tables and the same
    classify-then-fold order, used to tokenize driver-side query
    terms so query and corpus always agree (porter methodology:
    functions/porter.py porter_stem_py)."""
    fold = FOLD[remove_diacritics]
    out: list[str] = []
    cur: list[str] = []
    for ch in text:
        if _is_token_py(ch, remove_diacritics, tokenchars, separators):
            # marks cannot begin a token (mirrors the Spark
            # expression's leading-\p{M} strip)
            if not cur and unicodedata.category(ch)[0] == "M":
                continue
            cur.append(fold.get(ord(ch), ch))
        elif cur:
            if any(cur):
                out.append("".join(cur))
            cur = []
    if cur and any(cur):
        out.append("".join(cur))
    return out
