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

    tokens = filter(split(translate(text, SRC, DST), sep_regex), _ != '')

one translate (the probed fold — strictly 1:1 or deletion, so
translate expresses it exactly; Java lower() is deliberately NOT used
because it maps U+0130 to two chars and folds codepoints sqlite's
older-Unicode tables leave alone), one split on a character class
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
    return "".join(re.escape(chr(cp)) for cp in cps)


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
    text.tokens() is used. One split + one per-token translate, pure
    codegen. Order matters and mirrors sqlite's scanner: characters
    are CLASSIFIED (token vs separator, including the user's
    tokenchars/separators) by their ORIGINAL codepoint, and only the
    surviving token characters are folded — so separators 'o' does
    not swallow an 'O' (sqlite folds it to a token 'o'), and listing
    a diacritic-bearing char in tokenchars matches before the fold
    rewrites it."""
    c = col if not isinstance(col, str) else F.col(col)
    src, dst = _fold_src_dst(remove_diacritics)
    pat = _sep_regex(remove_diacritics, tokenchars, separators)
    return F.filter(
        F.transform(
            F.split(c, pat),
            # a combining mark cannot BEGIN a token (it attaches to a
            # preceding base char) — sqlite silently drops leading
            # marks even in mode 0, where in-token marks survive
            lambda w: F.translate(
                F.regexp_replace(w, r"^\p{M}+", ""), src, dst
            ),
        ),
        lambda w: F.length(w) > 0,
    )


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
