"""Rule-based casing engines: conservative English title-case and
contributor-name casing.

These are the reference's highest-fidelity-risk operators (SURVEY.md §7.4
hard part #1): hundreds of micro-rules whose semantics are the product.
Behavior parity with /root/reference/src/tagminder/core/tm_titlecase.py:180-411
and tm_contributor_case.py:96-187 is pinned by golden tests generated from
the reference implementation's observable behavior (tests/test_textcase.py);
the implementation below is an independent re-expression.

Execution model: pure str→str functions exposed as Arrow-batched pandas
UDFs (`title_case_udf`, `contributor_case_udf`). Casing rules are genuinely
beyond Catalyst expressions (stateful token context, Unicode combining
checks); a pandas UDF is the sanctioned slow path — trivially parallel,
no shuffle, scales linearly with executors.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# rule data
# ---------------------------------------------------------------------------

SMALL_WORDS = {
    "a", "an", "and", "as", "at", "but", "by", "for", "from", "if", "in",
    "into", "nor", "of", "on", "or", "over", "per", "so", "the", "to", "up",
    "via", "with", "yet",
}

GEO_CONTEXT = {
    "at", "from", "in", "into", "near", "of", "on", "outside", "through",
    "to", "toward", "towards", "via", "within", "inside", "around",
    "across", "by",
}

CONTRACTIONS = {"d", "ll", "m", "n", "re", "s", "t", "ve"}

KNOWN_ACRONYMS = {"cd", "dj", "ep", "eu", "fm", "lp", "r&b", "tv", "uk", "usa"}

TEMPO_WORDS = {
    "agitato", "assai", "con", "dolce", "espressivo", "giocoso", "ma",
    "molto", "non", "poco", "sempre", "troppo", "vivace",
}

US_STATES = {
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI", "ID",
    "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI", "MN", "MS",
    "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC", "ND", "OH", "OK",
    "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV",
    "WI", "WY", "DC",
}

ROMAN_RE = re.compile(
    r"^(?=[MDCLXVI])(M{0,4}(CM|CD|D?C{0,3})(XC|XL|L?X{0,3})(IX|IV|V?I{0,3}))$",
    re.IGNORECASE,
)
DOTTED_ACRONYM_RE = re.compile(r"^(?:[A-Za-z]\.){2,}[A-Za-z]?\.?$")
TOKEN_RE = re.compile(r"^([^\w]*)([\w][\w'’./&-]*)([^\w]*)$")
MUSICAL_KEY_RE = re.compile(r"^[A-Ga-g][#b]?$")

CLAUSE_ENDERS = (":", "?", "!", "/", "-", "--", "–", "—")


def _cap(s: str) -> str:
    return s[:1].upper() + s[1:].lower() if s else s


def _has_diacritics(s: str) -> bool:
    return any(unicodedata.combining(c) for c in unicodedata.normalize("NFD", s))


def _is_caps_run(core: str) -> bool:
    return core.isalpha() and core.isupper() and (
        len(core) >= 2 or core.lower() in SMALL_WORDS
    )


def _split(token: str) -> tuple[str, str, str]:
    m = TOKEN_RE.match(token)
    return (m.group(1), m.group(2), m.group(3)) if m else (token, "", "")


def _cap_with_contractions(core: str) -> str:
    if core.lower() in {"n'", "n’"}:
        return "n'"
    pieces = re.split(r"(['’])", core)
    if len(pieces) == 1:
        return _cap(core)
    out = []
    for i, piece in enumerate(pieces):
        if piece in {"'", "’"}:
            out.append(piece)
        elif i > 0 and piece.lower() in CONTRACTIONS:
            out.append(piece.lower())
        else:
            out.append(_cap(piece.lower()))
    return "".join(out)


def _case_core(core: str, ctx: dict) -> str:
    """Apply the rule cascade to one bare word (no punctuation affixes)."""
    if not core:
        return core
    if "/" in core:
        parts = core.split("/")
        sub = dict(is_first=False, is_last=False, clause_start=True,
                   prev=None, prev_caps=False, prev_comma=False,
                   nxt=None, nxt_caps=False)
        done = []
        for pi, part in enumerate(parts):
            s = dict(sub)
            s["is_first"] = pi == 0
            s["is_last"] = pi == len(parts) - 1
            done.append(_case_core(part, s))
        return "/".join(done)
    if "-" in core:
        parts = core.split("-")
        done = []
        for pi, part in enumerate(parts):
            s = dict(
                is_first=ctx["is_first"] and pi == 0,
                is_last=ctx["is_last"] and pi == len(parts) - 1,
                clause_start=ctx["clause_start"] and pi == 0,
                prev=ctx["prev"] if pi == 0 else None,
                prev_caps=ctx["prev_caps"] if pi == 0 else False,
                prev_comma=ctx["prev_comma"] if pi == 0 else False,
                nxt=None, nxt_caps=False,
            )
            done.append(_case_core(part, s))
        return "-".join(done)

    low = core.lower()
    if _has_diacritics(core):
        return core
    if DOTTED_ACRONYM_RE.match(core) or low in KNOWN_ACRONYMS:
        return core.upper()
    if (
        2 <= len(core) <= 4
        and core.isupper()
        and core.isalpha()
        and not (ctx["prev_caps"] or ctx["nxt_caps"])
    ):
        return core
    if ROMAN_RE.match(core):
        return core.upper()
    if core.endswith(".") and ROMAN_RE.match(core[:-1]):
        return core[:-1].upper() + "."
    if (
        MUSICAL_KEY_RE.match(core)
        and ctx["prev"] == "in"
        and ctx["nxt"] in {"major", "minor"}
    ):
        return core.upper()
    if (
        len(core) == 2
        and core.isalpha()
        and core.upper() in US_STATES
        and (
            (ctx["prev_comma"] and ctx["is_last"])
            or (core.isupper() and ctx["prev"] in GEO_CONTEXT)
        )
    ):
        return core.upper()
    if (
        core.islower()
        and low in TEMPO_WORDS
        and not (ctx["is_first"] or ctx["clause_start"])
    ):
        return low
    if low in SMALL_WORDS and not (
        ctx["is_first"] or ctx["is_last"] or ctx["clause_start"]
    ):
        return low
    return _cap_with_contractions(core)


def title_case(text: str | None) -> str | None:
    """Conservative English title-case for titles/albums/works."""
    if text is None:
        return None
    squeezed = re.sub(r"\s+", " ", str(text)).strip()
    if not squeezed:
        return None

    tokens = squeezed.split(" ")
    out: list[str] = []
    prev: str | None = None
    prev_caps = False
    prev_comma = False
    clause_start = True

    for i, token in enumerate(tokens):
        lead, core, trail = _split(token)
        nxt = None
        nxt_caps = False
        if i + 1 < len(tokens):
            _, ncore, _ = _split(tokens[i + 1])
            if ncore:
                nxt = ncore.lower()
            nxt_caps = _is_caps_run(ncore)
        if not core:
            out.append(token)
            prev_comma = "," in token
            clause_start = token in {":", "?", "!", "-", "--", "–", "—", "/"}
            continue
        # Afrikaans 'n: always lowercase, always ASCII apostrophe.
        if lead in {"'", "’"} and core.lower() == "n" and trail == "":
            out.append("'n")
            prev, prev_comma, clause_start = "n", False, False
            continue
        cased = _case_core(
            core,
            dict(
                is_first=i == 0,
                is_last=i == len(tokens) - 1,
                clause_start=clause_start,
                prev=prev,
                prev_caps=prev_caps,
                prev_comma=prev_comma,
                nxt=nxt,
                nxt_caps=nxt_caps,
            ),
        )
        out.append(f"{lead}{cased}{trail}")
        prev = re.sub(r"[^\w&]+", "", cased).replace("_", "").lower()
        prev_caps = _is_caps_run(core)
        prev_comma = "," in trail
        clause_start = trail.endswith(CLAUSE_ENDERS)

    return " ".join(out)


# ---------------------------------------------------------------------------
# contributor names
# ---------------------------------------------------------------------------

SURNAMES = {
    "macintyre": "MacIntyre", "macallister": "MacAllister",
    "mackenzie": "MacKenzie", "macdonald": "MacDonald",
    "maclachlan": "MacLachlan", "macgregor": "MacGregor",
    "macpherson": "MacPherson", "maclean": "MacLean",
    "macleod": "MacLeod", "macneil": "MacNeil",
    "mcbean": "McBean", "mccutcheon": "McCutcheon", "mcdaniel": "McDaniel",
    "mcdaniels": "McDaniels", "mcdermott": "McDermott",
    "mcdonagh": "McDonagh", "mcdonald": "McDonald", "mcintyre": "McIntyre",
    "mckenzie": "McKenzie", "mcallister": "McAllister",
    "mcfarland": "McFarland", "mcgregor": "McGregor", "mcguire": "McGuire",
    "mcgrath": "McGrath", "mcguirk": "McGuirk", "mcilrath": "McIlrath",
    "mckinna": "McKinna", "mclaughlin": "McLaughlin", "mclean": "McLean",
    "mcleod": "McLeod", "mcmahon": "McMahon", "mcnamara": "McNamara",
    "mcpherson": "McPherson", "mcvey": "McVey",
    "obrien": "O'Brien", "odonnell": "O'Donnell", "oconnor": "O'Connor",
    "oneill": "O'Neill", "omally": "O'Malley", "ohara": "O'Hara",
    "okeeffe": "O'Keeffe", "oreilly": "O'Reilly", "osullivan": "O'Sullivan",
    "fitzgibbon": "FitzGibbon", "fitzhenry": "FitzHenry",
    "decoster": "DeCoster", "de coster": "DeCoster", "desantis": "DeSantis",
    "delorean": "DeLorean", "delacruz": "De La Cruz",
    "delarosa": "De La Rosa", "deguzman": "De Guzman",
    "degaulle": "de Gaulle", "demedici": "de Medici", "devito": "DeVito",
    "depalma": "DePalma", "donatello": "Donatello",
    "vanpelt": "Van Pelt", "vandamme": "Van Damme", "vanhalen": "Van Halen",
    "vanderbilt": "Vanderbilt", "vanderveer": "Vanderveer",
    "vanburen": "Van Buren", "vanhouten": "Van Houten", "vangogh": "van Gogh",
    "vonbeethoven": "von Beethoven", "vontrapp": "von Trapp",
    "vonbraun": "von Braun", "vondoom": "Von Doom",
}

NAME_PARTICLES = {
    "of", "a", "an", "the", "and", "but", "or", "for", "nor", "on", "at",
    "to", "from", "by",
}

_NAME_WORD = r"(?:[A-Za-z]\.){2,}|[A-Za-z]\.|Mc\w+|O'\w+|\w+(?:['’]\w+)?"
_NAME_SCAN = re.compile(rf"({_NAME_WORD})|([^\w\s]+)|\s+")
_NAME_WORD_RE = re.compile(_NAME_WORD)


def _case_name_word(word: str, first: bool) -> str:
    low = word.lower()
    if low in SURNAMES:
        return SURNAMES[low]
    if re.match(r"^([A-Za-z]\.)+$", word, re.IGNORECASE):
        return word.upper()
    if first:
        return word.capitalize()
    if re.match(r"^[IVXLCDM]+$", word.upper()):
        return word.upper()
    if "." in word:
        return ".".join(
            p.upper() if p and len(p) == 1 else p.capitalize()
            for p in word.split(".")
        )
    if "'" in word or "’" in word:
        pos = max(word.find("'"), word.find("’"))
        if 0 < pos < len(word) - 1:
            return word[:pos].capitalize() + word[pos:]
        return word.capitalize()
    if "-" in word:
        return "-".join(p.capitalize() for p in word.split("-"))
    if low in NAME_PARTICLES:
        return low
    return word.capitalize()


def contributor_case(text: str | None) -> str | None:
    """Contributor-name casing for unresolved names (fallback when no
    canonical reference mapping exists)."""
    if not text:
        return text
    whole = text.lower()
    if whole in SURNAMES:
        return SURNAMES[whole]

    result: list[str] = []
    cap_next = True
    for m in _NAME_SCAN.finditer(text):
        word = m.group(1) or m.group(2)
        if not word:
            result.append(" ")
            continue
        if _NAME_WORD_RE.match(word):
            cased = _case_name_word(word, cap_next)
            if cased.lower().endswith(("'s", "’s")):
                cased = cased[:-2] + "'s"
            elif (
                word.lower().startswith("o'")
                and len(word) > 2
                and word[2].lower() != "s"
                and word[2] != " "
            ):
                cased = "O'" + _case_name_word(word[2:], False)
            result.append(cased)
            cap_next = False
        else:
            result.append(word)
            cap_next = word in "({[<"
    joined = "".join(result)
    return re.sub(r"(\w)['’]S\b", r"\1's", joined)


# ---------------------------------------------------------------------------
# Spark bindings (Arrow-batched)
# ---------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def title_case_udf(s: pd.Series) -> pd.Series:
    return s.map(title_case, na_action=None)


@F.pandas_udf(T.StringType())
def contributor_case_udf(s: pd.Series) -> pd.Series:
    return s.map(contributor_case, na_action=None)
