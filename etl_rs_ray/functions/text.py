"""Scalar string normalizers — the etl-rs ``Transform`` family re-expressed.

Each ``transform_*`` function is a pure ``Optional[str] -> Optional[str]``
whose semantics match the reference UDFs / Polars expressions:

- strip_accent         ≙ crates/libs/lib-etl/src/transforms/utils.rs:13-68
- transform_nom        ≙ src/transforms/nom.rs:15-77
- transform_prenom     ≙ src/transforms/prenom.rs:12-82
- transform_civilite   ≙ src/transforms/civilite.rs:7-50 (+ config.rs:67-97)
- transform_email      ≙ src/transforms/email.rs:13-59
- transform_telephone  ≙ src/transforms/telephone.rs:7-84
- transform_raison_sociale ≙ src/transforms/raison_sociale.rs:12-37
- transform_siren      ≙ src/transforms/siren.rs:8-33
- transform_siret      ≙ src/transforms/siret.rs:8-34
- transform_ape        ≙ src/transforms/ape.rs:9-38
- transform_code_naf   ≙ src/transforms/code_naf.rs:7-37 (replace FIRST occurrence)
- transform_libelle_naf ≙ src/transforms/libelle_naf.rs:7-37
- transform_pce        ≙ src/transforms/pce.rs:4-17
- transform_siret_successeur ≙ src/transforms/siret_successeur.rs:4-17

All are null-in -> null-out unless noted. Known reference quirks reproduced:
accent fold does NOT touch ``ø``/``ß``; nom's delimiter padding checks
*byte* offsets against a *char* index (nom.rs:24-49); prenom's single-char
checks use byte length (prenom.rs:68, 46); civilite emits "MONSIEUR MADAME"
in fixed order; email strips domain hyphens only after validation; telephone
rejects paid prefixes {81,82,83,87,89} on the national significant number.

Deliberate deviation: the reference's 12-digit ``00``-international telephone
branch indexes bytes 11..13 of a 12-char string (telephone.rs:42-52), which
panics in Rust; we return the gracefully-sliced Python result instead.
"""

from __future__ import annotations

import re

# --- accent folding (utils.rs:13-68) ---------------------------------------

_ACCENT_FOLD: dict[str, str] = {}
for _chars, _base in (
    ("àáâãäå", "a"),
    ("èéêë", "e"),
    ("ìíîï", "i"),
    ("òóôõö", "o"),
    ("ùúûü", "u"),
    ("ç", "c"),
    ("ñ", "n"),
):
    for _c in _chars:
        _ACCENT_FOLD[_c] = _base


def strip_accent(text: str) -> str:
    out = []
    for c in text:
        low = c.lower()
        base = _ACCENT_FOLD.get(low[0] if low else c)
        if base is None:
            out.append(c)
        else:
            out.append(base.upper() if c.isupper() else base)
    return "".join(out)


# --- nom (nom.rs:15-77) -----------------------------------------------------

_NOM_EDGE_RE = re.compile(r"^[^a-zA-ZÀ-ÿ\s]+|[^a-zA-ZÀ-ÿ\s]+$")
_NOM_DELIM_RE = re.compile(rb"//|_|/|&")
_NOM_INVALID_RE = re.compile(r"[^a-zA-Z0-9À-ÿ\s\-\'’]")
_HYPHENS_RE = re.compile(r"\-+")
_WS_RE = re.compile(r"\s+")


def _replace_delimiters_inside_text(text: str, replacement: str) -> str:
    # Reference checks whether the chars around a delimiter are whitespace
    # using *byte* offsets from the regex match but a *char*-indexed lookup
    # (nom.rs:24-49) — replicated here byte-for-byte.
    data = text.encode("utf-8")
    chars = text  # char-indexed
    n_chars = len(chars)
    out = []
    last = 0
    for m in _NOM_DELIM_RE.finditer(data):
        s, e = m.start(), m.end()
        out.append(data[last:s].decode("utf-8"))
        before_is_space = s > 0 and (s - 1) < n_chars and chars[s - 1].isspace()
        after_is_space = e < len(data) and e < n_chars and chars[e].isspace()
        if before_is_space and after_is_space:
            out.append(replacement)
        else:
            out.append(f" {replacement} ")
        last = e
    out.append(data[last:].decode("utf-8"))
    return _WS_RE.sub(" ", "".join(out)).strip()


def transform_nom(text: str | None) -> str | None:
    if text is None:
        return None
    text = text.strip()
    if not text:
        return None
    text = strip_accent(text).upper()
    text = _NOM_EDGE_RE.sub("", text)
    text = _replace_delimiters_inside_text(text, "ET")
    text = _NOM_INVALID_RE.sub("", text)
    text = _HYPHENS_RE.sub(" ", text)
    text = _WS_RE.sub(" ", text)
    return text


# --- prenom (prenom.rs:12-82) ----------------------------------------------

_PRENOM_SINGLE_RE = re.compile(r"[^a-zA-ZÀ-ÿ]")
_PRENOM_SPECIAL_RE = re.compile(r"[^À-ÿa-zA-Z\s\-\'’&]")
_AMP_RE = re.compile(r"&+")


def _format_name_part(part: str) -> str:
    formatted = []
    for sub in part.split():
        first = strip_accent(sub[0].upper())
        formatted.append(first + sub[1:].lower())
    return " ".join(formatted)


def transform_prenom(text: str | None) -> str | None:
    if text is None:
        return None
    if len(text.encode("utf-8")) == 1:  # byte length, prenom.rs:68
        cleaned = _PRENOM_SINGLE_RE.sub("", text)
        return cleaned if cleaned else None
    t = _PRENOM_SPECIAL_RE.sub("", text)
    t = _AMP_RE.sub(" ", t)
    t = t.strip()
    t = _WS_RE.sub(" ", t)
    parts = []
    for part in t.split("-"):
        stripped = part.strip()
        if len(stripped.encode("utf-8")) == 1:  # byte length, prenom.rs:46
            parts.append(stripped)
        else:
            parts.append(_format_name_part(part))
    return "-".join(parts)


# --- expression-variant normalizers -----------------------------------------
# The reference keeps TWO implementations of several transforms: a row UDF
# and a Polars expression chain; the example pipelines use the EXPRESSION
# variant for nom/prenom/email/raison_sociale (transform_jdd_normalisation.rs:40-52,
# transform_hdd_deduplication.rs:370-381). The expr variants differ from the
# UDFs in edge cases: polars str.replace is FIRST-occurrence-only, there is
# no final trim (golden keeps "SEBASTIEN ET PASCAL " with trailing space),
# no empty->null coercion, and no single-char verbatim rules in prenom.

_TRIM_RE = re.compile(r"^\s+|\s+$")
_NOM_DELIM_STR_RE = re.compile(r"//|_|/|&")


def transform_nom_expr(text: str | None) -> str | None:
    """nom.rs:83-114 (col_nom_with_polars_expr)."""
    if text is None:
        return None
    text = _TRIM_RE.sub("", text)
    text = strip_accent(text).upper()
    text = _NOM_EDGE_RE.sub("", text)
    text = _NOM_DELIM_STR_RE.sub(" ET ", text, count=1)  # polars str.replace: first only
    text = _NOM_INVALID_RE.sub("", text)
    text = _HYPHENS_RE.sub(" ", text)
    text = _WS_RE.sub(" ", text)
    return text


def transform_prenom_expr(text: str | None) -> str | None:
    """prenom.rs:88-144 — no single-byte special cases, every sub-part gets
    first-char uppercase + accent-strip."""
    if text is None:
        return None
    text = _TRIM_RE.sub("", text)
    t = _PRENOM_SPECIAL_RE.sub("", text)
    t = _AMP_RE.sub(" ", t)
    t = _WS_RE.sub(" ", t)
    parts = []
    for part in t.split("-"):
        subs = []
        for sp in part.split():
            first = strip_accent(sp[0].upper())
            subs.append(first + sp[1:].lower())
        parts.append(" ".join(subs))
    return "-".join(parts)


_EMAIL_STRIP_RE = re.compile(r"['’&\s]+")
_EMAIL_AT_DOT_RE = re.compile(r"@\.")


def _email_tail(email: str) -> str | None:
    """Shared validation + domain-hyphen strip (email.rs:26-58 == :84-117)."""
    if not _EMAIL_RE.match(email):
        return None
    parts = email.split("@")
    if len(parts) != 2:
        return None
    domain = parts[1]
    domain_parts = domain.split(".")
    if len(domain_parts) < 2:
        return None
    if len(domain_parts[-2]) < 2:
        return None
    if not (2 <= len(domain_parts[-1]) <= 4):
        return None
    return f"{parts[0]}@{domain.replace('-', '')}"


def transform_email_expr(text: str | None) -> str | None:
    """email.rs:65-125 — uppercase, FIRST-run-only strip of ['’&\\s]+,
    FIRST "@." fix, then accent-strip + shared validation."""
    if text is None:
        return None
    email = text.upper()
    email = _EMAIL_STRIP_RE.sub("", email, count=1)
    email = _EMAIL_AT_DOT_RE.sub("@", email, count=1)
    email = strip_accent(email)
    return _email_tail(email)


# --- civilite (civilite.rs:7-50, config.rs:67-97) ---------------------------

SPECIAL_CIVILITIES = frozenset(
    {
        "DOCTEUR",
        "GÉNÉRAL",
        "COMPTE",
        "INGÉNIEUR GÉNÉRAL",
        "PRÉFET",
        "PROFESSEUR",
        "MONSEIGNEUR",
        "SŒUR",
        "COMMISSAIRE",
    }
)

CIVILITE_MAP = {
    "MONSIEUR": "MONSIEUR",
    "M": "MONSIEUR",
    "M.": "MONSIEUR",
    "MR": "MONSIEUR",
    "MM": "MONSIEUR",
    "M(ESPACE)": "MONSIEUR",
    "MADAME": "MADAME",
    "MME": "MADAME",
    "MRS": "MADAME",
    "MS": "MADAME",
    "MLLE": "MADAME",
    "MAD": "MADAME",
    "MADEMOISELLE": "MADAME",
}

_CIVILITE_PUNCT_RE = re.compile(r"[.,/&\\]")


def transform_civilite(text: str | None) -> str | None:
    if text is None:
        return None
    text = strip_accent(text.strip()).upper()
    if text in SPECIAL_CIVILITIES:
        return None
    text = _CIVILITE_PUNCT_RE.sub(" ", text)
    full_titles: list[str] = []
    for part in text.split():
        title = CIVILITE_MAP.get(part)
        if title is not None and title not in full_titles:
            full_titles.append(title)
    result = []
    if "MONSIEUR" in full_titles:
        result.append("MONSIEUR")
    if "MADAME" in full_titles:
        result.append("MADAME")
    return " ".join(result) if result else None


# --- email (email.rs:13-59) -------------------------------------------------

_EMAIL_RE = re.compile(r"^[A-Z0-9._%+-]+@[A-Z0-9.-]+\.[A-Z]{2,}$")


def transform_email(email: str | None) -> str | None:
    if email is None:
        return None
    email = email.replace(" ", "").upper()
    email = strip_accent(email)
    for ch in ("'", "’", "&"):
        email = email.replace(ch, "")
    email = email.replace("@.", "@")
    if not _EMAIL_RE.match(email):
        return None
    parts = email.split("@")
    if len(parts) != 2:
        return None
    domain = parts[1]
    domain_parts = domain.split(".")
    if len(domain_parts) < 2:
        return None
    if len(domain_parts[-2]) < 2:
        return None
    if not (2 <= len(domain_parts[-1]) <= 4):
        return None
    return f"{parts[0]}@{domain.replace('-', '')}"


# --- telephone (telephone.rs:7-84) ------------------------------------------

_PAID_PREFIXES = ("81", "82", "83", "87", "89")


def _is_paid(number: str) -> bool:
    return number.startswith(_PAID_PREFIXES)


def transform_telephone(number: str | None) -> str | None:
    if number is None:
        return None
    n = "".join(c for c in number.strip() if c.isascii() and c.isdigit())
    ln = len(n)
    if ln == 10 and n.startswith("0") and not _is_paid(n[1:]):
        return f"+33 {n[1]} {n[2:4]} {n[4:6]} {n[6:8]} {n[8:10]}"
    if ln == 11 and n.startswith("33") and not _is_paid(n[2:]):
        return f"+33 {n[2]} {n[3:5]} {n[5:7]} {n[7:9]} {n[9:11]}"
    if ln == 12 and n.startswith("00") and not _is_paid(n[2:]):
        # Reference slices bytes 11..13 of a 12-char string (would panic);
        # Python slicing degrades gracefully — documented deviation.
        return f"+{n[2:4]} {n[4]} {n[5:7]} {n[7:9]} {n[9:11]} {n[11:13]}"
    if ln == 12 and n.startswith("330") and not _is_paid(n[3:]):
        return f"+33 {n[3]} {n[4:6]} {n[6:8]} {n[8:10]} {n[10:12]}"
    if ln == 9 and not _is_paid(n):
        return f"+33 {n[0]} {n[1:3]} {n[3:5]} {n[5:7]} {n[7:9]}"
    return None


# --- raison sociale (raison_sociale.rs:12-37) -------------------------------


def transform_raison_sociale(text: str | None) -> str | None:
    if text is None:
        return None
    text = strip_accent(text)
    if len(text) >= 2 and text.startswith('"') and text.endswith('"'):
        text = text[1:-1]
    text = text.replace('""', '"')
    return "".join(c if c == "ß" else c.upper() for c in text)


# --- siren / siret (siren.rs:8-33, siret.rs:8-34) ---------------------------

_SIREN_STRIP_RE = re.compile(r"-|\s")


def transform_siren(text: str | None) -> str | None:
    if text is None:
        return None
    cleaned = _SIREN_STRIP_RE.sub("", text)
    # Rust char::is_numeric == Unicode N category ≈ str.isnumeric
    if len(cleaned) == 9 and all(c.isnumeric() for c in cleaned):
        return cleaned
    return None


def transform_siret(text: str | None) -> str | None:
    if text is None:
        return None
    cleaned = "".join(c for c in text if c.isnumeric())
    return cleaned if len(cleaned) == 14 else None


# --- ape / code_naf / libelle_naf (ape.rs:9-38, code_naf.rs:7-37) -----------

_APE_STRIP_RE = re.compile(r"[.\-_,]")
_NAF_STRIP_RE = re.compile(r"[.\-_,;]")
_NAF_FULL_RE = re.compile(r"^(\d{4})([a-zA-Z])$")


def transform_ape(text: str | None) -> str | None:
    if text is None:
        return None
    cleaned = _APE_STRIP_RE.sub("", text)  # replace_all
    m = _NAF_FULL_RE.match(cleaned)
    if m is None or m.end() != len(cleaned):
        return None
    return m.group(1) + m.group(2).upper()


def transform_code_naf(text: str | None) -> str | None:
    if text is None:
        return None
    cleaned = _NAF_STRIP_RE.sub("", text, count=1)  # replace FIRST occurrence
    m = _NAF_FULL_RE.match(cleaned)
    if m is None or m.end() != len(cleaned):
        return None
    return m.group(1) + m.group(2).upper()


# libelle_naf.rs applies the code_naf rule to the LIBELE_NAF column
transform_libelle_naf = transform_code_naf


# --- pce / siret successeur (pce.rs:4-17, siret_successeur.rs:4-17) ---------

_NON_DIGIT_RE = re.compile(r"\D")


def transform_pce(text: str | None) -> str | None:
    if text is None:
        return None
    return _NON_DIGIT_RE.sub("", text)


transform_siret_successeur = transform_pce
