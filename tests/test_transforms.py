"""Per-transform conformance vectors, ported verbatim from the reference's
inline unit tests (SURVEY.md §5.1). No Ray needed — pure functions.

Sources (all under /root/reference/crates/libs/lib-etl/src/transforms/):
nom.rs:128-161, prenom.rs:158-176, civilite.rs:56-77, email.rs:139-184,
telephone.rs:94-127, raison_sociale.rs:91-122, siren.rs:40-70,
siret.rs:49-85, ape.rs:45-82, code_naf.rs:44-82, libelle_naf.rs:44-82.
"""

import pyarrow as pa
import pytest

from etl_rs_ray.functions import TRANSFORMS
from etl_rs_ray.functions import text as T

NOM_CASES = [
    ("Jean-Dupont//Smith", "JEAN DUPONT ET SMITH"),
    ("Marie-Curie&Einstein", "MARIE CURIE ET EINSTEIN"),
    ("N/A", "N ET A"),
    ("O'Neil & Sons", "O'NEIL ET SONS"),
    ("El Niño", "EL NINO"),
    ("&Carre & Lagrave&", "CARRE ET LAGRAVE"),
    ("/Sébastien / Pascal/", "SEBASTIEN ET PASCAL"),
    ("Carre_/", "CARRE"),
    ("Brøgger", "BRØGGER"),
    (None, None),
    ("", None),
    ("    ", None),
]

PRENOM_CASES = [
    ("amélie", "Amélie"),
    ("LOUCA", "Louca"),
    ("H-an", "H-An"),
    ("élie", "Elie"),
    ("anne-marie", "Anne-Marie"),
    ("anne marie", "Anne Marie"),
    ("Hélène*3", "Hélène"),
    ("Hélène&Adelin", "Hélène Adelin"),
    (None, None),
]

CIVILITE_CASES = [
    ("Mm", "MONSIEUR"),
    ("MR", "MONSIEUR"),
    ("Ms", "MADAME"),
    ("MMe", "MADAME"),
    ("M(espace)", "MONSIEUR"),
    ("MAD", "MADAME"),
    ("MADAME", "MADAME"),
    ("MM Mme", "MONSIEUR MADAME"),
    ("Mme M.", "MONSIEUR MADAME"),
    ("MISS", None),
    (None, None),
]

EMAIL_CASES = [
    ("Lucas31@gmail.com", "LUCAS31@GMAIL.COM"),
    ("Lucas 31@gmail.com", "LUCAS31@GMAIL.COM"),
    ("Lucàs31@gmail.com", "LUCAS31@GMAIL.COM"),
    ("Luc’’as31@gmail.com", "LUCAS31@GMAIL.COM"),
    ("@gmail.com", None),
    ("Lucas31gmail.com", None),
    ("Lucas31@g.com", None),
    ("Lucas31@siapartnersrue(XXXX....XXXX).com", None),
    ("Lucas31@", None),
    ("Lucas31@gmail.c-om", None),
    ("Lucas31@.gmail.com", "LUCAS31@GMAIL.COM"),
    ("Lucas31@gmail.", None),
    ("Lucas31@gmail..com", None),
    ("Lucas31@gmail.f", None),
    ("Lucas31@gmail.commmee", None),
    (None, None),
    ("em&ms@gmail..com", None),
]

TELEPHONE_CASES = [
    ("07 85 78 45 21b", "+33 7 85 78 45 21"),
    ("06.58.96.32.47", "+33 6 58 96 32 47"),
    ("06-58-96a32’47", "+33 6 58 96 32 47"),
    ("443-73-421-00395", None),
    ('"06.""é/940592"', None),
    ("081 6 75 57 98", None),
    ("085 6 75 57 98", "+33 8 56 75 57 98"),
    (None, None),
]

RAISON_SOCIALE_CASES = [
    ('"ED""BANGER"', 'ED"BANGER'),
    ("Imagin&tiff_", "IMAGIN&TIFF_"),
    ("S’ociété", "S’OCIETE"),
    ("VECCHIA/", "VECCHIA/"),
    ("//MONEYY//", "//MONEYY//"),
    ("Straße", "STRAßE"),
    ("Ve&ccio", "VE&CCIO"),
    ("édouardservices", "EDOUARDSERVICES"),
    ("imagin//", "IMAGIN//"),
    ("HecøTOR", "HECØTOR"),
    ("ed'GAR", "ED'GAR"),
    ("Société dupont", "SOCIETE DUPONT"),
    ("villiers", "VILLIERS"),
    ("Paul&JO", "PAUL&JO"),
    ('""vanescènce"', '"VANESCENCE'),
    ("Brøgger", "BRØGGER"),
    ("A", "A"),
    (None, None),
    ("TIGER_Milk", "TIGER_MILK"),
    ("漢字", "漢字"),
]

SIREN_CASES = [
    ("732829320", "732829320"),
    ("732829320111", None),
    (None, None),
]

SIRET_CASES = [
    ("443 169 524 00120", "44316952400120"),
    ("443.169.524.00120", "44316952400120"),
    ("443 169 524 GH780", None),
    ("4ZT 169 524 00120", None),
    (None, None),
]

APE_CASES = [
    ("62.01z", "6201Z"),
    ("62,01z", "6201Z"),
    ("94z", None),
    ("12325", None),
    ("a2325", None),
    (None, None),
]

CODE_NAF_CASES = [
    ("011;1Z", "0111Z"),
    ("1234a", "1234A"),
    ("5678B", "5678B"),
    ("1234", None),
    ("5678", None),
    ("12-34", None),
]

PCE_CASES = [
    ("PCE-123 456", "123456"),
    ("abc", ""),
    (None, None),
    ("12345678910124", "12345678910124"),
]

ALL = {
    "nom": NOM_CASES,
    "prenom": PRENOM_CASES,
    "civilite": CIVILITE_CASES,
    "email": EMAIL_CASES,
    "telephone": TELEPHONE_CASES,
    "raison_sociale": RAISON_SOCIALE_CASES,
    "siren": SIREN_CASES,
    "siret": SIRET_CASES,
    "ape": APE_CASES,
    "code_naf": CODE_NAF_CASES,
    "libelle_naf": CODE_NAF_CASES,
    "pce": PCE_CASES,
    "siret_successeur": PCE_CASES,
}

SCALARS = {
    "nom": T.transform_nom,
    "prenom": T.transform_prenom,
    "civilite": T.transform_civilite,
    "email": T.transform_email,
    "telephone": T.transform_telephone,
    "raison_sociale": T.transform_raison_sociale,
    "siren": T.transform_siren,
    "siret": T.transform_siret,
    "ape": T.transform_ape,
    "code_naf": T.transform_code_naf,
    "libelle_naf": T.transform_libelle_naf,
    "pce": T.transform_pce,
    "siret_successeur": T.transform_siret_successeur,
}


@pytest.mark.parametrize("name", sorted(ALL))
def test_scalar_vectors(name):
    fn = SCALARS[name]
    for given, expected in ALL[name]:
        assert fn(given) == expected, f"{name}({given!r})"


@pytest.mark.parametrize("name", sorted(ALL))
def test_column_fn_matches_scalar(name):
    """The Arrow column kernel must agree element-wise with the scalar fn."""
    inputs = [c[0] for c in ALL[name]]
    expected = [c[1] for c in ALL[name]]
    out = TRANSFORMS[name](pa.array(inputs, type=pa.string()))
    assert out.to_pylist() == expected


EXPR_VARIANT_CASES = {
    # nom.rs:163-226 (col_nom_with_polars_expr test)
    "nom_expr": [
        ("&Carre & Lagrave&", "CARRE ET LAGRAVE"),
        ("/Sébastien / Pascal/", "SEBASTIEN ET PASCAL"),
        ("Carre_/", "CARRE"),
        ("Brøgger", "BRØGGER"),
        (None, None),
    ],
    # prenom.rs:178-251 — expr agrees with the UDF on the reference vectors
    "prenom_expr": PRENOM_CASES,
    # email.rs:186-277 — expr agrees with the UDF on the reference vectors
    "email_expr": EMAIL_CASES,
}


@pytest.mark.parametrize("name", sorted(EXPR_VARIANT_CASES))
def test_expr_variant_vectors(name):
    fn = {
        "nom_expr": T.transform_nom_expr,
        "prenom_expr": T.transform_prenom_expr,
        "email_expr": T.transform_email_expr,
    }[name]
    for given, expected in EXPR_VARIANT_CASES[name]:
        assert fn(given) == expected, f"{name}({given!r})"
    out = TRANSFORMS[name](pa.array([c[0] for c in EXPR_VARIANT_CASES[name]], pa.string()))
    assert out.to_pylist() == [c[1] for c in EXPR_VARIANT_CASES[name]]


def test_expr_vs_udf_divergences():
    """The documented behavioral gaps between the reference's two variants
    (the example pipelines use the EXPR one for these columns)."""
    # polars str.replace is first-occurrence-only; UDF replaces all
    assert T.transform_nom("A/B/C") == "A ET B ET C"
    assert T.transform_nom_expr("A/B/C") == "A ET BC"
    # no final trim in expr (the JDD golden keeps 'SEBASTIEN ET PASCAL ')
    assert T.transform_nom_expr("/Sébastien / Pascal /") == "SEBASTIEN ET PASCAL "
    # no empty->null in expr
    assert T.transform_nom("") is None
    assert T.transform_nom_expr("") == ""
    # prenom single-byte rule exists only in the UDF
    assert T.transform_prenom("7") is None
    assert T.transform_prenom_expr("7") == ""


def test_strip_accent_preserves_unmapped():
    # utils.rs:13-68 — ø and ß are NOT folded; case is preserved
    assert T.strip_accent("øßÀéÇñÕ") == "øßAeCnO"
    assert T.strip_accent("El Niño") == "El Nino"


def test_prenom_single_char_rules():
    # prenom.rs:67-75 — single byte: keep iff letter
    assert T.transform_prenom("7") is None
    assert T.transform_prenom("a") == "a"
    assert T.transform_prenom("-") is None
    # 'é' is 2 bytes in UTF-8 → goes through the full path
    assert T.transform_prenom("é") == "E"


def test_nom_delimiter_spacing():
    # nom.rs:24-49 — delimiter already space-padded on both sides → bare ET
    assert T.transform_nom("A / B") == "A ET B"
    assert T.transform_nom("A/B") == "A ET B"


def test_transform_chain_batch():
    from etl_rs_ray.functions import TransformChain

    chain = TransformChain({"NOM": "nom", "email": "email"})
    batch = pa.table(
        {
            "NOM": ["El Niño", None],
            "email": ["Lucas31@gmail.com", "bad"],
            "other": [1, 2],
        }
    )
    out = chain(batch)
    assert out.column("NOM").to_pylist() == ["EL NINO", None]
    assert out.column("email").to_pylist() == ["LUCAS31@GMAIL.COM", None]
    assert out.column("other").to_pylist() == [1, 2]


def test_redact_pii_patterns():
    import pyarrow as pa

    from etl_rs_ray.stages.text_stats import redact_pii

    t = pa.table({"text": pa.array([
        "reach me at jane.doe+spam@mail.example.org or 06-123-456-7890",
        "two mails: a@b.co and x_1%y@z.io; no phone",
        "digits 1234567 without separators are not a phone",
        None,
        "",
    ])})
    out = redact_pii(t, "text")
    red = out.column("text_redacted").to_pylist()
    assert red[0] == "reach me at <EMAIL> or <PHONE>"
    assert red[1] == "two mails: <EMAIL> and <EMAIL>; no phone"
    assert red[2] == "digits 1234567 without separators are not a phone"
    assert red[3] is None and red[4] == ""
    assert out.column("n_emails").to_pylist() == [1, 2, 0, None, 0]
    assert out.column("n_phones").to_pylist() == [1, 0, 0, None, 0]


def test_repetition_stats():
    import pyarrow as pa

    from etl_rs_ray.stages.text_stats import repetition_stats

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a a a a b", "all distinct words here", None, "   "]),
    })
    out = repetition_stats(t)
    assert out.column("doc_id").to_pylist() == [1, 2]  # null + token-less skipped
    assert out.column("n_tokens_rep").to_pylist() == [5, 4]
    assert out.column("distinct_ratio").to_pylist() == [2 / 5, 1.0]
    assert out.column("top_token_frac").to_pylist() == [4 / 5, 1 / 4]
