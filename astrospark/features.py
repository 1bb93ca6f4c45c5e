"""Per-token feature columns — vectorized (pandas/numpy) over token batches.

Reproduces the EFFECTIVE feature set of the reference: the columns emitted by
``FeaturesVectorAstro.printVector``
(/root/reference/src/main/java/org/grobid/core/features/FeaturesVectorAstro.java:48-122)
as addressed by the Wapiti template column indices
(/root/reference/resources/dataset/astro/crfpp-templates/astro.template).
The template's comments describe a 4-prefix/4-suffix layout while printVector
emits 5+5, so the template's indices land on shifted columns; what the model
actually consumes is template-index ∘ printVector-order. We therefore compute
exactly the emitted column order and let the template spec (templates.py)
address it by index:

  0  token                        printVector:54
  1  lowercase(token)             printVector:57
  2-6  prefix 1..5                printVector:60-64
  7-11 suffix 1..5                printVector:67-71
  12 capitalisation (ALLCAPS/INITCAP/NOCAPS; forced NOCAPS when ALLDIGIT,
     printVector:74-77)           addFeaturesAstro:148-153
  13 digit (ALLDIGIT/CONTAINDIGIT/NODIGIT)  addFeaturesAstro:155-160
  14 singleChar "1"/"0"           addFeaturesAstro:144-146
  15 punctType                    addFeaturesAstro:162-178,186-187
  16 astroName "1"/"0"  (gazetteer token membership, J1)
  17 isAstroToken "1"/"0" (gazetteer multi-token interval, J2)

Columns 18-20 (shadowNumber/wordShape/wordShapeTrimmed) are emitted by the
reference but never addressed by any template line — they are dead features
and are intentionally not computed on the hot path (scalar renditions live in
oracle.py for documentation parity).

All functions take/return pandas Series so a whole Arrow batch's tokens are
processed in C loops — no per-token Python on the Spark path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

N_COLS = 18

_ALLCAPS_RE = r"[A-Z]+"
_ALLDIGIT_RE = r"[0-9]+"
_CONTAINS_DIGIT_RE = r"[0-9]"
_INITCAP_RE = r"[A-Z].*"
# token made entirely of punctuation-ish delimiter chars
_ISPUNCT_RE = r"[\,\:;\?\.\!\(\)\[\]\"'`\*\-–−/<>=\+%\$\^‰°≈]+"


def compute_columns(
    tokens: pd.Series, astro_name: np.ndarray, is_astro_token: np.ndarray | None
) -> list:
    """18 feature columns for a Series of (already normalized) token strings.

    ``astro_name``/``is_astro_token``: boolean arrays aligned with ``tokens``.
    String-valued columns are returned as pyarrow-backed Series (their str
    kernels run in native code, 2-5x the object path); categorical columns
    as numpy object arrays. Consumers (pd.factorize in CrfModel.emissions)
    accept both.

    ``is_astro_token=None`` leaves cols[17] as None — used by the kernel's
    unique-token fast path, where cols 0-16 are functions of the token
    string (computed once per distinct token) while col 17 is positional
    (interval membership) and is filled in full-length by the caller.
    """
    if not isinstance(tokens.dtype, pd.ArrowDtype):
        s = tokens.astype("string[pyarrow]")
    else:
        s = tokens
    cols: list = [None] * N_COLS
    cols[0] = s
    cols[1] = s.str.lower()
    # prefixes / suffixes: TextUtilities.prefix/suffix semantics — whole
    # string when shorter than k (str.slice already behaves that way).
    for k in range(1, 6):
        cols[1 + k] = s.str.slice(0, k)
        cols[6 + k] = s.str.slice(-k)

    all_digit = s.str.fullmatch(_ALLDIGIT_RE).to_numpy(dtype=bool)
    contains_digit = s.str.contains(_CONTAINS_DIGIT_RE, regex=True).to_numpy(dtype=bool)
    all_caps = s.str.fullmatch(_ALLCAPS_RE).to_numpy(dtype=bool)
    init_cap = s.str.match(_INITCAP_RE).to_numpy(dtype=bool)

    # capitalisation with the ALLDIGIT->NOCAPS override (printVector:74-77)
    cols[12] = np.select(
        [all_digit, all_caps, init_cap],
        ["NOCAPS", "ALLCAPS", "INITCAP"],
        default="NOCAPS",
    )
    cols[13] = np.select(
        [all_digit, contains_digit], ["ALLDIGIT", "CONTAINDIGIT"], default="NODIGIT"
    )
    cols[14] = np.where(s.str.len().to_numpy(dtype=np.int64) == 1, "1", "0")

    # punctType ladder (addFeaturesAstro:162-178): generic PUNCT first, then
    # exact-char classes override.
    is_punct = s.str.fullmatch(_ISPUNCT_RE).to_numpy(dtype=bool)
    cols[15] = np.select(
        [
            s.isin(("(", "[")).to_numpy(dtype=bool),
            s.isin((")", "]")).to_numpy(dtype=bool),
            s.isin((".",)).to_numpy(dtype=bool),
            s.isin((",",)).to_numpy(dtype=bool),
            s.isin(("-",)).to_numpy(dtype=bool),
            s.isin(('"', "'", "`")).to_numpy(dtype=bool),
            is_punct,
        ],
        ["OPENBRACKET", "ENDBRACKET", "DOT", "COMMA", "HYPHEN", "QUOTE", "PUNCT"],
        default="NOPUNCT",
    )
    cols[16] = np.where(astro_name, "1", "0")
    cols[17] = None if is_astro_token is None else np.where(is_astro_token, "1", "0")
    return cols
