"""P8: surrogate re-encode (SURVEY.md §2.2).

Reference: reencode_surrogates walks every global and per-variable attr
dict and fixes UTF-8 surrogate-escaped strings before item assembly
(insitu…/recipe.py:48-63, hooked as preprocess= at :164). There is no
Catalyst builtin for surrogateescape, so the fix itself is a tiny
scalar pandas UDF — and it MUST run where the bytes are decoded:
JVM strings cannot carry lone surrogates (they become U+FFFD in
transit), so once a broken string has crossed into Catalyst the
original bytes are unrecoverable. The reference has the same
constraint implicitly: reencode_surrogates runs inside the same Python
process that decoded the NetCDF attrs. Engine rule: repair inside the
mapInPandas decode island (sources/granules.py) or decode from the raw
BINARY column with decode_and_fix below.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column


def fix_surrogates_py(s: str | None) -> str | None:
    """Round-trip through surrogateescape: lone surrogates (produced by
    decoding mojibake bytes with errors='surrogateescape') re-encode to
    their original bytes, then decode strictly with replacement for
    anything still invalid. Clean strings pass through unchanged.

    TOTAL over all Python strings (fuzz-pinned): surrogateescape only
    maps the \\udc80-\\udcff range back to bytes — any OTHER lone
    surrogate (\\ud800 from truncated UTF-16, an unpaired \\uD800 out
    of JSON) raises UnicodeEncodeError from the encode itself. Those
    characters are unrepairable by construction and become U+FFFD,
    per-character so repairable \\udcXX bytes in the SAME string still
    round-trip."""
    if s is None:
        return None
    try:
        b = s.encode("utf-8", "surrogateescape")
    except UnicodeEncodeError:
        parts = []
        for ch in s:
            try:
                parts.append(ch.encode("utf-8", "surrogateescape"))
            except UnicodeEncodeError:
                parts.append(b"\xef\xbf\xbd")  # U+FFFD replacement
        b = b"".join(parts)
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("utf-8", errors="replace")


_UDF = None


def fix_surrogates(col: Column | str) -> Column:
    """Pandas-UDF wrapper, built lazily — pandas_udf resolves its return
    type against the ACTIVE SparkSession, so decorating at import time
    fails when the module loads before the session exists."""
    global _UDF
    if _UDF is None:

        @F.pandas_udf("string")
        def _fix(s: pd.Series) -> pd.Series:
            return s.map(fix_surrogates_py)

        _UDF = _fix
    return _UDF(col)


_BYTES_UDF = None


def decode_and_fix(col: Column | str) -> Column:
    """BINARY attr bytes → clean UTF-8 string: decode with
    surrogateescape (never throws), then repair — the full
    reference-equivalent path for raw attr bytes."""
    global _BYTES_UDF
    if _BYTES_UDF is None:

        @F.pandas_udf("string")
        def _decode(b: pd.Series) -> pd.Series:
            return b.map(
                lambda v: None
                if v is None
                else fix_surrogates_py(
                    bytes(v).decode("utf-8", errors="surrogateescape")
                )
            )

        _BYTES_UDF = _decode
    return _BYTES_UDF(col)


_MAP_UDF = None


def reencode_attrs_map(attrs: Column) -> Column:
    """The reference's attrs-dict walk (insitu…/recipe.py:48-63) as one
    map<string,string> → map<string,string> pandas UDF. NOT
    transform_values + scalar UDF: Catalyst rejects Python UDFs inside
    higher-order-function lambdas (UNSUPPORTED_FEATURE), and one UDF
    call per MAP beats one per entry anyway."""
    global _MAP_UDF
    if _MAP_UDF is None:

        @F.pandas_udf("map<string,string>")
        def _fix_map(maps: pd.Series) -> pd.Series:
            return maps.map(
                lambda d: None
                if d is None
                else {k: fix_surrogates_py(v) for k, v in d.items()}
            )

        _MAP_UDF = _fix_map
    return _MAP_UDF(attrs)
