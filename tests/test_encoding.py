"""P8 surrogate re-encode unit tests (insitu…/recipe.py:48-63
semantics): mojibake repair + clean-string identity."""

from __future__ import annotations

import pyspark.sql.functions as F

from recipes_spark.functions.encoding import fix_surrogates_py, reencode_attrs_map


def test_clean_string_identity():
    assert fix_surrogates_py("plain ascii") == "plain ascii"
    assert fix_surrogates_py("ünïcödé ✓") == "ünïcödé ✓"
    assert fix_surrogates_py(None) is None
    assert fix_surrogates_py("") == ""


def test_surrogate_escaped_utf8_repaired():
    # 'é' as utf-8 bytes decoded latin-1-style into surrogates:
    raw = "café".encode()
    broken = raw.decode("ascii", errors="surrogateescape")
    assert "\udcc3" in broken  # lone surrogate present
    assert fix_surrogates_py(broken) == "café"


def test_unrepairable_bytes_replaced():
    broken = b"\xff\xfe".decode("ascii", errors="surrogateescape")
    fixed = fix_surrogates_py(broken)
    assert "\udcff" not in fixed  # no surrogates survive
    assert "�" in fixed  # replacement char marks the loss


def test_reencode_attrs_map_clean_identity(spark):
    """Clean maps pass through the dict-walk UDF unchanged. (Broken
    strings can't be crafted driver-side: JVM strings cannot carry lone
    surrogates — see the module docstring; the repair path is
    decode_and_fix over BINARY, tested below.)"""
    df = spark.createDataFrame(
        [({"title": "ünïcödé ✓", "clean": "ok"},)], "attrs map<string,string>"
    )
    out = df.select(reencode_attrs_map(F.col("attrs")).alias("attrs")).first()
    assert out.attrs["title"] == "ünïcödé ✓"
    assert out.attrs["clean"] == "ok"


def test_decode_and_fix_binary_repair(spark):
    """Raw mojibake bytes → clean UTF-8, entirely executor-side: the
    reference-equivalent repair path (bytes never become a JVM string
    while broken)."""
    from recipes_spark.functions.encoding import decode_and_fix

    df = spark.createDataFrame(
        [("café".encode(),), (b"ok",), (b"\xff\xfe",), (None,)],
        "raw binary",
    )
    got = [r.s for r in df.select(decode_and_fix("raw").alias("s")).collect()]
    assert got[0] == "café"
    assert got[1] == "ok"
    assert "\udcff" not in got[2] and "�" in got[2]
    assert got[3] is None


def test_fix_surrogates_fuzz_total_and_jvm_safe():
    """The P8 repair contract, fuzzed: for ANY Python string —
    including lone surrogates in every position, mixed with real
    multibyte text — fix_surrogates_py (1) never raises, (2) returns
    a string that strictly UTF-8 encodes (i.e. contains NO lone
    surrogates — the property that makes it safe to hand to the JVM,
    where a lone surrogate would corrupt to U+FFFD unpredictably),
    and (3) is idempotent (repairing a repaired string is identity)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from recipes_spark.functions.encoding import fix_surrogates_py

    # Surrogate-capable text: hypothesis's text() excludes surrogates,
    # so splice them in explicitly.
    surrogates = st.integers(0xD800, 0xDFFF).map(chr)
    pieces = st.lists(
        st.one_of(st.text(max_size=8), surrogates), max_size=12
    ).map("".join)

    @settings(max_examples=500, deadline=None)
    @given(pieces)
    def fuzz(s):
        out = fix_surrogates_py(s)
        assert isinstance(out, str)
        out.encode("utf-8")  # strict — would raise on any lone surrogate
        assert fix_surrogates_py(out) == out

    fuzz()
    assert fix_surrogates_py(None) is None
