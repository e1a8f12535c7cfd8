"""Mini-driver: replicate the spark-graft driver's correctness check
(row count + schema + order-insensitive values) locally so oracle
mismatches surface in pytest before the real driver runs at sf0.01."""

from __future__ import annotations

import duckdb
import pandas as pd

from recipes_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def oracle_output_types(sql: str, sf_dir: str) -> list[tuple[str, str]]:
    """(column, DuckDB logical type) for an oracle's output, WITHOUT
    executing it — lazy relation metadata only. Used by the dtype audit:
    a HUGEINT output column means pandas will coerce it to float64 and the
    driver will hash-mismatch Spark's int64 even when values are equal."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    rel = con.sql(sql)
    return list(zip(rel.columns, [str(t) for t in rel.types]))


def driver_canonicalize(df: pd.DataFrame) -> None:
    """Replicate the DRIVER's canonicalization on a query output and
    raise if it cannot be canonicalized. The driver pandas-sorts EVERY
    query's output columns (including rows-only / no-oracle queries)
    and value-hashes the cells; a top-level array/map/struct column
    reaches `Categorical(..., ordered=True)` → `factorize` and dies
    with `TypeError: unhashable type` — exactly how `x3_pq_codes`
    burned the round-4 driver row despite 445 green local tests.
    Running this over every registered query makes the whole
    output-shape contract mechanical (like the HUGEINT audit did for
    oracle dtypes): any output the driver cannot sort/hash fails
    pytest first."""
    out = df[sorted(df.columns)]
    # Driver-style row sort over all output columns (this is the call
    # that throws on unhashable cells — lexsort factorizes object cols).
    out = out.sort_values(by=list(out.columns), kind="mergesort")
    # Driver-style value hash: every cell must be hashable.
    pd.util.hash_pandas_object(out, index=False)


def assert_plan_hygiene(sdf, name: str) -> None:
    """Execution anti-pattern audit, mechanical: no registered query's
    physical plan may contain a CartesianProduct (an unbroadcast
    cross join — every intended scalar crossJoin in the repo
    broadcasts its 1-row side, so it compiles to
    BroadcastNestedLoopJoin) or BatchEvalPython (a row-at-a-time
    Python UDF — every Python island must be Arrow-batched:
    ArrowEvalPython / mapInPandas / grouped map). Runs on the
    already-constructed DataFrame inside the oracle and
    canonicalization tests, so the whole registry is swept every suite
    run at no extra execution cost (a swept-clean baseline was
    verified over all 186 queries before pinning this)."""
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{name}: CartesianProduct in plan — broadcast the small side"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan — use a pandas_udf "
        "or mapInPandas (Arrow-batched)"
    )


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all values — order-insensitive
    canonical form."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].dt.tz_localize(None) if getattr(out[c].dt, "tz", None) else out[c]
            out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    return compare_frames(spark_df.toPandas(), oracle_df, name)


def compare_frames(
    spark_pdf: pd.DataFrame, oracle_df: pd.DataFrame, name: str
) -> list[str]:
    """compare() on an already-collected Spark result — lets a caller
    reuse one toPandas() for both the oracle compare and the
    driver-canonicalization check instead of executing the query
    twice."""
    problems: list[str] = []
    sp = normalize(spark_pdf)
    oc = normalize(oracle_df)
    if len(sp) != len(oc):
        problems.append(f"{name}: row count {len(sp)} vs oracle {len(oc)}")
    if list(sp.columns) != list(oc.columns):
        problems.append(f"{name}: columns {list(sp.columns)} vs {list(oc.columns)}")
        return problems
    if problems:
        return problems
    for c in sp.columns:
        a, b = sp[c], oc[c]
        # Driver-faithful dtype gate: the real driver hashes raw values, so
        # an int64 Spark column against a float64 oracle column (the DuckDB
        # HUGEINT → pandas float64 leak) mismatches there even when the
        # values are numerically equal. Deliberately strict for NULLABLE
        # integer outputs too: Spark's toPandas converts a long column with
        # any NULL to float64, and the driver sees exactly the same — so a
        # query whose integer output can be NULL must coalesce() (or the
        # oracle must produce matching floats); failing here predicts the
        # driver, which is this harness's whole contract. Fail it here too, so the leak can
        # never pass pytest and then burn a driver row.
        int_vs_float = (
            pd.api.types.is_integer_dtype(a) and pd.api.types.is_float_dtype(b)
        ) or (
            pd.api.types.is_float_dtype(a) and pd.api.types.is_integer_dtype(b)
        )
        if int_vs_float:
            problems.append(
                f"{name}: column {c} dtype class mismatch — spark {a.dtype} vs "
                f"oracle {b.dtype} (cast the oracle aggregate, e.g. "
                f"CAST(sum(...) AS BIGINT))"
            )
            continue
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            ok = (
                (a.isna() & b.isna())
                | ((a - b).abs() <= 1e-9 + 1e-9 * b.abs())
            ).all()
        else:
            ok = a.equals(b)
        if not ok:
            diff_idx = None
            try:
                neq = ~((a == b) | (a.isna() & b.isna()))
                diff_idx = neq.idxmax() if neq.any() else None
            except Exception:
                pass
            sample = (
                f" first diff at row {diff_idx}: {a.iloc[diff_idx]!r} vs {b.iloc[diff_idx]!r}"
                if diff_idx is not None
                else ""
            )
            problems.append(f"{name}: column {c} values differ.{sample}")
    return problems
