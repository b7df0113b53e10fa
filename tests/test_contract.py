"""Local mirror of the driver's correctness gate: run each queries()
entry on Spark and the matching oracle_sql() on DuckDB at sf0.01, then
compare row count, schema (column names), and order-insensitive values.

Floats are compared to 9 significant-ish decimals after the contract's
own rounding — the contract already rounds libm-derived values to 3
decimals, so equality here is strict string equality of normalized rows.
"""

import math

import pytest

from tests.conftest import SF_DIR_ORACLE


def _normalize(rows, colnames):
    out = []
    for row in rows:
        vals = []
        for c in sorted(colnames):
            v = row[c] if not isinstance(row, tuple) else row[colnames.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(repr(v))
            else:
                vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def _pairs():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,builder,oracle", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, duck, name, builder, oracle):
    df = builder(spark, SF_DIR_ORACLE)
    cols = df.columns
    spark_rows = df.collect()
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check (driver parity)
        return
    res = duck.sql(oracle)
    duck_cols = [d[0] for d in res.description]
    assert sorted(duck_cols) == sorted(cols), f"{name}: schema mismatch"
    duck_rows = res.fetchall()
    assert len(duck_rows) == len(spark_rows), (
        f"{name}: row count {len(spark_rows)} (spark) != {len(duck_rows)} (duckdb)"
    )
    s_norm = _normalize([r.asDict() for r in spark_rows], cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mism = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mism, f"{name}: {len(mism)} mismatching rows, first: {mism[:3]}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "spans" in df.columns  # span sequence carried through
